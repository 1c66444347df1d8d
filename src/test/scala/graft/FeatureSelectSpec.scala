package graft

import graft.pipeline.{FeatureSelect, KilnFixture, KilnPipeline, KilnSources}

class FeatureSelectSpec extends SparkSpec {

  // a synthetic 40-column schema covering every priority class
  private val cols: Seq[String] =
    Seq("target_binary", "days_to_critical", "accretion_zone") ++            // critical
    Seq("accretion_risk_score", "quality_shift_flag", "spread_zscore_5") ++  // indicators
    (1 to 6).map(i => s"ZONE_${i}_drop_pct") ++                              // temp drops
    (0 to 10).map(i => s"ZONE_$i") ++                                        // raw temps
    (1 to 4).map(i => s"diff_ZONE_$i") ++                                    // derived
    Seq("mis_GROSS_COAL_CONSUMPTION", "mis_DRI_LUMPS", "mis_POWER") ++       // ops
    Seq("ratio_coal_per_t", "thermal_efficiency") ++                         // ratios
    (1 to 3).map(i => s"ZONE_1_lag_$i").map(_ + "_lag_x").map(identity) ++   // lag-ish
    Seq("ZONE_3_roll_mean", "ZONE_2_ma_24") ++                               // roll
    Seq("ZONE_5_anomaly", "ZONE_6_anomaly")                                  // anomaly

  test("no-op below the cap") {
    assert(FeatureSelect.selectColumns(cols, maxFeatures = 500) == cols)
  }

  test("critical columns always survive; priority order governs the rest") {
    val kept = FeatureSelect.selectColumns(cols, maxFeatures = 10)
    assert(kept.size == 10)
    // critical first, all present
    assert(kept.take(3) == Seq("target_binary", "days_to_critical", "accretion_zone"))
    // indicators come before any raw temp column
    assert(kept.contains("accretion_risk_score"))
    val iIndicator = kept.indexOf("quality_shift_flag")
    val iTemp = kept.indexOf("ZONE_0")
    assert(iIndicator >= 0 && (iTemp == -1 || iIndicator < iTemp))
    // lag/roll are the lowest class — with a tight cap none survive
    assert(!kept.exists(c => c.contains("_roll_") || c.contains("_ma_")))
  }

  test("cap is exact and deduplication keeps first occurrence") {
    val kept = FeatureSelect.selectColumns(cols ++ cols, maxFeatures = 15)
    assert(kept.size == 15)
    assert(kept.distinct.size == 15)
  }

  test("reduceDimension prunes the plan to the kept columns") {
    import spark.implicits._
    val df = Seq((1.0, 2.0, 3.0, 4.0))
      .toDF("target_binary", "ZONE_0", "ZONE_1", "junk_metric")
    val out = FeatureSelect.reduceDimension(df, maxFeatures = 3)
    assert(out.columns.toSeq == Seq("target_binary", "ZONE_0", "ZONE_1"))
  }

  test("trainingMatrix caps the pivoted kiln frame and keeps ZONE names") {
    val readings = KilnSources.zoneWideToLong(KilnFixture.zoneWide(spark))
      .filter(org.apache.spark.sql.functions.col("ts") <
        org.apache.spark.sql.functions.to_timestamp(
          org.apache.spark.sql.functions.lit("2024-01-03 00:00:00")))
    val labeled = KilnPipeline.process(readings, KilnFixture.eventsForPipeline(spark))
    val m = KilnPipeline.trainingMatrix(labeled, KilnSources.zones,
      Seq("temp", "risk_score", "anomaly", "drops_12h"), maxFeatures = 20)
    assert(m.columns.length <= 21) // ts + 20 features
    assert(m.columns.count(_.startsWith("ZONE_")) >= 10)
  }
}
