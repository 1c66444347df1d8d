package graft

import graft.pipeline.ZoneRules

class ZoneRulesSpec extends SparkSpec {
  import spark.implicits._

  // thresholds: z0 750, z1 775, z2 800
  private def frame(rows: (Double, Double, Double)*) =
    rows.zipWithIndex.map { case ((a, b, c), i) => (i, a, b, c) }
      .toDF("row_id", "ZONE_0", "ZONE_1", "ZONE_2")

  test("counts low zones, triggers at 3+, picks the deepest drop") {
    val df = frame(
      (760.0, 780.0, 810.0), // nothing low
      (740.0, 770.0, 810.0), // 2 low -> no direct detection
      (700.0, 700.0, 700.0)  // 3 low; drops: 50, 75, 100 -> zone 2
    )
    val out = ZoneRules.detect(df).orderBy("row_id")
      .select("zones_low", "direct_detection", "most_affected_zone")
      .collect().map(r => (r.getInt(0), r.getInt(1), if (r.isNullAt(2)) -1 else r.getInt(2)))
    assert(out.toSeq == Seq((0, 0, -1), (2, 0, -1), (3, 1, 2)))
  }

  test("argmax tie-break takes the FIRST (lowest) zone, like Python max()") {
    // z0 drop 50, z1 drop 50, z2 drop 50 — tie across all three
    val out = ZoneRules.detect(frame((700.0, 725.0, 750.0))).collect().head
    assert(out.getAs[Int]("most_affected_zone") == 0)
  }

  test("A10 floor: normalization divides by 8 when the corpus max is below it") {
    val out = ZoneRules.detect(frame((700.0, 725.0, 750.0), (760.0, 780.0, 810.0)))
      .orderBy("row_id").select("temp_risk_normalized").collect()
    assert(out(0).getDouble(0) == 3.0 / 8.0)
    assert(out(1).getDouble(0) == 0.0)
  }

  test("a NULL zone temperature counts as not-low and cannot nullify the alert") {
    // z0/z1 low, z2 missing: pandas NaN < thr is False -> zones_low = 2;
    // regression: a bare cast made the whole sum NULL and dropped alerts
    val df = Seq((1, Some(700.0), Some(700.0), Option.empty[Double]))
      .toDF("row_id", "ZONE_0", "ZONE_1", "ZONE_2")
    val out = ZoneRules.detect(df).collect().head
    assert(out.getAs[Int]("zones_low") == 2)
    assert(out.getAs[Int]("direct_detection") == 0)
  }

  test("zones absent from the frame are skipped, as the reference skips missing columns") {
    val df = Seq((1, 700.0)).toDF("row_id", "ZONE_5") // thr 875 -> low
    val out = ZoneRules.detect(df).collect().head
    assert(out.getAs[Int]("zones_low") == 1)
    assert(out.getAs[Int]("direct_detection") == 0)
  }
}
