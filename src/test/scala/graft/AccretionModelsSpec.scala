package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ml.AccretionModels
import graft.pipeline.KilnPipeline

/** ML heads trained on the kiln fixture: the injected event is trivially
  * separable, so the heads must recover it (reference evaluation protocol,
  * `models.py:976-1034`, with the time-based split). */
class AccretionModelsSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-06-01 00:00:00").getTime
  // two events so both train (day 4-6) and test (day 8.5-9.5) halves see one
  private lazy val events = Seq(
    (1L, 3, Timestamp.valueOf("2024-06-04 00:00:00"), Timestamp.valueOf("2024-06-06 00:00:00")),
    (2L, 4, Timestamp.valueOf("2024-06-09 12:00:00"), Timestamp.valueOf("2024-06-10 12:00:00"))
  ).toDF("event_id", "zone", "start_date", "critical_date")

  private lazy val labeled = {
    val rows = for {
      zone <- 3 to 5
      minute <- 0 until (11 * 24 * 60) by 2
    } yield {
      val ts = new Timestamp(t0 + minute * 60000L)
      val base = 800.0 + zone * 25.0
      val inEv1 = zone == 3 && minute >= 3 * 24 * 60 && minute < 5 * 24 * 60
      val inEv2 = zone == 4 && minute >= (8 * 24 + 12) * 60 && minute < (9 * 24 + 12) * 60
      (ts, zone, if (inEv1 || inEv2) base - 150.0 else base)
    }
    KilnPipeline.process(rows.toDF("ts", "zone", "temp"), events)
      .withColumn("label_active", col("accretion_active").cast("double"))
      .na.fill(0.0, Seq("temp_pct_3h", "temp_diff"))
      .cache()
  }

  test("binary head separates the injected events (AUC > 0.9 on future data)") {
    val feats = AccretionModels.featureColumns(labeled,
      exclude = Set("zone", "accretion_active", "label_active", "days_to_critical",
        "accretion_next_24h", "accretion_next_48h", "accretion_next_72h"))
    val (train, test) = AccretionModels.timeSplit(labeled, "ts", 0.7)
    assert(train.filter(col("label_active") === 1).count() > 0, "train half sees an event")
    assert(test.filter(col("label_active") === 1).count() > 0, "test half sees an event")
    val m = AccretionModels.fitBinaryHead(train, feats, "label_active")
    val auc = AccretionModels.auc(m, test, "label_active")
    assert(auc > 0.9, s"AUC $auc")
    val imp = AccretionModels.featureImportances(m, feats, 5)
    assert(imp.nonEmpty && imp.head._2 > 0)
  }

  test("model sink/source roundtrip preserves predictions") {
    val feats = Array("temp", "drop_pct", "drops_12h", "risk_score")
    val m = AccretionModels.fitBinaryHead(labeled, feats, "label_active")
    val dir = java.nio.file.Files.createTempDirectory("model").toString + "/m"
    AccretionModels.save(m, dir)
    val m2 = AccretionModels.load(dir)
    val p1 = m.transform(AccretionModels.prep(labeled, feats))
      .agg(sum("prediction")).collect().head.getDouble(0)
    val p2 = m2.transform(AccretionModels.prep(labeled, feats))
      .agg(sum("prediction")).collect().head.getDouble(0)
    assert(p1 == p2)
  }

  test("prescriptor fits one regressor per control and predicts in range") {
    val feats = Array("temp", "drop_pct", "drops_12h", "risk_score")
    val pres = AccretionModels.fitPrescriptor(labeled, feats, Seq("temp"))
    assert(pres.keySet == Set("temp"))
    val pred = pres("temp").transform(AccretionModels.prep(labeled, feats))
      .agg(min("prediction"), max("prediction")).collect().head
    assert(pred.getDouble(0) >= 600.0 && pred.getDouble(1) <= 900.0)
  }

  test("refitRecent retrains on the trailing window and reports both metrics") {
    val feats = Array("temp", "drop_pct", "drops_12h", "risk_score")
    // stale model: trained only on the FIRST 60% (never saw event 2's zone-4
    // pattern); refit on the trailing 4 days must recover it
    val (early, _) = AccretionModels.timeSplit(labeled, "ts", 0.6)
    val stale = AccretionModels.fitBinaryHead(early, feats, "label_active")
    val (updated, before, after) = AccretionModels.refitRecent(
      stale, labeled, "ts", days = 4, feats, "label_active", isClassifier = true)
    assert(after > 0.9, s"post-refit AUC $after")
    assert(after >= before - 1e-9, s"refit must not regress on the window ($before -> $after)")
    val preds = updated.transform(AccretionModels.prep(labeled, feats))
    assert(preds.filter(col("prediction") === 1.0).count() > 0)
  }

  test("incremental history emits one chained metric row per update") {
    val feats = Array("temp", "drop_pct", "drops_12h", "risk_score")
    val (early, _) = AccretionModels.timeSplit(labeled, "ts", 0.6)
    val stale = AccretionModels.fitBinaryHead(early, feats, "label_active")
    val updates = Seq(
      Timestamp.valueOf("2024-06-09 00:00:00"),
      Timestamp.valueOf("2024-06-10 00:00:00"),
      Timestamp.valueOf("2024-06-11 00:00:00"))
    val hist = AccretionModels.incrementalHistory(stale, labeled, "ts",
      updates, days = 4, feats, "label_active", isClassifier = true)
      .orderBy("update_ts").collect()
    assert(hist.length == 3)
    assert(hist.map(_.getTimestamp(0)).toSeq == updates)
    // every refit is evaluated on its own window: finite AUCs in [0, 1]
    hist.foreach { r =>
      val (b, a) = (r.getDouble(1), r.getDouble(2))
      assert(!b.isNaN && !a.isNaN && b >= 0 && b <= 1 && a >= 0 && a <= 1)
      assert(a >= b - 1e-9, s"refit must not regress on its own window ($b -> $a)")
    }
    // the last two updates see event 2's zone-4 pattern: the chained model
    // must track it (the dashboard chart's whole point is spotting this)
    assert(hist.last.getDouble(2) > 0.9, s"post-refit AUC ${hist.last.getDouble(2)}")
  }

  test("zone head recovers the forming zone with the sorted-class inverse mapping") {
    val feats = Array("temp", "drop_pct", "drops_12h", "risk_score")
    // the reference's y_zone: the accretion zone, defined on active rows
    val withZoneLabel = labeled.withColumn("target_zone",
      when(col("accretion_active") === 1, col("zone")))
    val (m, classes) = AccretionModels.fitZoneHead(withZoneLabel, feats, "target_zone")
    assert(classes == Seq(3, 4)) // the two event zones, sorted
    val acc = AccretionModels.zoneAccuracy(m, classes, withZoneLabel, "target_zone")
    assert(acc > 0.9, s"zone accuracy $acc")
    // predictions map back to REAL zone ids, not model indices
    val preds = AccretionModels.predictZone(m, classes, withZoneLabel)
      .select("predicted_zone").distinct().collect().map(_.getInt(0)).toSet
    assert(preds.subsetOf(Set(3, 4)))
  }

  test("days head learns the countdown on pre-critical rows") {
    val feats = Array("temp", "drop_pct", "drops_12h", "risk_score")
    val (train, test) = AccretionModels.timeSplit(labeled, "ts", 0.7)
    val m = AccretionModels.fitDaysHead(train, feats, "days_to_critical")
    val r = AccretionModels.rmse(m, test, "days_to_critical")
    assert(!r.isNaN && r < 2.0, s"RMSE $r days") // countdown spans 0..2 days
  }

  test("prescriptor targets follow the correlation sign; models prescribe that direction") {
    import spark.implicits._
    // coal UP with risk (positive corr -> prescribe DOWN); air DOWN with
    // risk (negative corr -> prescribe UP); flat has no variation -> 0;
    // one zero and one null coal row exercise the mask semantics
    val rows = (0 until 64).map { i =>
      val risky = i % 2
      val coal: java.lang.Double =
        if (i == 0) 0.0 else if (i == 1) null
        else 100.0 + risky * 50.0 + (i % 7)
      val air = 900.0 - risky * 80.0 + (i % 5)
      (i.toDouble, coal, air, 10.0, risky)
    }.toDF("x", "coal", "air", "flat", "accretion_next_24h")
    val out = AccretionModels.prescriptorTargets(rows, Seq("coal", "air", "flat"),
      "accretion_next_24h").collect()
    out.foreach { r =>
      val (coal, air) = (Option(r.getAs[java.lang.Double]("coal")), r.getDouble(2))
      val (aCoal, aAir, aFlat) =
        (r.getAs[Double]("adj_coal"), r.getAs[Double]("adj_air"), r.getAs[Double]("adj_flat"))
      coal match {
        case None => assert(aCoal == 0.0) // null -> no adjustment
        case Some(c) if c == 0.0 => assert(aCoal == -0.05) // zero -> fixed step
        case Some(c) => assert(aCoal == -0.05 * c) // positive corr -> down
      }
      assert(aAir == 0.05 * air, "negative corr must prescribe UP") // sign(corr) = -1
      assert(aFlat == 0.0, "no variation -> zero adjustment")
    }
    // the trained heads reproduce the prescribed DIRECTION out of sample
    val models = AccretionModels.fitPrescriptorAdjustments(
      rows, Array("x", "coal", "air", "flat"), Seq("coal", "air"), "accretion_next_24h")
    val coalPred = models("coal").transform(AccretionModels.prep(rows, Array("x", "air", "flat")))
      .agg(org.apache.spark.sql.functions.avg("prediction")).head.getDouble(0)
    val airPred = models("air").transform(AccretionModels.prep(rows, Array("x", "coal", "flat")))
      .agg(org.apache.spark.sql.functions.avg("prediction")).head.getDouble(0)
    assert(coalPred < 0, s"coal adjustment should be negative, got $coalPred")
    assert(airPred > 0, s"air adjustment should be positive, got $airPred")
  }
}
