package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ml.AccretionModels
import graft.pipeline.{ScoreFusion, ZoneRules}

/** Serving-path score fusion (`dashboard.py:382-479`): the rule detector
  * and the model heads must compose per the reference's blend rules. The
  * frame is built so that BOTH branches carry information: a model-visible
  * pattern the rules miss (2 low zones — below the 3-zone trigger) and a
  * rule-visible event (4 low zones) — so every fusion clause is exercised
  * on rows where the other side disagrees. */
class ScoreFusionSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-06-01 00:00:00").getTime

  // 480 hourly rows, zones 0..10 wide. Baseline sits 30 above each
  // threshold. Hours [96, 192): RULE event — zones 4,5,6,7 drop 60 below
  // threshold (direct_detection fires, most-affected = zone 5 via largest
  // drop). Hours [288, 384): MODEL-ONLY event — zones 2,3 drop below
  // threshold (2 zones < 3: rules stay quiet) — the label marks both
  // windows, so the binary head learns to flag the second pattern too.
  private lazy val wide = {
    val rows = (0 until 480).map { h =>
      val ruleEv = h >= 96 && h < 192
      val subEv = h >= 288 && h < 384
      val temps = (0 to 10).map { z =>
        val base = ZoneRules.defaultThresholds(z) + 30.0 + (h % 7) * 0.25
        if (ruleEv && z >= 4 && z <= 7) base - (if (z == 5) 95.0 else 90.0)
        else if (subEv && (z == 2 || z == 3)) base - 80.0
        else base
      }
      (new Timestamp(t0 + h * 3600000L), temps, if (ruleEv || subEv) 1.0 else 0.0)
    }
    rows.toDF("ts", "temps", "label")
      .select(Seq(col("ts"), col("label")) ++
        (0 to 10).map(z => col("temps").getItem(z).as(s"ZONE_$z")): _*)
      .cache()
  }

  private lazy val feats = (0 to 10).map(z => s"ZONE_$z").toArray
  private lazy val binary = AccretionModels.fitBinaryHead(wide, feats, "label")
  private lazy val daysLabeled = wide.withColumn("dtc",
    when(col("label") === 1, 10.0).otherwise(25.0))
  private lazy val daysHead = AccretionModels.fitDaysHead(daysLabeled, feats, "dtc")
  private lazy val zoneHead = {
    val zl = wide.withColumn("zlab",
      when(col("ZONE_5") < ZoneRules.defaultThresholds(5), 5)
        .when(col("ZONE_2") < ZoneRules.defaultThresholds(2), 2))
    AccretionModels.fitZoneHead(zl, feats, "zlab")
  }

  test("rule branch matches the reference fallback constants") {
    val out = ScoreFusion.fuseRules(wide).cache()
    // rule event rows: detected, floored probability, 15-day countdown,
    // zone = largest threshold drop (zone 5's 95 > the others' 90)
    val ev = out.filter(col("direct_detection") === 1)
    assert(ev.count() == 96)
    assert(ev.filter(col("is_forming") =!= 1 || col("probability") =!= 0.7 ||
      col("days_to_critical") =!= 15.0 || col("zone") =!= 5).count() == 0)
    // the 2-zone window must NOT trip the 3-zone rule; quiet rows keep the
    // reference's 0.1/30/zone-5 defaults
    val rest = out.filter(col("direct_detection") === 0)
    assert(rest.count() == 480 - 96)
    assert(rest.filter(col("is_forming") =!= 0 || col("probability") =!= 0.1 ||
      col("days_to_critical") =!= 30.0 || col("zone") =!= 5).count() == 0)
  }

  test("model branch: rule evidence floors probability and overrides zone") {
    val out = ScoreFusion.fuse(wide, binary, Some(daysHead), Some(zoneHead)).cache()
    assert(out.count() == 480)
    val dd = out.filter(col("direct_detection") === 1)
    // probability = max(model, 0.7): never below the floor where detected
    assert(dd.filter(col("probability") < 0.7).count() == 0)
    assert(dd.filter(col("probability") < col("model_probability")).count() == 0)
    // is_forming = model OR rules; zone = rule argmax where detected
    assert(dd.filter(col("is_forming") =!= 1).count() == 0)
    assert(dd.filter(col("zone") =!= col("most_affected_zone")).count() == 0)
    // the model-only window: rules quiet, the binary head carries the alert
    // and the zone head serves the zone (2 — the worst sub-event zone)
    val sub = out.filter(col("ts") >= lit(new Timestamp(t0 + 288L * 3600000)) &&
      col("ts") < lit(new Timestamp(t0 + 384L * 3600000)))
    assert(sub.filter(col("direct_detection") =!= 0).count() == 0)
    val subFlagged = sub.filter(col("is_forming") === 1)
    assert(subFlagged.count() > 90, "binary head must flag the 2-zone pattern")
    assert(subFlagged.filter(col("zone") === 2).count() == subFlagged.count(),
      "zone head serves the model-only zone")
    // quiet rows: no alert, probability = the model's own (un-floored)
    val quiet = out.filter(col("label") === 0)
    assert(quiet.filter(col("is_forming") === 1).count() == 0)
    assert(quiet.filter(col("probability") =!= col("model_probability")).count() == 0)
    // days head replaces the constants everywhere
    assert(out.filter(col("days_to_critical") =!= col("model_days")).count() == 0)
  }

  test("no days/zone heads: reference fallbacks for days, null zone off-detection") {
    val out = ScoreFusion.fuse(wide, binary).cache()
    assert(out.filter(col("direct_detection") === 1 &&
      col("days_to_critical") =!= 15.0).count() == 0)
    assert(out.filter(col("direct_detection") === 0 &&
      col("days_to_critical") =!= 30.0).count() == 0)
    assert(out.filter(col("direct_detection") === 0 && col("zone").isNotNull).count() == 0)
    assert(out.filter(col("direct_detection") === 1 &&
      col("zone") =!= col("most_affected_zone")).count() == 0)
  }
}
