package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.pipeline.KilnPipeline

/** Semantic-parity replay on a kiln-shaped deterministic fixture
  * (FIXTURES.md §A): 2-minute readings for 3 zones over 10 days, one
  * injected accretion event with a temperature drop in its zone. */
class KilnPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-06-01 00:00:00").getTime

  // zone 3 drops 150C during the event window [day 6, day 8)
  private val evStart = Timestamp.valueOf("2024-06-07 00:00:00")
  private val evCritical = Timestamp.valueOf("2024-06-09 00:00:00")

  private lazy val readings = {
    val rows = for {
      zone <- 3 to 5
      minute <- 0 until (10 * 24 * 60) by 2
    } yield {
      val ts = new Timestamp(t0 + minute * 60000L)
      val base = 800.0 + zone * 25.0 // constant: any flag in a stable zone is a false positive
      val inEvent = zone == 3 && !ts.before(evStart) && ts.before(evCritical)
      (ts, zone, if (inEvent) base - 150.0 else base)
    }
    rows.toDF("ts", "zone", "temp")
  }

  private lazy val events = Seq(
    (1L, 3, evStart, evCritical)
  ).toDF("event_id", "zone", "start_date", "critical_date")

  private lazy val out = KilnPipeline.process(readings, events).cache()

  test("alignment yields full hourly grid per zone") {
    val grid = out.groupBy("zone").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // 10 days minus the last 2-min slot truncates to 239 hourly slots + 1
    assert(grid.values.toSet.size == 1, "all zones share the grid")
    assert(grid(3) >= 239 && grid(3) <= 241)
  }

  test("anomaly detector fires in the event zone at the drop, not elsewhere") {
    val drops = out.filter(col("anomaly") === -1)
      .groupBy("zone").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(drops.getOrElse(3, 0L) > 0, "zone 3 must flag the 150C drop")
    assert(drops.getOrElse(4, 0L) == 0 && drops.getOrElse(5, 0L) == 0,
      "stable zones must stay clean")
  }

  test("labels: active flag inside window, days_to_critical counts down, lookback flags") {
    val z3 = out.filter(col("zone") === 3)
    val active = z3.filter(col("accretion_active") === 1)
      .agg(min("ts"), max("ts")).collect().head
    assert(!active.getTimestamp(0).before(evStart))
    assert(active.getTimestamp(1).before(evCritical))
    // 30h before critical: next_48h and next_72h set, next_24h not
    val at = z3.filter(col("ts") === Timestamp.valueOf("2024-06-07 18:00:00"))
      .select("accretion_next_24h", "accretion_next_48h", "accretion_next_72h",
        "days_to_critical").collect().head
    assert(at.getInt(0) == 0 && at.getInt(1) == 1 && at.getInt(2) == 1)
    assert(math.abs(at.getDouble(3) - 1.25) < 1e-9) // 30h = 1.25 days
  }

  test("risk score is bounded and elevated during the event") {
    val stats = out.agg(min("risk_score"), max("risk_score")).collect().head
    assert(stats.getDouble(0) >= 0.0 && stats.getDouble(1) <= 1.0)
    val evAvg = out.filter(col("accretion_active") === 1).agg(avg("risk_score"))
      .collect().head.getDouble(0)
    val calmAvg = out.filter(col("zone") =!= 3).agg(avg("risk_score"))
      .collect().head.getDouble(0)
    assert(evAvg > calmAvg, s"event risk $evAvg should exceed calm $calmAvg")
  }

  test("wide pivot produces per-zone columns on the reduced frame") {
    val wide = KilnPipeline.toWide(out, Seq(3, 4, 5), Seq("temp", "risk_score"))
    assert(wide.columns.toSet.contains("3_temp") && wide.columns.toSet.contains("5_risk_score"))
    assert(wide.count() == out.select("ts").distinct().count())
  }
}
