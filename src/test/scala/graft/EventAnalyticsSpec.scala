package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.EventOps
import graft.queries.Q.dec6

/** Boundary semantics of the event-analytics operators whose gate queries
  * only exercise the organic testdata: PSI at zero drift, Kaplan–Meier
  * with full observation, Benford on exact powers, and xcorr at lag 0 on
  * a self-correlated series. */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("psi of identical snapshots is ~0 in every bin; disjoint ranges dominate") {
    val a = (1 to 400).map(_.toDouble % 97).toDF("value")
    val same = EventOps.psi(a, a, "value", bins = 10, lo = 0.0, hi = 100.0, dec6)
      .agg(sum("psi_contrib")).head().getDouble(0)
    assert(math.abs(same) < 1e-9, s"self-PSI $same should be 0")
    // a shifted distribution must produce a large PSI
    val b = (1 to 400).map(i => 900.0 + i % 97).toDF("value")
    val drift = EventOps.psi(a, b, "value", bins = 10, lo = 0.0, hi = 100.0, dec6)
      .agg(sum("psi_contrib")).head().getDouble(0)
    assert(drift > 1.0, s"full range shift must alarm, got $drift")
    // the shifted mass lands in the OVERFLOW bin — drift out of the
    // declared range registers instead of vanishing
    val over = EventOps.psi(a, b, "value", bins = 10, lo = 0.0, hi = 100.0, dec6)
      .filter(col("bin") === 10).head()
    assert(over.getLong(2) == 400L)
  }

  test("kaplanMeier: all users converting on day d gives a single step to ~0") {
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = (1L to 10L).flatMap { u =>
      Seq((u, ts("2024-01-01 08:00:00"), "signup"),
        (u, ts("2024-01-04 08:00:00"), "purchase"))
    }.toDF("user_id", "ts", "event_type")
    val km = EventOps.kaplanMeier(ev, "user_id", "ts", "event_type",
      "signup", "purchase", dec6).collect()
    assert(km.length == 1)
    assert(km(0).getInt(0) == 3)          // t_days
    assert(km(0).getLong(1) == 10L)       // n_at_risk
    assert(km(0).getLong(2) == 10L)       // n_events
    assert(math.abs(km(0).getDouble(3)) < 1e-9, "S(3) = 0 when everyone converts")
  }

  test("benford digit extraction: exact powers and mantissas map to their digit") {
    val vals = Seq(1.0, 2.0, 9.0, 10.0, 99.0, 0.5, 0.002, 3.14e7)
    val df = vals.toDF("value")
    val got = EventOps.benfordDigits(df, "value", dec6)
      .select("digit", "n").as[(Int, Long)].collect().toMap
    // digits: 1,2,9,1,9,5,2,3
    assert(got == Map(1 -> 2L, 2 -> 2L, 3 -> 1L, 5 -> 1L, 9 -> 2L), s"got $got")
  }

  test("xcorr lag scan: a series shifted by k hours peaks exactly at lag k") {
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-${1 + h / 24}%02d ${h % 24}%02d:00:00")
    // x(t) = y(t - 3): x at hour h carries the value y had at h-3
    val base = (0 until 96).map(h => math.sin(h / 5.0) * 10 + h % 7)
    val rows = (3 until 96).map(h => ("x", ts(h), base(h - 3))) ++
      (0 until 96).map(h => ("y", ts(h), base(h)))
    val df = rows.toDF("event_type", "ts", "value")
    val sc = EventOps.xcorrLagScan(df, "event_type", "ts", "value",
        seriesX = "x", seriesY = "y", maxLag = 6, scoreOut = dec6)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(math.abs(sc(3) - 1.0) < 1e-6, s"lag 3 should be perfect, got ${sc(3)}")
    assert(sc.filter(_._1 != 3).values.forall(_ < 0.999),
      s"only lag 3 may be ~1: $sc")
  }
}
