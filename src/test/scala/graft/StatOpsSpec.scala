package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{EventOps, StatOps}
import graft.queries.Q.dec6

/** Boundary semantics of the statistical operators (independent numpy
  * cross-checks live in tools/crosscheck_stats.py; these pin the closed-
  * form edges): Gini extremes, Mann-Whitney under identity, bootstrap CI
  * coverage of the point estimate, and A/B arm determinism. */
class StatOpsSpec extends SparkSpec {
  import spark.implicits._

  test("gini: all-equal units score 0; one unit holding everything scores (n-1)/n") {
    val equal = (1L to 50L).map((_, 10.0)).toDF("id", "x")
    val g0 = StatOps.giniConcentration(equal, "id", "x", dec6).head().getDouble(2)
    assert(math.abs(g0) < 1e-9, s"equal distribution gini $g0")
    val monopoly = ((1L to 49L).map((_, 0.0)) :+ (50L, 100.0)).toDF("id", "x")
    val g1 = StatOps.giniConcentration(monopoly, "id", "x", dec6).head().getDouble(2)
    assert(math.abs(g1 - 49.0 / 50.0) < 1e-6, s"monopoly gini $g1 want 0.98")
  }

  test("mann-whitney of a sample against itself: U = n^2/2, z = 0") {
    val a = (1 to 200).map(i => (i.toDouble % 37)).toDF("value")
    val r = StatOps.mannWhitneyU(a, a, "value", dec6).head()
    assert(r.getLong(0) == 200 && r.getLong(1) == 200)
    assert(math.abs(r.getDouble(2) - 200.0 * 200.0 / 2) < 1e-6, s"U ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(5)) < 1e-9, s"z ${r.getDouble(5)}")
    assert(r.getInt(6) == 0)
  }

  test("bootstrap CI brackets the point mean and is reproducible") {
    val ev = graft.sources.Tables.events(spark, sfTiny)
    val r1 = StatOps.bootstrapMeanCi(ev, "value", b = 32, level = 0.95,
      idCol = "event_id", scoreOut = dec6).head()
    val (mean, lo, hi) = (r1.getDouble(1), r1.getDouble(2), r1.getDouble(3))
    assert(lo < mean && mean < hi, s"CI [$lo, $hi] must bracket $mean")
    assert(hi - lo < mean, "CI implausibly wide for this sample size")
    val r2 = StatOps.bootstrapMeanCi(ev.repartition(7), "value", b = 32,
      level = 0.95, idCol = "event_id", scoreOut = dec6).head()
    assert(r1.getDouble(2) == r2.getDouble(2) && r1.getDouble(3) == r2.getDouble(3),
      "hash-drawn replicates must be partition-invariant")
  }

  test("ab arms partition users deterministically; z is 0 when arms are identical") {
    val ev = graft.sources.Tables.events(spark, sfTiny)
    val r = StatOps.abTest(ev, "user_id",
      successCond = col("event_type") === "purchase" && col("value") > 100, dec6)
      .head()
    val users = ev.select("user_id").distinct().count()
    assert(r.getLong(0) + r.getLong(1) == users, "arms must partition all users")
    // mirrored outcome: success independent of arm assignment parity check —
    // same cond, same data, re-run must be byte-identical
    val r2 = StatOps.abTest(ev.repartition(5), "user_id",
      successCond = col("event_type") === "purchase" && col("value") > 100, dec6)
      .head()
    assert(r.toSeq == r2.toSeq, "assignment must be a pure function of user id")
  }

  test("localPeaks: a hand-built series yields exactly its planted peaks") {
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // flat 10s with spikes at hours 5 and 12
    val rows = (0 until 20).map(h =>
      ("s", ts(h), if (h == 5 || h == 12) 100.0 else 10.0))
    val df = rows.toDF("event_type", "ts", "value")
    val peaks = EventOps.localPeaks(df, "event_type", "ts", "value",
      kSigma = 1.0, dec6).orderBy("h").collect()
    assert(peaks.length == 2)
    assert(peaks.map(_.getTimestamp(1).toString).toSeq ==
      Seq("2024-01-01 05:00:00.0", "2024-01-01 12:00:00.0"))
  }
}
