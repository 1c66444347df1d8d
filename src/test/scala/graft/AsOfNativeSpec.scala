package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{JoinOps, TimeSeriesOps}

/** The custom-operator as-of join (AsOfJoin logical node + strategy +
  * AsOfJoinExec) must agree exactly with the union-then-window
  * formulation on randomized multi-key data, and its physical plan must be
  * the custom exec, not a fallback. */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("native as-of join equals union-window as-of on randomized data") {
    val rnd = new scala.util.Random(42)
    val keys = Seq("a", "b", "c", "d")
    val left = (1 to 400).map { _ =>
      (new Timestamp(1704067200000L + rnd.nextInt(100000) * 1000L), keys(rnd.nextInt(4)))
    }.toDF("ts", "k")
    val right = (1 to 300).map { i =>
      (new Timestamp(1704067200000L + rnd.nextInt(100000) * 1000L), keys(rnd.nextInt(3)), i.toDouble)
    }.toDF("ts", "k", "v")
      // contract of both ops: unique (key, ts) on the right
      .groupBy("k", "ts").agg(max("v").as("v"))

    val expected = TimeSeriesOps.asofJoinLast(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .select("k", "ts", "v")
    val got = JoinOps.asofJoinNative(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .select("k", "ts", "v")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "native and union-window as-of disagree")
  }

  test("native as-of join survives many keys across many partitions") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 20000).map { _ =>
      (new Timestamp(1704067200000L + rnd.nextInt(1000000) * 1000L), s"k${rnd.nextInt(200)}")
    }.toDF("ts", "k")
    val right = (1 to 10000).map { i =>
      (new Timestamp(1704067200000L + rnd.nextInt(1000000) * 1000L), s"k${rnd.nextInt(150)}", i.toDouble)
    }.toDF("ts", "k", "v").groupBy("k", "ts").agg(max("v").as("v"))
    val expected = TimeSeriesOps.asofJoinLast(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .select("k", "ts", "v")
    val got = JoinOps.asofJoinNative(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .select("k", "ts", "v")
    assert(got.count() == 20000)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("plan uses AsOfJoinExec; exact-ts ties match; missing key yields nulls") {
    val left = Seq(
      (ts("2024-01-01 02:00:00"), "a"),
      (ts("2024-01-01 02:00:00"), "zzz") // key with no right rows
    ).toDF("ts", "k")
    val right = Seq(
      (ts("2024-01-01 02:00:00"), "a", 2.0), // exact tie: visible
      (ts("2024-01-01 01:00:00"), "a", 1.0)
    ).toDF("ts", "k", "v")
    val out = JoinOps.asofJoinNative(left, right, Seq("k"), "ts", "ts", Seq("v"))
    assert(out.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "custom exec not in plan:\n" + out.queryExecution.executedPlan)
    val rows = out.orderBy("k").collect()
    assert(rows(0).getDouble(2) == 2.0)
    assert(rows(1).isNullAt(2))
  }

  test("rightTiebreak resolves duplicate right timestamps to max tiebreak, no pre-agg") {
    val rnd = new scala.util.Random(13)
    val keys = Seq("a", "b", "c")
    val left = (1 to 300).map { _ =>
      (new Timestamp(1704067200000L + rnd.nextInt(5000) * 1000L), keys(rnd.nextInt(3)))
    }.toDF("ts", "k")
    // ~50% duplicate (k, ts) pairs; seq is unique => deterministic winner
    val right = (1 to 400).map { i =>
      (new Timestamp(1704067200000L + rnd.nextInt(2500) * 1000L), keys(rnd.nextInt(3)), i.toDouble, i.toLong)
    }.toDF("ts", "k", "v", "seq")
    val expected = TimeSeriesOps.asofJoinLast(
      left, right.groupBy("k", "ts").agg(max_by(col("v"), col("seq")).as("v")),
      Seq("k"), "ts", "ts", Seq("v")).select("k", "ts", "v")
    val got = JoinOps.asofJoinNative(left, right, Seq("k"), "ts", "ts", Seq("v"),
      rightTiebreak = Seq("seq")).select("k", "ts", "v")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "tiebreak path disagrees with max_by pre-aggregation")
  }

  test("self as-of join (shared lineage) returns RIGHT-side values, not left") {
    // left and right share exprIds: without re-aliasing the right plan,
    // the output projection would bind the appended value slot to the
    // LEFT row's column and silently echo left values back
    val df = Seq(
      (ts("2024-01-01 01:00:00"), "a", 1.0),
      (ts("2024-01-01 02:00:00"), "a", 2.0),
      (ts("2024-01-01 03:00:00"), "a", 3.0)
    ).toDF("ts", "k", "v")
    val right = df.filter(col("v") <= 1.0) // same lineage, same exprIds
    val out = JoinOps.asofJoinNative(df, right, Seq("k"), "ts", "ts", Seq("v"))
    // columns: ts, k, v(left), v(right-appended) — check positionally
    val got = out.orderBy("ts").collect().map(r => (r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1.0, 1.0), (2.0, 1.0), (3.0, 1.0)),
      s"right-appended values wrong: ${got.toSeq}")
  }
}
