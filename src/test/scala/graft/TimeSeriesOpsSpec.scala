package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.TimeSeriesOps

class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("timeline spans truncated min..max inclusive") {
    val df = Seq(ts("2024-01-01 00:30:00"), ts("2024-01-01 03:10:00")).toDF("ts")
    val grid = TimeSeriesOps.timeline(df, "ts").orderBy("ts").collect().map(_.getTimestamp(0))
    assert(grid.length == 4)
    assert(grid.head == ts("2024-01-01 00:00:00") && grid.last == ts("2024-01-01 03:00:00"))
  }

  test("interpolate: linear interior, null leading, carried trailing (pandas rules)") {
    val df = Seq(
      (ts("2024-01-01 00:00:00"), "a", None),
      (ts("2024-01-01 01:00:00"), "a", Some(10.0)),
      (ts("2024-01-01 02:00:00"), "a", None),
      (ts("2024-01-01 03:00:00"), "a", Some(40.0)),
      (ts("2024-01-01 04:00:00"), "a", None)
    ).toDF("ts", "k", "v")
    val out = TimeSeriesOps.interpolateCol(df, Seq("k"), "ts", "v", "o")
      .orderBy("ts").collect()
    assert(out(0).isNullAt(3))                       // leading null stays
    assert(out(2).getDouble(3) == 25.0)              // midpoint
    assert(out(4).getDouble(3) == 40.0)              // trailing carries last
  }

  test("asofJoinLast picks latest right at-or-before each left ts") {
    val left = Seq((ts("2024-01-01 02:00:00"), "a"), (ts("2024-01-01 05:00:00"), "a"))
      .toDF("ts", "k")
    val right = Seq(
      (ts("2024-01-01 01:00:00"), "a", 1.0),
      (ts("2024-01-01 02:00:00"), "a", 2.0),  // exact tie: visible to left
      (ts("2024-01-01 04:30:00"), "a", 3.0)
    ).toDF("ts", "k", "v")
    val out = TimeSeriesOps.asofJoinLast(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .orderBy("ts").collect()
    assert(out(0).getDouble(2) == 2.0)
    assert(out(1).getDouble(2) == 3.0)
  }

  test("asofJoinLast rightTiebreak collapses tied right rows deterministically, values travel together") {
    val left = Seq((ts("2024-01-01 02:00:00"), "a")).toDF("ts", "k")
    val right = Seq(
      (ts("2024-01-01 01:00:00"), "a", 1.0, 100.0, 1L),
      (ts("2024-01-01 01:00:00"), "a", 2.0, 200.0, 2L), // max seq wins as a unit
      (ts("2024-01-01 01:00:00"), "a", 3.0, 300.0, 0L)
    ).toDF("ts", "k", "v", "w", "seq")
    val out = TimeSeriesOps.asofJoinLast(left, right, Seq("k"), "ts", "ts",
      Seq("v", "w"), rightTiebreak = Some(col("seq"))).collect().head
    assert(out.getDouble(2) == 2.0 && out.getDouble(3) == 200.0)
  }

  test("nearest picks closer neighbor, prev on tie") {
    val df = Seq(
      (ts("2024-01-01 00:00:00"), "a", Some(1.0)),
      (ts("2024-01-01 01:00:00"), "a", None),          // 1h to prev, 1h to next -> prev
      (ts("2024-01-01 02:00:00"), "a", Some(5.0)),
      (ts("2024-01-01 03:00:00"), "a", None),          // closer to 02:00 value
      (ts("2024-01-01 06:00:00"), "a", Some(9.0))
    ).toDF("ts", "k", "v")
    val out = TimeSeriesOps.nearestCols(df, Seq("k"), "ts", "v", "o")
      .orderBy("ts").collect()
    assert(out(1).getDouble(3) == 1.0)  // tie -> previous
    assert(out(3).getDouble(3) == 5.0)  // 1h back vs 3h forward
  }

  test("ohlcBars: open/close by (ts,id) order, high/low/mean per bucket") {
    val df = Seq(
      ("x", ts("2024-01-01 00:10:00"), 1L, 5.0),
      ("x", ts("2024-01-01 00:20:00"), 2L, 9.0),
      ("x", ts("2024-01-01 00:40:00"), 3L, 1.0),
      ("x", ts("2024-01-01 00:50:00"), 4L, 7.0),
      ("y", ts("2024-01-01 00:30:00"), 5L, 2.0)
    ).toDF("k", "ts", "id", "v")
    val out = TimeSeriesOps.ohlcBars(df, "k", "ts", "id", "v")
      .orderBy("k").collect()
    val x = out(0)
    assert(x.getDouble(2) == 5.0 && x.getDouble(3) == 9.0)   // open, high
    assert(x.getDouble(4) == 1.0 && x.getDouble(5) == 7.0)   // low, close
    assert(x.getLong(6) == 4L && x.getDouble(7) == 5.5)      // n, mean
    val y = out(1)
    assert(y.getDouble(2) == 2.0 && y.getDouble(5) == 2.0 && y.getLong(6) == 1L)
  }

  test("ohlcBars: same-ts tie broken by id for open") {
    val df = Seq(
      ("x", ts("2024-01-01 00:10:00"), 1L, 5.0),
      ("x", ts("2024-01-01 00:10:00"), 0L, 3.0)  // same ts, smaller id -> open
    ).toDF("k", "ts", "id", "v")
    val out = TimeSeriesOps.ohlcBars(df, "k", "ts", "id", "v").collect().head
    assert(out.getDouble(2) == 3.0 && out.getDouble(5) == 5.0)
  }
}
