package graft

import java.sql.Timestamp
import graft.operators.WindowOps
import graft.queries.Q.dec6

/** scipy `mode='interp'` edge handling: an order-3 Savitzky-Golay filter
  * is a POLYNOMIAL PROJECTION, so any cubic series must pass through
  * unchanged — edges included. That single invariance checks the interior
  * kernel, the edge-fit rows, their reversal-symmetric tail application,
  * and the head/tail array plumbing at once. */
class SavgolInterpSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${1 + i / 24}%02d ${i % 24}%02d:00:00")

  test("a cubic is a fixed point, edges included") {
    def cubic(i: Int): Double = 2.0 + 0.5 * i - 0.03 * i * i + 0.001 * i * i * i
    val rows = (0 until 40).map(i => ("s", ts(i), cubic(i)))
    val out = WindowOps.savgol11o3Interp(rows.toDF("event_type", "ts", "v"),
        "event_type", "ts", "v", "sg", dec6)
      .collect()
    assert(out.length == 40)
    out.foreach { r =>
      assert(!r.isNullAt(3), s"null at ${r.getTimestamp(1)}")
      assert(math.abs(r.getDouble(3) - r.getDouble(2)) < 1e-5,
        s"cubic not reproduced at ${r.getTimestamp(1)}: ${r.getDouble(3)} vs ${r.getDouble(2)}")
    }
  }

  test("edge rows sum to 1 (constant preservation) and series under 11 points go null") {
    WindowOps.savgolEdgeRows.zipWithIndex.foreach { case (row, i) =>
      assert(math.abs(row.sum - 1.0) < 1e-12, s"edge row $i sums to ${row.sum}")
    }
    val short = (0 until 8).map(i => ("s", ts(i), i.toDouble))
    val out = WindowOps.savgol11o3Interp(short.toDF("event_type", "ts", "v"),
      "event_type", "ts", "v", "sg", dec6).collect()
    assert(out.length == 8 && out.forall(_.isNullAt(3)),
      "scipy raises below the window size; we stay total with nulls")
  }

  test("a step edge is smoothed differently at head vs interior (not a copy-through)") {
    // sanity against a degenerate implementation that copies inputs at edges
    val rows = (0 until 30).map(i => ("s", ts(i), if (i < 3) 100.0 else 0.0))
    val out = WindowOps.savgol11o3Interp(rows.toDF("event_type", "ts", "v"),
        "event_type", "ts", "v", "sg", dec6)
      .collect().map(r => r.getTimestamp(1) -> r.getDouble(3)).toMap
    assert(math.abs(out(ts(0)) - 100.0) > 1.0,
      s"head smoothing should bend the step, got ${out(ts(0))}")
  }
}
