package graft

import graft.operators.SeasonalOps
import graft.queries.Q.dec6
import org.apache.spark.sql.functions._

/** Holt–Winters: the Spark fold-recursion is replayed in plain Scala on
  * the driver (same classical init, same update order) and must match
  * row-for-row; plus shape pins — a clean periodic signal forecasts with
  * near-zero residuals, and the first m rows carry null fitted. */
class HoltWintersSpec extends SparkSpec {
  import spark.implicits._

  private val m = 6
  private val (a, b, g) = (0.3, 0.05, 0.2)

  /** Reference implementation: independent plain-Scala replay. */
  private def reference(xs: Seq[Double]): Seq[Option[Double]] = {
    val mu1 = xs.take(m).sum / m
    val b0 = (xs.slice(m, 2 * m).sum / m - xs.take(m).sum / m) / m
    var l = mu1 + b0 * (m - 1) / 2.0; var bb = b0
    val seas = scala.collection.mutable.Queue(
      xs.take(m).zipWithIndex.map { case (x, i) =>
        x - (mu1 + b0 * (i - (m - 1) / 2.0)) }: _*)
    val fit = scala.collection.mutable.ArrayBuffer.fill[Option[Double]](m)(None)
    xs.drop(m).foreach { x =>
      val sOld = seas.dequeue()
      fit += Some(l + bb + sOld)
      val lN = a * (x - sOld) + (1.0 - a) * (l + bb)
      val bN = b * (lN - l) + (1.0 - b) * bb
      val sN = g * (x - l - bb) + (1.0 - g) * sOld
      l = lN; bb = bN; seas += sN
    }
    fit.toSeq
  }

  private def mkDf(xs: Seq[Double]) =
    xs.zipWithIndex.map { case (x, i) =>
      ("s1", java.sql.Timestamp.valueOf(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"), x)
    }.toDF("k", "ts", "v")

  test("fold recursion matches the driver-side replay row-for-row") {
    // noisy-ish deterministic signal: daily cycle + trend + arithmetic jitter
    val xs = (0 until 40).map(i =>
      10.0 + 0.1 * i + 3.0 * math.sin(2 * math.Pi * i / m) + (i * 7 % 5) * 0.3)
    val out = SeasonalOps.holtWinters(mkDf(xs), "k", "ts", "v", m,
        a, b, g, zCut = 3.0, scoreOut = identity)
      .orderBy("ts").collect()
    val want = reference(xs)
    assert(out.length == xs.length)
    out.zip(want).zipWithIndex.foreach { case ((row, w), i) =>
      val got = if (row.isNullAt(3)) None else Some(row.getDouble(3))
      (got, w) match {
        case (None, None) =>
        case (Some(gv), Some(wv)) =>
          assert(math.abs(gv - wv) < 1e-9, s"row $i: $gv vs $wv")
        case other => fail(s"row $i null mismatch: $other")
      }
    }
  }

  test("a perfectly periodic signal with linear trend fits with ~zero residuals") {
    // x_t = 5 + 0.5 t + season(t) is EXACTLY representable by the additive
    // model and the classical init recovers it: residuals stay ~0, no anomalies
    val season = Seq(2.0, -1.0, 0.5, -2.0, 1.5, -1.0)
    val xs = (0 until 60).map(i => 5.0 + 0.5 * i + season(i % m))
    val out = SeasonalOps.holtWinters(mkDf(xs), "k", "ts", "v", m,
        a, b, g, zCut = 3.0, scoreOut = dec6)
      .filter(col("fitted").isNotNull).collect()
    assert(out.length == xs.length - m)
    out.foreach { r =>
      assert(math.abs(r.getDouble(4)) < 1e-6, s"residual ${r.getDouble(4)}")
    }
  }

  test("series shorter than two periods are dropped (cannot initialize)") {
    val out = SeasonalOps.holtWinters(mkDf((0 until 2 * m - 1).map(_.toDouble)),
      "k", "ts", "v", m, a, b, g, zCut = 3.0, scoreOut = identity)
    assert(out.count() == 0)
  }

  test("long grid (50k steps): the linear scan stays exact end to end") {
    // a 10-year-hourly-class series — the regime where the former
    // concat-accumulator fold paid O(grid^2) element copies; the scan is
    // linear and must still match the driver-side replay at every row
    val n = 50000
    val xs = (0 until n).map(i =>
      5.0 + 0.002 * i + 2.0 * math.sin(2 * math.Pi * i / m) + (i * 13 % 7) * 0.1)
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val df = xs.zipWithIndex.map { case (x, i) =>
      ("s1", new java.sql.Timestamp(ts0 + i * 60000L), x)
    }.toDF("k", "ts", "v")
    val out = SeasonalOps.holtWinters(df, "k", "ts", "v", m,
        a, b, g, zCut = 3.0, scoreOut = identity)
      .orderBy("ts").select("fitted").collect()
    val want = reference(xs)
    assert(out.length == n)
    (0 until n).foreach { i =>
      val got = if (out(i).isNullAt(0)) None else Some(out(i).getDouble(0))
      assert(got == want(i), s"row $i: $got vs ${want(i)}")
    }
    // ewma on the same grid: spot the head, an interior run, and the tail
    val ew = SeasonalOps.ewma(df, "k", "ts", "v", alpha = 0.25,
        scoreOut = identity)
      .orderBy("ts").select("ewma").collect().map(_.getDouble(0))
    var y = xs(0)
    (1 until n).foreach { i => y = 0.75 * y + 0.25 * xs(i) }
    assert(ew(0) == xs(0) && ew(n - 1) == y)
  }
}
