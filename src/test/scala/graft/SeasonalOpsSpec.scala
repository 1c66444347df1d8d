package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.SeasonalOps
import graft.queries.Q.dec6

/** Closed-form boundaries of the seasonal/trend operators: STL residuals
  * vanish on a pure trend+seasonal composite, the changepoint locator
  * finds a known step, and Theil-Sen recovers an exact slope and shrugs
  * off an outlier that would wreck OLS. */
class SeasonalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(dayHour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${1 + dayHour / 24}%02d ${dayHour % 24}%02d:00:00")

  test("stl: flat series decomposes to zero seasonal and zero residual") {
    val rows = (0 until 240).map(i => ("s", ts(i), 42.0))
    val df = rows.toDF("event_type", "ts", "value")
    val out = SeasonalOps.stlDecompose(df, "event_type", "ts", "value", 12, dec6)
      .collect()
    assert(out.length == 240)
    out.foreach { r =>
      assert(math.abs(r.getDouble(3) - 42.0) < 1e-6, s"trend ${r.getDouble(3)}")
      assert(math.abs(r.getDouble(4)) < 1e-6, s"seasonal ${r.getDouble(4)}")
      assert(math.abs(r.getDouble(5)) < 1e-6, s"residual ${r.getDouble(5)}")
    }
  }

  test("stl: seasonal component is zero-centered per series") {
    // daily sawtooth on a slow ramp: seasonal must average to ~0 so the
    // trend keeps the level
    val rows = (0 until 480).map(i => ("s", ts(i), i * 0.01 + (i % 24) * 1.5))
    val out = SeasonalOps.stlDecompose(rows.toDF("event_type", "ts", "value"),
      "event_type", "ts", "value", 12, dec6)
    val meanSeasonal = out.agg(avg("seasonal")).head().getDouble(0)
    assert(math.abs(meanSeasonal) < 1e-6, s"seasonal mean $meanSeasonal")
    // and it actually carries the sawtooth: hour 23 max, hour 0 min
    val byHod = out.withColumn("hod", hour(col("h")))
      .groupBy("hod").agg(avg("seasonal").as("s")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(byHod(23) > byHod(0) + 20, s"sawtooth not in seasonal: $byHod")
  }

  test("changepoint: locates a known step, per series") {
    // series A steps 10 -> 50 at hour 100 of 200; series B is flat
    val a = (0 until 200).map(i => ("A", ts(i), if (i < 100) 10.0 else 50.0))
    val b = (0 until 200).map(i => ("B", ts(i), 7.0))
    val out = SeasonalOps.meanShiftChangepoint(
        (a ++ b).toDF("event_type", "ts", "value"),
        "event_type", "ts", "value", dec6)
      .collect().map(r => r.getString(0) -> r).toMap
    val best = out("A")
    assert(best.getTimestamp(1) == ts(99), s"split at ${best.getTimestamp(1)}")
    assert(best.getLong(2) == 100 && best.getLong(3) == 100)
    assert(math.abs(best.getDouble(4) - 10.0) < 1e-6)
    assert(math.abs(best.getDouble(5) - 50.0) < 1e-6)
    // flat series: every split has stat 0; deterministic earliest-h winner
    assert(out("B").getDouble(6) == 0.0)
  }

  test("ols: exact fit on a line (r2 = 1); r2 = 0 on a flat series") {
    val line = (0 until 100).map(i => ("L", ts(i), 5.0 + 0.25 * i))
    val r = SeasonalOps.olsTrend(line.toDF("event_type", "ts", "value"),
      "event_type", "ts", "value", dec6).head()
    assert(r.getLong(1) == 100)
    assert(math.abs(r.getDouble(2) - 0.25) < 1e-6, s"slope ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-6, s"r2 ${r.getDouble(4)}")
    val flat = (0 until 100).map(i => ("F", ts(i), 9.0))
    val rf = SeasonalOps.olsTrend(flat.toDF("event_type", "ts", "value"),
      "event_type", "ts", "value", dec6).head()
    assert(math.abs(rf.getDouble(2)) < 1e-6 && rf.getDouble(4) == 0.0,
      s"flat series slope ${rf.getDouble(2)} r2 ${rf.getDouble(4)}")
  }

  test("seasonalStrength: sawtooth scores seasonal, ramp scores trend, noise-free extremes") {
    val saw = (0 until 480).map(i => ("SAW", ts(i), 100.0 + (i % 24) * 2.0))
    val ramp = (0 until 480).map(i => ("RAMP", ts(i), i * 0.5))
    val out = SeasonalOps.seasonalStrength(
        (saw ++ ramp).toDF("event_type", "ts", "value"),
        "event_type", "ts", "value", halfWin = 12, dec6)
      .collect().map(r => r.getString(0) -> r).toMap
    val s = out("SAW"); val t = out("RAMP")
    assert(s.getLong(1) == 480 && t.getLong(1) == 480)
    // pure daily sawtooth: seasonal strength near 1, far above the ramp's
    assert(s.getDouble(2) > 0.95, s"sawtooth seasonal ${s.getDouble(2)}")
    assert(t.getDouble(2) < s.getDouble(2) - 0.3,
      s"ramp seasonal ${t.getDouble(2)} vs sawtooth ${s.getDouble(2)}")
    // pure linear ramp: trend strength near 1
    assert(t.getDouble(3) > 0.95, s"ramp trend ${t.getDouble(3)}")
    // strengths are clamped to [0, 1]
    out.values.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("theil-sen: exact slope on a line; robust to one wild outlier") {
    val clean = (0 until 100).map(i => ("L", ts(i), 5.0 + 0.25 * i))
    val r1 = SeasonalOps.theilSenTrend(clean.toDF("event_type", "ts", "value"),
      "event_type", "ts", "value", dec6).head()
    assert(math.abs(r1.getDouble(3) - 0.25) < 1e-6, s"slope ${r1.getDouble(3)}")
    assert(r1.getLong(1) == 100 && r1.getLong(2) == 100L * 99 / 2)
    // poison one point by 10000x: median-of-slopes must not move (OLS would)
    val dirty = clean.updated(50, ("L", ts(50), 175000.0))
    val r2 = SeasonalOps.theilSenTrend(dirty.toDF("event_type", "ts", "value"),
      "event_type", "ts", "value", dec6).head()
    assert(math.abs(r2.getDouble(3) - 0.25) < 0.01,
      s"outlier dragged slope to ${r2.getDouble(3)}")
  }

  test("theil-sen pair subsampling: 1/7 hash sample keeps the slope, cuts the pairs") {
    // noisy-ish line: value quantized so pairwise slopes vary but center on 0.25
    val rows = (0 until 200).map(i =>
      ("L", ts(i), 5.0 + 0.25 * i + (i % 5) * 0.3))
    val df = rows.toDF("event_type", "ts", "value")
    val exact = SeasonalOps.theilSenTrend(df, "event_type", "ts", "value", dec6)
      .head()
    val sampled = SeasonalOps.theilSenTrend(df, "event_type", "ts", "value",
      dec6, pairSampleMod = 7L).head()
    val full = 200L * 199 / 2
    assert(exact.getLong(2) == full)
    // ~1/7 of the pairs survive the deterministic hash filter
    assert(sampled.getLong(2) > full / 12 && sampled.getLong(2) < full / 4,
      s"sampled pairs ${sampled.getLong(2)} of $full")
    // the median slope barely moves — Sen's estimator tolerates hash thinning
    assert(math.abs(sampled.getDouble(3) - exact.getDouble(3)) < 0.02,
      s"sampled slope ${sampled.getDouble(3)} vs exact ${exact.getDouble(3)}")
  }

  test("rollingPairCorr: linear twins pin r at +/-1; constant frames drop") {
    val rows = (0 until 10).flatMap { i =>
      Seq(("A", ts(i), i.toDouble), ("B", ts(i), 2.0 * i + 3),
        ("C", ts(i), -i.toDouble), ("K", ts(i), 7.0))
    }
    val out = SeasonalOps.rollingPairCorr(
        rows.toDF("event_type", "ts", "value"), "event_type", "ts", "value",
        windowHours = 4, scoreOut = dec6)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    // 10 hours, full 4-frames start at hour 3 -> 7 windows per pair
    assert(out(("A", "B")) == ((7L, 1.0, 1.0, 1.0)), s"${out(("A", "B"))}")
    assert(out(("A", "C")) == ((7L, -1.0, -1.0, -1.0)))
    assert(out(("B", "C")) == ((7L, -1.0, -1.0, -1.0)))
    // constant series K: zero variance in every frame -> no windows at all
    assert(!out.keySet.exists(p => p._1 == "K" || p._2 == "K"),
      s"constant series must not emit windows: ${out.keySet}")
  }

  test("conformal: hand-computed q_hat and coverage on planted residuals") {
    // period=1 residuals by construction: calibration |res| = 2,4,..,12,
    // test |res| = 1,3,..,11 (values are the running sum). n=12 residuals,
    // n_cal = 6.
    val res = Seq(2, 4, 6, 8, 10, 12, 1, 3, 5, 7, 9, 11)
    val vals = res.scanLeft(0.0)(_ + _)
    val df = vals.zipWithIndex.map { case (v, i) => ("s", ts(i), v) }
      .toDF("event_type", "ts", "value")
    // alpha=0.9: k = min(ceil(0.9*7), 6) = 6 -> q_hat = 12; all test <= 12
    val r9 = SeasonalOps.conformalNaive(df, "event_type", "ts", "value",
      period = 1, alpha = 0.9, scoreOut = dec6).head()
    assert(r9.getLong(1) == 6 && r9.getLong(2) == 6,
      s"split: ${r9.getLong(1)}/${r9.getLong(2)}")
    assert(r9.getDouble(3) == 12.0, s"q_hat ${r9.getDouble(3)}")
    assert(r9.getDouble(4) == 1.0, s"coverage ${r9.getDouble(4)}")
    // alpha=0.5: k = ceil(0.5*7) = 4 -> q_hat = 8; test 1,3,5,7 covered -> 4/6
    val r5 = SeasonalOps.conformalNaive(df, "event_type", "ts", "value",
      period = 1, alpha = 0.5, scoreOut = dec6).head()
    assert(r5.getDouble(3) == 8.0, s"q_hat ${r5.getDouble(3)}")
    assert(math.abs(r5.getDouble(4) - 0.666667) < 1e-9,
      s"coverage ${r5.getDouble(4)}")
  }

  test("harmonicPower: pure 24h cosine is fully explained at period 24, " +
    "absent at 12") {
    // y = 10 + 3*cos(2*pi*h/24) over exactly 2 whole cycles
    val rows = (0 until 48).map { h =>
      ("s", ts(h), 10.0 + 3.0 * math.cos(2.0 * math.Pi * h / 24.0))
    }
    val df = rows.toDF("event_type", "ts", "value")
    val out = SeasonalOps.harmonicPower(df, "event_type", "ts", "value",
        Seq(12, 24), dec6)
      .collect().map(r => r.getInt(1) -> r).toMap
    val p24 = out(24)
    assert(p24.getLong(2) == 48L)
    assert(math.abs(p24.getDouble(3) - 3.0) < 1e-5, s"amp ${p24.getDouble(3)}")
    assert(math.abs(p24.getDouble(4) - 1.0) < 1e-5, s"frac ${p24.getDouble(4)}")
    // the 12h harmonic of a pure 24h cosine is orthogonal: ~zero power
    val p12 = out(12)
    assert(p12.getDouble(3) < 1e-5 && p12.getDouble(4) < 1e-5,
      s"12h leak ${p12.getDouble(3)} / ${p12.getDouble(4)}")
  }
}
