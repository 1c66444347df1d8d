package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Window-feature combinators — the heart of the reference workload
  * (SURVEY §2.7). Every reference Numba kernel (`pre_processing.py:333-637,
  * 996-1037`) reduces to compositions of built-in, codegen'd window
  * aggregates; no UDFs anywhere, so the whole feature stage stays inside
  * WholeStageCodegen and one sort per window ordering.
  *
  * Scale note: all entry points take a caller-supplied [[WindowSpec]]; at
  * 100 TB the series MUST be partitioned (`Window.partitionBy(seriesKey)
  * .orderBy(ts)`) so the sort distributes. A global `orderBy` without
  * partitioning funnels into a single task — only acceptable for the small
  * post-aggregation hourly grids (≤ 10^5 rows/year/series).
  */
object WindowOps {

  /** Trailing row frame of the last `n` rows including the current one. */
  def trailing(w: WindowSpec, n: Int): WindowSpec = w.rowsBetween(-(n - 1L), 0L)

  /** Lag feature `x[t-k]` (reference `create_lag`, `pre_processing.py:333-347`).
    * Exact match to the pandas shift because the aligned grid is regular. */
  def lagF(c: Column, k: Int, w: WindowSpec): Column = lag(c, k).over(w)

  /** `min_periods` guard (reference `pre_processing.py:1173,1190,1240`):
    * emit the aggregate only when at least `minPeriods` non-null rows are in
    * the frame, else null — pandas `rolling(..., min_periods=p)` semantics. */
  private def withMinPeriods(agg: Column, c: Column, f: WindowSpec, minPeriods: Int): Column =
    when(count(c).over(f) >= minPeriods, agg).otherwise(lit(null))

  /** Rolling mean over last `n` rows (`rolling_mean_jit`, `pre_processing.py:520-550`). */
  def rollAvg(c: Column, n: Int, minPeriods: Int, w: WindowSpec): Column = {
    val f = trailing(w, n); withMinPeriods(avg(c).over(f), c, f, minPeriods)
  }

  /** Rolling *population* std — the reference divides by `count`
    * (`pre_processing.py:583`), so `stddev_pop`, not Spark's default sample
    * stddev (SURVEY §2.7 W3 footnote). */
  def rollStdPop(c: Column, n: Int, minPeriods: Int, w: WindowSpec): Column = {
    val f = trailing(w, n); withMinPeriods(stddev_pop(c).over(f), c, f, minPeriods)
  }

  /** Rolling sample std (pandas `rolling().std()` default ddof=1,
    * `simple_pre_processing.py:890`). */
  def rollStdSamp(c: Column, n: Int, minPeriods: Int, w: WindowSpec): Column = {
    val f = trailing(w, n); withMinPeriods(stddev_samp(c).over(f), c, f, minPeriods)
  }

  /** Rolling median — the robust-statistics window the mean/std family
    * lacks (pandas `rolling().median()`): an exact interpolated percentile
    * over the trailing frame. O(n log n) per frame via the aggregate's
    * internal sort; at 100 TB widths stay small (24-168 rows) and the
    * window is series-partitioned, so the cost is per-row-bounded. */
  def rollMedian(c: Column, n: Int, minPeriods: Int, w: WindowSpec): Column = {
    val f = trailing(w, n)
    // percentile, not median(): median is frame-restricted in Spark 4
    withMinPeriods(percentile(c, lit(0.5)).over(f), c, f, minPeriods)
  }

  /** Rolling min/max (`rolling_min_jit`/`rolling_max_jit`, `pre_processing.py:587-637`). */
  def rollMin(c: Column, n: Int, minPeriods: Int, w: WindowSpec): Column = {
    val f = trailing(w, n); withMinPeriods(min(c).over(f), c, f, minPeriods)
  }
  def rollMax(c: Column, n: Int, minPeriods: Int, w: WindowSpec): Column = {
    val f = trailing(w, n); withMinPeriods(max(c).over(f), c, f, minPeriods)
  }

  /** Rolling sum with min_periods. */
  def rollSum(c: Column, n: Int, minPeriods: Int, w: WindowSpec): Column = {
    val f = trailing(w, n); withMinPeriods(sum(c).over(f), c, f, minPeriods)
  }

  /** First difference `x - x[t-1]` (`pre_processing.py:862-864`). */
  def diff(c: Column, w: WindowSpec, k: Int = 1): Column = c - lag(c, k).over(w)

  /** Gradient per second: `diff / Δt_seconds` (`pre_processing.py:878`). */
  def gradientPerSecond(c: Column, ts: Column, w: WindowSpec): Column = {
    val dt = unix_timestamp(ts) - unix_timestamp(lag(ts, 1).over(w))
    when(dt > 0, (c - lag(c, 1).over(w)) / dt.cast("double"))
  }

  /** Percent change over `p` periods (`pct_change(periods=p)*100`,
    * `pre_processing.py:870-871,1172`). Null (not ±inf) when the base is
    * 0/null — declarative rewrite of pandas' inf quirk (SURVEY §7.4-6). */
  def pctChange(c: Column, p: Int, w: WindowSpec): Column = {
    val base = lag(c, p).over(w)
    when(base.isNotNull && base =!= 0, (c / base - 1) * 100)
  }

  /** Forward fill = most recent non-null at or before the current row
    * (pandas `ffill`, `pre_processing.py:279`). */
  def ffill(c: Column, w: WindowSpec): Column =
    last(c, ignoreNulls = true).over(w.rowsBetween(Long.MinValue, 0))

  /** Backward fill (pandas `bfill`, `pre_processing.py:284`). */
  def bfill(c: Column, w: WindowSpec): Column =
    first(c, ignoreNulls = true).over(w.rowsBetween(0, Long.MaxValue))

  /** Cooling-trend flag: 1 when the last 3 consecutive deltas are all
    * negative (`calculate_cooling_trend`, `pre_processing.py:874-881`).
    * Returns the *decrease indicator*; the caller sums it over a 3-row frame
    * in a second select (window-over-window needs two projections). */
  def decreaseFlag(c: Column, w: WindowSpec): Column =
    when(lag(c, 1).over(w).isNotNull && c < lag(c, 1).over(w), 1).otherwise(0)

  /** Trailing z-score anomaly detection (`detect_anomalies_jit`,
    * `pre_processing.py:996-1037`): stats over the previous `n` rows
    * *excluding* the current one, std floored at `stdFloor`, flag -1/+1
    * outside ±`nSigma`σ, require > `minCount` prior rows.
    * Returns (mean, std, flag, dropPct) columns. */
  def anomalyZ(c: Column, w: WindowSpec, n: Int = 24, nSigma: Double = 2.0,
               stdFloor: Double = 0.001, minCount: Int = 12): (Column, Column, Column, Column) = {
    val prev = w.rowsBetween(-n.toLong, -1L)
    val cnt  = count(c).over(prev)
    val m    = avg(c).over(prev)
    val s    = greatest(stddev_pop(c).over(prev), lit(stdFloor))
    val flag = when(cnt <= minCount || c.isNull, 0)
      .when(c < m - lit(nSigma) * s, -1)
      .when(c > m + lit(nSigma) * s, 1)
      .otherwise(0)
    val dropPct = when(flag === -1 && m > 0, (m - c) / m * 100).otherwise(lit(0.0))
    (when(cnt > minCount, m), when(cnt > minCount, s), flag, dropPct)
  }

  /** Baseline-ratio drift `(maShort/maLong - 1)*100` (`pre_processing.py:1185-1199`). */
  def drift(c: Column, shortN: Int, longN: Int, minPeriodsLong: Int, w: WindowSpec): Column = {
    val maS = rollAvg(c, shortN, 1, w)
    val maL = rollAvg(c, longN, minPeriodsLong, w)
    when(maL.isNotNull && maL =!= 0, (maS / maL - 1) * 100)
  }

  /** Savitzky–Golay smoothing as a fixed-weight FIR over a centered window
    * (`savgol_filter(temps, 11, 3)`, `data_generator.py:963`). For symmetric
    * windows the order-2/3 smoothing weights coincide; width-11 weights are
    * (-36,9,44,69,84,89,84,69,44,9,-36)/429. Emits null at the edges where
    * the full window is unavailable (documented deviation from scipy's
    * `mode='interp'` edge handling). Pure expression — codegen-friendly. */
  def savgol11o3(c: Column, w: WindowSpec): Column = {
    val weights = Seq(-36, 9, 44, 69, 84, 89, 84, 69, 44, 9, -36).map(_ / 429.0)
    val terms = weights.zipWithIndex.map { case (wt, i) =>
      val off = i - 5
      val v = if (off < 0) lag(c, -off).over(w) else if (off > 0) lead(c, off).over(w) else c
      lit(wt) * v
    }
    val full = count(c).over(w.rowsBetween(-5, 5)) === 11
    when(full, terms.reduce(_ + _))
  }
}
