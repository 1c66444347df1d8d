package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
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
    * the full window is unavailable; [[savgol11o3Interp]] supplies
    * scipy's `mode='interp'` edge handling when edge values are needed.
    * Pure expression — codegen-friendly. */
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

  /** Edge-fit rows of scipy's `mode='interp'` for window 11 / order 3:
    * row i (i = 0..4) is the least-squares cubic fitted to a full
    * 11-point window, evaluated at position i — edge value =
    * P[i]·y[0..10]. Computed from first principles (vandermonde
    * projection P = X(XᵀX)⁻¹Xᵀ, 4×4 Gauss–Jordan inverse); the same
    * projection's central row reproduces the classic (-36,9,44,…)/429
    * interior kernel, and SavgolInterpSpec pins the construction with the
    * cubic fixed-point invariance (a degree-≤3 series passes through
    * unchanged, edges included). By the reversal symmetry of the polynomial space,
    * P[10−i][10−k] = P[i][k], so the SAME rows apply to the REVERSED
    * last-11 values for the tail edges. These doubles are the single
    * source for the Spark plan AND the generated oracle SQL. */
  lazy val savgolEdgeRows: Seq[Array[Double]] = {
    val n = 11; val p = 4
    val x = Array.tabulate(n, p)((i, j) => math.pow(i.toDouble, j.toDouble))
    val xtx = Array.tabulate(p, p)((a, b) =>
      (0 until n).map(i => x(i)(a) * x(i)(b)).sum)
    // Gauss–Jordan inverse of the 4×4 normal matrix
    val aug = Array.tabulate(p, 2 * p)((r, cc) =>
      if (cc < p) xtx(r)(cc) else if (cc - p == r) 1.0 else 0.0)
    for (colI <- 0 until p) {
      val piv = (colI until p).maxBy(r => math.abs(aug(r)(colI)))
      val tmp = aug(colI); aug(colI) = aug(piv); aug(piv) = tmp
      val d = aug(colI)(colI)
      for (cc <- 0 until 2 * p) aug(colI)(cc) /= d
      for (r <- 0 until p if r != colI) {
        val f = aug(r)(colI)
        for (cc <- 0 until 2 * p) aug(r)(cc) -= f * aug(colI)(cc)
      }
    }
    val inv = Array.tabulate(p, p)((r, cc) => aug(r)(cc + p))
    (0 until 5).map { i =>
      Array.tabulate(n) { j =>
        (0 until p).map(a => (0 until p).map(b =>
          x(i)(a) * inv(a)(b) * x(j)(b)).sum).sum
      }
    }
  }

  /** Savitzky–Golay 11/3 with scipy's `mode='interp'` edge handling —
    * closes the documented deviation of [[savgol11o3]] (nulls at edges):
    * the first/last 5 values of each series come from the cubic fitted to
    * that end's full 11-point window ([[savgolEdgeRows]]), the interior
    * stays the FIR kernel. Each series' head/tail windows collapse to ONE
    * 11-element array per series (agg-sized), joined back; series shorter
    * than 11 points emit null everywhere (scipy raises there — we stay
    * total). Frame-level operator because edges need per-series arrays,
    * not just lag/lead.
    *
    * Returns (seriesCol, orderCol, valueCol, `outCol`). */
  def savgol11o3Interp(df: DataFrame, seriesCol: String, orderCol: String,
                       valueCol: String, outCol: String,
                       scoreOut: Column => Column): DataFrame = {
    val w = Window.partitionBy(seriesCol).orderBy(orderCol)
    val wAll = Window.partitionBy(seriesCol)
    val base = df
      .select(col(seriesCol), col(orderCol), col(valueCol).cast("double").as("__v"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
    def endArray(rank: Column, name: String) =
      base.filter(rank <= 11)
        .groupBy(seriesCol)
        .agg(transform(array_sort(collect_list(struct(rank.as("r"),
          col("__v").as("v")))), e => e("v")).as(name))
    val head = endArray(col("__rn"), "__h11")
    val tail = endArray(col("__n") - col("__rn") + 1, "__t11")
    def edgeDot(pos: Column, arr: Column): Column = {
      def dot(i: Int) = savgolEdgeRows(i).zipWithIndex.map { case (cf, j) =>
        lit(cf) * element_at(arr, j + 1)
      }.reduce(_ + _)
      (1 until 5).foldLeft(when(pos === 1, dot(0))) { (acc, i) =>
        acc.when(pos === i + 1, dot(i))
      }
    }
    val interior = savgol11o3(col("__v"), w)
    base
      .join(head, Seq(seriesCol))
      .join(tail, Seq(seriesCol))
      .withColumn(outCol, scoreOut(
        when(col("__n") < 11, lit(null).cast("double"))
          .when(col("__rn") <= 5, edgeDot(col("__rn"), col("__h11")))
          .when(col("__n") - col("__rn") < 5,
            edgeDot(col("__n") - col("__rn") + 1, col("__t11")))
          .otherwise(interior)))
      .select(col(seriesCol), col(orderCol), col("__v").as(valueCol), col(outCol))
  }

  /** Hampel despiking filter (Pearson's rule): over a CENTERED window of
    * `2*half+1` rows per series, flag points whose deviation from the
    * window median exceeds `nSigmas * 1.4826 * MAD` and repair them to the
    * median — the robust outlier-removal pass a sensor pipeline runs
    * before any mean/σ feature (the reference's z-score despike,
    * `pre_processing.py:1137-1170`, is the non-robust form this upgrades).
    *
    * Median and MAD are exact element picks from the sorted frame
    * (`sort_array` + `element_at` on the odd-length window), not
    * interpolated, so both engines read the identical IEEE double and the
    * flag comparison is bit-deterministic. Interior-only: rows whose frame
    * is short (series edges) pass through unflagged.
    *
    * Scale: window is series-partitioned and frame-bounded (2*half+1
    * rows), so state per row is O(window) regardless of series length —
    * and the frame pass runs CHUNKED: a per-series window's parallelism
    * is otherwise bounded by the series-key domain (the 5-series event
    * panel ran the whole sort/MAD pipeline on 5 tasks, profiled as 3
    * near-serial ~1.2-1.6 s stages of q244 with 27 cores idle; at 100 TB
    * a billion-row series is a single straggler task and an OOM). Rows
    * are split into `chunkRows`-sized chunks by per-series row number,
    * each row is duplicated into the neighbor chunk when it sits within
    * `half` rows of the boundary (the halo — ≤ 2*half extra rows per
    * chunk, 0.3% at the default sizing), frames are computed inside
    * (series, chunk) partitions, and only each row's OWN chunk keeps its
    * result. Frames at chunk boundaries see exactly the rows the
    * unchunked window saw, so the output is row-identical; series edges
    * still yield short frames and pass through unflagged. The row-number
    * pass is the one remaining series-keyed window — a plain counter,
    * O(1) state, no arrays. */
  def hampel(df: DataFrame, seriesCol: String, tsCol: String, idCol: String,
             valueCol: String, half: Int = 12, nSigmas: Double = 3.0,
             chunkRows: Int = 4096): DataFrame = {
    require(chunkRows >= 2 * half + 1,
      s"chunkRows must cover one frame (${2 * half + 1}), got $chunkRows")
    val width = 2 * half + 1
    val mid = half + 1 // 1-indexed middle of the sorted odd-length frame
    val wSeq = Window.partitionBy(seriesCol).orderBy(col(tsCol), col(idCol))
    val base = df
      .select(col(seriesCol), col(tsCol), col(idCol),
        col(valueCol).cast("double").as("__v"))
      .withColumn("__rn", row_number().over(wSeq))
    val pos = pmod(col("__rn") - 1, lit(chunkRows))
    val own = floor((col("__rn") - 1) / lit(chunkRows)).cast("long")
    // own chunk always; halo copy to the previous/next chunk when within
    // `half` rows of the boundary (nulls drop in the filter)
    val copies = array(
      own,
      when(pos < half && own > 0, own - 1),
      when(pos >= chunkRows - half, own + 1))
    val spreadRows = base
      .select(col(seriesCol), col(idCol), col("__v"), col("__rn"), own.as("__own"),
        explode(copies).as("__ck"))
      .filter(col("__ck").isNotNull)
      // EXPLICIT repartition: the row-number exchange hashes on series
      // alone, which already SATISFIES ClusteredDistribution(series, __ck)
      // — without this the planner reuses it and the frame window runs at
      // series-key parallelism again (measured: identical stage shape).
      // One narrow extra shuffle buys chunk-level parallelism.
      .repartition(col(seriesCol), col("__ck"))
    val w = Window.partitionBy(col(seriesCol), col("__ck")).orderBy(col("__rn"))
      .rowsBetween(-half, half)
    val withFrame = spreadRows
      .withColumn("__frame", collect_list(col("__v")).over(w))
      .filter(col("__own") === col("__ck") && size(col("__frame")) === width)
      .withColumn("__med", element_at(sort_array(col("__frame")), mid))
      .withColumn("__mad", element_at(
        sort_array(transform(col("__frame"), x => abs(x - col("__med")))), mid))
    withFrame
      .filter(abs(col("__v") - col("__med")) > lit(nSigmas * 1.4826) * col("__mad"))
      .select(col(seriesCol), col(idCol), col("__v").as(valueCol),
        col("__med").as("window_median"), col("__mad").as("window_mad"))
  }
}
