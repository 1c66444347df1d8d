package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seasonal / trend decomposition and robust-trend operators over regular
  * (hourly) series — the classical-decomposition layer of the reference's
  * time-series story (its pipeline detrends zone temperatures before
  * anomaly scoring; cf. `pre_processing.py` rolling statistics and
  * `data_generator.py` daily cycles).
  *
  * Scale shape shared by all three: the raw event stream collapses to the
  * per-(series, hour) grid in ONE map-side-combinable aggregate, and every
  * window afterwards is PARTITIONED BY SERIES over that grid — grid-sized
  * state (#hours per series), never event-sized, never partition-less. */
object SeasonalOps {

  /** Hourly collapse shared by the operators: (series, h, y). */
  private def hourly(events: DataFrame, seriesCol: String, tsCol: String,
                     valueCol: String): DataFrame =
    events
      .select(col(seriesCol), date_trunc("hour", col(tsCol)).as("h"),
        col(valueCol).cast("double").as("v"))
      .groupBy(seriesCol, "h").agg(avg("v").as("y"))

  /** STL-lite classical decomposition y = trend + seasonal + residual per
    * series: trend is the centered ±`halfWin`-hour rolling mean (edges get
    * the partial frame — deterministic, identical frame semantics in any
    * SQL engine); the seasonal component is the hour-of-day mean of the
    * detrended series, re-centered to sum to zero so trend keeps the
    * level; residual is what remains — the anomaly-scoring input that no
    * longer confuses "3 am" with "broken".
    *
    * All three passes are windows/aggregates partitioned by (series) or
    * (series, hour-of-day) over the hourly grid.
    *
    * Returns per (series, hour): (seriesCol, h, y, trend, seasonal,
    * residual), `scoreOut` applied to the float outputs. */
  def stlDecompose(events: DataFrame, seriesCol: String, tsCol: String,
                   valueCol: String, halfWin: Int,
                   scoreOut: Column => Column): DataFrame = {
    require(halfWin >= 1 && halfWin <= 168, s"window must be bounded, got $halfWin")
    val base = hourly(events, seriesCol, tsCol, valueCol)
    val wT = Window.partitionBy(seriesCol).orderBy("h")
      .rowsBetween(-halfWin, halfWin)
    val wHod = Window.partitionBy(col(seriesCol), hour(col("h")))
    val wS = Window.partitionBy(seriesCol)
    base
      .withColumn("trend", avg("y").over(wT))
      .withColumn("det", col("y") - col("trend"))
      .withColumn("s_raw", avg("det").over(wHod))
      .withColumn("seasonal", col("s_raw") - avg("s_raw").over(wS))
      .select(col(seriesCol), col("h"),
        scoreOut(col("y")).as("y"),
        scoreOut(col("trend")).as("trend"),
        scoreOut(col("seasonal")).as("seasonal"),
        scoreOut(col("y") - col("trend") - col("seasonal")).as("residual"))
  }

  /** Single most-likely mean-shift changepoint per series (binary-
    * segmentation step 1): for every split point k of the n-hour series,
    * the scaled mean shift |μ_left − μ_right|·√(k·(n−k)/n) — the
    * two-sample statistic that, maximized over k, is the standard offline
    * changepoint locator (the z-denominator is constant in k up to the
    * pooled σ, so the argmax is σ-free). Split stats come from one
    * per-series cumulative sum over the grid; the per-series argmax is a
    * partitioned rank.
    *
    * Returns one row per series: (seriesCol, split_h, n_left, n_right,
    * mean_left, mean_right, shift_stat). */
  def meanShiftChangepoint(events: DataFrame, seriesCol: String, tsCol: String,
                           valueCol: String,
                           scoreOut: Column => Column): DataFrame = {
    val base = hourly(events, seriesCol, tsCol, valueCol)
    val wCum = Window.partitionBy(seriesCol).orderBy("h")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wTot = Window.partitionBy(seriesCol)
    val scored = base
      .withColumn("k", count(lit(1)).over(wCum))
      .withColumn("cum", sum("y").over(wCum))
      .withColumn("n", count(lit(1)).over(wTot))
      .withColumn("tot", sum("y").over(wTot))
      .filter(col("k") < col("n")) // a split needs both sides non-empty
      .withColumn("mean_l", col("cum") / col("k"))
      .withColumn("mean_r", (col("tot") - col("cum")) / (col("n") - col("k")))
      .withColumn("stat",
        abs(col("mean_l") - col("mean_r")) *
          sqrt(col("k") * (col("n") - col("k")) / col("n")))
    val wBest = Window.partitionBy(seriesCol)
      .orderBy(scoreOut(col("stat")).desc, col("h"))
    scored
      .withColumn("rk", row_number().over(wBest))
      .filter(col("rk") === 1)
      .select(col(seriesCol), col("h").as("split_h"),
        col("k").as("n_left"), (col("n") - col("k")).as("n_right"),
        scoreOut(col("mean_l")).as("mean_left"),
        scoreOut(col("mean_r")).as("mean_right"),
        scoreOut(col("stat")).as("shift_stat"))
  }

  /** Theil–Sen robust trend per series: the median of all pairwise slopes
    * (y_j − y_i)/(t_j − t_i), i < j, over the hourly grid, with the
    * median-residual intercept — the slope estimator with a 29% breakdown
    * point (one broken sensor week cannot drag it, unlike OLS). The pair
    * table is an equi-join on the series key over the GRID, so its size is
    * #hours²/2 per series — grid metadata, not events; for multi-year
    * grids pass `pairSampleMod > 1` to keep a deterministic 1/mod hash
    * sample of the pairs (the estimator is a median — Sen's proof only
    * needs the sample to be outlier-agnostic, which a hash of the pair
    * key is; TheilSenSampleSpec pins the tolerance).
    *
    * Returns one row per series: (seriesCol, n_points, n_pairs,
    * slope_per_hour, intercept). */
  def theilSenTrend(events: DataFrame, seriesCol: String, tsCol: String,
                    valueCol: String,
                    scoreOut: Column => Column,
                    pairSampleMod: Long = 1L): DataFrame = {
    require(pairSampleMod >= 1, s"pairSampleMod must be >= 1, got $pairSampleMod")
    val base = hourly(events, seriesCol, tsCol, valueCol)
      .withColumn("t", (unix_micros(col("h")) / lit(3600000000L)).cast("double"))
    val a = base.select(col(seriesCol), col("t").as("t1"), col("y").as("y1"))
    val b = base.select(col(seriesCol), col("t").as("t2"), col("y").as("y2"))
    val slopes = a.join(b, Seq(seriesCol))
      .filter(col("t2") > col("t1"))
      .filter(pmod(xxhash64(col(seriesCol), col("t1"), col("t2")),
        lit(pairSampleMod)) === 0)
      .select(col(seriesCol),
        ((col("y2") - col("y1")) / (col("t2") - col("t1"))).as("slope"))
    val slope = slopes.groupBy(seriesCol)
      .agg(count(lit(1)).as("n_pairs"),
        expr("percentile(slope, 0.5)").as("m_slope"))
    base.join(slope, Seq(seriesCol))
      .groupBy(col(seriesCol), col("n_pairs"), col("m_slope"))
      .agg(count(lit(1)).as("n_points"),
        expr("percentile(y - m_slope * t, 0.5)").as("m_icept"))
      .select(col(seriesCol), col("n_points"), col("n_pairs"),
        scoreOut(col("m_slope")).as("slope_per_hour"),
        scoreOut(col("m_icept")).as("intercept"))
  }

  /** OLS trend per series with fit quality: slope/intercept from the
    * explicit moment formulas (E[ty] − E[t]E[y])/(E[t²] − E[t]²) and
    * R² = corr² — [[theilSenTrend]]'s least-squares twin, one map-side-
    * combinable aggregate per series instead of a pair table (use OLS when
    * the series is clean and you want the fit diagnostic; Theil–Sen when
    * sensors lie). The explicit moment algebra (not a regr_* builtin)
    * keeps both engines bit-aligned, the [[EventOps.xcorrLagScan]]
    * discipline. Time is hours since the SERIES' FIRST grid hour — not
    * epoch — because E[t²]−E[t]² over epoch-scale hours cancels ~6
    * leading digits and the last-ulp noise crosses rounding boundaries
    * cross-engine; centering removes the cancellation (and makes the
    * intercept the fitted value at series start, the number a reader
    * actually wants).
    *
    * Returns one row per series: (seriesCol, n_points, slope_per_hour,
    * intercept, r2), intercept = fit at the series' first hour. */
  def olsTrend(events: DataFrame, seriesCol: String, tsCol: String,
               valueCol: String, scoreOut: Column => Column): DataFrame = {
    val wS = Window.partitionBy(seriesCol)
    val base = hourly(events, seriesCol, tsCol, valueCol)
      .withColumn("t",
        ((unix_micros(col("h")) - min(unix_micros(col("h"))).over(wS))
          / lit(3600000000L)).cast("double"))
    val m = base.groupBy(seriesCol).agg(
      count(lit(1)).as("n"),
      avg("t").as("mt"), avg("y").as("my"),
      avg(col("t") * col("t")).as("mtt"),
      avg(col("t") * col("y")).as("mty"),
      avg(col("y") * col("y")).as("myy"))
    val varT = col("mtt") - col("mt") * col("mt")
    val varY = col("myy") - col("my") * col("my")
    val cov = col("mty") - col("mt") * col("my")
    m.select(col(seriesCol), col("n").as("n_points"),
      scoreOut(cov / varT).as("slope_per_hour"),
      scoreOut(col("my") - (cov / varT) * col("mt")).as("intercept"),
      scoreOut(when(varY > 0, cov * cov / (varT * varY)).otherwise(lit(0.0)))
        .as("r2"))
  }

  /** Seasonal / trend strength diagnostics (Hyndman & Athanasopoulos,
    * FPP3 §4.3) from the [[stlDecompose]] components:
    * F_seasonal = max(0, 1 − var(R)/var(S+R)) and
    * F_trend = max(0, 1 − var(R)/var(T+R)) — the "is this series seasonal
    * at all / trending at all" triage that decides which decomposition a
    * forecast or anomaly pass should bother with. One aggregate per
    * series over the decomposition's grid-sized output; population
    * variance by the explicit moment formula.
    *
    * Returns one row per series: (seriesCol, n_hours, seasonal_strength,
    * trend_strength). */
  def seasonalStrength(events: DataFrame, seriesCol: String, tsCol: String,
                       valueCol: String, halfWin: Int,
                       scoreOut: Column => Column): DataFrame = {
    val dec = stlDecompose(events, seriesCol, tsCol, valueCol, halfWin, scoreOut)
    def popVar(c: Column): Column = avg(c * c) - avg(c) * avg(c)
    val agg = dec.groupBy(seriesCol).agg(
      count(lit(1)).as("n_hours"),
      popVar(col("residual")).as("vr"),
      popVar(col("seasonal") + col("residual")).as("vsr"),
      popVar(col("trend") + col("residual")).as("vtr"))
    agg.select(col(seriesCol), col("n_hours"),
      scoreOut(greatest(lit(0.0),
        lit(1.0) - when(col("vsr") > 0, col("vr") / col("vsr")).otherwise(lit(1.0))))
        .as("seasonal_strength"),
      scoreOut(greatest(lit(0.0),
        lit(1.0) - when(col("vtr") > 0, col("vr") / col("vtr")).otherwise(lit(1.0))))
        .as("trend_strength"))
  }

  /** Pairwise Pearson correlation matrix across series (upper triangle):
    * which metrics move together, hour by hour — the cross-sectional
    * complement of [[EventOps.xcorrLagScan]]'s lag-0 (and the screen that
    * decides which pairs deserve a lag scan at all). The hourly tables
    * self-join on the grid hour with a series-order predicate; per-pair
    * correlations fold with the explicit moment formula (cross-engine
    * exact, no corr() builtin). Pair count is #series²/2 — the series
    * PANEL is the bound (named metrics, not events); the join itself keys
    * on the hour, so work is grid × panel², never event-scaled.
    *
    * Returns per pair: (series_a, series_b, n_hours, corr), series_a <
    * series_b. */
  def seriesCorrMatrix(events: DataFrame, seriesCol: String, tsCol: String,
                       valueCol: String,
                       scoreOut: Column => Column): DataFrame = {
    val base = hourly(events, seriesCol, tsCol, valueCol)
    val a = base.select(col(seriesCol).as("series_a"), col("h"), col("y").as("ya"))
    val b = base.select(col(seriesCol).as("series_b"), col("h"), col("y").as("yb"))
    a.join(b, Seq("h"))
      .filter(col("series_a") < col("series_b"))
      .groupBy("series_a", "series_b")
      .agg(count(lit(1)).as("n_hours"),
        avg("ya").as("ma"), avg("yb").as("mb"),
        avg(col("ya") * col("yb")).as("mab"),
        avg(col("ya") * col("ya")).as("maa"),
        avg(col("yb") * col("yb")).as("mbb"))
      .select(col("series_a"), col("series_b"), col("n_hours"),
        scoreOut((col("mab") - col("ma") * col("mb")) /
          (sqrt(col("maa") - col("ma") * col("ma")) *
            sqrt(col("mbb") - col("mb") * col("mb")))).as("corr"))
  }

  /** Rolling pairwise Pearson correlation — [[seriesCorrMatrix]]'s static
    * number upgraded to a stability read: per pair, a trailing
    * `windowHours`-hour correlation at every shared grid hour, summarized
    * per pair (a pair whose rolling r swings from +0.9 to −0.9 is
    * regime-coupled, not structurally coupled — the static matrix hides
    * exactly that). The hour-keyed self-join is panel-bounded (pairs =
    * keys², rows = pairs × hours, never events) and every window
    * partitions by the PAIR. Frames are ROWS-based (trailing
    * `windowHours` GRID ROWS, not wall-clock hours): over a gappy grid —
    * hours with no events — a frame spans a longer wall-clock range; an
    * ffilled/aligned input makes rows ≡ time. Full frames only
    * (min_periods = window); zero-variance frames yield null and drop
    * from the summary.
    *
    * Returns (series_a, series_b, n_windows, mean_r, min_r, max_r). */
  def rollingPairCorr(events: DataFrame, seriesCol: String, tsCol: String,
                      valueCol: String, windowHours: Int,
                      scoreOut: Column => Column): DataFrame = {
    require(windowHours >= 2, s"windowHours >= 2, got $windowHours")
    val base = hourly(events, seriesCol, tsCol, valueCol)
    val a = base.select(col(seriesCol).as("series_a"), col("h"), col("y").as("ya"))
    val b = base.select(col(seriesCol).as("series_b"), col("h"), col("y").as("yb"))
    val w = Window.partitionBy("series_a", "series_b").orderBy("h")
      .rowsBetween(-(windowHours - 1), 0)
    val va = avg(col("ya") * col("ya")).over(w) - avg("ya").over(w) * avg("ya").over(w)
    val vb = avg(col("yb") * col("yb")).over(w) - avg("yb").over(w) * avg("yb").over(w)
    val cov = avg(col("ya") * col("yb")).over(w) - avg("ya").over(w) * avg("yb").over(w)
    a.join(b, Seq("h"))
      .filter(col("series_a") < col("series_b"))
      .withColumn("__r",
        when(count(lit(1)).over(w) === windowHours && va > 0 && vb > 0,
          cov / (sqrt(va) * sqrt(vb))))
      .filter(col("__r").isNotNull)
      .groupBy("series_a", "series_b")
      .agg(count(lit(1)).as("n_windows"),
        scoreOut(avg("__r")).as("mean_r"),
        scoreOut(min("__r")).as("min_r"),
        scoreOut(max("__r")).as("max_r"))
  }

  /** Run `rec` (series array of (__t, __x) → the per-row output array)
    * over each series' collected grid via a LINEAR `mapPartitions` scan —
    * the sanctioned per-series imperative fold (the `orderedPrefixSum`
    * precedent): a Catalyst `aggregate` that grows its output array with
    * `concat` copies the whole accumulator every step (O(grid²) element
    * copies — ~3.8e9 for one 10-year hourly series), where the recursion
    * itself is linear. State stays grid-bounded per series (≤ #hours
    * rows); the Scala loop runs the identical IEEE ops in the identical
    * order, so DuckDB recursive-CTE oracles still match bit-for-bit. */
  private def scanSeries(collected: DataFrame, seriesCol: String)
                        (rec: IndexedSeq[Double] => Array[Double]): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, DoubleType, StructField, StructType}
    val outSchema = StructType(collected.schema.fields :+
      StructField("__ys", ArrayType(DoubleType), nullable = true))
    collected.mapPartitions { it =>
      it.map { r =>
        val arr = r.getSeq[Row](1)
        val xs = arr.map(_.getDouble(1)).toIndexedSeq
        Row(r.get(0), arr, rec(xs))
      }
    }(Encoders.row(outSchema))
  }

  /** Exponentially-weighted moving average — pandas
    * `ewm(alpha, adjust=False).mean()` parity: y_0 = x_0,
    * y_t = (1−α)·y_{t−1} + α·x_t per series over an ALIGNED grid (callers
    * drop leading nulls; an ffilled series is non-null after its first
    * observation, so the recursion never sees a null). The recursion is a
    * LINEAR scan over the series' collected grid array ([[scanSeries]]) —
    * grid-bounded state per series (≤ #hours rows, the STL/Theil-Sen
    * contract here) — then zips back to rows: no partition-less window,
    * no driver collect. Each step is two IEEE double ops in fixed order,
    * so an engine replaying the recursion (the DuckDB oracle's recursive
    * CTE) matches bit-for-bit.
    *
    * Returns (seriesCol, tsCol, x, ewma). */
  def ewma(grid: DataFrame, seriesCol: String, tsCol: String,
           valueCol: String, alpha: Double,
           scoreOut: Column => Column): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    val collected = grid
      .select(col(seriesCol), col(tsCol).as("__t"),
        col(valueCol).cast("double").as("__x"))
      .groupBy(seriesCol)
      .agg(sort_array(collect_list(struct(col("__t"), col("__x")))).as("arr"))
    val withYs = scanSeries(collected, seriesCol) { xs =>
      val ys = new Array[Double](xs.length)
      var i = 0
      while (i < xs.length) {
        ys(i) = if (i == 0) xs(0)
                else (1.0 - alpha) * ys(i - 1) + alpha * xs(i)
        i += 1
      }
      ys
    }
    withYs
      .select(col(seriesCol), explode(arrays_zip(col("arr"), col("__ys"))).as("__z"))
      .select(col(seriesCol), col("__z.arr.__t").as(tsCol),
        col("__z.arr.__x").as("x"), scoreOut(col("__z.__ys")).as("ewma"))
  }

  /** Kalman filter for the LOCAL-LEVEL model (random-walk state + white
    * observation noise — Durbin & Koopman §2; the "structural" cousin of
    * [[ewma]] whose gain ADAPTS instead of staying a fixed α): per step
    * P⁺ = P + q;  K = P⁺/(P⁺+r);  l ← l + K(x−l);  P ← (1−K)P⁺, with
    * diffuse-ish init l₁ = x₁, P₁ = r. Early steps trust observations
    * more (K large), then K converges to the steady-state gain of the
    * q/r ratio — the principled answer to "what α should the EWMA use".
    *
    * Same scale contract as [[ewma]]: a LINEAR [[scanSeries]] fold over
    * the series' collected grid (grid-bounded state, no partition-less
    * window); each step is fixed-order IEEE arithmetic, so the DuckDB
    * recursive-CTE oracle carrying (l, P) matches bit-for-bit.
    *
    * Returns (seriesCol, tsCol, x, level). */
  def kalmanLocalLevel(grid: DataFrame, seriesCol: String, tsCol: String,
                       valueCol: String, q: Double, r: Double,
                       scoreOut: Column => Column): DataFrame = {
    require(q > 0 && r > 0, s"need positive variances, got q=$q r=$r")
    val collected = grid
      .select(col(seriesCol), col(tsCol).as("__t"),
        col(valueCol).cast("double").as("__x"))
      .groupBy(seriesCol)
      .agg(sort_array(collect_list(struct(col("__t"), col("__x")))).as("arr"))
    val withYs = scanSeries(collected, seriesCol) { xs =>
      val ys = new Array[Double](xs.length)
      var l = 0.0
      var p = 0.0
      var i = 0
      while (i < xs.length) {
        if (i == 0) { l = xs(0); p = r }
        else {
          val pp = p + q
          val k = pp / (pp + r)
          l = l + k * (xs(i) - l)
          p = (1.0 - k) * pp
        }
        ys(i) = l
        i += 1
      }
      ys
    }
    withYs
      .select(col(seriesCol), explode(arrays_zip(col("arr"), col("__ys"))).as("__z"))
      .select(col(seriesCol), col("__z.arr.__t").as(tsCol),
        col("__z.arr.__x").as("x"), scoreOut(col("__z.__ys")).as("level"))
  }

  /** Additive Holt–Winters (triple exponential smoothing, period `m`) per
    * series over an aligned non-null grid — fitted one-step-ahead values
    * and residual z anomalies, the classical forecaster the reference's
    * domain (sensor telemetry with daily cycles) reaches for first.
    *
    * Classical init over the first two seasons: b₀ = (mean(season 2) −
    * mean(season 1)) / m; the level starts at the END of season 1
    * (l = mean(season 1) + b₀·(m−1)/2 — the season mean is the level at
    * the season MIDPOINT, so it must be advanced half a season or every
    * early forecast lags the trend by (m−1)/2·b₀, which is exactly the
    * residual bias the zero-residual spec caught); seasonals are the
    * DETRENDED first season, s_i = x_i − (mean(season 1) + b₀·(i −
    * (m−1)/2)), so a linear trend cannot leak into the seasonal state.
    * The recursion then runs from t = m+1 (fitted = l + b + s_{t−m};
    * l' = α(x − s_{t−m}) + (1−α)(l+b); b' = β(l'−l) + (1−β)b;
    * s' = γ(x − l − b) + (1−γ)s_{t−m}). The first m rows carry null
    * fitted. Same LINEAR scan-over-the-collected-grid shape (and scale
    * contract) as [[ewma]] ([[scanSeries]]); state is (l, b, the m-slot
    * seasonal ring, fitted list). HoltWintersSpec replays the identical
    * recursion in plain Scala on the driver and matches row-for-row.
    *
    * Returns (seriesCol, tsCol, x, fitted, residual, is_anom) where
    * is_anom flags |residual| > zCut·σ_resid (per-series σ). */
  def holtWinters(grid: DataFrame, seriesCol: String, tsCol: String,
                  valueCol: String, m: Int, alpha: Double, beta: Double,
                  gamma: Double, zCut: Double,
                  scoreOut: Column => Column): DataFrame = {
    require(m >= 2 && alpha > 0 && alpha < 1 && beta > 0 && beta < 1 &&
      gamma > 0 && gamma < 1 && zCut > 0, "need period >= 2, params in (0,1)")
    val collected = grid
      .select(col(seriesCol), col(tsCol).as("__t"),
        col(valueCol).cast("double").as("__x"))
      .groupBy(seriesCol)
      .agg(sort_array(collect_list(struct(col("__t"), col("__x")))).as("arr"))
      .filter(size(col("arr")) >= 2 * m) // need two full seasons to init
    // linear scan per series: init over two seasons, then t = m .. n-1
    // (0-based). Op order matches the former Catalyst fold exactly, so
    // the recursive-CTE oracle stays bit-for-bit.
    val withFit = scanSeries(collected, seriesCol) { xs =>
      def mean(from: Int): Double = {
        var s = 0.0; var i = from
        while (i < from + m) { s += xs(i); i += 1 } // left fold from 0.0
        s / m
      }
      val mu1 = mean(0)
      val b0 = (mean(m) - mu1) / m
      val half = (m - 1) / 2.0
      var l = mu1 + b0 * half
      var b = b0
      // m-slot seasonal ring; head = index (t - m) mod m
      val seas = Array.tabulate(m)(i => xs(i) - (mu1 + b0 * (i - half)))
      val fit = new Array[Double](xs.length) // first m slots re-nulled below
      var t = m
      while (t < xs.length) {
        val x = xs(t)
        val sOld = seas(t % m)
        fit(t) = l + b + sOld
        val lN = alpha * (x - sOld) + (1.0 - alpha) * (l + b)
        val bN = beta * (lN - l) + (1.0 - beta) * b
        val sN = gamma * (x - l - b) + (1.0 - gamma) * sOld
        l = lN; b = bN; seas(t % m) = sN
        t += 1
      }
      fit
    }
    val wS = Window.partitionBy(seriesCol)
    withFit
      // the scan fills slots 0..m-1 with 0.0 placeholders: null them (the
      // first m rows have no forecast)
      .withColumn("__fit", transform(col("__ys"),
        (f, i) => when(i >= m, f)))
      .select(col(seriesCol), explode(arrays_zip(col("arr"), col("__fit"))).as("__z"))
      .select(col(seriesCol), col("__z.arr.__t").as(tsCol),
        col("__z.arr.__x").as("x"), col("__z.__fit").as("__f"))
      .withColumn("__r", col("x") - col("__f"))
      .withColumn("__sd", stddev_pop("__r").over(wS))
      .select(col(seriesCol), col(tsCol), col("x"),
        scoreOut(col("__f")).as("fitted"), scoreOut(col("__r")).as("residual"),
        (col("__sd") > 0 && abs(col("__r")) > lit(zCut) * col("__sd"))
          .cast("int").as("is_anom"))
  }

  /** Split-conformal prediction interval for the seasonal-naive
    * forecaster x̂_t = x_{t−period}: per series, the first half of the
    * time-ordered forecastable points calibrates the half-width
    * q̂ = k-th smallest |residual|, k = min(⌈α·(n_cal+1)⌉, n_cal) — the
    * finite-sample-valid conformal quantile — and the second half
    * measures the empirical coverage of x̂ ± q̂. Distribution-free under
    * exchangeable residuals; the report's job is to catch when they are
    * NOT (trend or regime drift shows up as coverage under target).
    *
    * |residuals| are rounded (scoreOut) BEFORE ranking so the rank order
    * — and with it q̂ — is engine-identical (the rank-over-rounded
    * convention). Per-series windows only; q̂ is one row per series,
    * broadcast back for the coverage pass.
    *
    * Returns (seriesCol, n_cal, n_test, q_hat, coverage). */
  def conformalNaive(grid: DataFrame, seriesCol: String, tsCol: String,
                     valueCol: String, period: Int, alpha: Double,
                     scoreOut: Column => Column): DataFrame = {
    require(period >= 1 && alpha > 0 && alpha < 1,
      s"bad conformal params: period=$period alpha=$alpha")
    val wTs = Window.partitionBy(seriesCol).orderBy(tsCol)
    val wAll = Window.partitionBy(seriesCol)
    val base = grid
      .select(col(seriesCol), col(tsCol), col(valueCol).cast("double").as("__x"))
      .withColumn("__res", col("__x") - lag("__x", period).over(wTs))
      .filter(col("__res").isNotNull)
      .withColumn("__abs", scoreOut(abs(col("__res"))))
      .withColumn("__rn", row_number().over(wTs))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__cal", col("__rn") <= floor(col("__n") / lit(2.0)))
    val qhat = base.filter(col("__cal"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(seriesCol).orderBy(col("__abs"), col(tsCol))))
      .withColumn("__ncal", count(lit(1)).over(wAll))
      .filter(col("__rk") === least(
        ceil(lit(alpha) * (col("__ncal").cast("double") + lit(1.0))),
        col("__ncal")))
      .select(col(seriesCol), col("__ncal").as("n_cal"),
        col("__abs").as("q_hat"))
    base.filter(!col("__cal"))
      .join(broadcast(qhat), Seq(seriesCol))
      .groupBy(seriesCol)
      .agg(max("n_cal").as("n_cal"), count(lit(1)).as("n_test"),
        max("q_hat").as("q_hat"),
        scoreOut(avg((col("__abs") <= col("q_hat")).cast("double")))
          .as("coverage"))
  }

  /** Single-frequency periodogram power at a ladder of candidate periods —
    * "is there a daily / half-daily / weekly cycle, and how strong": for
    * each period P (hours), project the hourly series onto cos/sin at
    * ω = 2π/P and report the harmonic amplitude and the fraction of series
    * variance it explains,
    *
    *   C = Σxc − x̄Σc,  S = Σxs − x̄Σs   (c,s the basis at ω)
    *   amplitude = (2/n)·√(C²+S²),  var_frac = 2(C²+S²) / (n·SSE)
    *
    * — the quantitative companion of [[seasonalStrength]]: that one needs
    * the period known; this one ranks candidates (Schuster's periodogram).
    *
    * Scale shape: the stream collapses to hourly means once, then ONE
    * map-side-combinable aggregate per (series, period) computes all six
    * sums — no window, no per-period rescan of raw events. The basis angle
    * is built from the integer hour index mod P, so the trig argument is
    * identical cross-engine. var_frac is exact only over whole cycles;
    * with partial cycles it is the standard regression R² of the single
    * harmonic (documented, deterministic).
    *
    * Returns (series, period_hours, n_hours, amplitude, var_frac). */
  def harmonicPower(events: DataFrame, seriesCol: String, tsCol: String,
                    valueCol: String, periodsHours: Seq[Int],
                    scoreOut: Column => Column): DataFrame = {
    require(periodsHours.nonEmpty && periodsHours.forall(_ >= 2), "periods: hours >= 2")
    val grid = events
      .select(col(seriesCol).as("series"),
        floor(unix_timestamp(date_trunc("hour", col(tsCol))) / lit(3600L)).as("__h"),
        col(valueCol).cast("double").as("__v"))
      .groupBy("series", "__h").agg(avg("__v").as("__y"))
      .persist()
    val perPeriod = periodsHours.map { p =>
      val theta = lit(2.0 * math.Pi / p) * (col("__h") % lit(p.toLong)).cast("double")
      grid
        .select(col("series"), col("__y"), cos(theta).as("__c"), sin(theta).as("__s"))
        .groupBy("series")
        .agg(count(lit(1)).cast("double").as("__n"),
          sum("__y").as("__sx"), sum(col("__y") * col("__y")).as("__sxx"),
          sum("__c").as("__sc"), sum("__s").as("__ss"),
          sum(col("__y") * col("__c")).as("__sxc"),
          sum(col("__y") * col("__s")).as("__sxs"))
        .select(col("series"), lit(p).as("period_hours"),
          col("__n").cast("long").as("n_hours"),
          (col("__sxc") - col("__sx") / col("__n") * col("__sc")).as("__cc"),
          (col("__sxs") - col("__sx") / col("__n") * col("__ss")).as("__ssn"),
          (col("__sxx") - col("__sx") * col("__sx") / col("__n")).as("__sse"),
          col("__n"))
        .select(col("series"), col("period_hours"), col("n_hours"),
          scoreOut(lit(2.0) / col("__n") *
            sqrt(col("__cc") * col("__cc") + col("__ssn") * col("__ssn")))
            .as("amplitude"),
          scoreOut(when(col("__sse") > 0,
            lit(2.0) * (col("__cc") * col("__cc") + col("__ssn") * col("__ssn")) /
              (col("__n") * col("__sse")))).as("var_frac"))
    }
    perPeriod.reduce(_ unionAll _)
  }

  /** Theta-method one-step backtest (Assimakopoulos & Nikolopoulos '00 —
    * the M3-competition winner; Hyndman & Billah '03 showed it is SES
    * with drift b/2): x̂_t = l_{t−1} + b/2 with l the SES level ([[ewma]],
    * smoothing `alpha`) and b the per-hour OLS trend slope, scored
    * against the naive x_{t−1} per the q291 backtest discipline — never
    * ship a forecast without its naive baseline.
    *
    * The SES recursion is the linear [[scanSeries]] fold; the slope is
    * one moment aggregate on the CENTERED hour index (the q187
    * cancellation lesson), ROUNDED before the forecast arithmetic so
    * x̂ is identical arithmetic on identical (rounded) doubles in both
    * engines. The one-step lag is a series-partitioned window over the
    * grid. Returns (series, n_hours, slope, mae_theta, mae_naive, skill).
    */
  def thetaBacktest(grid: DataFrame, seriesCol: String, tsCol: String,
                    valueCol: String, alpha: Double,
                    scoreOut: Column => Column): DataFrame = {
    val lev = ewma(grid, seriesCol, tsCol, valueCol, alpha, scoreOut)
    val slope = grid
      .select(col(seriesCol),
        floor(unix_timestamp(date_trunc("hour", col(tsCol))) / 3600L).as("idx"),
        col(valueCol).cast("double").as("y"))
      .groupBy(seriesCol)
      .agg(avg("idx").as("__mi"), avg("y").as("__my"),
        avg(col("idx") * col("y")).as("__mxy"),
        avg(col("idx") * col("idx")).as("__mxx"))
      .select(col(seriesCol),
        scoreOut((col("__mxy") - col("__mi") * col("__my")) /
          (col("__mxx") - col("__mi") * col("__mi"))).as("slope"))
    val w = Window.partitionBy(seriesCol).orderBy(tsCol)
    lev
      .withColumn("__lp", lag("ewma", 1).over(w))
      .withColumn("__xp", lag("x", 1).over(w))
      .join(slope, seriesCol)
      .filter(col("__lp").isNotNull)
      .groupBy(seriesCol)
      .agg(count(lit(1)).as("n_steps"),
        first("slope").as("slope"),
        avg(abs(col("x") - (col("__lp") + col("slope") / lit(2.0)))).as("__mt"),
        avg(abs(col("x") - col("__xp"))).as("__mn"))
      .select(col(seriesCol).as("series"), col("n_steps"), col("slope"),
        scoreOut(col("__mt")).as("mae_theta"),
        scoreOut(col("__mn")).as("mae_naive"),
        scoreOut(lit(1.0) - col("__mt") / col("__mn")).as("skill"))
  }

  /** Croston's method for INTERMITTENT demand (Croston '72) — the
    * forecaster for series that are mostly zero (spare parts, rare
    * high-value events, error spikes), where SES over the raw series
    * decays toward zero between demands and spikes on each one. Separate
    * SES folds (smoothing `alpha`) over the demand SIZES z_i and the
    * inter-demand INTERVALS p_i (in days); the demand-rate forecast is
    * z_hat/p_hat per day.
    *
    * Occurrences collapse map-side to one (series, day, size) row per
    * demand day; each series then reduces to ONE row carrying its sorted
    * occurrence array — demand sequences are sparse by definition, so the
    * array is occurrence-bounded, not event-bounded. Both folds run as
    * Catalyst `aggregate` HOFs in fixed order ((1−α)·acc + α·x), so a
    * DuckDB `list_reduce` replays them bit-for-bit. Init per Croston:
    * z-SES starts at z_1, interval-SES at the first observed interval
    * (series with < 2 demand days are dropped — no interval exists).
    * Returns (series, n_demands, z_hat, p_hat, rate_per_day). */
  def crostonForecast(events: DataFrame, seriesCol: String, tsCol: String,
                      demandFilter: Column, alpha: Double,
                      scoreOut: Column => Column): DataFrame = {
    val daily = events.filter(demandFilter)
      .select(col(seriesCol).as("series"),
        datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date")).as("day"))
      .groupBy("series", "day").agg(count(lit(1)).cast("double").as("z"))
    val packed = daily.groupBy("series")
      .agg(sort_array(collect_list(struct(col("day"), col("z")))).as("occ"))
      .filter(size(col("occ")) >= 2)
      .select(col("series"), size(col("occ")).as("n_demands"),
        transform(col("occ"), o => o.getField("z")).as("zs"),
        transform(col("occ"), o => o.getField("day").cast("double")).as("ds"))
    val a = lit(alpha)
    def ses(arr: Column): Column =
      aggregate(slice(arr, lit(2), size(arr)), element_at(arr, 1),
        (acc, x) => (lit(1.0) - a) * acc + a * x)
    val intervals = zip_with(
      slice(col("ds"), lit(2), size(col("ds"))),
      slice(col("ds"), lit(1), size(col("ds")) - 1),
      (b, aa) => b - aa)
    packed
      .withColumn("__zh", ses(col("zs")))
      .withColumn("__ph", ses(intervals))
      .select(col("series"), col("n_demands"),
        scoreOut(col("__zh")).as("z_hat"),
        scoreOut(col("__ph")).as("p_hat"),
        scoreOut(col("__zh") / col("__ph")).as("rate_per_day"))
  }
}
