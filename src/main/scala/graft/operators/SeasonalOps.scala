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
}
