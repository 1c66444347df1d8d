package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming PSI drift monitor — the stream twin of `StatOps.psi`: per
  * event-time tumbling window, bin the metric into the SAME fixed
  * [lo, hi)/bins grid (underflow bin −1, overflow bin `bins`) and score
  * the window's distribution against a LITERAL reference histogram with
  * the same smoothed formula p = (n + 0.5)/(tot + bins/2). The reference
  * counts are fit offline (one batch `StatOps.psi`-style pass) and baked
  * into the plan — serving never joins or broadcasts the baseline.
  *
  * Structured Streaming forbids chained aggregations in append mode, so
  * the per-window histogram is ONE aggregation of bins+2 conditional
  * sums, and the PSI fold over bins is stateless column arithmetic above
  * it — watermark-final windows, state bounded by live windows × (bins+2)
  * counters. StreamPsiSpec pins per-window parity against the batch
  * formula on the same closed input. */
object StreamPsi {

  /** Shared bin expression — identical to the batch `StatOps.psi` grid. */
  private def binOf(v: Column, bins: Int, lo: Double, hi: Double): Column =
    when(v < lo, lit(-1))
      .when(v >= hi, lit(bins))
      .otherwise(least(floor((v - lo) / ((hi - lo) / bins)).cast("int"),
        lit(bins - 1)))

  /** `events` must carry an event-time column `tsCol` and a numeric
    * `valueCol`. `refCounts` maps bin index (−1 .. bins) to the reference
    * count; absent bins are 0. Returns a streaming frame of
    * (window_start, window_end, n_events, psi, drifted). */
  def psiStream(events: DataFrame, tsCol: String, valueCol: String,
                refCounts: Map[Int, Long], bins: Int, lo: Double, hi: Double,
                threshold: Double = 0.2,
                windowDuration: String = "1 hour",
                watermarkDelay: String = "10 minutes"): DataFrame = {
    require(bins >= 1, s"bins must be positive, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val allBins = (-1) +: (0 until bins) :+ bins
    val v = col(valueCol).cast("double")
    val b = binOf(v, bins, lo, hi)
    val half = bins / 2.0
    val refTot = refCounts.values.sum.toDouble
    val agged = events
      .withWatermark(tsCol, watermarkDelay)
      .select(window(col(tsCol), windowDuration).as("w"), b.as("bin"))
      .groupBy("w")
      .agg(count(lit(1)).as("n_events"),
        allBins.map(bb =>
          sum(when(col("bin") === bb, 1L).otherwise(0L)).as(s"c_$bb")): _*)
    // stateless PSI fold above the aggregation: literal smoothed reference
    // probabilities, current probabilities from the window's counters
    val psiCol = allBins.map { bb =>
      val pr = (refCounts.getOrElse(bb, 0L) + 0.5) / (refTot + half)
      val pc = (col(s"c_$bb") + lit(0.5)) / (col("n_events") + lit(half))
      (pc - lit(pr)) * log(pc / lit(pr))
    }.reduce(_ + _)
    agged.select(
      col("w.start").as("window_start"), col("w.end").as("window_end"),
      col("n_events"), psiCol.as("psi"),
      (psiCol > threshold).cast("int").as("drifted"))
  }

  /** The identical algebra on a BATCH frame — the parity surface the spec
    * compares the stream against (and a usable backfill path: scoring
    * historical windows against the same literal baseline). */
  def psiBatch(events: DataFrame, tsCol: String, valueCol: String,
               refCounts: Map[Int, Long], bins: Int, lo: Double, hi: Double,
               threshold: Double = 0.2,
               windowDuration: String = "1 hour"): DataFrame =
    psiStream(events, tsCol, valueCol, refCounts, bins, lo, hi, threshold,
      windowDuration, watermarkDelay = "0 seconds")
}
