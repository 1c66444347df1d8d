package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dynamic time warping between series pairs (Sakoe & Chiba '78 band).
  * Euclidean distance asks "do the series agree hour by hour?"; DTW asks
  * "do they trace the same SHAPE, allowing bounded time slippage?" — the
  * standard similarity for phase-shifted seasonal profiles.
  *
  * Scale contract: each series collapses to ONE row carrying its sorted
  * grid array (the [[SeasonalOps.ewma]] collected-grid discipline —
  * grid-bounded, never event-bounded), pairs come from a crossjoin of
  * that series-count-sized table, and each pair's DP runs inside one task
  * in O(len·band) time and O(band) memory (two rolling rows). The band
  * is the scale knob: full-matrix DTW is O(len²) and unbounded warping is
  * usually WRONG anyway (Sakoe-Chiba's point).
  */
object DtwOps {

  /** Banded DTW over z-NORMALIZED series (per-series mean/σ ROUNDED by
    * `scoreOut` before the DP, so distances are scale-free and replay
    * deterministically). Pairs with σ = 0 on either side are dropped.
    * The effective band widens to |n−m| when the lengths differ more
    * than `band` (otherwise no path exists). Returns one row per
    * unordered pair: (series_a, series_b, n_a, n_b, dtw, dtw_per_step)
    * with dtw_per_step = dtw / (n_a + n_b). */
  def dtwPairs(grid: DataFrame, seriesCol: String, tsCol: String,
               valueCol: String, band: Int,
               scoreOut: Column => Column): DataFrame = {
    require(band >= 1, s"band >= 1, got $band")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val stats = grid
      .select(col(seriesCol).as("s"), col(tsCol).as("__t"),
        col(valueCol).cast("double").as("__x"))
      .filter(col("__x").isNotNull)
      .groupBy("s")
      .agg(sort_array(collect_list(struct(col("__t"), col("__x")))).as("arr"),
        scoreOut(avg("__x")).as("__mu"),
        scoreOut(sqrt(avg(col("__x") * col("__x")) -
          avg("__x") * avg("__x"))).as("__sd"))
      .filter(col("__sd") > 0)
      .select(col("s"),
        transform(col("arr"), e =>
          (e.getField("__x") - col("__mu")) / col("__sd")).as("z"))
    val pairs = stats.select(col("s").as("sa"), col("z").as("za"))
      .crossJoin(stats.select(col("s").as("sb"), col("z").as("zb")))
      .filter(col("sa") < col("sb"))
    val outSchema = StructType(Seq(
      StructField("series_a", pairs.schema("sa").dataType, nullable = true),
      StructField("series_b", pairs.schema("sb").dataType, nullable = true),
      StructField("n_a", LongType, nullable = false),
      StructField("n_b", LongType, nullable = false),
      StructField("__dtw", DoubleType, nullable = true)))
    val raw = pairs.mapPartitions { it =>
      it.map { r =>
        val a = r.getSeq[Double](1).toArray
        val b = r.getSeq[Double](3).toArray
        val w = math.max(band, math.abs(a.length - b.length))
        val d = dtwBanded(a, b, w)
        Row(r.get(0), r.get(2), a.length.toLong, b.length.toLong, d)
      }
    }(Encoders.row(outSchema))
    raw.select(col("series_a"), col("series_b"), col("n_a"), col("n_b"),
      scoreOut(col("__dtw")).as("dtw"),
      scoreOut(col("__dtw") / (col("n_a") + col("n_b")).cast("double"))
        .as("dtw_per_step"))
  }

  /** Classic O(n·band) two-row DP with |i−j| ≤ band; cost = |aᵢ − bⱼ|
    * (Manhattan point cost — robust to the odd spike surviving the
    * z-normalization). */
  private[graft] def dtwBanded(a: Array[Double], b: Array[Double],
                               band: Int): Double = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return Double.NaN
    val inf = Double.PositiveInfinity
    var prev = Array.fill(m + 1)(inf)
    var cur = Array.fill(m + 1)(inf)
    prev(0) = 0.0
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      val lo = math.max(1, i - band)
      val hi = math.min(m, i + band)
      var j = lo
      while (j <= hi) {
        val c = math.abs(a(i - 1) - b(j - 1))
        val best = math.min(prev(j), math.min(cur(j - 1), prev(j - 1)))
        cur(j) = c + best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }
}
