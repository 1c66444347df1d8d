package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic event-stream analytics over the (user, ts, type) log — the
  * product-analytics queries (cohort retention, ordered funnels) that run
  * beside the sensor/time-series operators on the same events table.
  *
  * Scale shape: everything keys on the user — one hash shuffle on the
  * user id and the raw stream collapses map-side to per-(user, day) or
  * per-user rows before it; no global sorts, no self-joins over the raw
  * log. */
object EventOps {

  /** Cohort retention: users cohort by the DAY of their first event;
    * retention at offset k = how many of them were active k days later.
    * The raw log collapses to distinct (user, day) map-side (one row per
    * active user-day, the analytics-warehouse "daily active" compaction);
    * the cohort day attaches with a per-user window min (same shuffle
    * key), and the final count is exact — each (user, day) row is already
    * unique, so `count(*)` IS `count(distinct user)`.
    *
    * Returns (cohort_date, day_offset, n_users) for offsets 0..maxOffset. */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
                       maxOffset: Int): DataFrame = {
    val ud = events.select(col(userCol).as("u"), to_date(col(tsCol)).as("d")).distinct()
    val w = Window.partitionBy("u")
    ud.withColumn("cohort_date", min("d").over(w))
      .withColumn("day_offset", datediff(col("d"), col("cohort_date")))
      .filter(col("day_offset") <= maxOffset)
      .groupBy("cohort_date", "day_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-day histogram sketches of a measure, rolled up into whole-corpus
    * quantiles WITHOUT rescanning — the quantile twin of the HLL distinct
    * rollup (q106): daily (bins + 2)-long counter rows merge by vector
    * addition (exactly mergeable), so month/corpus percentiles come from
    * kilobytes of sketch rows instead of a second pass over the raw log.
    * Estimates are exact to one bin width over the declared [lo, hi)
    * range (HistogramSketchSpec pins the bound).
    *
    * Returns one row per day (day, n, p50) plus a "__all__" row with the
    * merged-sketch p50/p90/p99. */
  def histQuantileRollup(events: DataFrame, tsCol: String, valueCol: String,
                         bins: Int, lo: Double, hi: Double,
                         scoreOut: Column => Column): DataFrame = {
    graft.functions.VectorFunctions.register(events.sparkSession)
    val daily = events
      .select(date_format(col(tsCol), "yyyy-MM-dd").as("day"),
        col(valueCol).cast("double").as("v"))
      .groupBy("day")
      .agg(count(lit(1)).as("n"),
        call_function("graft_hist_agg", col("v"),
          lit(bins), lit(lo), lit(hi)).as("sk"))
    val perDay = daily.select(col("day"), col("n"),
      scoreOut(call_function("graft_hist_quantile", col("sk"), lit(0.5))).as("p50"),
      lit(null).cast("double").as("p90"),
      lit(null).cast("double").as("p99"))
    // corpus row: within one job the global sketch comes from the same
    // scan's partial buffers; the no-rescan claim is about the STORED
    // sketch-table workflow, exercised via [[mergeSketches]] in the spec
    val all = events
      .select(col(valueCol).cast("double").as("v"))
      .agg(count(lit(1)).as("n"),
        call_function("graft_hist_agg", col("v"), lit(bins), lit(lo), lit(hi)).as("sk"))
      .select(lit("__all__").as("day"), col("n"),
        scoreOut(call_function("graft_hist_quantile", col("sk"), lit(0.5))).as("p50"),
        scoreOut(call_function("graft_hist_quantile", col("sk"), lit(0.9))).as("p90"),
        scoreOut(call_function("graft_hist_quantile", col("sk"), lit(0.99))).as("p99"))
    perDay.unionByName(all)
  }

  /** Sketch-level merge of serialized histograms — the stored-sketch-table
    * rollup path (no raw rescan): vector-add the counters of same-shape
    * sketches. Driver-side utility for bounded sketch sets; the
    * distributed form is the aggregate itself. */
  def mergeSketches(sketches: Seq[Array[Byte]]): Array[Byte] = {
    require(sketches.nonEmpty, "nothing to merge")
    val bb0 = java.nio.ByteBuffer.wrap(sketches.head)
    val bins = bb0.getInt; val lo = bb0.getDouble; val hi = bb0.getDouble
    val acc = new Array[Long](bins + 2)
    sketches.foreach { s =>
      val bb = java.nio.ByteBuffer.wrap(s)
      val b = bb.getInt
      require(b == bins, s"shape mismatch: $b vs $bins bins")
      bb.getDouble; bb.getDouble
      var i = 0
      while (i < acc.length) { acc(i) += bb.getLong; i += 1 }
    }
    graft.functions.HistogramSketch.serialize(bins, lo, hi, acc)
  }

  /** Ordered three-step funnel (step1 → step2 → step3, each strictly
    * after the previous): per-user completion via RUNNING window minima in
    * ONE pass over the log — first_1 = min ts of step1 so far; a step2 row
    * counts only when first_1 < its ts; and so on. Equivalent to the
    * self-join formulation (min step2 after the first step1 …) but with
    * one shuffle on the user and a single scan instead of three.
    *
    * Returns one row: (n_step1, n_step2, n_step3, rate_12, rate_13) —
    * user counts completing each prefix and conversion rates. */
  def orderedFunnel(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, steps: (String, String, String),
                    scoreOut: Column => Column): DataFrame = {
    val (s1, s2, s3) = steps
    val w = Window.partitionBy(userCol).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val t1 = events
      .select(col(userCol), col(tsCol), col(typeCol))
      .withColumn("f1", min(when(col(typeCol) === s1, col(tsCol))).over(w))
      .withColumn("f2", min(when(col(typeCol) === s2 && col("f1") < col(tsCol),
        col(tsCol))).over(w))
    val t2 = t1
      .withColumn("f3", min(when(col(typeCol) === s3 && col("f2") < col(tsCol),
        col(tsCol))).over(w))
    val perUser = t2.groupBy(userCol).agg(
      max(col("f1").isNotNull.cast("int")).as("c1"),
      max(col("f2").isNotNull.cast("int")).as("c2"),
      max(col("f3").isNotNull.cast("int")).as("c3"))
    perUser.agg(
      sum("c1").as("n_step1"), sum("c2").as("n_step2"), sum("c3").as("n_step3"))
      .select(col("n_step1"), col("n_step2"), col("n_step3"),
        scoreOut(col("n_step2").cast("double") / col("n_step1")).as("rate_12"),
        scoreOut(col("n_step3").cast("double") / col("n_step1")).as("rate_13"))
  }
}
