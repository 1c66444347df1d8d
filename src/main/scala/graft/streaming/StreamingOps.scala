package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming wrapper for the reference's "live" path
  * (SURVEY §2.11): the dashboard's 60-second file-poll loop
  * (`dashboard.py:113,528-539,690-694`) maps to a file-source stream with a
  * processing-time trigger; its per-tick re-scoring maps to `foreachBatch`
  * over the trailing window.
  *
  * Design: event-time tumbling windows with a watermark bound state; the
  * heavy feature logic is NOT reimplemented for streaming — `foreachBatch`
  * reuses the exact batch operators (WindowOps/TimeSeriesOps) on each
  * micro-batch, which is both the faithful reproduction of the reference's
  * recompute-the-tail loop and the recommended Spark pattern. */
object StreamingOps {

  /** Event-time hourly tumbling aggregate with late-data tolerance —
    * streaming twin of `TimeSeriesOps.downsample` (reference T4). */
  def hourlyAggStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), avg("value").as("avg_value"))
      .select(col("w.start").as("ts"), col("event_type"), col("n"), col("avg_value"))

  /** File-source stream over a directory of parquet drops — the engine-side
    * equivalent of the reference's polling thread (S5). */
  def fileSource(spark: SparkSession, dir: String, schemaFrom: DataFrame): DataFrame =
    spark.readStream.schema(schemaFrom.schema).parquet(dir)

  /** Re-score every micro-batch with an arbitrary batch transformation —
    * the reference's `process_latest_data` + `predict_accretion` tick
    * (`dashboard.py:259-479`) as a foreachBatch loop. */
  def rescoreEachBatch(stream: DataFrame, intervalSec: Int)(
      score: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .trigger(Trigger.ProcessingTime(s"$intervalSec seconds"))
      .foreachBatch { (batch: DataFrame, id: Long) => score(batch, id) }

  /** Streaming exact dedup: drop rows whose fingerprint was already seen,
    * with the dedup state bounded by the event-time watermark (without it,
    * the seen-set grows forever — the non-negotiable at 100 TB/day).
    * Streaming twin of `DedupOps.exactDedup`'s keep-list: the FIRST arrival
    * of each fingerprint survives. */
  def dedupStream(docs: DataFrame, fpCol: String, tsCol: String,
                  watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(fpCol)

  /** Streaming zone-rule alerting: [[graft.pipeline.ZoneRules.flags]] is
    * stateless per-row column algebra, so it composes onto a stream
    * unchanged. The A10 corpus-max normalization is replaced by its hard
    * floor (`zones_low / 8` — a running global max has no bounded-state
    * streaming form, and on a live kiln the floor binds anyway, see A10).
    * Emits only triggered rows — the alert feed. */
  def zoneAlertStream(wide: DataFrame,
                      thresholds: Map[Int, Double] = graft.pipeline.ZoneRules.defaultThresholds): DataFrame =
    graft.pipeline.ZoneRules.flags(wide, thresholds)
      .withColumn("temp_risk_normalized", col("zones_low").cast("double") / 8.0)
      .filter(col("direct_detection") === 1)

  /** No-op nondeterministic expression used as a pushdown barrier: a
    * project containing it cannot have filters pushed through (alias
    * substitution would otherwise re-expand the tokenize expressions into
    * the predicate — q71's measured 6-splits-per-row pitfall,
    * `FlagshipQ.scala`). q71's `monotonically_increasing_id` barrier is
    * rejected by streaming's UnsupportedOperationChecker; a
    * nondeterministic-flagged identity UDF is the streaming-safe form, and
    * costs one no-op call per row against the ~6 regex splits it saves. */
  private val ridBarrier = udf(() => 0).asNondeterministic()

  /** Streaming corpus clean: the q71 cleaning cascade on a document
    * stream — per-row quality signals (stateless column algebra, composes
    * onto the stream unchanged), then watermark-bounded exact dedup on the
    * content fingerprint via [[dedupStream]]. The FIRST arrival of each
    * fingerprint survives, mirroring the batch keep-list (`canonical =
    * min id` under arrival-order ids). Downstream corpus statistics run in
    * `foreachBatch` over the cleaned stream via [[rescoreEachBatch]]. */
  def corpusCleanStream(docs: DataFrame, tsCol: String,
                        minTokens: Int = 20, maxStopRatio: Double = 0.5,
                        watermark: String = "1 hour"): DataFrame = {
    val stop = Seq("a", "the", "and", "of", "in", "to")
    val scored = docs
      .withColumn("__t", graft.operators.TextOps.tokens(col("text")))
      .withColumn("n_tokens", size(col("__t")))
      .withColumn("stop_ratio",
        graft.operators.TextOps.markerCount(col("__t"), stop) / size(col("__t")))
      .withColumn("__rid", ridBarrier())
      // referencing __rid keeps ColumnPruning from deleting the barrier
      .filter(col("n_tokens") >= minTokens && col("stop_ratio") < maxStopRatio &&
        col("__rid") >= 0)
      .withColumn("fp", graft.operators.TextOps.fingerprint(col("text")))
      .drop("__t", "__rid")
    dedupStream(scored, "fp", tsCol, watermark)
  }

  /** Stream-stream inner join bounded by an event-time range (§2.11): for
    * each left row, the right rows with the same key whose timestamp falls
    * in [left.ts, left.ts + within]. BOTH sides carry watermarks and the
    * range condition is part of the JOIN predicate (not a post-filter) —
    * that pair is what lets Spark bound and evict join state (left rows
    * older than watermark − within, right rows older than watermark).
    * Without it, stream-stream join state grows without bound — the
    * difference between a join that survives 100 TB/day and one that OOMs
    * by lunchtime. Output schema: all left columns + right columns except
    * the (duplicate) key. */
  def followWithinStream(left: DataFrame, right: DataFrame, keyCol: String,
                         tsLeft: String, tsRight: String,
                         watermark: String, within: String): DataFrame = {
    val l = left.withWatermark(tsLeft, watermark)
    val r = right.withWatermark(tsRight, watermark)
    l.join(r,
      l(keyCol) === r(keyCol) &&
        r(tsRight) >= l(tsLeft) &&
        r(tsRight) <= l(tsLeft) + expr(s"INTERVAL $within"),
      "inner").drop(r(keyCol))
  }

  /** Convenience: run a streaming aggregate to an in-memory table until all
    * available data is processed (test/driver harness path). */
  def runToMemory(agg: DataFrame, name: String): StreamingQuery = {
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    q.processAllAvailable()
    q
  }
}
