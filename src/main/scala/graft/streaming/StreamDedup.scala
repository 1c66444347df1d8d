package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact dedup — the q54 exact-dedup stage as a continuous
  * operator, for ingest pipelines that must not re-admit a document the
  * corpus already holds (within the watermark horizon; state cannot be
  * unbounded on an infinite stream — the horizon IS the dedup contract).
  *
  * Two surfaces:
  *  - [[firstWins]]: pass-through dedup via Spark's native
  *    `dropDuplicatesWithinWatermark` — emits a key's first arrival,
  *    drops repeats, state auto-expires with the watermark. Use when
  *    downstream only needs the deduped stream.
  *  - [[manifestStream]]: per-key dedup MANIFEST emitted on watermark
  *    close — (key, first_ts, payload, n_dups), the record an audit /
  *    curation-funnel stage needs (q226's dedup-impact numbers,
  *    streamed). First = min (event-time, payload) — a total order, so
  *    out-of-order and tied arrivals resolve identically on the batch
  *    replay ([[manifestBatch]], the parity surface StreamDedupSpec
  *    pins).
  *
  * State per key is one (ts, payload, count) triple — key-cardinality-
  * bounded within the horizon, the same contract as the batch groupBy.
  */
object StreamDedup {

  case class Doc(key: String, ts: Timestamp, payload: String)
  case class DupState(firstMs: Long, payload: String, dups: Long)
  case class DedupRec(key: String, first_ts: Timestamp, payload: String,
                      n_dups: Long)

  /** Native pass-through dedup on `key` within the watermark. */
  def firstWins(docs: Dataset[Doc], watermarkDelay: String): Dataset[Doc] =
    docs.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("key")

  /** Dedup manifest, one record per key emitted when its watermark
    * horizon closes (event-time timeout `closeDelayMs` past the key's
    * last arrival). */
  def manifestStream(spark: SparkSession, docs: Dataset[Doc],
                     watermarkDelay: String,
                     closeDelayMs: Long): Dataset[DedupRec] = {
    import spark.implicits._
    require(closeDelayMs > 0, s"close delay must be positive: $closeDelayMs")
    docs
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[DupState, DedupRec](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[Doc], state: GroupState[DupState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(
              DedupRec(key, new Timestamp(st.firstMs), st.payload, st.dups))
          } else {
            var st = state.getOption.orNull
            var lastMs = Long.MinValue
            rows.foreach { d =>
              val t = d.ts.getTime
              lastMs = math.max(lastMs, t)
              st =
                if (st == null) DupState(t, d.payload, 0L)
                // min (event-time, payload): the SAME total order as the
                // batch min(struct(ts, payload)) — arrival order never
                // decides who is "first"
                else if (t < st.firstMs ||
                  (t == st.firstMs && d.payload < st.payload))
                  DupState(t, d.payload, st.dups + 1L)
                else st.copy(dups = st.dups + 1L)
            }
            state.update(st)
            state.setTimeoutTimestamp(math.max(
              lastMs + closeDelayMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** The batch replay: one hash aggregate, min struct(ts, payload) picks
    * the identical "first". */
  def manifestBatch(docs: DataFrame, keyCol: String, tsCol: String,
                    payloadCol: String): DataFrame =
    docs
      .select(col(keyCol).as("key"), col(tsCol).as("__t"),
        col(payloadCol).as("__p"))
      .groupBy("key")
      .agg(min(struct(col("__t"), col("__p"))).as("__f"),
        (count(lit(1)) - 1L).as("n_dups"))
      .select(col("key"), col("__f.__t").as("first_ts"),
        col("__f.__p").as("payload"), col("n_dups"))
}
