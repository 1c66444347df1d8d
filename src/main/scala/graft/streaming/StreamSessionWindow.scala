package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Session aggregation on Spark's NATIVE `session_window` — the
  * engine-managed third implementation beside
  * [[Sessionize.sessionizeBatch]]'s lag/cumulative-sum window pass and
  * [[Sessionize.sessionize]]'s hand-rolled `flatMapGroupsWithState`
  * (the [[StreamIntervalJoin]] rationale: when the engine can express
  * the semantics natively it also owns the state machine — dynamic
  * session MERGE, watermark-derived eviction, append-mode finalization
  * — and a custom stateful operator is one more thing to get wrong).
  * `session_window(ts, gap)` assigns each event a [ts, ts + gap)
  * window and merges overlapping windows per key, so a session closes
  * exactly `gap` after its last event; in append mode each session row
  * emits once, when the watermark passes its (merged) window end.
  *
  * Boundary convention: the native merge keeps two events in ONE
  * session iff t₂ − t₁ < gap (strict — the windows must overlap),
  * while `sessionizeBatch` splits on t₂ − t₁ > gap (an event landing
  * EXACTLY on the gap boundary stays in-session there). The two agree
  * everywhere except exact-boundary gaps; callers mixing the paths on
  * data with quantized timestamps should pick the gap off the
  * quantization grid (the spec's fixture does, and the scaladoc is the
  * documented contract for the residual edge).
  *
  * Session identity: `sessionizeBatch` numbers sessions per key;
  * the native form identifies them by (key, session_start) — equality
  * of (start, end, n, sum) per key IS equality of the partition into
  * sessions, which is what StreamSessionSpec pins three ways
  * (streaming-native ≡ batch-native ≡ sessionizeBatch).
  *
  * Scale shape: one shuffle keyed on (key, merged window); state per
  * open session is O(1) aggregates (no event buffering — unlike the
  * fMGWS path, the engine pre-aggregates within micro-batches), evicted
  * when the watermark passes the session end. */
object StreamSessionWindow {

  /** One row per session: (key, session_start, session_end, n_events,
    * sum_value) — session_end is the max EVENT ts (not the window end,
    * which includes the gap padding), matching [[Sessionize
    * .sessionizeBatch]]'s columns. Works unchanged on a batch frame
    * (`session_window` is a grouping expression, not a streaming-only
    * operator). */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, gap: String,
               watermarkDelay: String): DataFrame = {
    val base =
      if (events.isStreaming) events.withWatermark(tsCol, watermarkDelay)
      else events
    base
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        sum(col(valueCol).cast("double")).as("sum_value"))
      .select(col(keyCol), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))
  }
}
