package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming sketches — the stream twin of the batch t-digest family
  * ([[graft.functions.TDigestAgg]] / q285): per-window quantile digests
  * over an unbounded stream.
  *
  * Shape: a WATERMARKED tumbling-window aggregate in append mode. The
  * t-digest is a `TypedImperativeAggregate`, so Structured Streaming's
  * HashAggregate state store holds one O(δ) digest buffer per open
  * window; partial (map-side) digests merge into the window's buffer per
  * micro-batch, and the window's final digest is EMITTED ON WATERMARK
  * CLOSE — merge-on-window-close, no raw-value retention. State is
  * bounded by watermark eviction: only windows newer than
  * (max event time − delay) stay open, so state = O(open_windows · δ)
  * regardless of stream length.
  *
  * The digest BYTES are merge-order-sensitive (the batch caveat, pinned
  * in TDigestSpec, applies doubly under micro-batch nondeterminism), so
  * the streaming contract is the same rank-error BOUND as batch plus
  * exact total-weight conservation — StreamTDigestSpec pins both against
  * arbitrary micro-batch splits of a closed input. */
object StreamSketch {

  /** Per-window t-digest of `valueCol` over event-time tumbling windows.
    * Call [[graft.functions.VectorFunctions.register]] (or rely on the
    * session extensions) so `graft_tdigest_agg` resolves. Returns
    * (window_start, window_end, n, digest) in append mode — one row per
    * CLOSED window. Probe the digest downstream with
    * `graft_tdigest_quantile(digest, q)`. */
  def windowedTDigest(events: DataFrame, tsCol: String, valueCol: String,
                      windowLen: String, watermarkDelay: String,
                      delta: Int = 200): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen).as("w"))
      .agg(count(col(valueCol)).as("n"),
        call_function("graft_tdigest_agg",
          col(valueCol).cast("double"), lit(delta)).as("digest"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"), col("n"), col("digest"))

  /** Batch reference for the spec: the same aggregate over a static
    * frame (identical plan surface minus the watermark). */
  def batchWindowedTDigest(events: DataFrame, tsCol: String,
                           valueCol: String, windowLen: String,
                           delta: Int = 200): DataFrame =
    events
      .groupBy(window(col(tsCol), windowLen).as("w"))
      .agg(count(col(valueCol)).as("n"),
        call_function("graft_tdigest_agg",
          col(valueCol).cast("double"), lit(delta)).as("digest"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"), col("n"), col("digest"))
}
