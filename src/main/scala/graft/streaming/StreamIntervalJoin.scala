package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Native watermarked STREAM-STREAM interval join — the attribution
  * primitive (impression → click within a horizon) on Spark's built-in
  * stream-stream join machinery rather than a hand-rolled
  * flatMapGroupsWithState ([[StreamAsOf]] is the fMGWS counterpart for
  * as-of semantics; this one exists precisely because Spark CAN express
  * interval-join semantics natively, and the native form gets state
  * pruning, retraction-free append output, and watermark bookkeeping
  * from the engine).
  *
  * Both sides carry an event-time watermark and the join condition
  * bounds click_ts to [imp_ts, imp_ts + horizon], so Spark derives a
  * state-cleanup predicate for BOTH buffers: an impression can be
  * dropped once the click watermark passes imp_ts + horizon, a click
  * once the impression watermark passes click_ts — state is
  * O(rows inside the horizon window), never unbounded (the structured
  * streaming guide's interval-join contract). Inner append-mode output:
  * each (impression, click) match emits exactly once, when both sides
  * are final under the watermark.
  *
  * StreamJoinSpec proves stream ≡ batch: the emitted matches equal the
  * identical batch join on the closed input, across micro-batch splits
  * with out-of-order arrivals. */
object StreamIntervalJoin {

  case class Impression(ad_id: Long, imp_ts: Timestamp, campaign: String)
  case class Click(ad_id: Long, click_ts: Timestamp)

  /** `impressions` and `clicks` may each be streaming or batch frames
    * with the case-class columns above; horizon/delay are SQL interval
    * strings (e.g. "30 minutes", "10 minutes"). */
  def attribute(impressions: Dataset[Impression], clicks: Dataset[Click],
                horizon: String, watermarkDelay: String): DataFrame = {
    val i = impressions.toDF().withWatermark("imp_ts", watermarkDelay)
    val c = clicks.toDF().withWatermark("click_ts", watermarkDelay)
    i.join(c,
      i("ad_id") === c("ad_id") &&
        c("click_ts") >= i("imp_ts") &&
        c("click_ts") <= i("imp_ts") + expr(s"INTERVAL $horizon"))
      .select(i("ad_id"), col("campaign"), col("imp_ts"), col("click_ts"),
        (unix_millis(col("click_ts")) - unix_millis(col("imp_ts")))
          .as("latency_ms"))
  }

  /** The batch twin used by the spec's equivalence check — the same
    * join predicate with no watermarks. */
  def attributeBatch(impressions: Dataset[Impression],
                     clicks: Dataset[Click], horizon: String): DataFrame = {
    val i = impressions.toDF()
    val c = clicks.toDF()
    i.join(c,
      i("ad_id") === c("ad_id") &&
        c("click_ts") >= i("imp_ts") &&
        c("click_ts") <= i("imp_ts") + expr(s"INTERVAL $horizon"))
      .select(i("ad_id"), col("campaign"), col("imp_ts"), col("click_ts"),
        (unix_millis(col("click_ts")) - unix_millis(col("imp_ts")))
          .as("latency_ms"))
  }
}
