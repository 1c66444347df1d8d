package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-window heavy hitters — the stream twin of the batch
  * Misra–Gries vocabulary head (q120) and CMS frequency sketch (q126):
  * per event-time tumbling window, the top-k keys by count, emitted once
  * when the WATERMARK closes the window (append-mode-safe: top-k needs a
  * rank over a windowed count, which Structured Streaming forbids as a
  * chained aggregation — so the count table lives in flatMapGroupsWithState
  * state instead, keyed by window start).
  *
  * State per live window is a Misra–Gries summary of ≤ `capacity`
  * counters + one decrement total — O(capacity), NOT O(distinct keys):
  * when a new key finds the summary full, every counter decrements by 1
  * (the classic frequent-items step) and the shed mass accumulates in
  * `dec`. The emitted `min_count` is the surviving counter (a LOWER
  * bound on the true count), `max_count = min_count + dec` the upper
  * bound; with capacity ≥ the window's distinct-key count, dec = 0 and
  * the counts are exact — the parity surface StreamTopKSpec pins against
  * the batch groupBy/rank. Any key with true count > dec is guaranteed
  * present (the Misra–Gries frequent-items guarantee), so a capacity of
  * k/θ catches every key above share θ. */
object StreamTopK {

  case class KeyedEvent(ts: Timestamp, key: String)
  case class TopKState(counts: Map[String, Long], dec: Long, n: Long)
  case class WindowTopK(window_start: Timestamp, rank: Int, key: String,
                        min_count: Long, max_count: Long, n_events: Long)

  private def mgFold(st: TopKState, key: String, capacity: Int): TopKState = {
    val c = st.counts
    if (c.contains(key))
      st.copy(counts = c.updated(key, c(key) + 1L), n = st.n + 1)
    else if (c.size < capacity)
      st.copy(counts = c.updated(key, 1L), n = st.n + 1)
    else {
      // full: decrement everything (dropping zeros) — the new key's single
      // occurrence is shed along with one count of each survivor
      val dec = c.iterator.map { case (k2, v) => k2 -> (v - 1L) }
        .filter(_._2 > 0L).toMap
      TopKState(dec, st.dec + 1L, st.n + 1)
    }
  }

  def topKStream(spark: SparkSession, events: Dataset[KeyedEvent],
                 windowMs: Long, k: Int, capacity: Int,
                 watermarkDelay: String = "10 minutes"): Dataset[WindowTopK] = {
    import spark.implicits._
    require(windowMs > 0 && k >= 1 && capacity >= k,
      s"need windowMs > 0, 1 <= k <= capacity; got $windowMs, $k, $capacity")
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => e.ts.getTime - Math.floorMod(e.ts.getTime, windowMs))
      .flatMapGroupsWithState[TopKState, WindowTopK](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wStart: Long, rows: Iterator[KeyedEvent], state: GroupState[TopKState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            st.counts.toSeq
              .sortBy { case (key, c) => (-c, key) }
              .take(k).zipWithIndex.iterator
              .map { case ((key, c), i) =>
                WindowTopK(new Timestamp(wStart), i + 1, key, c, c + st.dec, st.n)
              }
          } else {
            var st = state.getOption.getOrElse(TopKState(Map.empty, 0L, 0L))
            rows.foreach(e => st = mgFold(st, e.key, capacity))
            state.update(st)
            // finalize when the watermark passes the window end
            state.setTimeoutTimestamp(
              math.max(wStart + windowMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }
}
