package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state: gap-based sessionization of an event stream via
  * `flatMapGroupsWithState` — the `KeyValueGroupedDataset` stateful path the
  * reference's polling loop never needed but a production stream does
  * (SURVEY §2.11 maps it here).
  *
  * Event-time semantics throughout: a session closes when a later event of
  * the same key arrives past the idle gap, or when the WATERMARK passes the
  * session's deadline (EventTimeTimeout — deterministic under replay, unlike
  * processing-time timeouts, and bounded state: one O(1) record per open
  * key). */
object Sessionize {

  case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class Session(user_id: Long, start: Timestamp, end: Timestamp,
                     n_events: Long, sum_value: Double, closed_by: String)

  /** Batch twin of [[sessionize]]: the classic gaps-and-islands form — a
    * new session starts where the in-key gap exceeds `gapSeconds`, the
    * session index is the running count of starts, and sessions reduce with
    * one grouped aggregate. Produces the SAME session boundaries as the
    * streaming path over the same (closed) input, which the spec
    * cross-validates — the batch/stream parity a lambda-architecture
    * pipeline depends on.
    *
    * Scale shape: one window + one aggregate, both partitioned by the key —
    * a single hash shuffle of (key, ts, value), no self-join. Gap
    * arithmetic is integer microseconds (exact). Ties on ts break on
    * `orderCol` (a unique id) so the running count is total-ordered. */
  def sessionizeBatch(events: DataFrame, keyCol: String, tsCol: String,
                      valueCol: String, orderCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col("__us"), col(orderCol))
    events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__prev", lag(col("__us"), 1).over(w))
      .withColumn("__new",
        (col("__prev").isNull || col("__us") - col("__prev") > gapSeconds * 1000000L).cast("int"))
      .withColumn("session_idx",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        sum(col(valueCol)).as("sum_value"))
  }

  /** `events` must be a streaming Dataset; `watermarkDelay` bounds lateness
    * (and therefore state retention past each session's gap deadline). */
  def sessionize(spark: SparkSession, events: Dataset[SessionEvent],
                 gapSeconds: Long, watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, new Timestamp(s.start), new Timestamp(s.last),
              s.n, s.sum, "timeout"))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapSeconds * 1000 =>
                  cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1, sum = s.sum + e.value))
                case Some(s) => // gap exceeded: close and start fresh
                  closed ::= Session(user, new Timestamp(s.start), new Timestamp(s.last),
                    s.n, s.sum, "gap")
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // fire when the event-time watermark passes the gap deadline
              state.setTimeoutTimestamp(s.last + gapSeconds * 1000)
            }
            closed.reverseIterator
          }
      }
  }
}
