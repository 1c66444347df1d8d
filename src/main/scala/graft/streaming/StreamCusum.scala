package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM changepoint alarms — the stream twin of
  * `StatOps.cusum`, holding the SAME algebra in O(1) state per series:
  * the batch path computes C_t = S_t − min(0, min_j S_j) with two running
  * windows; here the two accumulators (prefix sum, running min) ARE the
  * state record, updated per event via `flatMapGroupsWithState`. No reset
  * on alarm, matching the batch semantics exactly — StreamCusumSpec pins
  * per-series alarm parity over the same closed input.
  *
  * Events are folded in event-time order WITHIN each micro-batch (sorted,
  * same discipline as [[Sessionize.sessionize]]); the watermark bounds
  * cross-batch disorder. EventTimeTimeout closes a series' state after
  * `idleTimeout` of event-time silence — state is bounded by LIVE series,
  * not by history. */
object StreamCusum {

  case class MetricEvent(series: String, ts: Timestamp, value: Double)
  case class CusumState(s: Double, minS: Double)
  case class Alarm(series: String, ts: Timestamp, cusum: Double)

  def cusumStream(spark: SparkSession, events: Dataset[MetricEvent],
                  k: Double, h: Double,
                  watermarkDelay: String = "10 minutes",
                  idleTimeoutMs: Long = 3600L * 1000L): Dataset[Alarm] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.series)
      .flatMapGroupsWithState[CusumState, Alarm](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (series: String, rows: Iterator[MetricEvent], state: GroupState[CusumState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(CusumState(0.0, 0.0))
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            val alarms = List.newBuilder[Alarm]
            var lastTs = 0L
            sorted.foreach { e =>
              val s = st.s + (e.value - k)
              val minS = math.min(st.minS, s)
              st = CusumState(s, minS)
              val c = s - math.min(minS, 0.0)
              if (c > h) alarms += Alarm(series, e.ts, c)
              lastTs = e.ts.getTime
            }
            state.update(st)
            // clamp to just past the watermark: a group fed only late rows
            // can see lastTs + idle already behind the global watermark, and
            // an earlier-than-watermark timeout is an IllegalArgumentException
            // that kills the whole streaming query
            if (lastTs > 0L) state.setTimeoutTimestamp(
              math.max(lastTs + idleTimeoutMs, state.getCurrentWatermarkMs() + 1))
            alarms.result().iterator
          }
      }
  }
}
