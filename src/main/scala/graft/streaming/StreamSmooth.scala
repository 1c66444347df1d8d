package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming recursive smoothers — the stream twins of
  * `SeasonalOps.ewma` and `SeasonalOps.kalmanLocalLevel`: both batch
  * recursions carry O(1) state per series (EWMA: the level; Kalman: the
  * (level, P) pair), so `flatMapGroupsWithState` holds exactly that
  * record and replays the IDENTICAL fixed-order IEEE arithmetic per
  * event — StreamSmoothSpec pins value-for-value parity with the batch
  * operators over the same closed input across arbitrary micro-batch
  * splits.
  *
  * Same state discipline as [[StreamCusum]]: events fold in event-time
  * order within each micro-batch (ties broken nowhere — the batch grid
  * has one value per (series, ts) by construction; callers pre-aggregate
  * duplicates like the batch side's hourly collapse), the watermark
  * bounds cross-batch disorder, and EventTimeTimeout closes idle series
  * so state is bounded by LIVE series, not history. */
object StreamSmooth {

  case class MetricEvent(series: String, ts: Timestamp, value: Double)
  case class Smoothed(series: String, ts: Timestamp, x: Double, y: Double)

  case class EwmaState(level: Double)
  case class KalmanState(level: Double, p: Double)

  /** y_t = (1−α)·y_{t−1} + α·x_t, y_0 = x_0 — pandas
    * `ewm(adjust=False)` parity, the batch `ewma` recursion verbatim. */
  def ewmaStream(spark: SparkSession, events: Dataset[MetricEvent],
                 alpha: Double,
                 watermarkDelay: String = "10 minutes",
                 idleTimeoutMs: Long = 3600L * 1000L): Dataset[Smoothed] = {
    import spark.implicits._
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.series)
      .flatMapGroupsWithState[EwmaState, Smoothed](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (series: String, rows: Iterator[MetricEvent], state: GroupState[EwmaState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            val out = List.newBuilder[Smoothed]
            var st = state.getOption
            var lastTs = 0L
            sorted.foreach { e =>
              val y = st match {
                case None => e.value
                case Some(s) => (1.0 - alpha) * s.level + alpha * e.value
              }
              st = Some(EwmaState(y))
              out += Smoothed(series, e.ts, e.value, y)
              lastTs = e.ts.getTime
            }
            st.foreach(state.update)
            if (lastTs > 0L) state.setTimeoutTimestamp(
              math.max(lastTs + idleTimeoutMs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }

  /** Local-level Kalman: P⁺ = P + q; K = P⁺/(P⁺+r); l ← l + K(x−l);
    * P ← (1−K)P⁺; init l = x₁, P = r — the batch `kalmanLocalLevel`
    * recursion verbatim, two doubles of state per live series. */
  def kalmanStream(spark: SparkSession, events: Dataset[MetricEvent],
                   q: Double, r: Double,
                   watermarkDelay: String = "10 minutes",
                   idleTimeoutMs: Long = 3600L * 1000L): Dataset[Smoothed] = {
    import spark.implicits._
    require(q > 0 && r > 0, s"need positive variances, got q=$q r=$r")
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.series)
      .flatMapGroupsWithState[KalmanState, Smoothed](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (series: String, rows: Iterator[MetricEvent], state: GroupState[KalmanState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            val out = List.newBuilder[Smoothed]
            var st = state.getOption
            var lastTs = 0L
            sorted.foreach { e =>
              val next = st match {
                case None => KalmanState(e.value, r)
                case Some(s) =>
                  val pp = s.p + q
                  val k = pp / (pp + r)
                  KalmanState(s.level + k * (e.value - s.level), (1.0 - k) * pp)
              }
              st = Some(next)
              out += Smoothed(series, e.ts, e.value, next.level)
              lastTs = e.ts.getTime
            }
            st.foreach(state.update)
            if (lastTs > 0L) state.setTimeoutTimestamp(
              math.max(lastTs + idleTimeoutMs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }
}
