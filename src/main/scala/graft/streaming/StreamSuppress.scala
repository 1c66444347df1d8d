package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Alert cooldown suppression — the pager-dedup stage between a detector
  * (StreamCusum, StreamPsi, StreamOutage, the q36/q195 anomaly flags) and
  * a human: per key, emit the FIRST alert, swallow everything within
  * `cooldownMs` of the last EMITTED alert (chained from emission, not
  * from the previous alert — a continuous alert storm emits exactly one
  * page per cooldown period), and stamp each emitted alert with how many
  * were suppressed since the previous page, so the operator still sees
  * the storm's size. Out-of-order alerts older than the last emission are
  * suppressed (deterministic policy; within a micro-batch rows process in
  * (event-time, severity) order — the same tiebreak as the batch fold's
  * sorted struct(ts, severity) array, so tied-timestamp alerts page
  * identically on both paths. Parity's one edge: ties SPLIT across
  * micro-batches process in arrival order — a stream cannot retro-sort
  * rows it has already acted on).
  *
  * State per key is two numbers (last emission time + suppressed count),
  * removed by an event-time timeout after 10 cooldowns of silence.
  * [[suppressBatch]] replays the identical fold per key over the
  * collected alert array (alerts per key are detector-output-sized, not
  * event-sized) — the parity surface StreamSuppressSpec pins. */
object StreamSuppress {

  case class Alert(key: String, ts: Timestamp, severity: Double)
  case class SupState(lastEmitMs: Long, suppressed: Long)
  case class Page(key: String, ts: Timestamp, severity: Double,
                  n_suppressed_since_last: Long)

  def suppressStream(spark: SparkSession, alerts: Dataset[Alert],
                     cooldownMs: Long,
                     watermarkDelay: String = "10 minutes"): Dataset[Page] = {
    import spark.implicits._
    require(cooldownMs > 0, s"cooldown must be positive, got $cooldownMs")
    alerts
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[SupState, Page](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[Alert], state: GroupState[SupState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(SupState(Long.MinValue, 0L))
            val out = List.newBuilder[Page]
            // (ts, severity) — the SAME tiebreak as suppressBatch's
            // sort_array over struct(__t, __sev), so tied-timestamp
            // alerts emit identical pages on both paths
            rows.toSeq.sortBy(a => (a.ts.getTime, a.severity)).foreach { a =>
              val t = a.ts.getTime
              if (st.lastEmitMs == Long.MinValue || t >= st.lastEmitMs + cooldownMs) {
                out += Page(key, a.ts, a.severity, st.suppressed)
                st = SupState(t, 0L)
              } else st = st.copy(suppressed = st.suppressed + 1L)
            }
            state.update(st)
            state.setTimeoutTimestamp(math.max(
              st.lastEmitMs + 10 * cooldownMs,
              state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }

  /** The identical fold on a batch frame (one collected alert array per
    * key — alert-sized, not event-sized), for backfills and the spec's
    * stream-parity check. Returns the same Page rows. */
  def suppressBatch(alerts: DataFrame, keyCol: String, tsCol: String,
                    severityCol: String, cooldownMs: Long): DataFrame = {
    require(cooldownMs > 0, s"cooldown must be positive, got $cooldownMs")
    val collected = alerts
      .select(col(keyCol).as("key"), col(tsCol).as("__t"),
        col(severityCol).cast("double").as("__sev"))
      .groupBy("key")
      .agg(sort_array(collect_list(struct(col("__t"), col("__sev")))).as("arr"))
    // fold state: (lastEmit micros as long, suppressed, pages)
    val pages = aggregate(
      col("arr"),
      struct(lit(Long.MinValue).as("last"), lit(0L).as("sup"),
        array().cast("array<struct<t:timestamp,sev:double,nsup:bigint>>")
          .as("pages")),
      (acc, e) => {
        val t = unix_micros(e.getField("__t"))
        val emit = acc.getField("last") === Long.MinValue ||
          t >= acc.getField("last") + lit(cooldownMs * 1000L)
        struct(
          when(emit, t).otherwise(acc.getField("last")).as("last"),
          when(emit, lit(0L)).otherwise(acc.getField("sup") + 1L).as("sup"),
          when(emit, concat(acc.getField("pages"),
              array(struct(e.getField("__t").as("t"),
                e.getField("__sev").as("sev"),
                acc.getField("sup").as("nsup")))))
            .otherwise(acc.getField("pages")).as("pages"))
      },
      acc => acc.getField("pages"))
    collected
      .select(col("key"), explode(pages).as("p"))
      .select(col("key"), col("p.t").as("ts"), col("p.sev").as("severity"),
        col("p.nsup").as("n_suppressed_since_last"))
  }
}
