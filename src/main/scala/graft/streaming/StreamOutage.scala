package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming outage ("series went dark") alerts — the stream twin of
  * `EventOps.gapOutages`, and the canonical EventTimeTimeout shape: state
  * per series is ONE timestamp (last event seen); silence is detected two
  * ways, matching the batch operator's semantics exactly:
  *
  *  - a LATE-CLOSED gap: the next event finally arrives and its distance
  *    to the previous one exceeds the threshold → emit the closed gap
  *    (`gap_end` set), exactly the rows batch gapOutages produces;
  *  - an OPEN outage: no event arrives and the WATERMARK passes
  *    last_seen + threshold → the state times out and emits an open
  *    alert (`gap_end` null) — the alert a live pager needs, which a
  *    batch scan can only see after the fact. State is then kept by
  *    re-arming with the same last_seen so a later event still closes
  *    the gap upstream of deduplication.
  *
  * State is bounded by LIVE series (one timestamp each); the watermark
  * drives both detection paths, so alerts are deterministic given the
  * same closed input and watermark schedule. */
object StreamOutage {

  case class SeriesEvent(series: String, ts: Timestamp)
  case class OutageState(lastSeen: Long, openAlerted: Boolean)
  case class Outage(series: String, gap_start: Timestamp,
                    gap_end: Option[Timestamp], gap_hours: Double,
                    open: Boolean)

  def outageStream(spark: SparkSession, events: Dataset[SeriesEvent],
                   minGapHours: Double,
                   watermarkDelay: String = "10 minutes"): Dataset[Outage] = {
    import spark.implicits._
    val gapMs = (minGapHours * 3600e3).toLong
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.series)
      .flatMapGroupsWithState[OutageState, Outage](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (series: String, rows: Iterator[SeriesEvent], state: GroupState[OutageState]) =>
          if (state.hasTimedOut) {
            // silence confirmed by the watermark: open alert, once
            val st = state.get
            val out =
              if (st.openAlerted) Iterator.empty
              else Iterator(Outage(series, new Timestamp(st.lastSeen), None,
                (state.getCurrentWatermarkMs() - st.lastSeen) / 3600e3,
                open = true))
            state.update(st.copy(openAlerted = true))
            // re-arm far ahead so the state survives for a late close
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 4 * gapMs)
            out
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var last = state.getOption.map(_.lastSeen).getOrElse(Long.MinValue)
            val closed = List.newBuilder[Outage]
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (last != Long.MinValue && t - last > gapMs)
                closed += Outage(series, new Timestamp(last),
                  Some(e.ts), (t - last) / 3600e3, open = false)
              if (t > last) last = t
            }
            state.update(OutageState(last, openAlerted = false))
            state.setTimeoutTimestamp(
              math.max(last + gapMs, state.getCurrentWatermarkMs() + 1))
            closed.result().iterator
          }
      }
  }
}
