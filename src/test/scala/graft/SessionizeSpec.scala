package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Sessionize
import graft.streaming.Sessionize.SessionEvent

/** Gap-based sessionization over a memory stream: sessions split on the
  * idle gap, and open sessions close when the event-time watermark passes
  * their deadline. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ev(u: Long, t: String, v: Double) =
    SessionEvent(u, Timestamp.valueOf(t), v)

  test("sessions split on the gap and idle sessions time out via watermark") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    input.addData(
      ev(1, "2024-01-01 10:00:00", 1.0),
      ev(1, "2024-01-01 10:05:00", 2.0),
      ev(1, "2024-01-01 11:30:00", 5.0),  // > 30 min gap: closes burst 1
      ev(2, "2024-01-01 09:00:00", 7.0))
    val out = Sessionize.sessionize(spark, input.toDS(), gapSeconds = 1800,
      watermarkDelay = "0 seconds")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("sessions").start()
    q.processAllAvailable()
    // advance the watermark far past every deadline, then run another batch
    // so timed-out state fires
    input.addData(ev(99, "2024-01-02 00:00:00", 0.0))
    q.processAllAvailable()
    input.addData(ev(99, "2024-01-03 00:00:00", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions").as[Sessionize.Session].collect()
      .map(s => (s.user_id, s.start.toString, s.n_events, s.sum_value, s.closed_by)).toSet
    assert(got.contains((1L, "2024-01-01 10:00:00.0", 2L, 3.0, "gap")))
    assert(got.contains((1L, "2024-01-01 11:30:00.0", 1L, 5.0, "timeout")))
    assert(got.contains((2L, "2024-01-01 09:00:00.0", 1L, 7.0, "timeout")))
  }

  test("batch sessionize produces the same session boundaries as the stream") {
    val rows = Seq(
      ev(1, "2024-01-01 10:00:00", 1.0),
      ev(1, "2024-01-01 10:05:00", 2.0),
      ev(1, "2024-01-01 11:30:00", 5.0),
      ev(2, "2024-01-01 09:00:00", 7.0),
      ev(2, "2024-01-01 09:20:00", 1.5),
      ev(2, "2024-01-02 09:00:00", 4.0))
    // streaming over the closed input: all sessions eventually close
    implicit val sq = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    input.addData(rows: _*)
    val out = Sessionize.sessionize(spark, input.toDS(), gapSeconds = 1800,
      watermarkDelay = "0 seconds")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("sessions_xval").start()
    q.processAllAvailable()
    input.addData(ev(99, "2024-02-01 00:00:00", 0.0))
    q.processAllAvailable()
    input.addData(ev(99, "2024-03-01 00:00:00", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sessions_xval").as[Sessionize.Session].collect()
      .filter(_.user_id != 99)
      .map(s => (s.user_id, s.start.toString, s.end.toString, s.n_events, s.sum_value))
      .toSet
    // batch over the same rows, ids synthesized for the tie-break column
    val df = rows.zipWithIndex
      .map { case (e, i) => (e.user_id, e.ts, e.value, i.toLong) }
      .toDF("user_id", "ts", "value", "event_id")
    val batch = Sessionize.sessionizeBatch(df, "user_id", "ts", "value", "event_id",
        gapSeconds = 1800)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(3).toString, r.getTimestamp(4).toString,
        r.getLong(2), r.getDouble(5)))
      .toSet
    assert(batch == streamed)
  }
}
