package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{Sessionize, StreamSessionWindow}
import graft.streaming.Sessionize.SessionEvent

/** Native session_window aggregation: the streamed session set must
  * equal BOTH the batch-native run and sessionizeBatch's gaps-and-
  * islands pass on the same closed input, across micro-batch splits
  * with out-of-order arrivals; a session must emit only once its gap
  * deadline passes the watermark (append finalization). */
class StreamSessionSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  // gap 30 min; user 1: two sessions (09:00-09:25 with three events, a
  // single-event session at 11:00); user 2: one session whose events
  // arrive out of order across batches. No inter-event gap sits exactly
  // on the 30-minute boundary (the documented native-vs-batch edge).
  private val evs = Seq(
    SessionEvent(1L, t("2024-01-01 09:00:00"), 1.0),
    SessionEvent(1L, t("2024-01-01 09:10:00"), 2.0),
    SessionEvent(1L, t("2024-01-01 09:25:00"), 4.0),
    SessionEvent(1L, t("2024-01-01 11:00:00"), 8.0),
    SessionEvent(2L, t("2024-01-01 09:05:00"), 16.0),
    SessionEvent(2L, t("2024-01-01 09:20:00"), 32.0))

  private def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(r => Seq(r.get(0), r.get(1), r.get(2), r.get(3), r.get(4))
      .mkString("|")).sorted.toSeq

  test("streamed sessions == batch-native == sessionizeBatch, across splits and disorder") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[SessionEvent]
    val q = StreamSessionWindow.sessions(ms.toDF(), "user_id", "ts",
        "value", gap = "30 minutes", watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("native_sessions")
      .outputMode("append").start()
    // batch 1 delivers user 2's LATER event first (disorder), batch 2
    // the rest; the sentinel pushes the watermark past every deadline
    ms.addData(evs(0), evs(5))
    q.processAllAvailable()
    val early = spark.table("native_sessions").count()
    ms.addData(evs(1), evs(4), evs(2), evs(3))
    q.processAllAvailable()
    ms.addData(SessionEvent(99L, t("2024-01-02 00:00:00"), 0.0))
    q.processAllAvailable()
    q.stop()
    // nothing finalized while the watermark sat before the deadlines
    assert(early == 0L, s"sessions must not emit before their close: $early")
    val streamed = canon(spark.table("native_sessions")
      .filter($"user_id" =!= 99L).collect())
    val all = evs :+ SessionEvent(99L, t("2024-01-02 00:00:00"), 0.0)
    val batchNative = canon(StreamSessionWindow.sessions(all.toDF(),
        "user_id", "ts", "value", gap = "30 minutes",
        watermarkDelay = "5 minutes")
      .filter($"user_id" =!= 99L).collect())
    val gapsIslands = canon(Sessionize.sessionizeBatch(all.toDF(),
        "user_id", "ts", "value", orderCol = "value", gapSeconds = 1800L)
      .filter($"user_id" =!= 99L)
      .select("user_id", "session_start", "session_end", "n_events",
        "sum_value")
      .collect())
    assert(streamed == batchNative, s"stream $streamed vs native $batchNative")
    assert(streamed == gapsIslands, s"stream $streamed vs batch $gapsIslands")
    // the expected partition: (1: 09:00-09:25 n=3 sum=7), (1: 11:00
    // singleton), (2: 09:05-09:20 n=2 sum=48)
    assert(streamed.size == 3, streamed.mkString(";"))
    assert(streamed.exists(s => s.startsWith("1|") && s.endsWith("|3|7.0")))
    assert(streamed.exists(s => s.startsWith("1|") && s.endsWith("|1|8.0")))
    assert(streamed.exists(s => s.startsWith("2|") && s.endsWith("|2|48.0")))
  }
}
