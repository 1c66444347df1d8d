package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamCusum
import graft.streaming.StreamCusum.MetricEvent

/** Streaming CUSUM parity with the batch operator: same alarms over the
  * same closed input, across arbitrary micro-batch splits, with O(1)
  * state per series. */
class StreamCusumSpec extends SparkSpec {
  import spark.implicits._

  private def ev(s: String, t: String, v: Double) =
    MetricEvent(s, Timestamp.valueOf(t), v)

  // drift k=10, alarm h=25: values engineered so series "a" crosses once
  // rebounds, and crosses again; "b" never alarms
  private val rows = Seq(
    ev("a", "2024-01-01 00:00:00", 12.0),
    ev("a", "2024-01-01 00:01:00", 30.0),  // S=22, C=22
    ev("a", "2024-01-01 00:02:00", 20.0),  // S=32, C=32  ALARM
    ev("a", "2024-01-01 00:03:00", 0.0),   // S=22, C=22
    ev("a", "2024-01-01 00:04:00", 25.0),  // S=37, C=37  ALARM
    ev("b", "2024-01-01 00:00:00", 5.0),
    ev("b", "2024-01-01 00:01:00", 8.0))

  private def batchAlarms: Map[String, Long] = {
    val df = rows.toDF("event_type", "ts", "value")
      .withColumn("event_id", monotonically_increasing_id())
    graft.operators.StatOps.cusum(df, "event_type", "ts", "event_id", "value",
        k = 10.0, h = 25.0, scoreOut = graft.queries.Q.dec6)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
  }

  test("stream alarms equal the batch operator's, per series") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[MetricEvent]
    val out = StreamCusum.cusumStream(spark, input.toDS(), k = 10.0, h = 25.0,
      watermarkDelay = "0 seconds")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("cusum_alarms").start()
    // feed in two arbitrary micro-batch splits — state must carry across
    input.addData(rows.take(3): _*)
    q.processAllAvailable()
    input.addData(rows.drop(3): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("cusum_alarms").as[StreamCusum.Alarm].collect()
    val bySeries = got.groupBy(_.series).view.mapValues(_.length.toLong).toMap
    val batch = batchAlarms
    assert(bySeries.getOrElse("a", 0L) == batch("a"),
      s"series a: stream ${bySeries.get("a")} vs batch ${batch("a")}")
    assert(bySeries.getOrElse("b", 0L) == batch.getOrElse("b", 0L))
    // alarm VALUES also match the batch algebra (C at the crossing rows)
    val cs = got.filter(_.series == "a").map(_.cusum).sorted
    assert(cs.length == 2 && math.abs(cs(0) - 32.0) < 1e-9 &&
      math.abs(cs(1) - 37.0) < 1e-9, s"got ${cs.toSeq}")
  }

  test("idle series state is removed by event-time timeout") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[MetricEvent]
    val out = StreamCusum.cusumStream(spark, input.toDS(), k = 10.0, h = 25.0,
      watermarkDelay = "0 seconds", idleTimeoutMs = 60_000L)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("cusum_timeout").start()
    input.addData(ev("a", "2024-01-01 00:00:00", 30.0)) // S=20, C=20 no alarm
    q.processAllAvailable()
    // watermark jumps a day: "a" times out and resets; the next "a" event
    // starts from zero state, so the SAME value alarms only if fresh
    // accumulation crosses — 30-10=20 < 25 → still no alarm
    input.addData(ev("z", "2024-01-02 00:00:00", 0.0))
    q.processAllAvailable()
    input.addData(ev("a", "2024-01-02 00:01:00", 30.0))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("cusum_timeout").isEmpty,
      "timed-out state must not leak accumulation across the idle gap")
  }
}
