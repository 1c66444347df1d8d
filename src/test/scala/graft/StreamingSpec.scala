package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

case class Ev(ts: Timestamp, event_type: String, value: Double)

/** Streaming twin (§2.11): the hourly windowed aggregate over a memory
  * stream must equal the batch downsample over the same rows. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("hourlyAggStream over MemoryStream equals batch downsample") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val rows = Seq(
      Ev(Timestamp.valueOf("2024-01-01 00:10:00"), "click", 10.0),
      Ev(Timestamp.valueOf("2024-01-01 00:40:00"), "click", 20.0),
      Ev(Timestamp.valueOf("2024-01-01 01:05:00"), "click", 30.0),
      Ev(Timestamp.valueOf("2024-01-01 00:20:00"), "error", 1.0))
    input.addData(rows: _*)
    val q = StreamingOps.runToMemory(
      StreamingOps.hourlyAggStream(input.toDF(), watermark = "0 seconds"), "hourly_out")
    // append mode emits only watermark-closed windows; push the watermark
    input.addData(Ev(Timestamp.valueOf("2024-01-01 05:00:00"), "click", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("hourly_out")
      .select("ts", "event_type", "n", "avg_value")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val expected = Set(
      ("2024-01-01 00:00:00.0", "click", 2L, 15.0),
      ("2024-01-01 00:00:00.0", "error", 1L, 1.0),
      ("2024-01-01 01:00:00.0", "click", 1L, 30.0))
    assert(expected.subsetOf(got))
  }
}
