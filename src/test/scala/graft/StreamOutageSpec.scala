package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamOutage
import graft.streaming.StreamOutage.{Outage, SeriesEvent}

/** Streaming outage alerts: closed gaps match the batch gapOutages rows
  * over the same closed input (across micro-batch splits), and a
  * watermark-confirmed silence raises exactly one open alert. */
class StreamOutageSpec extends SparkSpec {
  import spark.implicits._

  private def ev(s: String, t: String) = SeriesEvent(s, Timestamp.valueOf(t))

  // series a: 3h silent gap between 01:00 and 04:00 (closed by the 04:00
  // event); series b: steady then goes dark after 02:00
  private val rows = Seq(
    ev("a", "2024-01-01 00:00:00"), ev("a", "2024-01-01 01:00:00"),
    ev("a", "2024-01-01 04:00:00"), ev("a", "2024-01-01 04:30:00"),
    ev("b", "2024-01-01 00:30:00"), ev("b", "2024-01-01 02:00:00"))

  test("closed gaps equal the batch operator; silence raises one open alert") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[SeriesEvent]
    val out = StreamOutage.outageStream(spark, input.toDS(), minGapHours = 2.0,
      watermarkDelay = "0 seconds")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("outages").start()
    input.addData(rows.take(2): _*)
    q.processAllAvailable()
    input.addData(rows.drop(2): _*)
    q.processAllAvailable()
    // advance the watermark far past b's last event → open alert for b
    input.addData(ev("a", "2024-01-01 09:00:00"))
    q.processAllAvailable()
    // one more batch so the timeout fires under the advanced watermark
    input.addData(ev("a", "2024-01-01 09:05:00"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("outages").as[Outage].collect()
    val closed = got.filter(!_.open)
    // batch twin on the same closed input (plus the watermark-driver rows)
    val batchRows = (rows :+ ev("a", "2024-01-01 09:00:00") :+
      ev("a", "2024-01-01 09:05:00")).toDF("event_type", "ts")
    val batch = graft.operators.EventOps.gapOutages(batchRows, "event_type",
        "ts", minGapHours = 2.0, graft.queries.Q.dec6)
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2)))
    assert(closed.map(o => (o.series, o.gap_start, o.gap_end.get)).toSet ==
      batch.toSet,
      s"closed gaps diverge: stream ${closed.toSeq} vs batch ${batch.toSeq}")
    // series b went dark at 02:00; watermark reached 09:05 → exactly one
    // open alert, anchored at the last sighting
    val open = got.filter(_.open)
    assert(open.length == 1, s"expected one open alert, got ${open.toSeq}")
    assert(open.head.series == "b" &&
      open.head.gap_start == Timestamp.valueOf("2024-01-01 02:00:00"))
    assert(open.head.gap_hours >= 2.0)
  }
}
