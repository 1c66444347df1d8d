package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamSmooth
import graft.streaming.StreamSmooth.{MetricEvent, Smoothed}

/** Streaming EWMA / Kalman parity with the batch operators: identical
  * values over the same closed input, across arbitrary micro-batch
  * splits — the recursion state (one/two doubles per series) must carry
  * exactly. */
class StreamSmoothSpec extends SparkSpec {
  import spark.implicits._

  private def ev(s: String, t: String, v: Double) =
    MetricEvent(s, Timestamp.valueOf(t), v)

  private val rows = Seq(
    ev("a", "2024-01-01 00:00:00", 64.76),
    ev("a", "2024-01-01 01:00:00", 41.21),
    ev("a", "2024-01-01 02:00:00", 29.44),
    ev("a", "2024-01-01 03:00:00", 50.435),
    ev("b", "2024-01-01 00:00:00", 5.0),
    ev("b", "2024-01-01 01:00:00", 8.0),
    ev("b", "2024-01-01 02:00:00", 2.0))

  private def runStream(name: String,
      f: org.apache.spark.sql.Dataset[MetricEvent] => org.apache.spark.sql.Dataset[Smoothed])
      : Map[(String, Long), Double] = {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[MetricEvent]
    val q = f(input.toDS()).writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    // three arbitrary splits — state must carry across batch boundaries
    input.addData(rows.take(2): _*)
    q.processAllAvailable()
    input.addData(rows.slice(2, 5): _*)
    q.processAllAvailable()
    input.addData(rows.drop(5): _*)
    q.processAllAvailable()
    q.stop()
    spark.table(name).as[Smoothed].collect()
      .map(s => (s.series, s.ts.getTime) -> s.y).toMap
  }

  test("streaming EWMA equals the batch recursion value-for-value") {
    val streamed = runStream("ewma_out",
      ds => StreamSmooth.ewmaStream(spark, ds, alpha = 0.25,
        // covers the whole closed input: the splits interleave series, so
        // a 0s watermark would drop series b's rows as late
        watermarkDelay = "1 day"))
    val batch = graft.operators.SeasonalOps.ewma(
        rows.toDF("event_type", "ts", "value"),
        "event_type", "ts", "value", alpha = 0.25, scoreOut = identity)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime) -> r.getDouble(3))
      .toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (k, v) =>
      assert(v == batch(k), s"$k: stream $v vs batch ${batch(k)}")
    }
  }

  test("streaming Kalman equals the batch recursion value-for-value") {
    val streamed = runStream("kalman_out",
      ds => StreamSmooth.kalmanStream(spark, ds, q = 0.5, r = 4.0,
        watermarkDelay = "1 day"))
    val batch = graft.operators.SeasonalOps.kalmanLocalLevel(
        rows.toDF("event_type", "ts", "value"),
        "event_type", "ts", "value", q = 0.5, r = 4.0, scoreOut = identity)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime) -> r.getDouble(3))
      .toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (k, v) =>
      assert(v == batch(k), s"$k: stream $v vs batch ${batch(k)}")
    }
    // the adaptive gain actually adapts: first update moves more than
    // the steady state would (sanity that we're not just testing EWMA)
    val a1 = streamed(("a", Timestamp.valueOf("2024-01-01 01:00:00").getTime))
    assert(math.abs(a1 - 52.29235294117647) < 1e-12)
  }
}
