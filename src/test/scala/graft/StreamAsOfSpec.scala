package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamAsOf
import graft.streaming.StreamAsOf.{AsOfMatch, TaggedRow}
import graft.operators.TimeSeriesOps

/** Streaming as-of join: probes answered by the latest reference row at or
  * before them, emitted only once the watermark makes them final — proved
  * equal to the batch as-of on the same closed input, including a late
  * reference row that arrives in a later micro-batch. */
class StreamAsOfSpec extends SparkSpec {
  import spark.implicits._

  private def row(k: Long, t: String, v: Double, ref: Boolean) =
    TaggedRow(k, Timestamp.valueOf(t), v, ref)

  private def runBatches(name: String, batches: Seq[Seq[TaggedRow]],
                         lateness: String = "0 seconds",
                         refTtlMs: Long = Long.MaxValue): Map[(Long, String), Option[Double]] = {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[TaggedRow]
    val out = StreamAsOf.asofStream(spark,
      input.toDS().withWatermark("ts", lateness), refTtlMs)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    // advance the watermark past everything so buffered probes drain
    input.addData(row(999L, "2030-01-01 00:00:00", 0.0, ref = true))
    q.processAllAvailable()
    input.addData(row(999L, "2031-01-01 00:00:00", 0.0, ref = true))
    q.processAllAvailable()
    q.stop()
    spark.table(name).as[AsOfMatch].collect()
      .filter(_.key != 999L)
      .map(m => (m.key, m.ts.toString) -> m.value).toMap
  }

  test("matches the batch as-of, probes before any ref get null") {
    val refs = Seq(
      (1L, "2024-01-01 10:00:00", 10.0), (1L, "2024-01-01 10:30:00", 30.0),
      (2L, "2024-01-01 09:00:00", 9.0))
    val probes = Seq(
      (1L, "2024-01-01 09:59:59"), (1L, "2024-01-01 10:00:00"),
      (1L, "2024-01-01 10:29:59"), (1L, "2024-01-01 11:00:00"),
      (2L, "2024-01-01 09:30:00"))
    val batch1 = refs.map(r => row(r._1, r._2, r._3, ref = true)) ++
      probes.map(p => row(p._1, p._2, 0.0, ref = false))
    val got = runBatches("asof_stream_1", Seq(batch1))
    // batch oracle: same rows through the union-window as-of
    val refDf = refs.toDF("key", "ts", "value").withColumn("ts", col("ts").cast("timestamp"))
    val probeDf = probes.toDF("key", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val want = TimeSeriesOps.asofJoinLast(probeDf, refDf, Seq("key"), "ts", "ts", Seq("value"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(got == want)
    assert(got((1L, "2024-01-01 09:59:59.0")).isEmpty, "probe before any ref is null")
    assert(got((1L, "2024-01-01 10:00:00.0")).contains(10.0), "at-or-before is inclusive")
  }

  test("a late reference row still answers a buffered probe (watermark discipline)") {
    // batch 1: the probe arrives FIRST; with 2 minutes allowed lateness the
    // watermark after this batch is 10:03, which has NOT passed the probe
    // (10:05) — it must be buffered, not emitted
    val b1 = Seq(row(1L, "2024-01-01 10:05:00", 0.0, ref = false),
      row(1L, "2024-01-01 10:00:00", 5.0, ref = true))
    // batch 2: a ref BETWEEN the first ref and the probe arrives late but
    // within the lateness bound (10:04 >= wm 10:03, so not dropped); the
    // buffered probe's answer must be this row, not the earlier one
    val b2 = Seq(row(1L, "2024-01-01 10:04:00", 44.0, ref = true))
    val got = runBatches("asof_stream_2", Seq(b1, b2), lateness = "2 minutes")
    assert(got((1L, "2024-01-01 10:05:00.0")).contains(44.0),
      s"late ref must answer the buffered probe: $got")
  }

  test("ref TTL: an expired survivor no longer answers, a live one does") {
    // ref at 09:00; watermark driven to 11:00 by a noise key; with a 1 h
    // TTL the survivor expired at 10:00, so the 11:30 probe gets null —
    // and the same scenario WITHOUT a TTL (separate run) still answers
    val b1 = Seq(row(1L, "2024-01-01 09:00:00", 7.0, ref = true))
    val b2 = Seq(row(50L, "2024-01-01 11:00:00", 0.0, ref = true))
    val b3 = Seq(row(1L, "2024-01-01 11:30:00", 0.0, ref = false))
    val ttl = runBatches("asof_stream_ttl", Seq(b1, b2, b3), refTtlMs = 3600 * 1000L)
    assert(ttl((1L, "2024-01-01 11:30:00.0")).isEmpty,
      s"expired ref must not answer: $ttl")
    val noTtl = runBatches("asof_stream_nottl", Seq(b1, b2, b3))
    assert(noTtl((1L, "2024-01-01 11:30:00.0")).contains(7.0),
      s"unbounded retention must answer: $noTtl")
  }

  test("state prunes below the watermark but keeps the newest older ref") {
    // refs at 09:00 and 09:30; watermark advances to 10:00 via a noise key;
    // a probe at 10:30 must still be answered by the 09:30 ref even though
    // both refs are below the watermark by then
    val b1 = Seq(row(1L, "2024-01-01 09:00:00", 1.0, ref = true),
      row(1L, "2024-01-01 09:30:00", 2.0, ref = true))
    val b2 = Seq(row(50L, "2024-01-01 10:00:00", 0.0, ref = true)) // advance wm
    val b3 = Seq(row(1L, "2024-01-01 10:30:00", 0.0, ref = false))
    val got = runBatches("asof_stream_3", Seq(b1, b2, b3))
    assert(got((1L, "2024-01-01 10:30:00.0")).contains(2.0),
      s"survivor ref below the watermark must answer: $got")
  }
}
