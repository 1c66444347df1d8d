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

  test("dedupStream keeps the first arrival per fingerprint, bounded by watermark") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Doc]
    input.addData(
      Doc(Timestamp.valueOf("2024-01-01 00:00:10"), "fpA", 1L),
      Doc(Timestamp.valueOf("2024-01-01 00:00:20"), "fpA", 2L), // dup within watermark
      Doc(Timestamp.valueOf("2024-01-01 00:00:30"), "fpB", 3L))
    val q = graft.streaming.StreamingOps.dedupStream(input.toDF(), "fp", "ts", "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    q.processAllAvailable()
    input.addData(Doc(Timestamp.valueOf("2024-01-01 00:01:00"), "fpA", 4L)) // still a dup
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_out").select("fp", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("fpA", 1L), ("fpB", 3L)))
  }

  test("corpusCleanStream applies the batch quality filter and dedups by fingerprint") {
    import java.sql.Timestamp
    implicit val sq = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val longText = ("tok " * 25).trim            // 25 tokens, no stopwords
    val stopsText = ("the " * 30).trim           // all stopwords: filtered
    val shortText = "too short"                  // < 20 tokens: filtered
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Timestamp)]
    input.addData(
      (1L, longText, t0), (2L, shortText, t0), (3L, stopsText, t0),
      (4L, longText, t0), // exact dup of 1 -> exactly one of {1,4} survives
      (5L, longText + " unique", t0))
    val stream = graft.streaming.StreamingOps.corpusCleanStream(
      input.toDS().toDF("doc_id", "text", "ts"), "ts")
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("clean_stream").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("clean_stream").select("doc_id", "fp").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // quality filter: 2 and 3 are gone; dedup: one survivor per fingerprint
    assert(got.map(_._1).toSet.subsetOf(Set(1L, 4L, 5L)))
    assert(got.map(_._2).distinct.length == got.length)
    assert(got.length == 2) // {1|4} and 5
    // batch parity: the same rows survive the batch cascade (modulo which
    // member of an exact-dup group represents it)
    val batchFps = {
      import spark.implicits._
      val df = Seq((1L, longText), (2L, shortText), (3L, stopsText),
        (4L, longText), (5L, longText + " unique")).toDF("doc_id", "text")
      val stop = Seq("a", "the", "and", "of", "in", "to")
      df.withColumn("t", graft.operators.TextOps.tokens(col("text")))
        .filter(size(col("t")) >= 20 &&
          graft.operators.TextOps.markerCount(col("t"), stop) / size(col("t")) < 0.5)
        .select(graft.operators.TextOps.fingerprint(col("text")).as("fp"))
        .distinct().as[String].collect().toSet
    }
    assert(got.map(_._2).toSet == batchFps)
  }

  test("zoneAlertStream emits only triggered rows with the batch rule columns") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[ZoneRow]
    input.addData(
      ZoneRow(Timestamp.valueOf("2024-01-01 00:00:00"), 760.0, 780.0, 810.0), // quiet
      ZoneRow(Timestamp.valueOf("2024-01-01 01:00:00"), 700.0, 700.0, 700.0)) // 3 low
    val q = graft.streaming.StreamingOps.zoneAlertStream(
        input.toDF().toDF("ts", "ZONE_0", "ZONE_1", "ZONE_2"))
      .writeStream.outputMode("append").format("memory").queryName("alerts_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("alerts_out").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Int]("zones_low") == 3)
    assert(r.getAs[Int]("most_affected_zone") == 2) // deepest drop: 800-700
    assert(r.getAs[Double]("temp_risk_normalized") == 3.0 / 8.0)
  }
  test("followWithinStream equals the batch range join and evicts by watermark") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[ClickE]
    val buys = MemoryStream[BuyE]
    val clickRows = Seq(
      ClickE(1L, Timestamp.valueOf("2024-01-01 00:00:00")),
      ClickE(2L, Timestamp.valueOf("2024-01-01 00:00:30")))
    val buyRows = Seq(
      BuyE(1L, Timestamp.valueOf("2024-01-01 00:03:00"), 10.0), // within 5 min
      BuyE(1L, Timestamp.valueOf("2024-01-01 00:09:00"), 20.0), // outside 5 min
      BuyE(2L, Timestamp.valueOf("2024-01-01 00:01:00"), 30.0), // within
      BuyE(3L, Timestamp.valueOf("2024-01-01 00:02:00"), 40.0)) // no click
    clicks.addData(clickRows: _*)
    buys.addData(buyRows: _*)
    val joined = StreamingOps.followWithinStream(
      clicks.toDF(), buys.toDF(), "user_id", "c_ts", "b_ts", "10 minutes", "5 minutes")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("follow_out").start()
    q.processAllAvailable()
    // push both watermarks past every row so inner-join results flush
    // (distinct users so the pushers cannot join with each other)
    clicks.addData(ClickE(98L, Timestamp.valueOf("2024-01-01 02:00:00")))
    buys.addData(BuyE(99L, Timestamp.valueOf("2024-01-01 02:00:00"), 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("follow_out").select("user_id", "amount")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    // batch twin over the same rows
    import spark.implicits._
    val expected = clickRows.toDF().join(buyRows.toDF(),
        Seq("user_id")).filter($"b_ts" >= $"c_ts" &&
        $"b_ts" <= $"c_ts" + org.apache.spark.sql.functions.expr("INTERVAL 5 minutes"))
      .select("user_id", "amount")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == expected)
    assert(got == Set((1L, 10.0), (2L, 30.0)))
  }
}

case class Doc(ts: java.sql.Timestamp, fp: String, doc_id: Long)
case class ZoneRow(ts: java.sql.Timestamp, z0: Double, z1: Double, z2: Double)
case class ClickE(user_id: Long, c_ts: java.sql.Timestamp)
case class BuyE(user_id: Long, b_ts: java.sql.Timestamp, amount: Double)
