package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamIntervalJoin
import graft.streaming.StreamIntervalJoin.{Click, Impression}

/** Native stream-stream interval join (attribution): the streamed match
  * set must equal the batch join on the same closed input, across
  * micro-batch splits with out-of-order arrivals; the horizon bound
  * must exclude late clicks; join state must not grow unboundedly
  * (watermark-derived cleanup evicts closed impressions/clicks). */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private val imps = Seq(
    Impression(1L, t("2024-01-01 00:00:00"), "camp-a"),
    Impression(1L, t("2024-01-01 01:00:00"), "camp-b"),
    Impression(2L, t("2024-01-01 00:30:00"), "camp-a"),
    Impression(3L, t("2024-01-01 00:10:00"), "camp-c")) // never clicked

  private val clicks = Seq(
    Click(1L, t("2024-01-01 00:20:00")),  // within 30m of camp-a imp only
    Click(1L, t("2024-01-01 01:05:00")),  // within 30m of camp-b imp only
    Click(2L, t("2024-01-01 01:30:00")),  // 60m after camp-a imp: OUTSIDE horizon
    Click(2L, t("2024-01-01 00:45:00")))  // within horizon, arrives late

  test("streamed matches == batch join, across splits and disorder") {
    implicit val sq = spark.sqlContext
    val si = MemoryStream[Impression]
    val sc = MemoryStream[Click]
    val q = StreamIntervalJoin.attribute(si.toDS(), sc.toDS(),
        horizon = "30 minutes", watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("attr_join")
      .outputMode("append").start()
    // batch 1: first two impressions + one click; batch 2: the rest,
    // with the in-horizon ad-2 click arriving AFTER the out-of-horizon
    // one (disorder across batches)
    si.addData(imps.take(2): _*)
    sc.addData(clicks.take(1): _*)
    q.processAllAvailable()
    si.addData(imps.drop(2): _*)
    sc.addData(clicks.drop(1): _*)
    q.processAllAvailable()
    // sentinels push both watermarks past every horizon close
    si.addData(Impression(99L, t("2024-01-02 00:00:00"), "zz"))
    sc.addData(Click(99L, t("2024-01-02 00:00:01")))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("attr_join")
      .select("ad_id", "campaign", "imp_ts", "click_ts", "latency_ms")
      .collect().map(_.toString).sorted.toSeq
    val batch = StreamIntervalJoin.attributeBatch(
        (imps :+ Impression(99L, t("2024-01-02 00:00:00"), "zz")).toDS(),
        (clicks :+ Click(99L, t("2024-01-02 00:00:01"))).toDS(),
        horizon = "30 minutes")
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    // the horizon bound held: ad 2's 01:30 click attributed to nothing
    assert(!streamed.exists(_.contains("01:30:00")), streamed.mkString(";"))
    // ad 3's unclicked impression emitted nothing (inner join)
    assert(!streamed.exists(_.startsWith("[3,")), streamed.mkString(";"))
  }

  test("horizon matches expected attribution pairs exactly") {
    val batch = StreamIntervalJoin.attributeBatch(imps.toDS(), clicks.toDS(),
        horizon = "30 minutes")
      .select("campaign", "latency_ms")
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    // camp-a/ad1: 20m; camp-b/ad1: 5m; camp-a/ad2: 15m (the late-arriving
    // in-horizon click); the 60m click joins nothing
    assert(batch == Seq(("camp-a", 900000L), ("camp-a", 1200000L),
      ("camp-b", 300000L)), batch.mkString(","))
  }
}
