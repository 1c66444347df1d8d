package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamDedup
import graft.streaming.StreamDedup.{DedupRec, Doc}

/** Streaming exact dedup (the q54 stage as a continuous operator):
  * first-wins passes exactly one row per key; the manifest emits on
  * watermark close with the min-(ts, payload) "first" and the duplicate
  * count, and replays identically on the batch twin across out-of-order
  * arrivals and micro-batch splits. */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  // key a: 3 arrivals OUT OF ORDER (the true first arrives second);
  // key b: a tied-timestamp pair — payload order must decide "first";
  // key c: a singleton
  private val rows = Seq(
    Doc("a", t("2024-01-01 00:10:00"), "a-late"),
    Doc("a", t("2024-01-01 00:00:00"), "a-first"),
    Doc("a", t("2024-01-01 00:20:00"), "a-later"),
    // b sits strictly ABOVE batch 1's closing watermark (00:05) — rows
    // at/behind the watermark are dropped as late before the operator
    Doc("b", t("2024-01-01 00:06:00"), "b2"),
    Doc("b", t("2024-01-01 00:06:00"), "b1"),
    Doc("c", t("2024-01-01 00:07:00"), "c-only"))

  test("firstWins emits exactly one row per key") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamDedup.firstWins(input.toDS(), "10 minutes")
      .writeStream.format("memory").queryName("dedup_fw")
      .outputMode("append").start()
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_fw").collect()
    assert(got.map(_.getString(0)).sorted.toSeq == Seq("a", "b", "c"),
      s"one row per key, got ${got.mkString(",")}")
  }

  test("manifest emits on watermark close and matches the batch twin exactly") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamDedup.manifestStream(spark, input.toDS(),
        watermarkDelay = "5 minutes", closeDelayMs = 600000L)
      .writeStream.format("memory").queryName("dedup_mf")
      .outputMode("append").start()
    // split across micro-batches so state carries between batches
    input.addData(rows.take(2): _*)
    q.processAllAvailable()
    input.addData(rows.drop(2): _*)
    q.processAllAvailable()
    assert(spark.table("dedup_mf").count() == 0, "horizon still open")
    // sentinel advances the watermark past every close timestamp
    input.addData(Doc("zz", t("2024-01-02 00:00:00"), "sentinel"))
    q.processAllAvailable()
    val stateRows = q.lastProgress.stateOperators.apply(0).numRowsTotal
    q.stop()
    val streamed = spark.table("dedup_mf").as[DedupRec].collect()
      .map(r => r.key -> ((r.first_ts, r.payload, r.n_dups))).toMap
    assert(streamed.keySet == Set("a", "b", "c"))
    assert(streamed("a") == ((t("2024-01-01 00:00:00"), "a-first", 2L)),
      s"out-of-order true first must win: ${streamed("a")}")
    assert(streamed("b") == ((t("2024-01-01 00:06:00"), "b1", 1L)),
      s"tied ts resolves by payload: ${streamed("b")}")
    assert(streamed("c") == ((t("2024-01-01 00:07:00"), "c-only", 0L)))
    assert(stateRows <= 1, s"only the sentinel key may remain open: $stateRows")
    val batch = StreamDedup.manifestBatch(rows.toDF(), "key", "ts", "payload")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getTimestamp(1), r.getString(2), r.getLong(3)))).toMap
    assert(batch == streamed, s"stream/batch manifests differ:\n$batch\n$streamed")
  }
}
