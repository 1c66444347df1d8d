package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.functions.{TDigest, VectorFunctions}
import graft.streaming.StreamSketch

/** Streaming t-digest contracts: per-window digests emitted on watermark
  * close must carry (a) EXACT total weight (n = the window's row count —
  * merge-order cannot change mass) and (b) the same rank-error bound as
  * the batch digest, across arbitrary micro-batch splits. State is
  * bounded: after the run, the aggregation store holds only the windows
  * the watermark has not yet closed. */
class StreamTDigestSpec extends SparkSpec {
  import StreamTDigestSpec.TsVal
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  // three hourly windows × ~400 values each, deterministic spread
  private val rows: Seq[TsVal] = (0 until 1200).map { i =>
    val hour = i % 3
    val minute = (i * 7) % 60
    val v = ((i.toLong * 2654435761L) % 100003L).toDouble / 100.0
    TsVal(t(f"2024-01-01 0$hour%d:$minute%02d:00"), v)
  }

  test("per-window digests: exact mass, batch-grade rank error, bounded state") {
    VectorFunctions.register(spark)
    implicit val sq = spark.sqlContext
    val input = MemoryStream[TsVal]
    val out = StreamSketch.windowedTDigest(
      input.toDS().toDF(), "ts", "v",
      windowLen = "1 hour", watermarkDelay = "1 day", delta = 200)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("tdigest_out").start()
    // arbitrary splits: state (partial digests per open window) must
    // merge across micro-batches
    input.addData(rows.take(100): _*)
    q.processAllAvailable()
    input.addData(rows.slice(100, 700): _*)
    q.processAllAvailable()
    input.addData(rows.drop(700): _*)
    q.processAllAvailable()
    // nothing emitted yet: the 1-day watermark holds every window open
    assert(spark.table("tdigest_out").count() == 0)
    // sentinel far in the future closes all three real windows
    input.addData(TsVal(t("2024-01-05 00:00:00"), 0.0))
    q.processAllAvailable()
    val emitted = spark.table("tdigest_out").collect()
      .map(r => r.getTimestamp(0).getTime ->
        (r.getLong(2), r.getAs[Array[Byte]](3))).toMap
    // bounded state: only the sentinel's still-open window remains
    val stateRows = q.lastProgress.stateOperators.apply(0).numRowsTotal
    q.stop()
    assert(emitted.size == 3, s"expected the 3 closed windows, got ${emitted.size}")
    assert(stateRows <= 2, s"state store must hold only open windows, got $stateRows")
    val byWindow = rows.groupBy(_.ts.getTime / 3600000L * 3600000L)
    byWindow.foreach { case (w, evs) =>
      val (n, digest) = emitted(w)
      assert(n == evs.size, s"window $w mass: $n vs ${evs.size}")
      val sorted = evs.map(_.v).sorted.toArray
      def rankOf(x: Double): Double =
        sorted.count(_ <= x).toDouble / sorted.length
      for (qq <- Seq(0.1, 0.5, 0.9, 0.99)) {
        val est = TDigest.quantile(digest, qq).asInstanceOf[Double]
        val err = math.abs(rankOf(est) - qq)
        assert(err < 0.015, s"window $w q=$qq est $est rank err $err")
      }
    }
    // and the batch twin agrees on mass per window (bytes may differ)
    val batch = StreamSketch.batchWindowedTDigest(
        rows.toDF(), "ts", "v", "1 hour", delta = 200)
      .collect().map(r => r.getTimestamp(0).getTime -> r.getLong(2)).toMap
    byWindow.keys.foreach { w =>
      assert(batch(w) == emitted(w)._1, s"window $w batch mass mismatch")
    }
  }
}

object StreamTDigestSpec {
  // top-level so the streaming encoder can instantiate it without an
  // outer-scope reference (the r9 fMGWS lesson)
  case class TsVal(ts: java.sql.Timestamp, v: Double)
}
