package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamTopK
import graft.streaming.StreamTopK.KeyedEvent

/** Streaming heavy hitters: exact parity with the batch groupBy/rank when
  * capacity covers the distinct keys, Misra–Gries bounds + guaranteed
  * survival of the dominant key under a tight capacity, and window
  * isolation across micro-batch splits. */
class StreamTopKSpec extends SparkSpec {
  import spark.implicits._

  private def e(t: String, k: String) = KeyedEvent(Timestamp.valueOf(t), k)

  // window 1 (00:xx): a=4, b=2, c=1; window 2 (01:xx): c=3, a=1
  private val rows = Seq(
    e("2024-01-01 00:05:00", "a"), e("2024-01-01 00:06:00", "b"),
    e("2024-01-01 00:10:00", "a"), e("2024-01-01 00:12:00", "c"),
    e("2024-01-01 00:20:00", "a"), e("2024-01-01 00:25:00", "b"),
    e("2024-01-01 00:40:00", "a"),
    e("2024-01-01 01:05:00", "c"), e("2024-01-01 01:10:00", "c"),
    e("2024-01-01 01:20:00", "a"), e("2024-01-01 01:25:00", "c"))

  private def run(k: Int, capacity: Int): Array[StreamTopK.WindowTopK] = {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val out = StreamTopK.topKStream(spark, input.toDS(), windowMs = 3600000L,
      k = k, capacity = capacity, watermarkDelay = "0 seconds")
    val name = s"topk_${k}_$capacity"
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    input.addData(rows.take(5): _*)
    q.processAllAvailable()
    input.addData(rows.drop(5): _*)
    input.addData(e("2024-01-01 03:00:00", "z")) // watermark past both windows
    q.processAllAvailable()
    q.stop()
    spark.table(name).as[StreamTopK.WindowTopK].collect()
  }

  test("capacity >= distinct keys: exact parity with the batch top-k") {
    val got = run(k = 2, capacity = 8)
      .map(r => (r.window_start.toString, r.rank) -> (r.key, r.min_count, r.max_count))
      .toMap
    assert(got(("2024-01-01 00:00:00.0", 1)) == ("a", 4L, 4L), s"$got")
    assert(got(("2024-01-01 00:00:00.0", 2)) == ("b", 2L, 2L))
    assert(got(("2024-01-01 01:00:00.0", 1)) == ("c", 3L, 3L))
    assert(got(("2024-01-01 01:00:00.0", 2)) == ("a", 1L, 1L))
    // batch twin on the same closed input agrees row-for-row
    val batch = rows.toDS()
      .groupBy(window(col("ts"), "1 hour").getField("start").as("ws"), col("key"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getLong(2))
      .toMap
    got.foreach { case ((ws, _), (key, mn, _)) =>
      assert(batch((ws, key)) == mn, s"batch disagrees on ($ws, $key)")
    }
  }

  test("tight capacity: bounds hold and the dominant key survives") {
    val w1 = run(k = 2, capacity = 2)
      .filter(_.window_start.toString == "2024-01-01 00:00:00.0")
    // Misra-Gries guarantee: a (4 of 7, > dec) must survive; counts bound truth
    val a = w1.find(_.key == "a")
    assert(a.isDefined, s"dominant key evicted: ${w1.toSeq}")
    assert(a.get.min_count <= 4L && 4L <= a.get.max_count,
      s"bounds [${a.get.min_count}, ${a.get.max_count}] miss true count 4")
    assert(w1.forall(_.n_events == 7L))
  }

  test("late rows within the watermark still count; state is per window") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val out = StreamTopK.topKStream(spark, input.toDS(), windowMs = 3600000L,
      k = 1, capacity = 8, watermarkDelay = "30 minutes")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("topk_late").start()
    input.addData(e("2024-01-01 00:05:00", "a"), e("2024-01-01 01:05:00", "b"))
    q.processAllAvailable()
    // 00:50 is LATE relative to 01:05 but inside the 30 min delay: must count
    input.addData(e("2024-01-01 00:50:00", "a"))
    input.addData(e("2024-01-01 04:00:00", "z"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("topk_late").as[StreamTopK.WindowTopK].collect()
      .map(r => r.window_start.toString -> r.min_count).toMap
    assert(got("2024-01-01 00:00:00.0") == 2L, s"late row lost: $got")
  }
}
