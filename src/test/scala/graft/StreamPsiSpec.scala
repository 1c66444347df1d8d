package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamPsi

private[graft] case class PsiM(ts: Timestamp, value: Double)

/** Streaming PSI drift monitor: per-window parity with the batch formula
  * over the same closed input, across arbitrary micro-batch splits, and
  * hand-computed PSI on a known histogram. */
class StreamPsiSpec extends SparkSpec {
  import spark.implicits._

  private def m(t: String, v: Double) = PsiM(Timestamp.valueOf(t), v)

  // reference histogram: uniform-ish over 4 bins of [0, 40)
  private val ref = Map(-1 -> 0L, 0 -> 25L, 1 -> 25L, 2 -> 25L, 3 -> 25L, 4 -> 0L)

  // window 1 (00:xx) matches the reference shape; window 2 (01:xx) is
  // concentrated in bin 0 + one overflow — clearly drifted
  private val rows = Seq(
    m("2024-01-01 00:05:00", 5.0), m("2024-01-01 00:10:00", 15.0),
    m("2024-01-01 00:20:00", 25.0), m("2024-01-01 00:40:00", 35.0),
    m("2024-01-01 01:05:00", 1.0), m("2024-01-01 01:10:00", 2.0),
    m("2024-01-01 01:20:00", 3.0), m("2024-01-01 01:25:00", 4.0),
    m("2024-01-01 01:40:00", 99.0))

  private def handPsi(counts: Map[Int, Long]): Double = {
    val bins = 4; val half = bins / 2.0
    val n = counts.values.sum.toDouble
    val refTot = ref.values.sum.toDouble
    ((-1) +: (0 until bins) :+ bins).map { b =>
      val pr = (ref.getOrElse(b, 0L) + 0.5) / (refTot + half)
      val pc = (counts.getOrElse(b, 0L) + 0.5) / (n + half)
      (pc - pr) * math.log(pc / pr)
    }.sum
  }

  test("stream windows score the batch formula exactly; drift verdict fires") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[PsiM]
    val out = StreamPsi.psiStream(input.toDF(), "ts", "value", ref,
      bins = 4, lo = 0.0, hi = 40.0, threshold = 0.6,
      windowDuration = "1 hour", watermarkDelay = "0 seconds")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("psi_windows").start()
    input.addData(rows.take(6): _*)
    q.processAllAvailable()
    input.addData(rows.drop(6): _*)
    // advance the watermark past both windows so they finalize
    input.addData(m("2024-01-01 03:00:00", 10.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("psi_windows").collect()
      .map(r => r.getTimestamp(0).toString -> r).toMap
    val w1 = got("2024-01-01 00:00:00.0")
    val w2 = got("2024-01-01 01:00:00.0")
    assert(w1.getLong(2) == 4 && w2.getLong(2) == 5)
    val exp1 = handPsi(Map(0 -> 1L, 1 -> 1L, 2 -> 1L, 3 -> 1L))
    val exp2 = handPsi(Map(0 -> 4L, 4 -> 1L))
    assert(math.abs(w1.getDouble(3) - exp1) < 1e-9,
      s"w1 psi ${w1.getDouble(3)} vs $exp1")
    assert(math.abs(w2.getDouble(3) - exp2) < 1e-9,
      s"w2 psi ${w2.getDouble(3)} vs $exp2")
    // threshold 0.6 sits between the two hand-computed scores: the
    // matching window carries only the small-sample smoothing floor
    // (~0.44 from the empty under/overflow bins at n=4) while the
    // concentrated window scores >1
    assert(exp1 < 0.6 && exp2 > 0.6, s"fixture drift gap collapsed: $exp1 / $exp2")
    assert(w1.getInt(4) == 0, "matching window must not flag")
    assert(w2.getInt(4) == 1, "concentrated window must flag")
    // batch twin emits the identical rows for the same input
    val batch = StreamPsi.psiBatch(rows.toDF(), "ts", "value", ref,
        bins = 4, lo = 0.0, hi = 40.0, threshold = 0.6,
        windowDuration = "1 hour")
      .collect().map(r => r.getTimestamp(0).toString -> r).toMap
    Seq("2024-01-01 00:00:00.0", "2024-01-01 01:00:00.0").foreach { k =>
      assert(math.abs(batch(k).getDouble(3) - got(k).getDouble(3)) < 1e-12,
        s"batch/stream psi diverge at $k")
    }
  }
}
