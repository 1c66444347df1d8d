package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamSuppress
import graft.streaming.StreamSuppress.{Alert, Page}

/** Alert cooldown suppression: storm collapses to one page per cooldown
  * with the suppressed count carried, stream ≡ batch on the same closed
  * input across micro-batch splits, and per-key isolation. */
class StreamSuppressSpec extends SparkSpec {
  import spark.implicits._

  private def a(k: String, t: String, sev: Double = 1.0) =
    Alert(k, Timestamp.valueOf(t), sev)

  // key x: a storm of 5 alerts in 40 min, then one after the cooldown;
  // key y: two isolated alerts — never suppressed. The x-storm opens with
  // a TIED timestamp (sev 3 vs 5, listed higher-severity-last): both
  // paths must sort ties by (ts, severity) — sev 3 pages first and sev 5
  // lands in the suppressed count, on stream AND batch — so a stream side
  // sorting by arrival order alone goes red here.
  private val rows = Seq(
    a("x", "2024-01-01 00:00:00", 5.0), a("x", "2024-01-01 00:00:00", 3.0),
    a("x", "2024-01-01 00:10:00"),
    a("x", "2024-01-01 00:20:00"), a("x", "2024-01-01 00:30:00"),
    a("x", "2024-01-01 00:40:00"), a("x", "2024-01-01 01:10:00", 7.0),
    a("y", "2024-01-01 00:05:00", 2.0), a("y", "2024-01-01 02:00:00", 3.0))

  private val cooldown = 3600000L // 1 hour

  test("storm collapses to one page per cooldown; suppressed count carried") {
    val got = StreamSuppress.suppressBatch(rows.toDF(), "key", "ts",
        "severity", cooldown)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getDouble(2), r.getLong(3))).toSet
    assert(got == Set(
      ("x", "2024-01-01 00:00:00.0", 3.0, 0L), // tie: lower severity first
      ("x", "2024-01-01 01:10:00.0", 7.0, 5L), // 5 suppressed incl. the tied 5.0
      ("y", "2024-01-01 00:05:00.0", 2.0, 0L),
      ("y", "2024-01-01 02:00:00.0", 3.0, 0L)), s"got $got")
  }

  test("stream emits the identical pages across arbitrary micro-batch splits") {
    implicit val sq = spark.sqlContext
    val want = StreamSuppress.suppressBatch(rows.toDF(), "key", "ts",
        "severity", cooldown)
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2),
        r.getLong(3))).toSet
    // chunk sizes keep the two tied-timestamp alerts in ONE micro-batch
    // (rows 0-1): across batches a stream cannot retro-reorder ties — the
    // documented edge of the parity contract (suppressStream scaladoc)
    Seq(2, 4, 9).foreach { chunk =>
      val input = MemoryStream[Alert]
      // delay covers the fixture's max disorder (y 00:05 arrives after
      // x 01:10) so no row is watermark-dropped; drop semantics themselves
      // are Spark's, not this operator's
      val q = StreamSuppress.suppressStream(spark, input.toDS(), cooldown,
          watermarkDelay = "4 hours")
        .writeStream.outputMode("append").format("memory")
        .queryName(s"sup_$chunk").start()
      rows.grouped(chunk).foreach { g => input.addData(g: _*); q.processAllAvailable() }
      q.stop()
      val got = spark.table(s"sup_$chunk").as[Page].collect()
        .map(p => (p.key, p.ts, p.severity, p.n_suppressed_since_last)).toSet
      assert(got == want, s"chunk=$chunk: $got vs $want")
    }
  }
}
