package graft

import org.apache.spark.sql.functions._
import graft.functions.{TDigest, VectorFunctions}

/** Accuracy and merge contracts of the t-digest (the q285 gate entry is
  * rows-only — digest bytes are merge-order-specific, so the BOUNDS live
  * here): rank error at the probed quantiles, small-n exactness, tail
  * tightness vs the body, rollup-merge preserving the bound, and
  * repartition invariance of the bound (NOT of the bytes). */
class TDigestSpec extends SparkSpec {
  import spark.implicits._

  private val delta = 100

  /** rank of x in sorted xs (fraction ≤ x) — the error metric that the
    * t-digest bounds; value-space error is unbounded for skewed data. */
  private def rankOf(xs: Array[Double], x: Double): Double =
    xs.count(_ <= x).toDouble / xs.length

  test("rank error at body and tail quantiles is within the delta bound") {
    VectorFunctions.register(spark)
    // deterministic skewed data: exp-ish via hash-uniform transform
    val xs = (1 to 20000).map { i =>
      val u = ((i * 2654435761L) & 0xffffffffL).toDouble / 4294967296.0
      -math.log(1.0 - u * 0.99999) * 100.0
    }.toArray
    val sk = xs.toSeq.toDF("v").repartition(8)
      .agg(call_function("graft_tdigest_agg", col("v"), lit(delta)))
      .head().getAs[Array[Byte]](0)
    val sorted = xs.sorted
    for (q <- Seq(0.01, 0.25, 0.5, 0.9, 0.99, 0.999)) {
      val est = TDigest.quantile(sk, q).asInstanceOf[Double]
      val rankErr = math.abs(rankOf(sorted, est) - q)
      // k1 with delta=100 keeps rank error well under 1%; tails tighter
      assert(rankErr < 0.01, s"q=$q: est $est rank err $rankErr")
      if (q >= 0.99) assert(rankErr < 0.003, s"tail q=$q rank err $rankErr")
    }
  }

  test("small-n digest is exact: singletons survive compression") {
    VectorFunctions.register(spark)
    val xs = (1 to 50).map(_.toDouble)
    val sk = xs.toDF("v")
      .agg(call_function("graft_tdigest_agg", col("v"), lit(delta)))
      .head().getAs[Array[Byte]](0)
    // min/max anchored exactly
    assert(TDigest.quantile(sk, 0.0) == 1.0)
    assert(TDigest.quantile(sk, 1.0) == 50.0)
    // interior: within half a step of the exact order statistic
    val med = TDigest.quantile(sk, 0.5).asInstanceOf[Double]
    assert(math.abs(med - 25.5) <= 0.5, s"median $med")
  }

  test("rollup merge of per-day digests preserves the rank bound") {
    VectorFunctions.register(spark)
    val ev = graft.sources.Tables.events(spark, sfTiny)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("value").cast("double").as("v"))
    val merged = ev.groupBy("day")
      .agg(call_function("graft_tdigest_agg", col("v"), lit(delta)).as("sk"))
      .agg(call_function("graft_tdigest_merge", col("sk")))
      .head().getAs[Array[Byte]](0)
    val xs = ev.select("v").as[Double].collect().sorted
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = TDigest.quantile(merged, q).asInstanceOf[Double]
      val rankErr = math.abs(rankOf(xs, est) - q)
      assert(rankErr < 0.015, s"rollup q=$q: est $est rank err $rankErr")
    }
  }

  test("rollup adopts the inputs' delta: high-res sketches stay high-res") {
    VectorFunctions.register(spark)
    // δ=1000 per-group digests over a wide uniform stream; a rollup that
    // silently re-compressed at the merge buffer's seed δ=100 would land
    // near 2δ=200 centroids — adopting the input δ keeps far more
    val xs = (1 to 200000).map(i => ((i * 2654435761L) % 1000003).toDouble)
    val merged = xs.toDF("v")
      .withColumn("g", (col("v") % 8).cast("int"))
      .groupBy("g")
      .agg(call_function("graft_tdigest_agg", col("v"), lit(1000)).as("sk"))
      .agg(call_function("graft_tdigest_merge", col("sk")))
      .head().getAs[Array[Byte]](0)
    val bb = java.nio.ByteBuffer.wrap(merged)
    val outDelta = bb.getInt
    val k = bb.getInt
    assert(outDelta == 1000, s"merge must adopt the stored delta, got $outDelta")
    assert(k > 400, s"rollup of delta=1000 digests kept only $k centroids")
    // and the tail stays sharp
    val sorted = xs.toArray.sorted
    for (q <- Seq(0.5, 0.99, 0.999)) {
      val est = TDigest.quantile(merged, q).asInstanceOf[Double]
      assert(math.abs(rankOf(sorted, est) - q) < 0.005,
        s"q=$q est $est rank err ${math.abs(rankOf(sorted, est) - q)}")
    }
  }

  test("the accuracy bound is repartition-invariant (bytes need not be)") {
    VectorFunctions.register(spark)
    val xs = (1 to 5000).map(i => (i % 997).toDouble)
    val sorted = xs.toArray.sorted
    for (parts <- Seq(1, 4, 32)) {
      val sk = xs.toDF("v").repartition(parts)
        .agg(call_function("graft_tdigest_agg", col("v"), lit(delta)))
        .head().getAs[Array[Byte]](0)
      for (q <- Seq(0.5, 0.95)) {
        val est = TDigest.quantile(sk, q).asInstanceOf[Double]
        assert(math.abs(rankOf(sorted, est) - q) < 0.015,
          s"parts=$parts q=$q est $est")
      }
    }
  }

  test("empty digest probes to null; nulls are skipped") {
    VectorFunctions.register(spark)
    val sk = Seq.empty[Double].toDF("v")
      .agg(call_function("graft_tdigest_agg", col("v"), lit(delta)))
      .head().getAs[Array[Byte]](0)
    assert(TDigest.quantile(sk, 0.5) == null)
    val sk2 = Seq[Option[Double]](None, Some(7.0), None).toDF("v")
      .agg(call_function("graft_tdigest_agg", col("v"), lit(delta)))
      .head().getAs[Array[Byte]](0)
    assert(TDigest.quantile(sk2, 0.5) == 7.0)
  }
}
