package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventOps, StatOps}
import graft.queries.Q.dec6

/** Error bounds of the sketch-binned KS / Mann-Whitney variants against
  * their exact counterparts — the scaladoc'd 100 TB substitution for
  * continuous measures (support/rank tables capped at `bins` rows by
  * construction). Inputs are deterministic hash-mixed pseudo-samples so
  * the pinned tolerances are stable across runs. */
class SketchBinnedSpec extends SparkSpec {
  import spark.implicits._

  // two continuous samples with a genuine location shift: b = a + 0.35
  // on a [0, 10) hash-uniform base, 4000/5000 rows — distinct values ≈ N,
  // exactly the regime the binning exists for
  private def mix(i: Int): Double = {
    val h = (i * 2654435761L) % 1000003L
    (h.toDouble / 1000003.0) * 10.0
  }
  private lazy val a = (1 to 4000).map(mix).toDF("value")
  private lazy val b = (1 to 5000).map(i => mix(i + 7919) + 0.35).toDF("value")

  test("binned KS lower-bounds the exact D within the per-bin mass") {
    val exact = StatOps.ksTest(a, b, "value", dec6).head()
    val dExact = exact.getDouble(2)
    for (bins <- Seq(32, 128)) {
      val r = StatOps.ksTestBinned(a, b, "value", bins, dec6).head()
      val dBinned = r.getDouble(2)
      // same sample sizes flow through
      assert(r.getLong(0) == 4000 && r.getLong(1) == 5000)
      // one-sided: a max over a SUBSET of the support can only shrink
      assert(dBinned <= dExact + 1e-9, s"bins=$bins binned $dBinned > exact $dExact")
      // gap bounded by the largest per-bin mass (~1/bins per side for
      // pooled quantile bins) plus sketch slack
      assert(dExact - dBinned <= 3.0 / bins,
        s"bins=$bins gap ${dExact - dBinned} exceeds 3/bins")
    }
  }

  test("binned MW z converges to the exact z as bins grow") {
    val exact = StatOps.mannWhitneyU(a, b, "value", dec6).head()
    val zExact = exact.getDouble(5)
    assert(math.abs(zExact) > 3, s"fixture should carry a real shift, z=$zExact")
    for ((bins, tol) <- Seq(32 -> 0.15, 128 -> 0.05)) {
      val r = StatOps.mannWhitneyUBinned(a, b, "value", bins, dec6).head()
      assert(r.getLong(0) == 4000 && r.getLong(1) == 5000)
      val zBinned = r.getDouble(5)
      // within-bin rank distortion only — relative z error shrinks ~1/bins
      assert(math.abs(zBinned - zExact) / math.abs(zExact) <= tol,
        s"bins=$bins z binned $zBinned vs exact $zExact")
      // the drift verdict itself must agree
      assert(r.getInt(6) == exact.getInt(6))
    }
  }

  test("binned KS support table is bins-sized: identical samples give D = 0") {
    val r = StatOps.ksTestBinned(a, a, "value", 64, dec6).head()
    assert(r.getDouble(2) == 0.0, s"self-KS D ${r.getDouble(2)}")
    assert(r.getInt(4) == 0)
  }
}
