package graft

import graft.operators.SimilarityOps
import graft.queries.Q.dec6

/** PQ distortion report contracts: zero error on a degenerate corpus,
  * ratio bounds, monotonicity in the codebook budget, and the overall
  * row's consistency with the per-subspace rows. */
class PqDistortionSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(f: Int => Seq[Double], n: Int) =
    (0 until n).map(i => (i.toLong, f(i).map(_.toFloat).toArray))
      .toDF("vec_id", "embedding")

  test("identical vectors quantize with zero distortion") {
    val df = vecs(_ => Seq(1.0, 2.0, 3.0, 4.0), 20)
    val out = SimilarityOps.pqDistortion(df, "vec_id", "embedding",
      m = 2, k = 2, seed = 3L, dec6).collect()
    out.foreach { r =>
      assert(math.abs(r.getDouble(2)) < 1e-6, s"mse ${r.getDouble(2)}")
      assert(math.abs(r.getDouble(4)) < 1e-6, s"ratio ${r.getDouble(4)}")
    }
  }

  test("ratio bounded; a larger codebook never quantizes worse") {
    // deterministic spread: 4-dim vectors on an arithmetic lattice
    val df = vecs(i => Seq(i % 7, (i * 3) % 5, i % 2 * 10, (i * 5) % 11), 60)
    def overall(k: Int): Double =
      SimilarityOps.pqDistortion(df, "vec_id", "embedding",
          m = 2, k = k, seed = 3L, dec6)
        .filter($"subspace" === -1).head().getDouble(4)
    val d2 = overall(2); val d16 = overall(16)
    assert(d2 >= 0 && d2 <= 1 + 1e-9, s"ratio $d2 out of bounds")
    assert(d16 <= d2 + 1e-9, s"k=16 ($d16) must not beat k=2 ($d2) backwards")
  }

  test("overall row equals the subspace-energy-weighted aggregate") {
    val df = vecs(i => Seq(i % 7, (i * 3) % 5, i % 2 * 10, (i * 5) % 11), 60)
    val rows = SimilarityOps.pqDistortion(df, "vec_id", "embedding",
        m = 2, k = 4, seed = 3L, dec6)
      .collect().map(r => r.getInt(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val subs = rows.filter(_._1 >= 0).values
    val mseMean = subs.map(_._1).sum / subs.size
    val eMean = subs.map(_._2).sum / subs.size
    assert(math.abs(rows(-1)._1 - mseMean) < 1e-5,
      s"overall mse ${rows(-1)._1} vs per-sub mean $mseMean")
    assert(math.abs(rows(-1)._2 - eMean) < 1e-5)
  }
}
