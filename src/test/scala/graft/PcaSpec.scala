package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** PCA fit/project guarantees (the q130 gate is rows-only — the basis is a
  * driver eigensolve — so the linear-algebra contract is pinned here):
  * orthonormal components, eigenvalues descending and matching both the
  * covariance trace and the realized projection variance, plus an exact
  * hand case. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def eye(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("fitPca on real embeddings: orthonormal basis, descending eigenvalues, trace captured") {
    val emb = graft.sources.Tables.embeddings(spark, sfTiny)
    val k = 8
    val (mean, eig, comps, n) = SimilarityOps.fitPca(emb, "vec_id", "embedding", k)
    assert(n > 0 && mean.length == 64 && comps.size == k)
    // orthonormality: component i · component j = δ_ij
    for (i <- 0 until k; j <- i until k) {
      val d = eye(comps(i).toArray, comps(j).toArray)
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-9, s"comp $i · comp $j = $d, want $want")
    }
    // eigenvalues: nonnegative (covariance is PSD), descending
    eig.foreach(ev => assert(ev > -1e-9, s"negative eigenvalue $ev"))
    assert(eig.sameElements(eig.sortBy(-_)), "eigenvalues not descending")
    // leading-k eigenvalue mass cannot exceed the total variance (trace),
    // and for k=dim it must equal it; here assert the bound + that the
    // fraction is sane (>0)
    val full = SimilarityOps.fitPca(emb, "vec_id", "embedding", 64)
    val trace = full._2.sum
    assert(eig.sum <= trace + 1e-9 && eig.sum > 0)
    // per-component realized projection variance == its eigenvalue: the
    // defining property tying the distributed moment pass, the driver
    // eigensolve and the in-plan projection together
    val proj = SimilarityOps.pcaProject(emb, "vec_id", "embedding", mean, comps)
    val varRow = proj.select(
      (0 until k).map(i =>
        (avg(col("proj")(i) * col("proj")(i)) -
          avg(col("proj")(i)) * avg(col("proj")(i))).as(s"v$i")): _*).head()
    for (i <- 0 until k)
      assert(math.abs(varRow.getDouble(i) - eig(i)) < 1e-6,
        s"projection variance ${varRow.getDouble(i)} != eigenvalue ${eig(i)} at $i")
  }

  test("hand case: points on a line have one nonzero eigenvalue along the line") {
    // y = 2x exactly: first PC must be (1,2)/√5, second eigenvalue 0
    val pts = Seq((0L, Seq(0.0f, 0.0f)), (1L, Seq(1.0f, 2.0f)),
      (2L, Seq(2.0f, 4.0f)), (3L, Seq(3.0f, 6.0f)))
    val df = pts.toDF("vec_id", "embedding")
    val (mean, eig, comps, n) = SimilarityOps.fitPca(df, "vec_id", "embedding", 2)
    assert(n == 4)
    assert(math.abs(mean(0) - 1.5) < 1e-12 && math.abs(mean(1) - 3.0) < 1e-12)
    val s5 = math.sqrt(5.0)
    assert(math.abs(comps(0)(0) - 1.0 / s5) < 1e-9 &&
      math.abs(comps(0)(1) - 2.0 / s5) < 1e-9,
      s"first PC ${comps(0).mkString(",")} not along the line")
    assert(math.abs(eig(1)) < 1e-9, s"second eigenvalue ${eig(1)} should be 0")
    // variance along the line: x has var 1.25, y 5.0 → total 6.25
    assert(math.abs(eig(0) - 6.25) < 1e-9)
    // projections: centered coordinates times √5 on PC1, 0 on PC2
    val proj = SimilarityOps.pcaProject(df, "vec_id", "embedding", mean, comps)
      .orderBy("vec_id").collect().map(_.getSeq[Double](1))
    val want = Seq(-1.5 * s5, -0.5 * s5, 0.5 * s5, 1.5 * s5)
    proj.zip(want).foreach { case (p, w) =>
      assert(math.abs(p(0) - w) < 1e-9 && math.abs(p(1)) < 1e-9)
    }
  }

  test("basis is deterministic under re-partitioning up to moment noise") {
    val emb = graft.sources.Tables.embeddings(spark, sfTiny)
    val (m1, e1, c1, _) = SimilarityOps.fitPca(emb, "vec_id", "embedding", 4)
    val (m2, e2, c2, _) = SimilarityOps.fitPca(emb.repartition(7), "vec_id", "embedding", 4)
    m1.zip(m2).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    e1.zip(e2).foreach { case (a, b) => assert(math.abs(a - b) < 1e-7) }
    c1.zip(c2).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-6) }
    }
  }
}
