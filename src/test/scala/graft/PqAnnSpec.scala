package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps
import graft.sources.Tables

/** Product-quantization ANN: codebook/encoding invariants, the textbook
  * quantization-error monotonicity, and recall against brute-force cosine
  * (all seeded — deterministic across runs). */
class PqAnnSpec extends SparkSpec {

  /** L2-normalized embeddings: ascending ADC (approximate squared L2)
    * ranking is then comparable to descending cosine. */
  private lazy val normed = {
    val emb = Tables.embeddings(spark, sfTiny)
    emb.select(col("vec_id"), SimilarityOps.toDouble(col("embedding")).as("v"))
      .withColumn("n", sqrt(aggregate(transform(col("v"), x => x * x),
        lit(0.0), (a, x) => a + x)))
      .filter(col("n") > 0)
      .select(col("vec_id"), transform(col("v"), x => x / col("n")).as("emb"))
  }

  /** Total squared reconstruction error of an encoding: Σ over rows of
    * ||v − concat_j codebook(j)(code_j)||². Computed in-plan: per subspace,
    * distance of the slice to the SELECTED codeword via a case-chain on the
    * code value. */
  private def reconstructionError(m: Int,
                                  fit: (org.apache.spark.sql.DataFrame, Seq[Seq[Array[Double]]]),
                                  vExpr: org.apache.spark.sql.Column = col("v")): Double = {
    val (enc, cb) = fit
    val sub = cb.head.head.length
    val errCols = (0 until m).map { j =>
      val sl = slice(vExpr, j * sub + 1, sub)
      // codebook j as a literal 2-D array; the selected codeword is one
      // element_at lookup by the stored code
      val book = array(cb(j).map(cw => array(cw.map(lit).toIndexedSeq: _*)): _*)
      val cw = element_at(book, element_at(col("code"), j + 1) + 1)
      aggregate(zip_with(sl, cw, (x, y) => (x - y) * (x - y)),
        lit(0.0), (a, x) => a + x)
    }
    enc.select(sum(errCols.reduce(_ + _)).as("e")).head.getDouble(0)
  }

  test("codes are within [0, k) and one per subspace") {
    val (enc, cb) = SimilarityOps.fitPq(normed, "vec_id", "emb", m = 8, k = 16,
      seed = 42L, maxIter = 5)
    assert(cb.size == 8 && cb.forall(_.size == 16) && cb.forall(_.forall(_.length == 8)))
    val bad = enc.filter(size(col("code")) =!= 8 ||
      exists(col("code"), c => c < 0 || c >= 16)).count()
    assert(bad == 0)
  }

  test("quantization error shrinks as the codebook grows (k=4 -> k=64)") {
    val coarse = reconstructionError(8,
      SimilarityOps.fitPq(normed, "vec_id", "emb", m = 8, k = 4, seed = 42L, maxIter = 10))
    val fine = reconstructionError(8,
      SimilarityOps.fitPq(normed, "vec_id", "emb", m = 8, k = 64, seed = 42L, maxIter = 10))
    assert(fine < coarse,
      s"64-codeword books must reconstruct better than 4-codeword books ($fine >= $coarse)")
  }

  test("ADC recall@10 vs brute-force cosine (m=16, k=64: 16x compression)") {
    val (enc, cb) = SimilarityOps.fitPq(normed, "vec_id", "emb", m = 16, k = 64,
      seed = 42L, maxIter = 10)
    val encP = enc.persist()
    val recalls = Seq(0L, 7L, 42L, 99L, 123L).map { qid =>
      val exact = SimilarityOps.bruteForceTopK(normed, "vec_id", "emb", qid, 10, identity)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val approx = SimilarityOps.pqTopK(encP, cb, "vec_id", qid, 10, identity)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      (exact & approx).size / 10.0
    }
    // measured 0.52 mean / 0.4 min on this fixture (synthetic near-random
    // embeddings are PQ's worst case); floors leave margin for ml-lib
    // version drift in the k-means fit, not for regressions
    assert(recalls.sum / recalls.size >= 0.35, s"mean recall too low: $recalls")
    assert(recalls.min >= 0.2, s"worst-query recall too low: $recalls")
    // the query itself quantizes to its own codes: ADC distance to itself
    // is the pure quantization error, which must put it in its own top-10
    val self = SimilarityOps.pqTopK(encP, cb, "vec_id", 42L, 10, identity)
      .select("vec_id").collect().map(_.getLong(0))
    assert(self.contains(42L), "query row missing from its own neighborhood")
    encP.unpersist()
  }

  test("IVFPQ residual coding beats flat PQ reconstruction; probe keeps recall") {
    // The deterministic cross-validation is RECONSTRUCTION error: at the
    // same m x k code budget, coding residuals (v - centroid) must beat
    // coding raw vectors — that is the entire point of Jegou '11 SIV
    // (measured here: ~241 vs ~271). Recall@10 against flat PQ is NOT the
    // gate: 5 queries x 10 neighbors on near-random synthetic embeddings
    // is 50 noise-dominated samples, and either variant can win a given
    // draw even though the residual codes are strictly more precise.
    val (encFlat, cbFlat) = SimilarityOps.fitPq(normed, "vec_id", "emb",
      m = 8, k = 16, seed = 42L, maxIter = 10)
    val flatErr = reconstructionError(8, (encFlat, cbFlat))
    val (encIvf, centers, cbIvf) = SimilarityOps.fitIvfPq(normed, "vec_id", "emb",
      nCells = 16, m = 8, k = 16, seed = 42L, maxIter = 10)
    val ivfP = encIvf.persist()
    val cLit = array(centers.map(cw => array(cw.map(lit).toIndexedSeq: _*)): _*)
    val resid = zip_with(col("v"), element_at(cLit, col("cell") + 1), (x, c) => x - c)
    val ivfErr = reconstructionError(8, (ivfP, cbIvf), resid)
    assert(ivfErr < flatErr,
      s"residual coding must reconstruct better at equal budget ($ivfErr >= $flatErr)")

    val queries = Seq(0L, 7L, 42L, 99L, 123L)
    def recallOf(topK: Long => Set[Long]): Double = queries.map { qid =>
      val exact = SimilarityOps.bruteForceTopK(normed, "vec_id", "emb", qid, 10, identity)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      (exact & topK(qid)).size / 10.0
    }.sum / queries.size
    // full probe: same candidate set as flat PQ, so this floors the
    // end-to-end ranking quality of the residual ADC path
    val full = recallOf(qid => SimilarityOps.ivfPqTopK(ivfP, centers, cbIvf, "vec_id",
      qid, 10, nProbe = 16, identity).select("vec_id").collect().map(_.getLong(0)).toSet)
    assert(full >= 0.3, s"full-probe IVFPQ recall too low: $full")
    // partial probe (the actual serving shape) keeps most of that recall
    val probed = recallOf(qid => SimilarityOps.ivfPqTopK(ivfP, centers, cbIvf, "vec_id",
      qid, 10, nProbe = 8, identity).select("vec_id").collect().map(_.getLong(0)).toSet)
    assert(probed >= full - 0.25, s"8/16-cell probe lost too much recall ($probed vs $full)")
    // every vector quantizes into a valid cell with m codes in [0, k)
    assert(ivfP.filter(size(col("code")) =!= 8 ||
      exists(col("code"), c => c < 0 || c >= 16) ||
      col("cell") < 0 || col("cell") >= 16).count() == 0)
    ivfP.unpersist()
  }
}
