package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps
import graft.queries.Q.dec6

/** Embedding-quality evaluation operators: Matryoshka truncation recall
  * and deterministic-sample pairwise diversity. */
class EmbedEvalSpec extends SparkSpec {
  import spark.implicits._

  // 40 deterministic 8-dim vectors; id 0 is the query
  private lazy val emb = (0L until 40L).map { i =>
    (i, Array.tabulate(8)(d => math.sin(i * 1.7 + d * 0.9).toFloat))
  }.toDF("vec_id", "embedding")

  test("matryoshka: full-dimension budget is the recall=1 anchor; schema stable") {
    val out = SimilarityOps.matryoshkaRecall(emb, "vec_id", "embedding",
      queryId = 0L, k = 5, dims = Seq(2, 4, 8), scoreOut = dec6).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(2, 4, 8))
    out.foreach(r => assert(r.getLong(1) == 5))
    val full = out.last
    assert(full.getLong(2) == 5 && full.getDouble(3) == 1.0,
      s"full-dim row must self-agree: $full")
    // truncated budgets can only lose overlap, never exceed k
    out.foreach(r => assert(r.getLong(2) >= 0 && r.getLong(2) <= 5))
  }

  test("matryoshka: rejects unsorted or oversized budget sets") {
    intercept[IllegalArgumentException] {
      SimilarityOps.matryoshkaRecall(emb, "vec_id", "embedding", 0L, 5,
        Seq(8, 4), dec6)
    }
    intercept[IllegalArgumentException] {
      SimilarityOps.matryoshkaRecall(emb, "vec_id", "embedding", 0L, 5,
        (1 to 9).toSeq, dec6)
    }
  }

  test("sampleDiversity: identical vectors give mean=min=max=1") {
    val same = (0L until 30L).map(i => (i, Array.fill(4)(0.5f)))
      .toDF("vec_id", "embedding")
    val r = SimilarityOps.sampleDiversity(same, "vec_id", "embedding", 3L, dec6)
      .head()
    assert(r.getLong(0) == 10, s"sample ${r.getLong(0)}") // ids 0,3,…,27
    assert(r.getLong(1) == 45, s"pairs ${r.getLong(1)}")  // 10 choose 2
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-6)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-6)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-6)
  }

  test("sampleDiversity: orthogonal pair scores 0 and bounds hold") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)), (2L, Array(1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val r = SimilarityOps.sampleDiversity(vecs, "vec_id", "embedding", 1L, dec6)
      .head()
    assert(r.getLong(1) == 3)
    assert(math.abs(r.getDouble(3)) < 1e-6, s"min ${r.getDouble(3)}")
    val inv = 1.0 / math.sqrt(2)
    assert(math.abs(r.getDouble(4) - inv) < 1e-6, s"max ${r.getDouble(4)}")
  }
}
