package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusOps, SimilarityOps}
import graft.queries.Q.dec6

/** Semantics pins for the two driver-gated rows-only ops of this batch:
  * MMR re-ranking (q131 — greedy isn't SQL) and the JS-divergence
  * boundary values the q128 oracle can't distinguish from luck. */
class MmrJsSpec extends SparkSpec {
  import spark.implicits._

  // Candidates engineered so pure relevance order and MMR order differ:
  // ids 1,2 are near-copies of each other and most relevant; 3 points
  // elsewhere. Query is id 0.
  private def toyEmb = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),        // query
    (1L, Seq(0.9f, 0.1f, 0.0f)),        // rel ≈ .994
    (2L, Seq(0.9f, 0.11f, 0.0f)),       // rel ≈ .993, sim(1,2) ≈ 1
    (3L, Seq(0.6f, 0.0f, 0.8f))         // rel = .6, orthogonal-ish to 1,2
  ).toDF("vec_id", "embedding")

  test("mmr demotes the near-copy: rank 2 goes to the diverse candidate") {
    val out = SimilarityOps.mmrRerank(toyEmb, "vec_id", "embedding",
        queryId = 0L, candN = 3, k = 3, lambda = 0.5, scoreOut = dec6)
      .orderBy("mmr_rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L),
      s"got ${out.map(_.getLong(1)).toSeq}")
    // rank-1 row: no selected set yet → max_sim_sel 0, score = λ·rel
    assert(out(0).getDouble(3) == 0.0)
    // the demoted near-copy carries its ~1.0 similarity to rank-1
    assert(out(2).getDouble(3) > 0.99)
  }

  test("lambda=1 reduces MMR to pure relevance order") {
    val out = SimilarityOps.mmrRerank(toyEmb, "vec_id", "embedding",
        queryId = 0L, candN = 3, k = 3, lambda = 1.0, scoreOut = dec6)
      .orderBy("mmr_rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
  }

  test("mmr on real embeddings is deterministic and ranks are unique") {
    val emb = graft.sources.Tables.embeddings(spark, sfTiny)
    val a = SimilarityOps.mmrRerank(emb, "vec_id", "embedding", 0L, 20, 5, 0.7, dec6)
      .orderBy("mmr_rank").collect().map(r => (r.getInt(0), r.getLong(1)))
    val b = SimilarityOps.mmrRerank(emb.repartition(5), "vec_id", "embedding", 0L, 20, 5, 0.7, dec6)
      .orderBy("mmr_rank").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq)
    assert(a.map(_._2).distinct.length == 5)
  }

  test("mmr with k larger than the candidate pool returns the pool, not a crash") {
    // advisor regression: 3 non-query rows, k = 5 — the greedy loop must
    // stop at the exhausted pool instead of indexing bestIdx = -1
    val out = SimilarityOps.mmrRerank(toyEmb, "vec_id", "embedding",
      queryId = 0L, candN = 10, k = 5, lambda = 0.5, scoreOut = dec6)
      .collect()
    assert(out.length == 3, s"expected the 3-row pool, got ${out.length}")
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 3), "ranks stay dense")
  }

  test("annRecall divides by the retrievable count when the corpus is short") {
    // advisor regression: corpus of 3 non-query vectors, k = 10 — exact
    // list has 4 entries (incl. the query row), so a perfect ANN scores
    // recall 1.0, not 4/10
    val out = SimilarityOps.annRecall(toyEmb, "vec_id", "embedding",
      queryIds = Seq(0L), k = 10,
      annTopK = qid => SimilarityOps.bruteForceTopK(toyEmb, "vec_id",
        "embedding", qid, 10, dec6),
      scoreOut = dec6).collect()
    val row = out.find(_.getString(0) == "0").get
    assert(row.getDouble(3) == 1.0,
      s"self-identical retrieval must score recall 1.0, got ${row.getDouble(3)}")
  }

  test("js divergence: identical corpora → 0, disjoint vocabularies → ln 2") {
    val a = Seq((1L, "alpha beta gamma"), (2L, "beta gamma")).toDF("doc_id", "text")
    val same = CorpusOps.jsDivergence(a, a, "text", dec6).head()
    assert(math.abs(same.getDouble(7)) < 1e-6, s"JS(P,P) = ${same.getDouble(7)}")
    val b = Seq((3L, "delta epsilon"), (4L, "epsilon zeta")).toDF("doc_id", "text")
    val disj = CorpusOps.jsDivergence(a, b, "text", dec6).head()
    assert(math.abs(disj.getDouble(7) - math.log(2.0)) < 1e-6,
      s"JS over disjoint support = ${disj.getDouble(7)}, want ln 2")
    // vocab accounting on the disjoint case: 3 + 3 tokens, union 6
    assert(disj.getLong(2) == 3 && disj.getLong(3) == 3 && disj.getLong(4) == 6)
  }

  test("js divergence is symmetric") {
    val docs = graft.sources.Tables.documents(spark, sfTiny)
    val en = docs.filter(col("lang") === "en")
    val rest = docs.filter(col("lang") =!= "en")
    val ab = CorpusOps.jsDivergence(en, rest, "text", dec6).head().getDouble(7)
    val ba = CorpusOps.jsDivergence(rest, en, "text", dec6).head().getDouble(7)
    assert(math.abs(ab - ba) < 2e-6, s"JS not symmetric: $ab vs $ba")
    assert(ab > 0 && ab < math.log(2.0))
  }
}
