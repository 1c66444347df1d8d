package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, SimilarityOps}
import graft.sources.Tables

/** Cross-validation for the hash-based operators that have no DuckDB
  * oracle: their outputs must be consistent with the exact operators they
  * approximate, computed on the same engine and data. */
class CrossValidationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("MinHash+LSH pairs are a subset of exact Jaccard pairs at the same threshold") {
    val docs = Tables.documents(spark, sf)
    val lsh = DedupOps.minhashLshPairs(docs, "doc_id", "text", threshold = 0.3)
      .select("id_a", "id_b")
    val exact = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3)
      .select("id_a", "id_b")
    val falsePositives = lsh.except(exact).count()
    assert(falsePositives == 0, s"$falsePositives LSH pairs not in the exact set")
    // recall on this corpus: banding (16x4) should catch the high-J pairs
    val missed = exact.except(lsh).count()
    val total = exact.count()
    assert(total > 0)
    assert(missed.toDouble / total < 0.2, s"missed $missed of $total exact pairs")
  }

  test("LSH ANN scores match brute-force scores for the ids it returns") {
    val emb = Tables.embeddings(spark, sf)
    val brute = SimilarityOps.bruteForceTopK(emb, "vec_id", "embedding", 0L, 500, identity)
      .withColumnRenamed("cos_sim", "exact_cos")
    val lsh = SimilarityOps.lshTopK(emb, "vec_id", "embedding", 0L, 10,
      seed = 7L, nPlanes = 4, dim = 64, identity)
    val joined = lsh.join(brute, "vec_id")
    assert(joined.count() == lsh.count(), "every LSH hit exists in the full ranking")
    val mismatched = joined.filter(abs(col("cos_sim") - col("exact_cos")) > 1e-12).count()
    assert(mismatched == 0, "scores must be identical (same formula, same data)")
    // the query vector itself shares its own bucket and must rank first
    assert(lsh.orderBy(col("cos_sim").desc).first().getLong(0) == 0L)
  }

  test("multi-probe LSH recall >= single-probe recall, scores exact") {
    val emb = Tables.embeddings(spark, sf)
    val brute = SimilarityOps.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10, identity)
      .withColumnRenamed("cos_sim", "exact_cos")
    def recallOf(df: org.apache.spark.sql.DataFrame): Long =
      df.join(brute, "vec_id").count()
    val single = SimilarityOps.lshTopK(emb, "vec_id", "embedding", 0L, 10,
      seed = 7L, nPlanes = 4, dim = 64, identity)
    val multi = SimilarityOps.lshTopKMultiProbe(emb, "vec_id", "embedding", 0L, 10,
      seed = 7L, nPlanes = 4, dim = 64, probeDist = 1, identity)
    assert(recallOf(multi) >= recallOf(single),
      "probing Hamming-1 buckets must not lose single-probe hits")
    // scores for returned ids are the exact cosine (same formula, same data)
    val mismatched = multi.join(brute, "vec_id")
      .filter(abs(col("cos_sim") - col("exact_cos")) > 1e-12).count()
    assert(mismatched == 0)
  }

  test("IVF ANN: probing all cells recovers the exact brute-force top-k") {
    val emb = Tables.embeddings(spark, sf)
    val (indexed, centers) = SimilarityOps.fitIvf(emb, "vec_id", "embedding",
      nCells = 16, seed = 7L)
    val brute = SimilarityOps.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10, identity)
      .collect().map(_.getLong(0)).toSet
    // nProbe = nCells → no cell is skipped → must equal brute force exactly
    val full = SimilarityOps.ivfTopK(indexed, centers, "vec_id", 0L, 10,
      nProbe = 16, identity).collect().map(_.getLong(0)).toSet
    assert(full == brute)
    // the real operating point: 4 of 16 cells still finds the query itself
    // first and keeps decent recall on this corpus
    val probed = SimilarityOps.ivfTopK(indexed, centers, "vec_id", 0L, 10,
      nProbe = 4, identity).collect()
    assert(probed.head.getLong(0) == 0L)
    assert(probed.map(_.getLong(0)).count(brute) >= 5, "recall@10 under 50% with 4/16 cells")
  }

  test("IVF-cell-blocked cosine pairs are a subset of all-pairs with identical scores") {
    val emb = Tables.embeddings(spark, sf)
    val (indexed, _) = SimilarityOps.fitIvf(emb, "vec_id", "embedding", nCells = 8, seed = 7L)
    val got = SimilarityOps.ivfCosinePairs(indexed, "vec_id", threshold = 0.3, identity)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.nonEmpty, "quantized cells must contain some near pairs")
    // brute all-pairs oracle on the same engine
    val brute = SimilarityOps.blockedCosinePairs(
      emb.withColumn("one", org.apache.spark.sql.functions.lit(1)),
      "vec_id", "embedding", "one", threshold = 0.3, identity)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    got.foreach { case (k, v) =>
      assert(brute.contains(k), s"IVF pair $k not in all-pairs set")
      assert(math.abs(brute(k) - v) < 1e-12)
    }
  }

  test("SimHash near-pairs are top-tier in UNIGRAM similarity (its actual measure)") {
    // SimHash hashes token multisets: hamming-close pairs may share no
    // trigram at all (word-reordered docs), so the invariant is stated in
    // simhash's own metric — unigram-set Jaccard far above the corpus level
    // (median across all pairs on this corpus is ~0.63).
    val docs = Tables.documents(spark, sf)
    val pairs = DedupOps.simhashPairs(docs, "doc_id", "text", maxDist = 3)
    val uni = docs.select(col("doc_id"),
      array_distinct(graft.operators.TextOps.tokens(col("text"))).as("u"))
    val j = pairs
      .join(uni.select(col("doc_id").as("id_a"), col("u").as("ua")), "id_a")
      .join(uni.select(col("doc_id").as("id_b"), col("u").as("ub")), "id_b")
      .withColumn("ju",
        size(array_intersect(col("ua"), col("ub"))) / size(array_union(col("ua"), col("ub"))))
    val total = j.count()
    assert(total > 0)
    val stats = j.agg(min("ju").as("mn"), avg("ju").as("av")).collect().head
    assert(stats.getDouble(0) >= 0.5, s"weakest simhash pair ju=${stats.getDouble(0)}")
    assert(stats.getDouble(1) >= 0.8, s"avg simhash pair ju=${stats.getDouble(1)}")
  }
}
