package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusOps

/** Semantics of the corpus-curation operators (q80–q85 oracle-check the
  * corpus paths; these pin the contracts on constructed fixtures). */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("contamination counts distinct shared n-grams and zero-fills clean docs") {
    // eval doc holds "a b c d e f"; train doc 1 shares exactly the two
    // 5-grams of that run, train doc 2 shares none, train doc 3 is too
    // short to have any 5-gram at all
    val eval = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "x a b c d e f y"), // grams "a b c d e" and "b c d e f" shared
      (2L, "p q r s t u v w"),
      (3L, "a b c")).toDF("doc_id", "text")
    val out = CorpusOps.contamination(train, eval, "doc_id", "text", n = 5)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq((1L, 2L, 1), (2L, 0L, 0), (3L, 0L, 0)))
  }

  test("contamination dedups repeated grams within one training doc") {
    val eval = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    // the shared 5-gram occurs twice in the train doc; distinct-set
    // semantics must count it once
    val train = Seq((1L, "a b c d e z a b c d e")).toDF("doc_id", "text")
    val out = CorpusOps.contamination(train, eval, "doc_id", "text", n = 5).collect()
    assert(out.head.getLong(1) == 1L)
  }

  test("stratified sample is a pure function of the id and respects rate edges") {
    val docs = (0L until 256L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
    val sampled = CorpusOps.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 16, "zh" -> 0), defaultKeep = 8)
    val langs = sampled.select("lang").distinct().as[String].collect()
    // rate 16/16 keeps every row, rate 0/16 keeps none
    assert(langs.toSeq == Seq("en"))
    assert(sampled.count() == 128)
    // determinism: the same call yields the same id set
    val ids1 = sampled.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = CorpusOps.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 16, "zh" -> 0), defaultKeep = 8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
  }

  test("stratified sample rate is monotone in the keep count") {
    val docs = (0L until 512L).map(i => (i, "en")).toDF("doc_id", "lang")
    def kept(k: Int): Set[Long] =
      CorpusOps.stratifiedSample(docs, "doc_id", "lang", Map("en" -> k), defaultKeep = 0)
        .select("doc_id").as[Long].collect().toSet
    val k4 = kept(4); val k8 = kept(8)
    // buckets nest: raising the keep count only ADDS rows (stable mixture
    // growth — the property that makes hash sampling re-runnable)
    assert(k4.subsetOf(k8))
    // 4/16 of a uniform hash ≈ a quarter; allow generous slack on 512 rows
    assert(k4.size > 512 / 4 - 60 && k4.size < 512 / 4 + 60)
  }

  test("bm25 ranks the term-bearing doc above term-free docs and scales with tf") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha alpha alpha beta"),
      (3L, "beta gamma delta epsilon")).toDF("doc_id", "text")
    val out = CorpusOps.bm25(docs, "doc_id", "text", Seq("alpha"))
      .select("doc_id", "bm25").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 3 has no query term -> exactly 0; tf=3 beats tf=1 at equal dl
    assert(out(3L) == 0.0)
    assert(out(2L) > out(1L) && out(1L) > 0.0)
  }

  test("tfidf top term prefers the rare term and breaks exact ties on the string") {
    val docs = Seq(
      (1L, "common rare common"),   // rare: tf=1 df=1; common: tf=2 df=3
      (2L, "common common zed"),
      (3L, "common zed zed")).toDF("doc_id", "text")
    val out = CorpusOps.tfidfTopTerm(docs, "doc_id", "text")
      .select("doc_id", "top_term").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1: rare (df=1) has idf ln(3) > anything df>=2 can reach at tf<=2
    assert(out(1L) == "rare")
    // doc 3: zed tf=2 df=2 -> 2*ln(1.5) ≈ 0.81 beats common 1*ln(1) = 0
    assert(out(3L) == "zed")
  }

  test("unigram logprob: uniform corpus scores ln(1/V); rare tokens drag the mean down") {
    // 4 tokens total, each type once -> every doc token has p = 1/4
    val uniform = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val u = CorpusOps.unigramLogProb(uniform, "doc_id", "text")
      .select("mean_logprob").as[Double].collect()
    assert(u.forall(v => math.abs(v - math.log(0.25)) < 1e-12))
    // doc of common tokens outscores the doc holding the one rare token
    val skewed = Seq((1L, "x x x x"), (2L, "x x x rare")).toDF("doc_id", "text")
    val s = CorpusOps.unigramLogProb(skewed, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(1L) > s(2L))
  }

  test("centroid outlier: the planted far vector ranks first in its block") {
    import graft.operators.SimilarityOps
    val rows = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.1f, 0.0f), 0),
      (3L, Array(0.9f, 0.0f), 0),
      (4L, Array(9.0f, 9.0f), 0), // planted outlier
      (5L, Array(0.0f, 1.0f), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.centroidOutliers(emb, "vec_id", "embedding", "label",
        topK = 1, scoreOut = identity)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getInt(4)))
    val byId = out.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byId(4L) == ((1, 1))) // rank 1, flagged
    assert(byId(5L) == ((1, 1))) // singleton block: trivially its own top
    assert(out.filter(t => Set(1L, 2L, 3L).contains(t._1)).forall(_._3 == 0))
  }

  test("tfidf ubiquitous-term corpus still yields one row per doc") {
    // every term in every doc -> all idf = ln(1) = 0; the tie must break
    // deterministically on the term string, not drop rows
    val docs = Seq((1L, "a b"), (2L, "b a")).toDF("doc_id", "text")
    val out = CorpusOps.tfidfTopTerm(docs, "doc_id", "text")
      .orderBy("doc_id").select("top_term").as[String].collect()
    assert(out.toSeq == Seq("a", "a"))
  }

  test("dsirWeights: target-looking raw docs outweigh off-target ones; target excluded") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", 1), // target
      (2L, "the quick brown fox naps under the tall tree", 1), // target
      (3L, "the quick brown fox jumps over the sleepy cat", 0), // raw, target-like
      (4L, "zzz qqq www eee rrr ttt yyy uuu iii ooo", 0),       // raw, disjoint
      (5L, "x", 0)                                              // raw, too short
    ).toDF("doc_id", "text", "tgt")
    val out = CorpusOps.dsirWeights(docs, "doc_id", "text",
        isTarget = col("tgt") === 1, buckets = 4096, n = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet == Set(3L, 4L, 5L), "only raw docs are scored")
    assert(out(3L)._2 > out(4L)._2,
      s"target-like doc must outweigh disjoint doc: ${out(3L)._2} vs ${out(4L)._2}")
    assert(out(5L) == ((0L, 0.0)), "sub-n-gram doc scores (0, 0.0)")
  }

  test("bigramSurprisal: repeated transitions score lower than rare ones; short docs zero") {
    val docs = Seq(
      (1L, "a b a b a b a b a b"), // one dominant transition
      (2L, "c d e f g h i j k l"), // all transitions unique
      (3L, "solo")                 // no bigram
    ).toDF("doc_id", "text")
    val out = CorpusOps.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L)._2 < out(2L)._2,
      s"repetitive doc must have lower surprisal: ${out(1L)._2} vs ${out(2L)._2}")
    assert(out(3L) == ((0L, 0.0)))
    assert(out(1L)._1 == 9L && out(2L)._1 == 9L)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val v2 = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val out = CorpusOps.snapshotDiff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("bpePairCounts weights pairs by word frequency and breaks ties on the pair") {
    // "ab" x3 (as 2 tokens of 'ab' + 1 in 'abc'), 'bc' x1; single chars ignored
    val docs = Seq((1L, "ab ab abc x")).toDF("doc_id", "text")
    val out = CorpusOps.bpePairCounts(docs, "doc_id", "text", topK = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.head == (("ab", 3L)))
    assert(out.toMap.get("bc").contains(1L))
    assert(!out.map(_._1).contains("x"))
  }

  test("dedupLines keeps first occurrences in order, zero shuffle") {
    import graft.operators.CleanOps
    val docs = Seq(
      (1L, "a\nb\na\nc\nb"),
      (2L, "only one line")
    ).toDF("doc_id", "text")
    val out = CleanOps.dedupLines(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L) == ((5, 3, "a\nb\nc")))
    assert(out(2L) == ((1, 1, "only one line")))
    // shuffle-free contract: the physical plan must contain no Exchange
    val plan = CleanOps.dedupLines(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"dedupLines must not shuffle:\n$plan")
  }

  test("vocabGrowthCurve: new types land in their first bucket; cumsum is the vocab") {
    // ids 0-4 -> bucket 0 ("a b"), ids 5-9 -> bucket 1 ("b c")
    val docs = (0L to 9L).map(i => (i, if (i < 5) "a b" else "b c"))
      .toDF("doc_id", "text")
    val out = CorpusOps.vocabGrowthCurve(docs, "doc_id", "text", buckets = 2)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 5L, 2L, 2L), (1L, 5L, 1L, 3L)), out.mkString(","))
  }

  test("phraseSearch counts overlapping positional matches; non-matches drop") {
    val docs = Seq(
      (1L, "the quick brown fox saw the quick brown hare"),
      (2L, "quick brown"),
      (3L, "brown quick"),                // right tokens, wrong order
      (4L, "quick red brown"),            // gap breaks adjacency
      (5L, "go go go go"))                // overlapping bigram occurrences
      .toDF("doc_id", "text")
    val two = CorpusOps.phraseSearch(docs, "doc_id", "text",
        Seq("quick", "brown"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == Map(1L -> 2L, 2L -> 1L), s"got $two")
    val over = CorpusOps.phraseSearch(docs, "doc_id", "text", Seq("go", "go"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(over == Map(5L -> 3L), s"overlaps must count: $over")
    val tri = CorpusOps.phraseSearch(docs, "doc_id", "text",
        Seq("the", "quick", "brown"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri == Map(1L -> 2L), s"got $tri")
  }

  test("groupOverlap: hand Jaccard; within-source duplicate shingles collapse") {
    val docs = Seq(
      ("A", "a b c d"),   // 3-grams: "a b c", "b c d"
      ("A", "a b c d"),   // duplicate doc — must NOT inflate n_a
      ("B", "a b c x"),   // 3-grams: "a b c", "b c x"
      ("C", "z z z z")    // 3-grams: "z z z" (x2, collapses to 1)
    ).toDF("source", "text")
    val out = CorpusOps.groupOverlap(docs, "source", "text", 3,
        graft.queries.Q.dec6)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("A", "B"))
    assert(ab.getLong(2) == 2L && ab.getLong(3) == 2L && ab.getLong(4) == 1L)
    assert(math.abs(ab.getDouble(5) - 1.0 / 3.0) < 1e-6)
    assert(!out.contains(("A", "C")) && !out.contains(("B", "C")),
      "disjoint sources must yield no pair row")
  }
}
