package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level training-data-curation operators beyond per-document
  * signals: benchmark decontamination, deterministic stratified sampling,
  * corpus-relative relevance/salience scoring (BM25, TF-IDF).
  *
  * Scale design: every operator is a linear scan plus either a broadcast
  * join against a benchmark-sized side (decontamination) or a map-side-
  * combinable aggregation (vocabulary, document frequency). Nothing here
  * shuffles document text — shuffle keys are 8-byte gram hashes or short
  * token strings, and per-doc outputs re-join on the id column only. */
object CorpusOps {

  /** One (id, h) row per distinct hashed word n-gram per document — shared
    * with the dedup operators so the bind-then-explode-outer discipline
    * (the InferFiltersFromGenerate pitfall) lives in exactly one place. */
  private def hashedGrams(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    DedupOps.hashedShingles(docs, idCol, textCol, n)

  /** Benchmark decontamination (the n-gram-overlap check run before every
    * training data release, cf. GPT-3 appx. C / PaLM §C): for each training
    * document, count its distinct word `n`-grams that also occur anywhere in
    * the evaluation corpus, and flag any overlap. Wide grams (n ≈ 5–13) make
    * a shared gram evidence of true contamination rather than a common
    * phrase.
    *
    * Scale shape: the eval side is benchmark-sized (thousands of documents,
    * not billions), so its distinct gram set is collected into a BROADCAST
    * hash join — the 100 TB training scan never shuffles. Grams travel as
    * 8-byte xxhash64 keys, never as strings. If the eval side ever outgrows
    * broadcast range, keep the same plan minus the hint (shuffled equi-join
    * on the hash), or pre-filter with a bloom filter of eval grams.
    *
    * Returns one row per TRAINING document: (id, n_shared, contaminated). */
  def contamination(train: DataFrame, eval: DataFrame, idCol: String,
                    textCol: String, n: Int = 5): DataFrame = {
    val evalGrams = hashedGrams(eval, idCol, textCol, n).select("h").distinct()
    val hits = hashedGrams(train, idCol, textCol, n)
      .join(broadcast(evalGrams), Seq("h"))
      .groupBy(idCol).agg(count(lit(1)).as("n_shared"))
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("contaminated", (col("n_shared") > 0).cast("int"))
  }

  /** Bloom-filtered decontamination — the scale path [[contamination]]'s
    * scaladoc promises for an eval side too large to broadcast as an exact
    * gram set. The eval corpus's hashed grams aggregate into ONE mergeable
    * bloom filter ([[graft.functions.BloomAgg]] — partial aggregation
    * collapses each partition to a filter before the shuffle); the single
    * filter row is collected (bounded: a benchmark corpus of millions of
    * grams is a ~1 MB filter — the same bounded-metadata discipline as the
    * IVF centroid literals) and re-planted as a plan literal, so the
    * training-side probe ([[graft.functions.BloomMightContainLong]])
    * inlines into whole-stage codegen INSIDE the scan: the 100 TB side is
    * never joined, never shuffled.
    *
    * Contract: `n_bloom_hits` counts distinct training grams the filter
    * ACCEPTS — a superset of the exact overlap (no false negatives, by the
    * bloom inclusion property; false positives bounded by `fpp` and
    * deterministic for fixed parameters, since insertion hashing is
    * seed-fixed and the OR-merge is order-independent). Use as a cheap
    * first pass: docs with 0 hits are provably clean; flagged docs go to
    * the exact [[contamination]] check restricted to the survivors. */
  def bloomContamination(train: DataFrame, eval: DataFrame, idCol: String,
                         textCol: String, n: Int = 5,
                         expectedItems: Long = 1000000L,
                         fpp: Double = 0.01): DataFrame = {
    graft.functions.VectorFunctions.register(train.sparkSession)
    val bloomBytes = hashedGrams(eval, idCol, textCol, n)
      .agg(call_function("graft_bloom_agg", col("h"), lit(expectedItems), lit(fpp)))
      .head.getAs[Array[Byte]](0)
    val hits = hashedGrams(train, idCol, textCol, n)
      .filter(call_function("graft_bloom_contains", lit(bloomBytes), col("h")))
      .groupBy(idCol).agg(count(lit(1)).as("n_bloom_hits"))
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bloom_hits"), lit(0L)).as("n_bloom_hits"))
      .withColumn("flagged", (col("n_bloom_hits") > 0).cast("int"))
  }

  /** Cross-document repeated n-gram measurement (the signal behind Lee et
    * al., "Deduplicating Training Data Makes Language Models Better",
    * ACL'22 §4 — exact-substring duplication): for every document, how many
    * of its n-gram POSITIONS carry a gram that also occurs in at least one
    * OTHER document. Positions, not distinct grams: a boilerplate sentence
    * pasted three times is three positions of duplicated text.
    *
    * Scale shape: the positional gram table is (8-byte id, 8-byte hash)
    * rows; both aggregations are map-side combinable, and the per-doc-gram
    * → gram-document-frequency join happens on `h` with BOTH sides already
    * hash-partitioned by the preceding groupBys — Catalyst reuses the
    * partitioning, so the join adds no exchange. Text itself never
    * shuffles. Returns (id, n_grams, n_dup_grams) with zero rows for
    * short docs preserved. */
  def dupNgramSpans(docs: DataFrame, idCol: String, textCol: String,
                    n: Int = 8): DataFrame = {
    // spread the narrow gate scan before the tokenize+shingle HOFs (the
    // trigramSurprisal precedent): unspread, the whole positional-gram
    // production ran as one 8.9 s task at sf0.1 (guide §2.5)
    val pos = Spread.ifNarrow(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__t"))
      .select(col(idCol), TextOps.hashedShingleSeq(col("__t"), n).as("g"))
      .select(col(idCol), explode_outer(col("g")).as("h"))
      .filter(col("h").isNotNull)
    val perDocGram = pos.groupBy(col(idCol), col("h")).agg(count(lit(1)).as("occ"))
    val gramDf = perDocGram.groupBy("h").agg(count(lit(1)).as("df"))
    val per = perDocGram.join(gramDf, Seq("h"))
      .groupBy(idCol).agg(
        sum("occ").as("n_grams"),
        sum(when(col("df") >= 2, col("occ")).otherwise(0L)).as("n_dup_grams"))
    docs.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"))
  }

  /** 16-way content-stable hash bucket: first hex digit of `md5(id)` —
    * reproducible across engines, runs, partitionings and retries. The
    * shared primitive under [[stratifiedSample]] and [[assignSplit]]. */
  private def hexBucket(idCol: String): Column =
    conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 1), 16, 10)
      .cast("int")

  /** Deterministic leakage-free train/validation/test split: buckets
    * `[0, 16-val-test)` train, the next `valOf16` validation, the last
    * `testOf16` test. A document's split is a pure function of its id, so
    * re-running the pipeline (or adding data) never migrates an old row
    * between splits — train/test leakage cannot creep in through
    * re-partitioning, and the assignment evaluates inside the scan with no
    * shuffle. */
  def assignSplit(docs: DataFrame, idCol: String,
                  valOf16: Int = 2, testOf16: Int = 2): DataFrame = {
    require(valOf16 >= 0 && testOf16 >= 0 && valOf16 + testOf16 < 16,
      s"val+test buckets must leave room for train, got $valOf16 + $testOf16")
    docs.withColumn("bucket", hexBucket(idCol))
      .withColumn("split",
        when(col("bucket") < 16 - valOf16 - testOf16, "train")
          .when(col("bucket") < 16 - testOf16, "val")
          .otherwise("test"))
  }

  /** Deterministic stratified sampling by content-stable hash bucket: each
    * row lands in one of 16 buckets via the first hex digit of
    * `md5(idCol)`, and a stratum keeps rows whose bucket index is below its
    * configured keep-count (keep `k` of 16 ≈ k/16 sampling rate).
    *
    * Why hash buckets and not `sample()`/`rand()`: the draw is a pure
    * function of the id — reproducible across runs, engines, partitionings
    * and retries (speculative re-execution of a task yields the same rows),
    * and the filter evaluates inside the scan with no count pass, no sort,
    * and no shuffle. This is how a 100 TB mixture is cut: per-stratum rates
    * tune the training mix (up-sample low-resource strata, down-sample the
    * head) while staying a one-pass filter. */
  def stratifiedSample(docs: DataFrame, idCol: String, stratumCol: String,
                       keepOf16: Map[String, Int], defaultKeep: Int): DataFrame = {
    require((defaultKeep +: keepOf16.values.toSeq).forall(k => k >= 0 && k <= 16),
      "keep counts must be in [0,16]")
    // fixed-order fold → deterministic when-chain regardless of map ordering
    val rate = keepOf16.toSeq.sortBy(_._1).foldLeft(lit(defaultKeep)) {
      case (acc, (stratum, k)) => when(col(stratumCol) === stratum, lit(k)).otherwise(acc)
    }
    docs.withColumn("bucket", hexBucket(idCol))
      .withColumn("keep_of_16", rate)
      .filter(col("bucket") < col("keep_of_16"))
  }

  /** Okapi BM25 score of every document against a fixed bag of query terms
    * (Robertson/Spärck Jones; the lexical-retrieval baseline a curation
    * pipeline uses for topic-targeted selection). Per-term statistics
    * (document frequency, mean document length) reduce to ONE aggregate row
    * that is broadcast back over the corpus — two linear scans, no shuffle
    * of the documents themselves.
    *
    * Float discipline (oracle-exact): tf/df/dl/N are integer-valued doubles
    * (exact in IEEE 754 at any realistic corpus size), `avg(dl)` divides an
    * exactly-summed integer total, and the per-term score sum folds in
    * fixed term order — so the only cross-engine noise is `ln` at 1 ulp,
    * absorbed by the caller's biased rounding.
    *
    * Output: (id, dl, tf_0.., bm25) one row per document. */
  def bm25(docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val tfCols = terms.indices.map(i =>
      size(filter(col("__t"), x => x === terms(i))).cast("double").as(s"tf_$i"))
    val base = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__t"))
      .select(col(idCol) +: size(col("__t")).cast("double").as("dl") +: tfCols: _*)
    val dfCols = terms.indices.map(i =>
      sum((col(s"tf_$i") > 0).cast("int")).cast("double").as(s"df_$i"))
    val stats = base.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl") +: dfCols: _*)
    val score = terms.indices.map { i =>
      val tf = col(s"tf_$i")
      val idf = log((col("n_docs") - col(s"df_$i") + lit(0.5)) /
        (col(s"df_$i") + lit(0.5)) + lit(1.0))
      // constants written as the same source-level arithmetic the oracle
      // uses ((k1 + 1.0), (1.0 - b)) so both engines fold identical doubles
      idf * (tf * (lit(k1) + lit(1.0))) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .select(col(idCol) +: col("dl").cast("long").as("dl") +:
        terms.indices.map(i => col(s"tf_$i").cast("long").as(s"tf_$i")) :+
        score.as("bm25"): _*)
  }

  /** Unigram language-model scoring (the CCNet/KenLM-style perplexity
    * filter reduced to its order-0 form): fit p(tok) = count/total over the
    * corpus itself, then score each document by its mean token log-prob.
    * Degenerate, boilerplate-heavy documents score HIGH (their tokens are
    * the corpus head); rare-garbage documents score LOW — both tails get
    * cut. Two aggregates (vocab, then per-doc mean via a broadcast
    * vocab join); the corpus text itself is never shuffled.
    *
    * At 100 TB the vocabulary (≤ millions of types after BPE) still
    * broadcasts; the per-doc mean is a map-side-combinable sum/count. */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ex = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__t"))
      .select(col(idCol), explode_outer(col("__t")).as("tok"))
      .filter(col("tok").isNotNull && col("tok") =!= "")
    val vocab = ex.groupBy("tok").agg(count(lit(1)).cast("double").as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("total"))
    val lp = vocab.crossJoin(broadcast(total))
      .select(col("tok"), log(col("cnt") / col("total")).as("logp"))
    ex.join(broadcast(lp), "tok")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_toks"),
        (sum(col("logp")) / count(lit(1))).as("mean_logprob"))
  }

  /** Corpus-relative salience: every document's single most distinctive
    * term by TF-IDF (raw term count × ln(N/df)), ties on the term string.
    * The (doc, term) counts and the global document frequencies are both
    * map-side-combinable aggregates over the exploded token stream; N joins
    * back as a broadcast 1-row aggregate.
    *
    * Returns (id, top_term, tf, df, tfidf) — one row per document with at
    * least one token. */
  def tfidfTopTerm(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ex = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__t"))
      .select(col(idCol), explode_outer(col("__t")).as("tok"))
      .filter(col("tok").isNotNull && col("tok") =!= "")
    val tf = ex.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    // one row per (doc, term) above → counting rows per term IS df
    val dfTab = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val w = Window.partitionBy(idCol).orderBy(col("tfidf").desc, col("tok"))
    tf.join(dfTab, "tok")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", col("tf") * log(col("n_docs") / col("df")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("tok").as("top_term"), col("tf"), col("df"), col("tfidf"))
  }

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS'23): hashed
    * n-gram bucket features, a bag-of-buckets unigram model fit on the
    * TARGET slice vs the RAW pool (Laplace-smoothed), and a per-document
    * log importance weight Σ_positions ln(p_target(b)/p_raw(b)).
    * Downstream selection keeps the top-weighted raw documents (or
    * Gumbel-resamples on the weights) to shift the raw pool toward the
    * target distribution without training a classifier.
    *
    * Scale shape: the bucket-count fit is two map-side-combinable sums on
    * a ≤`buckets`-sized key, the log-ratio model is `buckets` doubles of
    * collected fit metadata baked into the score pass as one literal
    * array (no join, no broadcast barrier), and the score itself is a
    * per-doc sum/count — the document text never shuffles. The bucket hash is
    * md5-derived (3 hex digits → 4096 cells) so an external SQL engine
    * reproduces it bit-for-bit; a production run would swap in
    * `xxhash64 % buckets` (same shape, cheaper) at the cost of the
    * cross-engine oracle.
    *
    * Returns one row per RAW (non-target) document:
    * (id, n_feats, dsir_logratio); documents too short for a single
    * n-gram get (0, 0.0). */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, buckets: Int = 4096, n: Int = 2): DataFrame =
    nbScore(docs, idCol, textCol, isTarget, buckets, n,
      rawOnly = true, roundLr = false, "dsir_logratio")

  /** Naive-Bayes log-count-ratio scores for EVERY document (the NBSVM /
    * fastText-flavored feature: Wang & Manning, ACL'12 §2.1) — the
    * [[dsirWeights]] machinery with the target slice defined by a LABEL
    * instead of a language, scored over the full corpus rather than the
    * raw pool only. Per-bucket log-ratios are rounded to 6 decimals
    * before the per-doc sum so a replaying engine agrees bit-for-bit
    * (the ln() last-ulp discipline). Same scale shape as dsirWeights:
    * one exploded traversal, ≤`buckets` rows of collected fit metadata
    * baked back as one literal array, no join in the score pass. */
  def nbLogRatio(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, buckets: Int = 4096, n: Int = 2): DataFrame =
    nbScore(docs, idCol, textCol, isTarget, buckets, n,
      rawOnly = false, roundLr = true, "nb_logratio")

  private def nbScore(docs: DataFrame, idCol: String, textCol: String,
                      isTarget: Column, buckets: Int, n: Int,
                      rawOnly: Boolean, roundLr: Boolean,
                      scoreName: String): DataFrame = {
    require(buckets > 0 && buckets <= 4096, s"buckets must be in (0, 4096], got $buckets")
    // guard: sequence(1, 0) yields a DESCENDING [1, 0], not an empty array
    val mk = transform(
      sequence(lit(1), size(col("__t")) - lit(n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(col("__t"), i + lit(j))): _*))
    val grams = when(size(col("__t")) >= n, mk)
      .otherwise(array().cast("array<string>"))
    val pos = docs
      .select(col(idCol), isTarget.cast("int").as("__tgt"),
        TextOps.tokens(col(textCol)).as("__t"))
      .select(col(idCol), col("__tgt"), explode_outer(grams).as("g"))
      .filter(col("g").isNotNull)
      .withColumn("b", conv(substring(md5(col("g")), 1, 3), 16, 10)
        .cast("int") % buckets)
    // ONE traversal of the exploded position stream: tokenize + md5 is the
    // dominant cost, and both the model fit and the score pass only need
    // the (doc, target-flag, bucket, multiplicity) aggregate — so compute
    // it once, materialize it (MEMORY_AND_DISK: strictly smaller than the
    // position stream it replaces — ≤ min(positions, B) rows per doc —
    // and spill-safe; at cluster scale this is the intermediate you'd
    // shuffle-materialize anyway), and derive the ≤B-key bucket table
    // from it with a second, tiny aggregate. Lazy re-derivation without
    // materialization would re-tokenize the corpus for each consumer.
    // localCheckpoint (not persist): a session-lifetime persist here leaks
    // cached blocks on every invocation; checkpoint blocks are released by
    // the ContextCleaner as soon as the returned frame is unreferenced.
    // (Not executor-loss-tolerant — acceptable for a scoring pass; a
    // cluster job would checkpoint to reliable storage instead.)
    val perDoc = pos.groupBy(col(idCol), col("__tgt"), col("b"))
      .agg(count(lit(1)).as("nb"))
      .localCheckpoint()
    // The bucket model is ≤B rows of fit METADATA (the same bounded-collect
    // contract as the IVF centroids): collect it, finish the smoothed
    // log-ratio on the driver, and bake the per-bucket ratios into the
    // score pass as ONE literal array indexed by bucket id. This replaces
    // two broadcast-barrier jobs (totals, ratio table) and a join with a
    // plain element_at — the score pass is then a single aggregate over
    // the cached (doc, bucket, n) rows with no join at all.
    val cntRows = perDoc.groupBy("b").agg(
        sum(when(col("__tgt") === 1, col("nb")).otherwise(0L)).cast("double").as("ct"),
        sum(when(col("__tgt") === 0, col("nb")).otherwise(0L)).cast("double").as("cr"))
      .collect()
    val ct = new Array[Double](buckets)
    val cr = new Array[Double](buckets)
    cntRows.foreach { r => val b = r.getInt(0); ct(b) = r.getDouble(1); cr(b) = r.getDouble(2) }
    val nt = ct.sum; val nr = cr.sum
    // one array-typed Literal, NOT a 4096-child CreateArray — the latter
    // costs visible analysis/codegen time at this width
    val lrLit = lit((0 until buckets).map { b =>
      val raw = math.log((ct(b) + 1.0) / (nt + buckets)) -
        math.log((cr(b) + 1.0) / (nr + buckets))
      if (roundLr) math.rint(raw * 1e6) / 1e6 else raw
    }.toArray)
    val scorees = if (rawOnly) perDoc.filter(col("__tgt") === 0) else perDoc
    val scored = scorees
      .withColumn("lr", element_at(lrLit, col("b") + 1))
      .groupBy(idCol)
      .agg(sum(col("nb")).as("n_feats"),
        sum(col("lr") * col("nb")).as(scoreName))
    val ids =
      if (rawOnly) docs.filter(!isTarget).select(col(idCol))
      else docs.select(col(idCol))
    ids
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col(scoreName), lit(0.0)).as(scoreName))
  }

  /** Corpus snapshot diff — dataset versioning's core primitive: classify
    * every document id across two corpus versions as `added` (v2 only),
    * `removed` (v1 only), `changed` (both, content fingerprint differs) or
    * `unchanged`. Powers incremental reprocessing: downstream stages
    * (dedup indexes, embedding caches, quality scores) re-run on
    * added+changed only instead of the full corpus.
    *
    * Scale shape: each side collapses to (id, xxhash64(text)) BEFORE the
    * join, so the full-outer join moves two 8-byte words per document —
    * text never shuffles. A 64-bit fingerprint false-"unchanged" needs an
    * exact collision (~n²/2⁶⁵); widen to two seeded lanes where that
    * matters. */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val a = v1.select(col(idCol), xxhash64(col(textCol)).as("__fp1"))
    val b = v2.select(col(idCol), xxhash64(col(textCol)).as("__fp2"))
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__fp1").isNull, lit("added"))
          .when(col("__fp2").isNull, lit("removed"))
          .when(col("__fp1") =!= col("__fp2"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** One round of corpus-scale BPE pair counting (Sennrich et al., ACL'16
    * §3.2): the most frequent adjacent character pairs, weighted by word
    * frequency. A tokenizer fit iterates this — count pairs, merge the
    * winner into the vocab, repeat — and the expensive part at 100 TB is
    * exactly this aggregation.
    *
    * Scale shape: the corpus stream collapses to the DISTINCT-WORD vocab
    * first (one map-side-combinable count — the classic BPE-on-vocab
    * optimization: pair counting is then proportional to vocabulary size,
    * not corpus size), pairs explode from the bounded vocab, and the
    * top-k is a single ordered limit. Ties break on the pair string so
    * the result is deterministic. */
  def bpePairCounts(docs: DataFrame, idCol: String, textCol: String,
                    topK: Int = 20): DataFrame = {
    val vocab = docs
      .select(explode_outer(TextOps.tokens(col(textCol))).as("w"))
      .filter(col("w").isNotNull && col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val mkPairs = transform(sequence(lit(1), length(col("w")) - lit(1)),
      i => col("w").substr(i, lit(2)))
    vocab
      .select(explode(when(length(col("w")) >= 2, mkPairs)
        .otherwise(array().cast("array<string>"))).as("pair"), col("freq"))
      .groupBy("pair").agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(topK)
  }

  /** Add-k smoothed bigram-LM surprisal (the order-1 step up from
    * [[unigramLogProb]] toward the CCNet/KenLM perplexity filter): fit
    * bigram and unigram counts on the corpus itself, then score each
    * document by its mean −ln p(w_i | w_{i−1}) with
    * p = (c(w_{i−1} w_i) + k) / (c(w_{i−1}) + k·V). Repetitive documents
    * score LOW (their transitions dominate the fit), rare-garbage ones
    * HIGH — the perplexity cut reads both tails.
    *
    * Scale shape (asserted in ScaleTechniquesSpec): positions collapse to
    * per-doc bigram multiplicities (id, h1, h2, n) BEFORE any join, so a
    * repetitive document moves one row per DISTINCT transition, not per
    * token; all join keys are single `xxhash64` words, so no string ever
    * rides a shuffle (a false merge needs an exact 64-bit collision,
    * ~pairs²/2⁶⁵); the unigram counts join the BIGRAM-VOCAB table (c2t),
    * never the doc stream, fusing into one per-bigram surprisal table; and
    * the doc stream then shuffles exactly once, through a PLAIN SHUFFLE
    * join — at web scale the vocab tables are GBs and must never broadcast
    * (Catalyst/AQE still auto-broadcast when runtime stats say a side is
    * genuinely small; no hint forces it — CONFIRMED at sf0.1: the final
    * adaptive plan runtime-converts these vocab joins to
    * BroadcastHashJoin while the declared plan stays a plain shuffle).
    * The only hinted broadcast is the 1-row vocab size. `minDf` prunes tail bigrams into the add-k
    * smoothing mass (their c2 scores as 0 — "unseen"); the default 1
    * keeps exact counting.
    *
    * Returns (id, n_bigrams, mean_surprisal) for every document;
    * documents with < 2 tokens get (0, 0.0). */
  def bigramSurprisal(docs: DataFrame, idCol: String, textCol: String,
                      k: Double = 0.5, minDf: Long = 1L): DataFrame = {
    // narrow-scan spread before the tokenizer HOF (trigramSurprisal
    // precedent; profiled 1.4 s single-task bigram production on q116)
    val toks = Spread.ifNarrow(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__t"))
    // same sequence(1, 0) == [1, 0] guard as dsirWeights
    val mkBig = transform(
      sequence(lit(1), size(col("__t")) - lit(1)),
      i => struct(element_at(col("__t"), i).as("w1"),
        element_at(col("__t"), i + lit(1)).as("w2")))
    val big = toks
      .select(col(idCol), explode_outer(when(size(col("__t")) >= 2, mkBig)
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("bg"))
      .filter(col("bg").isNotNull)
      .select(col(idCol), xxhash64(col("bg.w1")).as("h1"),
        xxhash64(col("bg.w1"), col("bg.w2")).as("h2"))
    val dbc = big.groupBy(col(idCol), col("h1"), col("h2"))
      .agg(count(lit(1)).as("n"))
    // h1 is functionally determined by h2 (the bigram fixes its first
    // word), so the bigram count table can carry it along — max() is just
    // the aggregate form of "the one value"
    val c2t = dbc.groupBy("h2")
      .agg(sum("n").cast("double").as("c2"), max("h1").as("h1"))
    val uni = toks
      .select(explode_outer(col("__t")).as("tok"))
      .filter(col("tok").isNotNull && col("tok") =!= "")
      .select(xxhash64(col("tok")).as("h1"))
      .groupBy("h1").agg(count(lit(1)).cast("double").as("c1"))
    val v = uni.agg(count(lit(1)).cast("double").as("vsz"))
    // fuse the per-bigram surprisal into ONE vocab-scale table so the
    // (doc, bigram) stream shuffles exactly once — the unigram join runs
    // against the bigram vocab (c2t), never against the doc stream.
    // minDf treats tail bigrams as unseen (c2 := 0, full smoothing mass).
    val stab = c2t
      .join(uni, Seq("h1"))
      .crossJoin(broadcast(v))
      .select(col("h2"),
        (-(log(when(col("c2") >= lit(minDf.toDouble), col("c2"))
            .otherwise(lit(0.0)) + lit(k)) -
          log(col("c1") + lit(k) * col("vsz")))).as("s"))
    dbc
      .join(stab, Seq("h2"))
      .groupBy(idCol)
      .agg(sum(col("n")).as("n_bigrams"),
        (sum(col("s") * col("n")) / sum(col("n"))).as("mean_surprisal"))
      .join(docs.select(col(idCol)), Seq(idCol), "right")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("mean_surprisal"), lit(0.0)).as("mean_surprisal"))
  }

  /** Jelinek–Mercer interpolated TRIGRAM-LM surprisal — the order-2 step
    * from [[bigramSurprisal]] toward a KenLM-grade perplexity filter:
    * p(w₃|w₁w₂) = λ₃·c(w₁w₂w₃)/c(w₁w₂) + λ₂·c(w₂w₃)/c(w₂) +
    * λ₁·(c(w₃)+k)/(N+kV), fit and scored on the same corpus (so every
    * observed trigram's prefix counts are ≥ 1 — no zero denominators by
    * construction). Same scale shape as the bigram scorer: 8-byte hashed
    * grams everywhere, the n-gram count tables join EACH OTHER (vocab
    * scale) into one fused per-trigram score table, and the (doc, trigram)
    * stream shuffles exactly once through a plain join against it; the
    * only hinted broadcast is the 1-row (N, V) aggregate. The component
    * hashes (prefix bigram, suffix bigram, w₂, w₃) are functionally
    * determined by the trigram hash, so they ride the count group-by as
    * max() — no re-tokenization.
    *
    * Returns (id, n_trigrams, mean_surprisal); docs with < 3 tokens get
    * (0, 0.0). */
  def trigramSurprisal(docs: DataFrame, idCol: String, textCol: String,
                       lambda3: Double = 0.5, lambda2: Double = 0.3,
                       lambda1: Double = 0.2, k: Double = 0.5): DataFrame = {
    require(math.abs(lambda1 + lambda2 + lambda3 - 1.0) < 1e-12,
      "interpolation weights must sum to 1")
    // spread the single-row-group gate scan before the tokenizer HOF —
    // `toks` feeds THREE per-row-expensive consumers (tri/bi/uni), each
    // otherwise replaying the one-partition tokenize (groupOverlap
    // precedent; gated on partition count so a pre-split corpus is not
    // re-shuffled)
    val toks = Spread.ifNarrow(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__t"))
    val mkTri = transform(
      sequence(lit(1), size(col("__t")) - lit(2)),
      i => struct(element_at(col("__t"), i).as("w1"),
        element_at(col("__t"), i + lit(1)).as("w2"),
        element_at(col("__t"), i + lit(2)).as("w3")))
    val triT = "array<struct<w1:string,w2:string,w3:string>>"
    val tri = toks
      .select(col(idCol), explode_outer(when(size(col("__t")) >= 3, mkTri)
        .otherwise(array().cast(triT))).as("tg"))
      .filter(col("tg").isNotNull)
      .select(col(idCol),
        xxhash64(col("tg.w1"), col("tg.w2"), col("tg.w3")).as("h123"),
        xxhash64(col("tg.w1"), col("tg.w2")).as("h12"),
        xxhash64(col("tg.w2"), col("tg.w3")).as("h23"),
        xxhash64(col("tg.w2")).as("h2"),
        xxhash64(col("tg.w3")).as("h3"))
    val dtc = tri.groupBy(col(idCol), col("h123"))
      .agg(count(lit(1)).as("n"), max("h12").as("h12"), max("h23").as("h23"),
        max("h2").as("h2"), max("h3").as("h3"))
    val c3t = dtc.groupBy("h123")
      .agg(sum("n").cast("double").as("c3"), max("h12").as("h12"),
        max("h23").as("h23"), max("h2").as("h2"), max("h3").as("h3"))
    // corpus bigram counts over ALL adjacent pairs (positions 1..n-1) —
    // serves both the prefix (h12) and suffix (h23) lookups
    val mkBig = transform(
      sequence(lit(1), size(col("__t")) - lit(1)),
      i => struct(element_at(col("__t"), i).as("w1"),
        element_at(col("__t"), i + lit(1)).as("w2")))
    val bigT = "array<struct<w1:string,w2:string>>"
    val bi = toks
      .select(explode_outer(when(size(col("__t")) >= 2, mkBig)
        .otherwise(array().cast(bigT))).as("bg"))
      .filter(col("bg").isNotNull)
      .select(xxhash64(col("bg.w1"), col("bg.w2")).as("hb"))
      .groupBy("hb").agg(count(lit(1)).cast("double").as("cb"))
    val uni = toks
      .select(explode_outer(col("__t")).as("tok"))
      .filter(col("tok").isNotNull && col("tok") =!= "")
      .select(xxhash64(col("tok")).as("hu"))
      .groupBy("hu").agg(count(lit(1)).cast("double").as("cu"))
    val nv = uni.agg(sum("cu").as("nn"), count(lit(1)).cast("double").as("vsz"))
    val stab = c3t
      .join(bi.select(col("hb").as("h12"), col("cb").as("c12")), Seq("h12"))
      .join(bi.select(col("hb").as("h23"), col("cb").as("c23")), Seq("h23"))
      .join(uni.select(col("hu").as("h2"), col("cu").as("cu2")), Seq("h2"))
      .join(uni.select(col("hu").as("h3"), col("cu").as("cu3")), Seq("h3"))
      .crossJoin(broadcast(nv))
      .select(col("h123"),
        (-log(lit(lambda3) * col("c3") / col("c12") +
          lit(lambda2) * col("c23") / col("cu2") +
          lit(lambda1) * (col("cu3") + lit(k)) /
            (col("nn") + lit(k) * col("vsz")))).as("s"))
    dtc
      .join(stab, Seq("h123"))
      .groupBy(idCol)
      .agg(sum(col("n")).as("n_trigrams"),
        (sum(col("s") * col("n")) / sum(col("n"))).as("mean_surprisal"))
      .join(docs.select(col(idCol)), Seq(idCol), "right")
      .select(col(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("mean_surprisal"), lit(0.0)).as("mean_surprisal"))
  }

  /** Bounded-memory vocabulary head via the Misra–Gries summary
    * ([[graft.functions.HeavyHittersAgg]]): the top of the token
    * distribution in ONE linear scan with ≤ `capacity` counters per task
    * and a single ≤capacity-entry row crossing the shuffle per partition —
    * no token-keyed exchange at all, where the exact vocab count (q82) is
    * a full shuffle. The price is approximation: counts are lower bounds
    * undershooting by at most N/(capacity+1), and items below that
    * threshold may or may not appear (merge-order dependent) — the head
    * itself is guaranteed present. Use it as the in-pass statistic
    * (stop-word lists, head-domination diagnostics) and the exact batch
    * job when counts must be exact.
    *
    * Returns (item, count_lower) rows, count desc, item asc. */
  def heavyHitterVocab(docs: DataFrame, textCol: String,
                       capacity: Int = 64): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    docs
      .select(explode_outer(TextOps.tokens(col(textCol))).as("tok"))
      .filter(col("tok").isNotNull && col("tok") =!= "")
      .agg(call_function("graft_heavy_hitters", col("tok"), lit(capacity)).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("item"), col("e.count_lower").as("count_lower"))
  }

  /** Per-stratum Count-Min frequency sketches with point probes — the
    * "how often does THIS token occur in THAT slice" statistic in bounded
    * memory ([[graft.functions.CountMinAgg]]). Complements the sketch
    * family: bloom answers membership, HLL answers distinct counts,
    * Misra–Gries answers "which items are heavy" (lower bounds), count-min
    * answers point frequencies (upper bounds: estimate ≥ truth, ≤ truth +
    * ε·N w.h.p.).
    *
    * Scale shape: one linear scan; each task collapses its partition into
    * a fixed depth×width grid (map-side combine), grids merge by
    * elementwise addition (EXACTLY mergeable — no approximation
    * compounding), and the per-stratum sketch table answers any later
    * probe without rescanning the corpus. Tokens ride the sketch as
    * xxhash64 keys; the probe loop is codegen'd.
    *
    * Returns (group, term, est_count) for every (stratum, probe term). */
  def cmsTokenEstimates(docs: DataFrame, groupCol: String, textCol: String,
                        terms: Seq[String], depth: Int = 4,
                        width: Int = 8192): DataFrame = {
    require(terms.nonEmpty, "need at least one probe term")
    graft.functions.VectorFunctions.register(docs.sparkSession)
    val sketches = docs
      .select(col(groupCol), explode_outer(TextOps.tokens(col(textCol))).as("tok"))
      .filter(col("tok").isNotNull && col("tok") =!= "")
      .groupBy(groupCol)
      .agg(call_function("graft_cms_agg", xxhash64(col("tok")),
        lit(depth), lit(width)).as("sketch"))
    sketches
      .select(col(groupCol), col("sketch"),
        explode(array(terms.map(lit): _*)).as("term"))
      .select(col(groupCol), col("term"),
        call_function("graft_cms_estimate", col("sketch"),
          xxhash64(col("term"))).as("est_count"))
  }

  /** Character-level Shannon entropy per document — the cheap gibberish /
    * binary-spill / encoding-damage filter (low entropy: repeated filler;
    * high entropy: compressed or base64 payloads masquerading as text; cf.
    * the character-distribution heuristics in Gopher rule filtering).
    *
    * Scale shape: one native JVM pass per row
    * ([[graft.functions.CharEntropyStats]]) — zero shuffles, zero
    * explodes, zero per-char object churn; the codepoint histogram folds
    * inside the scan. Measured progression over sf0.1, kept as a column-
    * algebra cautionary tale: `array_distinct` + per-char `filter` was
    * O(distinct·n) at 5.4 s; the sorted-run-length HOF fold was O(n log n)
    * but still 1.98 s (a UTF8String allocated PER CHARACTER by `split`,
    * interpreted lambdas per element); the native loop is ~0.1 s. HOFs are
    * the right tool until the per-ELEMENT work is the bottleneck — then a
    * custom expression with a primitive-array loop wins an order of
    * magnitude.
    *
    * Returns (id, n_chars_h, entropy) — n_chars_h counts codepoints;
    * empty documents get (0, 0.0). */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    docs
      .select(col(idCol),
        call_function("graft_char_entropy", col(textCol)).as("__e"))
      .select(col(idCol), col("__e.n_chars_h").as("n_chars_h"),
        col("__e.entropy").as("entropy"))
  }

  /** Quality-ranked near-duplicate cluster representative selection — the
    * curation policy a plain keep-min-id dedup gets wrong: inside each
    * near-dup cluster keep the HIGHEST-quality member (SemDeDup keeps by
    * cosine-to-centroid; FineWeb keeps by heuristic score), not an
    * arbitrary one. Composes [[DedupOps.nearDupClusters]]' (id, cluster)
    * labels with any per-doc quality column.
    *
    * Scale shape: one window over the cluster labels — hash-partitioned by
    * cluster id, and cluster sizes are near-dup group sizes (bounded small
    * in a real corpus), so no skew concern. The quality frame joins the
    * label frame on the 8-byte id only; text never moves.
    *
    * Returns every doc: (id, cluster, quality, keep) where keep=1 marks the
    * per-cluster argmax (ties broken toward the smaller id for
    * reproducibility). */
  def bestOfCluster(labels: DataFrame, quality: DataFrame, idCol: String,
                    qualityCol: String): DataFrame = {
    val w = Window.partitionBy("cluster")
      .orderBy(col(qualityCol).desc, col(idCol))
    labels.select(col("id").as(idCol), col("cluster"))
      .join(quality.select(col(idCol), col(qualityCol)), Seq(idCol))
      .withColumn("keep", (row_number().over(w) === 1).cast("int"))
  }

  /** Distributed prefix sum over a total order — the scalable form of
    * `sum(x) OVER (ORDER BY …)`, which in naive Spark collapses the whole
    * dataset into ONE partition (the WindowExec "No Partition Defined"
    * trap). Classic two-phase scan: range-repartition on the order key, run
    * the running sum WITHIN each range partition, then offset every
    * partition by the sum of all earlier partitions — the offset table is
    * one row per PARTITION (bounded metadata, like the IVF centroids), so
    * its own global window is trivially safe, and it joins back with a
    * broadcast hint.
    *
    * Order keys must form a total order (caller appends a tiebreaker id) —
    * range partitioning needs no such guarantee, but result determinism
    * does.
    *
    * With `groupCols` the running sum restarts per group (the distributed
    * `sum(x) OVER (PARTITION BY g ORDER BY …)` for groups too large for
    * one partition): ranges span (group, order) so each group is
    * contiguous across partitions, and the offset window is PARTITIONED
    * by group — ~#groups + #partitions offset rows total, no global
    * window at all on that path.
    *
    * Why `.rdd` + `mapPartitionsWithIndex` instead of `spark_partition_id`
    * windows (the sanctioned-last-resort clause, invoked deliberately):
    * the local-sum and offset branches both need the row's range-partition
    * id, and `spark_partition_id()` is NONDETERMINISTIC — column pruning
    * gives the two branches non-identical range exchanges, ReuseExchange
    * doesn't fire, each branch samples its own `RangePartitioner`
    * boundaries (seeded by rdd id), and the two `__pid`s stop referring to
    * the same boundaries: ranks silently shift near partition edges
    * depending on which consumer plan runs. Freezing ONE physical RDD via
    * `.rdd` plans the exchange exactly once (both branches reuse its
    * shuffle map stage), and the per-partition scan bakes a `__pid` that
    * is stable by construction. The scan itself is streaming O(rows),
    * holding one running sum per group resident in the partition.
    *
    * Null `valueCol` rows contribute 0 to the running sum (SQL window sum
    * would instead emit NULL until the first non-null — callers here all
    * feed non-null values).
    *
    * Returns the input plus `cumCol` = running sum of `valueCol` inclusive
    * of the current row, in `orderCols` order (per group if given). */
  def orderedPrefixSum(df: DataFrame, orderCols: Seq[Column], valueCol: Column,
                       cumCol: String, partitions: Int = 32,
                       groupCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val gCols = groupCols.map(col)
    val keyed = df.withColumn("__v", valueCol)
    val isIntegral = keyed.schema("__v").dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val prepared = keyed.withColumn("__v",
      col("__v").cast(if (isIntegral) LongType else DoubleType))
    val sortCols = gCols ++ orderCols
    val ranged = prepared.repartitionByRange(partitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = ranged.schema
    val gIdx = groupCols.map(schema.fieldIndex).toArray
    val vIdx = schema.fieldIndex("__v")
    val localRdd = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      val runL = scala.collection.mutable.HashMap.empty[Seq[Any], Long]
      val runD = scala.collection.mutable.HashMap.empty[Seq[Any], Double]
      val seq = scala.collection.mutable.HashMap.empty[Seq[Any], Long]
      it.map { row =>
        val gk: Seq[Any] = gIdx.map(row.get).toIndexedSeq
        val local: Any =
          if (isIntegral) {
            val v = if (row.isNullAt(vIdx)) 0L else row.getLong(vIdx)
            val s = runL.getOrElse(gk, 0L) + v; runL(gk) = s; s
          } else {
            val v = if (row.isNullAt(vIdx)) 0.0 else row.getDouble(vIdx)
            val s = runD.getOrElse(gk, 0.0) + v; runD(gk) = s; s
          }
        val sq = seq.getOrElse(gk, 0L) + 1L; seq(gk) = sq
        Row.fromSeq(row.toSeq :+ pid :+ local :+ sq)
      }
    }
    val base = spark.createDataFrame(localRdd, schema
      .add("__pid", IntegerType, nullable = false)
      .add("__local", if (isIntegral) LongType else DoubleType, nullable = false)
      .add("__seq", LongType, nullable = false))
    val wOff = (if (gCols.isEmpty) Window.orderBy("__pid")
                else Window.partitionBy(gCols: _*).orderBy("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val zero = if (isIntegral) lit(0L) else lit(0.0)
    // the (pid, group) total is the LAST running value (max_by on the scan
    // counter) — plain max(__local) would be wrong for negative values
    val offsets = base.groupBy(col("__pid") +: gCols: _*)
      .agg(max_by(col("__local"), col("__seq")).as("__psum"))
      .withColumn("__offset", coalesce(sum(col("__psum")).over(wOff), zero))
      .select((col("__pid") +: gCols) :+ col("__offset"): _*)
    val joined =
      if (gCols.isEmpty) base.join(broadcast(offsets), Seq("__pid"))
      else base.join(offsets, "__pid" +: groupCols) // agg-sized side; AQE broadcasts
    joined.withColumn(cumCol, col("__local") + col("__offset"))
      .drop("__pid", "__local", "__offset", "__seq", "__v")
  }

  /** Token-budget corpus selection + training-shard assignment: order the
    * corpus by a quality key (best first), take documents while the running
    * token total stays within `budget`, and pack the selected stream into
    * fixed-token-budget shards by cumulative position — the final "write
    * the training set" step, producing a deterministic shard manifest
    * instead of whatever file layout the cluster happened to emit.
    *
    * Built on [[orderedPrefixSum]], so the global running sum never
    * single-partitions the corpus. Shard id = ⌊(cum − tokens)/shardTokens⌋
    * (a document belongs to the shard its FIRST token lands in) — a pure
    * function of the prefix sum, so re-running at any parallelism yields
    * the identical manifest.
    *
    * Returns (id, tokens, quality, cum_tokens, selected, shard). */
  def tokenShards(docs: DataFrame, idCol: String, tokensCol: Column,
                  qualityCol: Column, budget: Long, shardTokens: Long): DataFrame = {
    val base = docs.select(col(idCol), tokensCol.cast("long").as("tokens"),
      qualityCol.as("quality"))
    orderedPrefixSum(base, Seq(col("quality").desc, col(idCol)), col("tokens"),
        "cum_tokens")
      .withColumn("selected", (col("cum_tokens") <= budget).cast("int"))
      .withColumn("shard",
        when(col("selected") === 1,
          floor((col("cum_tokens") - col("tokens")) / lit(shardTokens.toDouble))
            .cast("long"))
          .otherwise(lit(-1L)))
  }

  /** Exact-target mixture downsampling: given target SHARES per stratum,
    * find the largest corpus the available data can honor — feasible
    * total T = min over strata of N_s/share_s (the scarcest stratum
    * binds; closed form, no iteration) — then keep each stratum's
    * ⌊share_s·T⌋ quota with a DETERMINISTIC md5 draw (u16 < rate, the
    * [[stratifiedSample]] hash discipline at 1/65536 granularity): the
    * sampling-rate planner a mixture spec turns into an actual keep
    * filter, where [[temperatureMix]] only reweights. Strata absent from
    * the target map are dropped (share 0). Counts and rates live on a
    * strata-sized aggregate; the corpus itself is touched by one count
    * scan + one row-local filter.
    *
    * Returns one row per targeted stratum: (stratumCol, n_docs,
    * target_share, feasible_total, kept_target, keep_rate, n_kept) —
    * n_kept is the realized draw (≈ kept_target, binomial noise;
    * identical in any engine because the draw is a pure id hash). */
  def targetMixtureSample(docs: DataFrame, idCol: String, stratumCol: String,
                          targetShares: Map[String, Double],
                          scoreOut: Column => Column): DataFrame = {
    require(targetShares.nonEmpty && targetShares.values.forall(s => s > 0 && s <= 1),
      "target shares must be positive")
    require(math.abs(targetShares.values.sum - 1.0) < 1e-9,
      s"target shares must sum to 1, got ${targetShares.values.sum}")
    // fixed-order fold → deterministic when-chain regardless of map order
    val shareCol = targetShares.toSeq.sortBy(_._1)
      .foldLeft(lit(Double.NaN)) { case (acc, (s, p)) =>
        when(col(stratumCol) === s, lit(p)).otherwise(acc)
      }
    val base = docs
      .select(col(idCol), col(stratumCol), shareCol.as("target_share"))
      .filter(!isnan(col("target_share")))
    // anchor the counts on the TARGET list, not the observed strata: a
    // targeted stratum with zero rows must drive the water line to 0
    // (nothing can honor its share), not silently drop out of the min
    val spark = docs.sparkSession
    import spark.implicits._
    val targets = targetShares.toSeq.sortBy(_._1)
      .toDF(stratumCol, "target_share")
    val counts = targets.join(
        base.groupBy(stratumCol).agg(count(lit(1)).as("n_docs")),
        Seq(stratumCol), "left")
      .withColumn("n_docs", coalesce(col("n_docs"), lit(0L)))
    val feasible = counts.agg(
      min(floor(col("n_docs") / col("target_share"))).as("feasible_total"))
    val rates = counts.crossJoin(broadcast(feasible))
      .withColumn("kept_target",
        floor(col("target_share") * col("feasible_total")).cast("long"))
      .withColumn("keep_rate", // 0/0 on an empty stratum reads as rate 0
        when(col("n_docs") > 0, col("kept_target") / col("n_docs"))
          .otherwise(lit(0.0)))
    val u16 = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("int") / lit(65536.0)
    base.join(rates.select(col(stratumCol), col("keep_rate")), Seq(stratumCol))
      .filter(u16 < col("keep_rate"))
      .groupBy(stratumCol).agg(count(lit(1)).as("n_kept"))
      .join(rates, Seq(stratumCol), "right")
      .select(col(stratumCol), col("n_docs"),
        scoreOut(col("target_share")).as("target_share"),
        col("feasible_total").cast("long").as("feasible_total"),
        col("kept_target"),
        scoreOut(col("keep_rate")).as("keep_rate"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Temperature-scaled mixture weights per stratum (the multilingual /
    * multi-domain rebalancing rule, sampled at α≈0.3–0.7 in multilingual
    * LM training): a stratum with natural share p gets temperature share
    * p^α / Σ p^α — flattening the head, boosting the tail — and each of
    * its documents the sampling multiplier (temperature share / natural
    * share). Two tiny aggregates: per-stratum counts (map-side
    * combinable), then a 1-row normalizer broadcast back; the corpus
    * itself is never touched beyond the count scan.
    *
    * Returns one row per stratum: (strata…, n_docs, p_nat, p_temp,
    * multiplier). */
  def temperatureMix(docs: DataFrame, strataCols: Seq[String],
                     alpha: Double = 0.3): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"temperature alpha must be in (0,1], got $alpha")
    val counts = docs.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).cast("double").as("n"))
    val norm = counts.agg(sum(col("n")).as("total"),
      sum(pow(col("n"), lit(alpha))).as("ztemp"))
    counts.crossJoin(broadcast(norm))
      .select(strataCols.map(col) ++ Seq(
        col("n").cast("long").as("n_docs"),
        (col("n") / col("total")).as("p_nat"),
        (pow(col("n"), lit(alpha)) / col("ztemp")).as("p_temp"),
        (pow(col("n"), lit(alpha)) / col("ztemp") /
          (col("n") / col("total"))).as("multiplier")): _*)
  }

  /** Leakage-safe train/val/test split: hash-bucket assignment keyed on the
    * NEAR-DUP CLUSTER representative, not the document id — two near-copies
    * must never straddle the train/test boundary, or the eval set silently
    * measures memorization (the split-contamination failure mode
    * benchmark decontamination alone doesn't catch). `clusters` is
    * [[DedupOps.nearDupClusters]] output (id, cluster); singletons are
    * their own cluster, so this degrades to [[assignSplit]] exactly when
    * no near-dups exist. One equi-join on the id — the cluster table is
    * (id, id) pairs, document text is never touched.
    *
    * Returns (id, cluster, bucket, split). */
  def leakageSafeSplit(clusters: DataFrame, idCol: String,
                       valOf16: Int = 2, testOf16: Int = 2): DataFrame = {
    require(valOf16 >= 0 && testOf16 >= 0 && valOf16 + testOf16 < 16,
      s"val+test buckets must leave room for train, got $valOf16 + $testOf16")
    clusters.select(col("id").as(idCol), col("cluster"))
      .withColumn("bucket", hexBucket("cluster"))
      .withColumn("split",
        when(col("bucket") < 16 - valOf16 - testOf16, "train")
          .when(col("bucket") < 16 - testOf16, "val")
          .otherwise("test"))
  }

  /** Per-group lexical-diversity statistics: type-token ratio (distinct
    * tokens / total tokens) and hapax fraction (share of types occurring
    * once) — the vocabulary-richness signals that flag template-generated
    * or keyword-stuffed sources a perplexity filter scores as fluent. Two
    * stacked map-side-combinable aggregates over (group, token); text
    * never rides the shuffle. */
  def lexicalDiversity(docs: DataFrame, groupCol: String, textCol: String,
                       scoreOut: Column => Column): DataFrame = {
    val ex = docs
      .select(col(groupCol), TextOps.tokens(col(textCol)).as("__t"))
      .select(col(groupCol), explode_outer(col("__t")).as("token"))
      .filter(col("token").isNotNull && col("token") =!= "")
    ex.groupBy(groupCol, "token").agg(count(lit(1)).as("c"))
      .groupBy(groupCol)
      .agg(sum("c").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col(groupCol), col("n_tokens"), col("n_types"), col("n_hapax"),
        scoreOut(col("n_types").cast("double") / col("n_tokens")).as("ttr"),
        scoreOut(col("n_hapax").cast("double") / col("n_types")).as("hapax_frac"))
  }

  /** Weighted sampling without replacement (Efraimidis & Spirakis,
    * IPL'06 "A-Res"): each row gets key = u^(1/w) for a uniform u ∈ (0,1]
    * and weight w > 0; the k LARGEST keys are a weighted sample — the
    * "sample documents proportional to token count" primitive behind
    * mixture construction. u comes from a Knuth multiplicative hash of the
    * id ((id·2654435761) mod 2³¹), pure integer-then-double arithmetic
    * that is bit-identical in any engine — so the sample is reproducible
    * across runs, engines and retries, the same determinism discipline as
    * [[stratifiedSample]] (swap in xxhash64 for production-grade mixing;
    * the structure is unchanged). Zero/negative weights are excluded (a
    * w = 0 row can never be sampled).
    *
    * The top-k is an `orderBy(key).limit(k)` — TakeOrdered at scale: one
    * per-partition heap + a k-row driver merge, NEVER a global sort.
    *
    * Returns the k sampled rows: (id, w, u, key, rank). */
  def weightedSample(docs: DataFrame, idCol: String, weight: Column, k: Int,
                     scoreOut: Column => Column): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    graft.functions.VectorFunctions.register(docs.sparkSession)
    // reduce the id mod 2³¹ BEFORE the Knuth multiply: 2³¹·2654435761 ≈
    // 5.7e18 < Long.Max, so the product can never overflow — a plain
    // id·2654435761 silently wraps in Spark (non-ANSI) for ids ≳3.4e9
    // while DuckDB raises, breaking the bit-identical cross-engine draw
    val h = pmod(pmod(col(idCol).cast("long"), lit(2147483648L)) *
      lit(2654435761L), lit(2147483647L))
    val u = (h + lit(1.0)) / lit(2147483648.0)
    val keyed = docs
      .select(col(idCol), weight.cast("double").as("w"))
      .filter(col("w") > 0)
      .withColumn("u", scoreOut(u))
      .withColumn("key", scoreOut(pow(u, lit(1.0) / col("w"))))
    val top = keyed.orderBy(col("key").desc, col(idCol)).limit(k)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("key").desc, col(idCol))))
  }

  /** Jensen–Shannon divergence between two corpora's token distributions —
    * the drift/selection metric behind mixture rebalancing and DSIR-style
    * target matching: "how far is my candidate pool from the reference
    * domain?" in one number (0 = identical, ln 2 = disjoint support).
    *
    * JS(P,Q) = ½·KL(P‖M) + ½·KL(Q‖M) with M = (P+Q)/2, in nats. Tokens
    * absent from one side contribute only through the other sum (their KL
    * term has p = 0 → 0 by the usual convention), so no smoothing constant
    * is needed — M > 0 wherever either distribution is.
    *
    * Scale shape: each corpus collapses to (token, tf) by ONE map-side-
    * combinable aggregate (text never rides the shuffle — only short token
    * strings); the two distributions full-outer join on the token key, and
    * the per-token contributions fold into a single summary row. The 1-row
    * totals attach via broadcast cross joins, the same scalar pattern as
    * [[temperatureMix]]. At 100 TB the joined stream is vocabulary-sized,
    * not corpus-sized.
    *
    * Returns one row: (n_a, n_b, vocab_a, vocab_b, vocab_union, kl_a_m,
    * kl_b_m, js) — the KL halves unrounded for callers, `scoreOut` applied
    * to every float output. */
  def jsDivergence(corpusA: DataFrame, corpusB: DataFrame, textCol: String,
                   scoreOut: Column => Column): DataFrame = {
    def dist(docs: DataFrame): DataFrame = {
      val ex = docs
        .select(TextOps.tokens(col(textCol)).as("__t"))
        .select(explode_outer(col("__t")).as("token"))
        .filter(col("token").isNotNull && col("token") =!= "")
      val tf = ex.groupBy("token").agg(count(lit(1)).cast("double").as("tf"))
      val tot = tf.agg(sum("tf").as("n"))
      tf.crossJoin(broadcast(tot)).select(col("token"), col("tf"), col("n"),
        (col("tf") / col("n")).as("p"))
    }
    val a = dist(corpusA).select(col("token"), col("n").as("n_a"), col("p").as("pa"))
    val b = dist(corpusB).select(col("token"), col("n").as("n_b"), col("p").as("pb"))
    val joined = a.join(b, Seq("token"), "full_outer")
      .select(col("token"), col("n_a"), col("n_b"),
        coalesce(col("pa"), lit(0.0)).as("p"),
        coalesce(col("pb"), lit(0.0)).as("q"))
      .withColumn("m", (col("p") + col("q")) / lit(2.0))
    joined.agg(
        max("n_a").cast("long").as("n_a"),
        max("n_b").cast("long").as("n_b"),
        sum(when(col("p") > 0, 1L).otherwise(0L)).as("vocab_a"),
        sum(when(col("q") > 0, 1L).otherwise(0L)).as("vocab_b"),
        count(lit(1)).as("vocab_union"),
        sum(when(col("p") > 0, col("p") * log(col("p") / col("m")))
          .otherwise(lit(0.0))).as("kl_a_m"),
        sum(when(col("q") > 0, col("q") * log(col("q") / col("m")))
          .otherwise(lit(0.0))).as("kl_b_m"))
      .select(col("n_a"), col("n_b"), col("vocab_a"), col("vocab_b"),
        col("vocab_union"),
        scoreOut(col("kl_a_m")).as("kl_a_m"),
        scoreOut(col("kl_b_m")).as("kl_b_m"),
        scoreOut((col("kl_a_m") + col("kl_b_m")) / lit(2.0)).as("js"))
  }

  /** Source-relative quality normalization: a raw quality score is not
    * comparable ACROSS sources (a mid-tier web page and a mid-tier academic
    * paper score very differently), so per-source percentile rank is the
    * score a cross-source quality cut actually thresholds on — the
    * "keep the top 30% of every source" rule common in web-corpus curation.
    *
    * `percent_rank` = (rank − 1)/(n − 1) over the ROUNDED score with the id
    * as tiebreak — deterministic cross-engine (same discipline as
    * [[bestOfCluster]]). The window partitions by source: each source sorts
    * independently, so the operator scales with the largest single source,
    * not the corpus; the sorted payload is (id, score) pairs only.
    *
    * Returns input ids with (source, quality, pct_rank, keep). */
  def sourceRelativeQuality(docs: DataFrame, idCol: String, sourceCol: String,
                            quality: Column, keepFrom: Double,
                            scoreOut: Column => Column): DataFrame = {
    val scored = docs.select(col(idCol), col(sourceCol),
      scoreOut(quality).as("quality"))
    val w = Window.partitionBy(sourceCol).orderBy(col("quality"), col(idCol))
    scored
      .withColumn("pct_rank", scoreOut(percent_rank().over(w)))
      .withColumn("keep", (col("pct_rank") >= keepFrom).cast("int"))
  }

  /** Maximal duplicated-span runs per document — the span-level form of
    * the cross-doc duplicated n-gram statistic (q112), matching the
    * exact-substring-dedup semantics of Lee et al. '22: consecutive
    * duplicated n-gram POSITIONS merge into runs (gaps-and-islands on
    * position − rank), and a run of `r` grams covers r + n − 1 tokens —
    * the excisable span. Shuffle keys are 8-byte gram hashes and (doc,
    * position) pairs; text never rides a join.
    *
    * Returns (id, n_dup_pos, n_runs, max_run_grams, max_span_tokens). */
  def dupSpanRuns(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 8): DataFrame = {
    // same narrow-scan spread as [[dupNgramSpans]] (tokenize+shingle HOFs)
    val pos = Spread.ifNarrow(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__t"))
      .select(col(idCol), posexplode_outer(TextOps.hashedShingleSeq(col("__t"), n)))
      .toDF(idCol, "pos", "h")
      .filter(col("h").isNotNull)
    val df = pos.select(col(idCol), col("h")).distinct()
      .groupBy("h").agg(count(lit(1)).as("df"))
    val dup = pos.join(df.filter(col("df") >= 2).select("h"), Seq("h"))
      .select(col(idCol), col("pos"))
    val w = Window.partitionBy(idCol).orderBy("pos")
    val runs = dup
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col(idCol), col("grp"))
      .agg(count(lit(1)).as("run"))
      .groupBy(idCol)
      .agg(sum("run").as("n_dup_pos"),
        count(lit(1)).as("n_runs"),
        max("run").as("max_run_grams"))
    docs.select(col(idCol))
      .join(runs, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_dup_pos"), lit(0L)).as("n_dup_pos"),
        coalesce(col("n_runs"), lit(0L)).as("n_runs"),
        coalesce(col("max_run_grams"), lit(0L)).as("max_run_grams"),
        when(col("max_run_grams").isNull, 0L)
          .otherwise(col("max_run_grams") + lit(n - 1)).as("max_span_tokens"))
  }

  /** SCD1 changeset application (MERGE/upsert): one full-outer join of the
    * base snapshot against a changeset on the id — change rows win,
    * tombstones delete, untouched base rows carry forward — with the op
    * audit (`insert`/`update`/`delete`/`keep`) attached so the write is
    * its own reconciliation report. The snapshot twin of [[snapshotDiff]]:
    * diff derives a changeset, this applies one. Join carries (id,
    * payload) only; at scale the base side is the bucketed table and the
    * changeset is the small side.
    *
    * Returns surviving rows (id, value, op) — delete ops are REPORTED as
    * rows with a null value (callers filter `op != 'delete'` for the pure
    * snapshot; keeping them makes the audit complete). */
  def applyChangeset(base: DataFrame, changes: DataFrame, idCol: String,
                     valueCol: String, deleteCol: String): DataFrame = {
    val b = base.select(col(idCol), col(valueCol).as("__bv"))
    val c = changes.select(col(idCol), col(valueCol).as("__cv"),
      col(deleteCol).cast("boolean").as("__del"))
    b.join(c, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__del"), lit(null).cast("string"))
          .when(col("__cv").isNotNull, col("__cv"))
          .otherwise(col("__bv")).as(valueCol),
        when(col("__del") && col("__bv").isNotNull, "delete")
          .when(col("__del"), "delete_missing")
          .when(col("__cv").isNotNull && col("__bv").isNull, "insert")
          .when(col("__cv").isNotNull && col("__cv") =!= col("__bv"), "update")
          .when(col("__cv").isNotNull, "noop_update")
          .otherwise("keep").as("op"))
  }

  /** T5-style span corruption (Raffel et al., JMLR'20 §3.1.4 simplified to
    * per-position masking): each token position is masked by a
    * DETERMINISTIC hash draw (first md5 hex digit of "id_pos" below
    * `maskOf16`), masked tokens are replaced by a sentinel in the input
    * and collected as the target — denoising pairs that are reproducible
    * across runs, engines and retries, the same content-stable-draw
    * discipline as [[stratifiedSample]]. Pure row-local array algebra:
    * zero shuffles.
    *
    * Returns (id, n_tokens, n_masked, corrupted_md5, target_md5) — string
    * payloads travel as fingerprints, not text. */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
                  maskOf16: Int = 2, sentinel: String = "<X>"): DataFrame = {
    require(maskOf16 >= 0 && maskOf16 <= 16, s"maskOf16 in [0,16], got $maskOf16")
    val toks = TextOps.tokens(col(textCol))
    val digit = (i: Column) => conv(substring(
      md5(concat_ws("_", col(idCol).cast("string"), i.cast("string")).cast("binary")),
      1, 1), 16, 10).cast("int")
    val masked = transform(toks, (_, i) => digit(i) < maskOf16)
    // pure per-row map, but each row pays tokenize + per-token md5 coins —
    // spread so the one-partition gate scan doesn't serialize it
    Spread.ifNarrow(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), toks.as("__t"), masked.as("__m"))
      .select(col(idCol),
        size(col("__t")).cast("long").as("n_tokens"),
        size(filter(col("__m"), m => m)).cast("long").as("n_masked"),
        md5(concat_ws(" ", zip_with(col("__t"), col("__m"),
          (t, m) => when(m, lit(sentinel)).otherwise(t))).cast("binary"))
          .as("corrupted_md5"),
        md5(concat_ws(" ", filter(zip_with(col("__t"), col("__m"),
            (t, m) => when(m, t)), x => x.isNotNull)).cast("binary"))
          .as("target_md5"))
  }

  /** Sketch-based set-overlap estimation between two corpora's distinct
    * token sets: HLL sketches of each side union-merge (registers take the
    * max — exactly mergeable), and |A∩B| falls out by inclusion-exclusion
    * |A| + |B| − |A∪B|, giving a Jaccard estimate — "how much vocabulary
    * do these two sources share?" from kilobytes of sketch instead of a
    * distinct-token join. The stored-sketch workflow this enables: keep
    * one HLL row per (source, day), answer any pairwise overlap later with
    * no rescan. Estimates carry HLL error (±~1.6% at lgK=12) AMPLIFIED by
    * the subtraction when the overlap is small relative to the sets —
    * CorpusOverlapSpec pins the bound against exact counts.
    *
    * Returns one row: (card_a, card_b, card_union, inter_est,
    * jaccard_est) — first three are HLL estimates (longs), inter/jaccard
    * derived. */
  def hllOverlap(corpusA: DataFrame, corpusB: DataFrame, textCol: String,
                 lgK: Int = 12, scoreOut: Column => Column): DataFrame = {
    def sketch(df: DataFrame): DataFrame = df
      .select(explode_outer(TextOps.tokens(col(textCol))).as("tok"))
      .filter(col("tok").isNotNull && col("tok") =!= "")
      .agg(hll_sketch_agg(col("tok"), lit(lgK)).as("sk"))
    val a = sketch(corpusA).select(col("sk").as("sk_a"))
    val b = sketch(corpusB).select(col("sk").as("sk_b"))
    a.crossJoin(broadcast(b))
      .select(
        hll_sketch_estimate(col("sk_a")).as("card_a"),
        hll_sketch_estimate(col("sk_b")).as("card_b"),
        hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"))).as("card_union"))
      .select(col("card_a"), col("card_b"), col("card_union"),
        (col("card_a") + col("card_b") - col("card_union")).as("inter_est"),
        scoreOut((col("card_a") + col("card_b") - col("card_union")).cast("double")
          / col("card_union")).as("jaccard_est"))
  }

  /** Collocation extraction by pointwise mutual information: adjacent
    * token pairs scored PMI = ln(p(ab) / (p(a)·p(b))) with a minimum pair
    * count — high-PMI bigrams are the multiword units ("new york",
    * "machine learning") a tokenizer-budget or phrase-mining pass wants.
    * Pair and unigram tables are both map-side-combinable aggregates; the
    * pair → unigram probability joins key on short token strings over
    * VOCABULARY-sized tables (never the corpus), the same discipline as
    * [[bigramSurprisal]] — no broadcast of the vocab.
    *
    * Returns top-`topK` by PMI among pairs with count ≥ `minCount`:
    * (w1, w2, n_pair, n_w1, n_w2, pmi). */
  def pmiCollocations(docs: DataFrame, textCol: String, minCount: Int,
                      topK: Int, scoreOut: Column => Column): DataFrame = {
    val toks = docs
      .select(TextOps.tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 2)
    val pairs = toks
      .select(explode(transform(sequence(lit(1), size(col("__t")) - 1),
        i => struct(element_at(col("__t"), i).as("w1"),
          element_at(col("__t"), i + 1).as("w2")))).as("p"))
      .select(col("p.w1"), col("p.w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
    val uni = docs
      .select(explode_outer(TextOps.tokens(col(textCol))).as("w"))
      .filter(col("w").isNotNull && col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n_w"))
    val totU = uni.agg(sum("n_w").as("nu"))
    val totP = pairs.agg(sum("n_pair").as("np"))
    pairs.filter(col("n_pair") >= minCount)
      .join(uni.select(col("w").as("w1"), col("n_w").as("n_w1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("n_w").as("n_w2")), Seq("w2"))
      .crossJoin(broadcast(totU)).crossJoin(broadcast(totP))
      .select(col("w1"), col("w2"), col("n_pair"), col("n_w1"), col("n_w2"),
        scoreOut(log((col("n_pair") / col("np")) /
          ((col("n_w1") / col("nu")) * (col("n_w2") / col("nu"))))).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Per-class classification report (precision / recall / F1) from
    * labeled predictions — the eval harness that turns any heuristic
    * classifier in the pipeline (language ID, quality cut, zone rules)
    * into a measured component, same measure-don't-guess discipline as
    * the ANN and blocking recall harnesses. Three class-keyed aggregates
    * over (label, prediction) pairs; the corpus never moves.
    *
    * Returns one row per class appearing as label OR prediction:
    * (cls, n_true, n_pred, n_correct, precision, recall, f1); zero
    * denominators yield 0.0 (the sklearn zero_division=0 convention). */
  def classificationReport(scored: DataFrame, labelCol: String, predCol: String,
                           scoreOut: Column => Column): DataFrame = {
    val t = scored.groupBy(col(labelCol).as("cls")).agg(count(lit(1)).as("n_true"))
    val p = scored.groupBy(col(predCol).as("cls")).agg(count(lit(1)).as("n_pred"))
    val c = scored.filter(col(labelCol) === col(predCol))
      .groupBy(col(labelCol).as("cls")).agg(count(lit(1)).as("n_correct"))
    val prec = when(col("n_pred") > 0,
      col("n_correct").cast("double") / col("n_pred")).otherwise(lit(0.0))
    val rec = when(col("n_true") > 0,
      col("n_correct").cast("double") / col("n_true")).otherwise(lit(0.0))
    t.join(p, Seq("cls"), "full_outer")
      .join(c, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("n_correct"), lit(0L)).as("n_correct"))
      .select(col("cls"), col("n_true"), col("n_pred"), col("n_correct"),
        scoreOut(prec).as("precision"), scoreOut(rec).as("recall"),
        scoreOut(when(prec + rec > 0, lit(2.0) * prec * rec / (prec + rec))
          .otherwise(lit(0.0))).as("f1"))
  }

  /** k-anonymity audit over a quasi-identifier combination: any group of
    * rows sharing the full quasi-identifier tuple with fewer than k
    * members is re-identifiable and must be suppressed or generalized —
    * the release-side governance check that complements content-level PII
    * redaction (q99). One map-side-combinable aggregate on the quasi
    * columns; the corpus rows never move.
    *
    * Returns one row per group: (quasi…, n, violates). */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2, s"need quasi columns and k >= 2")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("violates", (col("n") < k).cast("int"))
  }

  /** Burrows' Delta (Burrows '02) — the standard stylometric distance
    * between text groups: z-score each group's relative frequency of the
    * corpus's top-k words (function words dominate that head, and their
    * rates are the classic authorship fingerprint), then Δ(a,b) = mean
    * |z_a − z_b|. In a pipeline: which "sources" are actually the same
    * generator/template farm — the style-level companion of the
    * content-level q258 shingle overlap.
    *
    * Scale shape: one token scan collapses to (group, word) counts; the
    * top-k head is a TakeOrdered over the vocabulary aggregate; the
    * dense (group × k) grid, the per-word moments and the pairwise
    * deltas all live on groups×k cells (vocabulary/domain-sized, never
    * corpus rows). Zero-variance words drop (no style signal). */
  def burrowsDelta(docs: DataFrame, groupCol: String, textCol: String,
                   k: Int, scoreOut: Column => Column): DataFrame = {
    require(k >= 2 && k <= 1000, s"k in [2, 1000], got $k")
    val tok = docs
      .select(col(groupCol).as("g"),
        explode(graft.operators.TextOps.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
    val counts = tok.groupBy("g", "w").agg(count(lit(1)).as("c")).persist()
    val totals = counts.groupBy("g").agg(sum("c").as("tot"))
    val top = counts.groupBy("w").agg(sum("c").as("cw"))
      .orderBy(col("cw").desc, col("w")).limit(k)
      .select("w")
    val dense = totals.crossJoin(top)
      .join(counts, Seq("g", "w"), "left")
      .select(col("g"), col("w"),
        (coalesce(col("c"), lit(0L)) / col("tot").cast("double")).as("f"))
    val stats = dense.groupBy("w")
      .agg(avg("f").as("mu"), stddev_pop("f").as("sd"))
      .filter(col("sd") > 0)
    val z = dense.join(stats, "w")
      .select(col("g"), col("w"),
        scoreOut((col("f") - col("mu")) / col("sd")).as("z"))
    z.select(col("g").as("src_a"), col("w"), col("z").as("za"))
      .join(z.select(col("g").as("src_b"), col("w"), col("z").as("zb")),
        Seq("w"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_words"),
        scoreOut(avg(abs(col("za") - col("zb")))).as("delta"))
  }

  /** l-diversity audit (Machanavajjhala '06) — the attack k-anonymity
    * misses: a group can be large yet carry ONE sensitive value, so
    * membership alone discloses it (homogeneity attack). Each
    * quasi-identifier group must contain ≥ l distinct sensitive values.
    *
    * Shape: distinct (QI, sensitive) collapse FIRST (map-side), then the
    * group count — one exact countDistinct stays on the two-phase
    * aggregate path (the Expand trap needs ≥2 of them); output is
    * QI-group-sized. */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Int): DataFrame = {
    require(quasiCols.nonEmpty && l >= 2, s"need quasi columns and l >= 2")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("distinct_sensitive"))
      .withColumn("violates", (col("distinct_sensitive") < l).cast("int"))
  }

  /** CCNet-style LM-quality buckets (Wenzek et al., LREC'20): rank every
    * document by corpus-LM mean log-probability WITHIN its language and
    * cut the distribution into head/middle/tail thirds — the per-language
    * normalization that keeps a multilingual quality cut from simply
    * dropping low-resource languages (their absolute perplexities run
    * higher). Built on [[unigramLogProb]]; the tertile is `ntile(3)` over
    * the ROUNDED score with id tiebreak (deterministic cross-engine), and
    * the window partitions by language, so the sort is per-language over
    * (id, score) pairs — never a global corpus sort. */
  def ccnetBuckets(docs: DataFrame, idCol: String, langCol: String,
                   textCol: String, scoreOut: Column => Column): DataFrame = {
    val scored = unigramLogProb(docs, idCol, textCol)
      .select(col(idCol), col("n_toks"), scoreOut(col("mean_logprob")).as("mean_logprob"))
    val w = Window.partitionBy(langCol)
      .orderBy(col("mean_logprob").desc, col(idCol))
    docs.select(col(idCol), col(langCol))
      .join(scored, Seq(idCol))
      .withColumn("tertile", ntile(3).over(w))
      .withColumn("ccnet_bucket",
        when(col("tertile") === 1, "head")
          .when(col("tertile") === 2, "middle")
          .otherwise("tail"))
  }

  /** Deterministic temperature-mixture training schedule: an explicit
    * per-document stream position such that, at every prefix of the
    * stream, stratum proportions match the temperature mix — the "data
    * ordering" step that writes an epoch schedule instead of trusting a
    * runtime sampler. Each document ranks within its stratum by the md5
    * hash of its id (the [[groupSample]] permutation trick), and its key
    * is (rank − ½) / p_temp(stratum): a prefix of keys ≤ K then holds
    * ≈ K·p_temp(s) documents of stratum s — proportions are p_temp by
    * construction until a stratum exhausts (an up-weighted stratum that
    * runs out simply stops contributing; the schedule records, not hides,
    * that). Reproducible across runs/engines/partitionings.
    *
    * One broadcast of the per-stratum mix (bounded: one row per stratum)
    * plus one per-stratum window; consumers sort by `sched_key` — at
    * cluster scale that is the write-time `repartitionByRange` ordering,
    * never a single global sort here.
    *
    * Returns (id, stratum, r_in_stratum, p_temp, sched_key). */
  def mixtureSchedule(docs: DataFrame, idCol: String, stratumCol: String,
                      alpha: Double, scoreOut: Column => Column): DataFrame = {
    val mix = temperatureMix(docs, Seq(stratumCol), alpha)
      .select(col(stratumCol), col("p_temp"))
    val w = Window.partitionBy(stratumCol)
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    docs.select(col(idCol), col(stratumCol))
      .join(broadcast(mix), Seq(stratumCol))
      .withColumn("r_in_stratum", row_number().over(w))
      .select(col(idCol), col(stratumCol),
        col("r_in_stratum"),
        scoreOut(col("p_temp")).as("p_temp"),
        scoreOut((col("r_in_stratum") - lit(0.5)) / col("p_temp")).as("sched_key"))
  }

  /** Deterministic k-per-group sample ("reservoir" semantics without the
    * order-dependence of an actual reservoir): rank group members by the
    * md5 of their id — a content-stable stand-in for a random permutation,
    * the same engine-portable trick as [[hexBucket]] — and keep the first
    * `k`. Reproducible across runs, engines, partitionings and retries,
    * unlike `rand()`-based sampling; and unlike [[stratifiedSample]]'s
    * fixed RATE, this fixes the per-group COUNT (the "k eval docs per
    * language" shape).
    *
    * One window, hash-partitioned by the group columns. Skewed group sizes
    * cost what any per-group top-k costs — at 100 TB pre-prune with a
    * per-partition top-k (takeOrdered shape) before the window if a single
    * group dominates.
    *
    * Returns input rows with `rank_in_group` attached, filtered to ≤ k. */
  def groupSample(docs: DataFrame, idCol: String, groupCols: Seq[String],
                  k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    docs.withColumn("rank_in_group", row_number().over(w))
      .filter(col("rank_in_group") <= k)
  }

  /** Heaps-law vocabulary-growth curve: distinct vocabulary size as the
    * corpus grows through `buckets` deterministic doc-id slices — the
    * "are we still seeing new language or re-crawling the same text"
    * corpus-freshness diagnostic (sublinear growth ~ K·nᵝ is healthy; a
    * flat curve means saturation, a linear one means noise/OCR garbage).
    * The corpus collapses to (token → first bucket) with ONE token-keyed
    * aggregate; the cumulative sum then runs over the ≤`buckets`-row
    * bucket table (named lint bound). Bucket assignment is pure id
    * arithmetic — no global sort, no ntile.
    *
    * Returns (bucket, n_docs, new_types, vocab_size), bucket ascending. */
  def vocabGrowthCurve(docs: DataFrame, idCol: String, textCol: String,
                       buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= 1000, s"bad bucket count $buckets")
    val mx = docs.agg(max(col(idCol)).as("__mx"))
    val withB = docs.crossJoin(mx)
      .withColumn("__b", floor(col(idCol) * lit(buckets) /
        (col("__mx") + 1)).cast("long"))
    val nd = withB.groupBy(col("__b").as("bucket"))
      .agg(count(lit(1)).as("n_docs"))
    val firstB = withB
      .select(col("__b"), explode_outer(TextOps.tokens(col(textCol))).as("tok"))
      .filter(col("tok").isNotNull && col("tok") =!= "")
      .groupBy("tok").agg(min("__b").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("new_types"))
    val wCum = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    nd.join(firstB, Seq("bucket"), "left")
      .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
      .withColumn("vocab_size", sum("new_types").over(wCum))
      .select(col("bucket"), col("n_docs"), col("new_types"), col("vocab_size"))
  }

  /** Positional phrase search via posting-list equi-joins: each phrase
    * token selects its (doc, position) postings, and token i joins token
    * 0 on (doc, pos₀+i = posᵢ) — the inverted-index query plan, never a
    * substring scan over raw text. The token filters prune the exploded
    * postings BEFORE any shuffle, so the join inputs are
    * term-frequency-sized, not corpus-sized; at 100 TB the postings would
    * be a materialized table bucketed by token, making each phrase query
    * index-only. Whitespace tokens ([[TextOps.tokens]] semantics);
    * positions are 0-based internals that never surface.
    *
    * Returns (idCol, n_matches) for documents containing the phrase. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    val post = docs.select(col(idCol).as("__id"),
      posexplode(TextOps.tokens(col(textCol))).as(Seq("__pos", "__tok")))
    val first = post.filter(col("__tok") === phrase.head)
      .select(col("__id"), col("__pos"))
    val matched = phrase.zipWithIndex.tail.foldLeft(first) {
      case (acc, (tok, i)) =>
        val pi = post.filter(col("__tok") === tok)
          .select(col("__id").as("__id2"), col("__pos").as("__p2"))
        acc.join(pi, acc("__id") === col("__id2") &&
            acc("__pos") + lit(i) === col("__p2"))
          .select(acc("__id"), acc("__pos"))
    }
    matched.groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_matches"))
  }

  /** Most distinctive terms per group by weighted log-odds with an
    * informative Dirichlet prior (Monroe–Colaresi–Quinn '08, "Fightin'
    * Words") — the statistically-grounded replacement for raw TF-IDF
    * "top terms per source": the prior (α_w = a0·y_w/N, i.e. scaled
    * global frequency) shrinks rare-word noise, and dividing by the
    * estimated standard deviation turns the log-odds delta into a
    * z-score comparable across frequency bands.
    *
    *   δ_w = ln((y_gw+α_w)/(n_g+a0−y_gw−α_w)) − ln((y_rw+α_w)/(n_r+a0−y_rw−α_w))
    *   z_w = δ_w / √(1/(y_gw+α_w) + 1/(y_rw+α_w))
    *
    * where r is the complement corpus (everything but g). All counts are
    * map-side-combinable token aggregates; the per-group totals join back
    * agg-sized and the global vocab joins on the token key. The top-k cut
    * ranks the ROUNDED z with the token as tiebreak (group-partitioned
    * window, cross-engine deterministic).
    *
    * Returns (group, token, y_group, y_rest, z_logodds, rn), rn ≤ k. */
  def logOddsTerms(docs: DataFrame, groupCol: String, textCol: String,
                   a0: Double, k: Int, scoreOut: Column => Column): DataFrame = {
    val ex = docs
      .select(col(groupCol).as("grp"), TextOps.tokens(col(textCol)).as("__t"))
      .select(col("grp"), explode_outer(col("__t")).as("tok"))
      .filter(col("tok").isNotNull && col("tok") =!= "")
    val yGw = ex.groupBy("grp", "tok").agg(count(lit(1)).cast("double").as("y_g"))
    val nG = yGw.groupBy("grp").agg(sum("y_g").as("n_g"))
    val yW = yGw.groupBy("tok").agg(sum("y_g").as("y_w"))
    val nTab = yW.agg(sum("y_w").as("__N"))
    val joined = yGw
      .join(yW, "tok")
      .join(nG, "grp")
      .crossJoin(broadcast(nTab))
      .select(col("grp"), col("tok"), col("y_g"),
        (col("y_w") - col("y_g")).as("y_r"),
        (lit(a0) * col("y_w") / col("__N")).as("__aw"),
        col("n_g"), (col("__N") - col("n_g")).as("n_r"))
    val delta =
      log((col("y_g") + col("__aw")) /
          (col("n_g") + lit(a0) - col("y_g") - col("__aw"))) -
      log((col("y_r") + col("__aw")) /
          (col("n_r") + lit(a0) - col("y_r") - col("__aw")))
    val sd = sqrt(lit(1.0) / (col("y_g") + col("__aw")) +
                  lit(1.0) / (col("y_r") + col("__aw")))
    val scored = joined.select(col("grp"), col("tok"),
      col("y_g").cast("long").as("y_group"),
      col("y_r").cast("long").as("y_rest"),
      scoreOut(delta / sd).as("z_logodds"))
    val w = Window.partitionBy("grp").orderBy(col("z_logodds").desc, col("tok"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Pairwise shingle-Jaccard overlap matrix between corpus groups
    * (sources): which slices share content — the input to mixture
    * weighting and cross-source contamination triage. The text is scanned
    * ONCE into the distinct (shingle, group) table; each shingle then
    * collapses to its sorted SOURCE SET (one aggregate, state ≤ G
    * entries), identical sets dedupe into a weighted set table (at most
    * min(#shingles, 2^G) rows — with a shared vocabulary it is tiny), and
    * the G²-per-shingle pair fanout happens only on THAT table. This
    * replaces the naive shingle-keyed self-join, which materializes up to
    * G² rows per shingle (measured 7.6 s → the set collapse at sf0.1;
    * same two big-data shuffles, no pairwise materialization). With G
    * groups the result is at most G·(G−1)/2 rows.
    *
    * Returns (src_a, src_b, n_a, n_b, n_both, jaccard) for a < b. */
  def groupOverlap(docs: DataFrame, groupCol: String, textCol: String,
                   shingleN: Int, scoreOut: Column => Column): DataFrame = {
    // The shingle transform is an interpreted higher-order function, so its
    // cost is CPU-per-row — and a small parquet input arrives as ONE
    // partition (single row group), serializing it on one core (measured
    // 6.6 s single-task vs 0.8 s spread at sf0.1). Spreading the cheap
    // (group, text) projection first costs one tiny shuffle and buys the
    // full core count for the expensive stage; Spread.ifNarrow gates on
    // the scan's partition count so a pre-split 100 TB corpus is not
    // re-shuffled.
    val spread = Spread.ifNarrow(
      docs.select(col(groupCol).as("g"), col(textCol).as("__t")))
    val sets = spread
      .select(col("g"),
        explode(TextOps.shingles(TextOps.tokens(col("__t")), shingleN))
          .as("sh"))
      .distinct()
      .groupBy("sh").agg(array_sort(collect_set(col("g"))).as("gs"))
      .groupBy("gs").agg(count(lit(1)).as("w"))
      .persist()
    val totals = sets
      .select(explode(col("gs")).as("g"), col("w"))
      .groupBy("g").agg(sum("w").as("n"))
    val pairs = sets
      .select(posexplode(col("gs")).as(Seq("__i", "src_a")), col("gs"), col("w"))
      .select(col("src_a"), explode(slice(col("gs"), col("__i") + 2,
        size(col("gs")))).as("src_b"), col("w"))
      .groupBy("src_a", "src_b").agg(sum("w").as("n_both"))
    pairs
      .join(totals.select(col("g").as("src_a"), col("n").as("n_a")), "src_a")
      .join(totals.select(col("g").as("src_b"), col("n").as("n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("n_both"),
        scoreOut(col("n_both").cast("double") /
          (col("n_a") + col("n_b") - col("n_both"))).as("jaccard"))
  }
}
