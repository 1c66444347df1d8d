package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Deduplication operators for training-data pipelines: exact hash dedup,
  * MinHash+LSH banding, SimHash, and prefix-filtered n-gram Jaccard.
  *
  * Scale design: every variant is a shuffle-bounded equi-join — candidate
  * pairs come from `groupBy`/join on a BUCKET key (band hash, simhash chunk,
  * prefix shingle), never a cross join. At 100 TB the only quadratic step is
  * within-bucket pair expansion, bounded by bucket size (tunable via
  * bands/rows and shingle width).
  *
  * Key-width discipline: shingles are replaced by `xxhash64` keys at the
  * explode, so every shuffle, sort, and join below moves 8-byte longs
  * instead of multi-word strings (~5× less shuffle volume on 3-gram text).
  * A 64-bit collision merges two shingles with probability ~n²/2⁶⁵ —
  * vanishing for any corpus whose exploded table fits a cluster, and only
  * perturbing one pair's count by 1 if it ever fires.
  *
  * Caching note: the exploded shingle table feeds 4+ plan branches with
  * DIFFERENT column prunings, so their exchanges canonicalize differently
  * and ReuseExchange cannot dedup them — without materialization the
  * tokenize+shingle subtree re-executes per branch (measured 3×).
  * These ops therefore `persist()` that one intermediate; callers that run
  * many corpora in one session must release the blocks at query boundaries
  * (`spark.catalog.clearCache()`, as graft.Bench/Verify do) — leaked blocks
  * degrade later queries via eviction pressure. At 100 TB, where the
  * exploded table exceeds cluster memory, the same materialization point
  * becomes a staging write (`df.write.parquet` + re-read, or
  * `checkpoint()`), not an in-memory cache. */
object DedupOps {

  /** Exact dedup: canonical id = min doc id within an identical-content
    * group (hash of normalized text). One hash-partitioned window. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val wf = Window.partitionBy("fp")
    docs
      .withColumn("fp", TextOps.fingerprint(col(textCol)))
      .withColumn("canonical_id", min(col(idCol)).over(wf))
      .withColumn("group_size", count(lit(1)).over(wf))
      .withColumn("is_duplicate", (col(idCol) =!= col("canonical_id")).cast("int"))
  }

  /** Incremental exact dedup — the production ingestion shape: a NEW batch
    * is deduplicated against the already-curated corpus without rescanning
    * it pair-wise. `seen` is the historical fingerprint index (one `fp`
    * column; at 100 TB a bucketed parquet table keyed by fp, so the join
    * below is co-located and the new batch — typically 1000× smaller than
    * history — is the small side). A row is dropped if its fingerprint
    * exists in history (`dup_of_corpus`) or earlier in its own batch
    * (`dup_in_batch`, same window as [[exactDedup]]); the surviving rows'
    * fingerprints are what gets appended to the index afterwards. */
  def incrementalDedup(batch: DataFrame, seen: DataFrame,
                       idCol: String, textCol: String): DataFrame = {
    val wf = Window.partitionBy("fp")
    val idx = seen.select(col("fp")).distinct()
      .withColumn("__seen", lit(1))
    batch
      .withColumn("fp", TextOps.fingerprint(col(textCol)))
      .join(idx, Seq("fp"), "left")
      .withColumn("dup_of_corpus", (col("__seen").isNotNull).cast("int"))
      .withColumn("dup_in_batch",
        (col(idCol) =!= min(col(idCol)).over(wf)).cast("int"))
      .withColumn("keep",
        (col("dup_of_corpus") === 0 && col("dup_in_batch") === 0).cast("int"))
      .drop("__seen")
  }

  /** Drop bucket keys whose membership exceeds `maxBucketSize` before a
    * within-bucket pair expansion. A pathological bucket of 10⁶ members
    * would expand to 5·10¹¹ pairs; the cap bounds the worst case at
    * `maxBucketSize²/2` per bucket. RECALL CONTRACT: pairs whose EVERY
    * shared bucket is oversized are silently lost — and near-identical docs
    * share ALL their buckets, so a duplicate cluster larger than the cap
    * returns zero pairs. The cap is therefore OPT-IN (callers default to
    * uncapped); when enabled, route oversized clusters through
    * [[exactDedup]] or a representative-per-bucket pass first. The window
    * reuses the same hash partitioning as the self-join that follows. */
  private def capBuckets(buckets: DataFrame, keyCols: Seq[String], maxBucketSize: Int): DataFrame =
    if (maxBucketSize == Int.MaxValue) buckets
    else buckets
      .withColumn("__bs", count(lit(1)).over(Window.partitionBy(keyCols.map(col): _*)))
      .filter(col("__bs") <= maxBucketSize)
      .drop("__bs")

  /** Distinct candidate pairs (a < b) sharing at least one exploded bucket
    * key. `buckets` must be (id, key...) with one row per bucket membership. */
  private def pairsByBucket(buckets: DataFrame, idCol: String, keyCols: Seq[String],
                            maxBucketSize: Int): DataFrame = {
    val capped = capBuckets(buckets, keyCols, maxBucketSize)
    val a = capped.toDF(capped.columns.map(c => s"a_$c"): _*)
    val b = capped.toDF(capped.columns.map(c => s"b_$c"): _*)
    val cond = keyCols.map(k => col(s"a_$k") === col(s"b_$k")).reduce(_ && _) &&
      col(s"a_$idCol") < col(s"b_$idCol")
    a.join(b, cond)
      .select(col(s"a_$idCol").as("id_a"), col(s"b_$idCol").as("id_b"))
      .distinct()
  }

  /** Hashed exploded shingle table: one (id, h) row per distinct shingle
    * per document, hashed STRAIGHT from the token n-tuple
    * ([[TextOps.hashedShingleSet]] — no shingle string is ever built).
    * `explode_outer` + isNotNull instead of plain explode: explode triggers
    * InferFiltersFromGenerate, whose size>0 predicate is pushed below the
    * token projection and re-expands the lambda with an inline split per
    * element (~10× slowdown — the repo's documented HOF pitfall). */
  private[graft] def hashedShingles(docs: DataFrame, idCol: String, textCol: String,
                                        n: Int): DataFrame =
    // the shingle HOF pays CPU per ROW, and gate corpora arrive as ONE
    // row group (= one scan partition) — spread the cheap (id, text)
    // projection first so the expensive stage uses every core (the
    // CorpusOps.groupOverlap precedent: 6.6 s single-task → 0.8 s).
    // Spread.ifNarrow gates on the scan's partition count, so a
    // pre-split 100 TB corpus is NOT re-shuffled.
    Spread.ifNarrow(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__t"))
      .select(col(idCol), TextOps.hashedShingleSet(col("__t"), n).as("sh"))
      .select(col(idCol), explode_outer(col("sh")).as("h"))
      .filter(col("h").isNotNull)

  /** Exact-Jaccard verification of candidate pairs WITHOUT materializing
    * per-doc shingle arrays: fan each candidate pair out to doc a's
    * exploded shingles, equi-join against doc b's shingles on (id_b, h),
    * and count the matches — |A∩B| as a pure count aggregate. Every
    * shuffled row is (id, id, h) = three 8-byte words, so the payload per
    * row is CONSTANT regardless of document length; the array-based
    * alternative ([[verifyJaccardArrays]]) ships each doc's entire
    * distinct-shingle set as one array cell. Cost model: count-based moves
    * O(Σ_pairs |A|) small rows AND re-shuffles the whole exploded table by
    * (id, h); array-based aggregates the exploded table once per doc and
    * lets AQE broadcast the candidate side. MEASURED at sf0.1 (q55/q56/
    * q65): array wins 5.9 s vs 9.2 s on q55 — candidates are few after
    * prefix filtering and the sets table broadcasts — so callers default
    * to `arrayVerify = true`. The 100 TB implication cuts the other way:
    * for BOOK-LENGTH docs the array cell (every distinct shingle of the
    * doc) dominates the shuffle and can exceed a single row's sane size,
    * while the count join's row width stays 24 bytes regardless — flip to
    * count-based when avg doc shingle count × candidate fan-in outgrows
    * executor memory per cell.
    * Inner joins are sound: every PPJoin/LSH candidate shares ≥ 1 shingle
    * and threshold > 0, so zero-overlap pairs can't be output anyway.
    * |A∪B| = |A|+|B|−|A∩B|, so no union is ever materialized. */
  private def verifyJaccard(cand: DataFrame, ex: DataFrame, idCol: String,
                            threshold: Double): DataFrame = {
    val szs = ex.groupBy(idCol).agg(count(lit(1)).as("sz"))
    cand
      .join(ex.select(col(idCol).as("id_a"), col("h")), "id_a")
      .join(ex.select(col(idCol).as("id_b"), col("h")), Seq("id_b", "h"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
      .join(szs.select(col(idCol).as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(szs.select(col(idCol).as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        col("n_common") / (col("sz_a") + col("sz_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Array-based exact-Jaccard verification (the measured alternative to
    * [[verifyJaccard]]): join each (id_a, id_b) to the two documents'
    * SORTED hashed shingle arrays and count the overlap with one
    * zero-allocation merge per pair
    * ([[graft.functions.SortedIntersectCount]] — `array_intersect` builds a
    * hash set per invocation) — no per-shingle fan-out, no re-aggregation.
    * The array table is one row per doc (AQE broadcasts it when small; at
    * 100 TB it hash-joins on id — still one row per doc), but each cell
    * carries the doc's whole distinct-shingle set through the shuffle.
    * Kept for workloads where candidates per doc is high enough that the
    * count-based fan-out (O(Σ_pairs |A|) rows) exceeds shipping each array
    * once. |A∪B| = |A|+|B|−|A∩B|, so no union array is materialized. */
  private def verifyJaccardArrays(cand: DataFrame, ex: DataFrame, idCol: String,
                                  threshold: Double): DataFrame = {
    graft.functions.VectorFunctions.register(ex.sparkSession)
    val sets = ex.groupBy(idCol)
      .agg(sort_array(collect_list("h")).as("hs"), count(lit(1)).as("sz"))
    cand
      .join(sets.select(col(idCol).as("id_a"), col("hs").as("hs_a"), col("sz").as("sz_a")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("hs").as("hs_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("n_common", call_function("graft_isect_sorted", col("hs_a"), col("hs_b")))
      .withColumn("jaccard",
        col("n_common") / (col("sz_a") + col("sz_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact pairwise Jaccard ≥ `threshold` via PREFIX FILTERING with the
    * PPJoin length and positional filters (Xiao et al., WWW'08): order each
    * document's shingles by ascending global document frequency (rarest
    * first, ties on hash — a total order), keep only the first
    * `|A| − ⌈t·|A|⌉ + 1` as the candidate-generating prefix. Any pair with
    * J ≥ t MUST share a prefix shingle, so candidate generation never joins
    * on the corpus's hottest shingles — the classic hot-bucket blowup (a
    * shingle shared by 10⁶ docs → 10¹² pair rows) is structurally bounded,
    * with zero recall loss at the given threshold.
    *
    * Candidate pruning before the distinct, both sound for J ≥ t:
    *  - LENGTH: t·max(|A|,|B|) ≤ min(|A|,|B|).
    *  - POSITIONAL: a true pair's FIRST shared shingle (same relative order
    *    in both docs — both sort by the global (df, h) order) satisfies
    *    1 + min(|A|−rnA, |B|−rnB) ≥ α where α = ⌈t/(1+t)·(|A|+|B|)⌉ is the
    *    minimum absolute overlap; under the length filter that first shared
    *    shingle is provably inside both prefixes, so keeping pairs where ANY
    *    match passes loses nothing.
    *
    * Document frequency comes from a window on the hash partitioning (no
    * aggregate+join round trip), `rn`/`sz` share one id-partitioned sort,
    * and every shuffle key is an 8-byte hash. Verification defaults to the
    * sorted-merge intersect per pair ([[verifyJaccardArrays]] — measured
    * fastest here, where candidates are few after prefix filtering);
    * `arrayVerify = false` switches to the constant-row-width count join
    * ([[verifyJaccard]]) for book-length docs whose shingle arrays would
    * dominate the shuffle. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        arrayVerify: Boolean = true): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold must be in (0,1], got $threshold")
    val ex = hashedShingles(docs, idCol, textCol, n).persist()
    val wId = Window.partitionBy(idCol)
    // prefix size |A| − ⌈t·|A|⌉ + 1; the 1e-9 guard keeps float error from
    // overshooting an exactly-integer product (0.07·100 → 7.000000000000001
    // → ceil 8 would shorten the prefix and break the recall proof)
    val prefix = ex
      .withColumn("df", count(lit(1)).over(Window.partitionBy("h")))
      .withColumn("rn", row_number().over(wId.orderBy(col("df"), col("h"))))
      .withColumn("sz", count(lit(1)).over(wId)) // distinct per doc: count = |set|
      .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1)
      // df == 1 shingles appear in exactly one doc, so the self-join on h can
      // only pair them with themselves (excluded by id_a < id_b) — dropping
      // the ROWS (after rn/sz are fixed on the full ordered set, so the
      // positional filter still sees true positions) loses zero candidates.
      // Rarest-first ordering puts df==1 shingles at the FRONT of every
      // prefix, so for mostly-unique corpora this removes the bulk of the
      // join input — the lever that keeps prefix joins cheap at 100 TB.
      .filter(col("df") >= 2)
      .select(col(idCol), col("h"), col("rn"), col("sz"))
      .persist()
    val pa = prefix.select(col(idCol).as("id_a"), col("h"),
      col("rn").as("rn_a"), col("sz").as("sz_a"))
    val pb = prefix.select(col(idCol).as("id_b"), col("h"),
      col("rn").as("rn_b"), col("sz").as("sz_b"))
    val alpha = ceil(lit(threshold / (1 + threshold)) * (col("sz_a") + col("sz_b")) - lit(1e-9))
    val cand = pa.join(pb, Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .filter(least(col("sz_a"), col("sz_b")) >=
        ceil(lit(threshold) * greatest(col("sz_a"), col("sz_b")) - lit(1e-9)))
      .filter(lit(1) + least(col("sz_a") - col("rn_a"), col("sz_b") - col("rn_b")) >= alpha)
      .select("id_a", "id_b")
      .distinct()
    if (arrayVerify) verifyJaccardArrays(cand, ex, idCol, threshold)
    else verifyJaccard(cand, ex, idCol, threshold)
  }

  /** MinHash signatures + LSH banding: shingle→xxhash64→k independent
    * re-hashes (`xxhash64(h, i)` — overflow-free under ANSI mode, unlike the
    * classic `a·h+b` permutation) with per-doc mins; band hash per
    * `rows`-sized slice; pairs sharing any band bucket are candidates, then
    * verified with exact Jaccard. Returns (id_a, id_b, jaccard) for verified
    * pairs ≥ `threshold`. `maxBucketSize` defaults to uncapped — see
    * [[capBuckets]] for the recall contract before enabling it. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, numHashes: Int = 64, rows: Int = 4,
                      threshold: Double = 0.3,
                      maxBucketSize: Int = Int.MaxValue,
                      arrayVerify: Boolean = true): DataFrame = {
    require(numHashes % rows == 0, s"numHashes ($numHashes) must divide evenly into rows of $rows")
    // the count-based verify path is only sound for threshold > 0 (a
    // zero-overlap candidate has no join row to carry jaccard = 0)
    require(threshold > 0 && threshold <= 1, s"threshold must be in (0,1], got $threshold")
    val bands = numHashes / rows
    // persist: the signature aggregate, the size aggregate, and both
    // verification streams prune differently, so only materialization
    // shares the shingle evaluation (see object scaladoc).
    val ex = hashedShingles(docs, idCol, textCol, shingleN).persist()
    // one typed-imperative aggregate computes ALL lane minima per row in a
    // tight JVM loop (graft.functions.MinHashAgg) — numHashes separate
    // min(xxhash64(h, i)) agg expressions measured ~2x slower here
    graft.functions.VectorFunctions.register(docs.sparkSession)
    val sig = ex.groupBy(idCol)
      .agg(call_function("graft_minhash", col("h"), lit(numHashes)).as("sig"))
    val bandStructs = (0 until bands).map { bi =>
      struct(lit(bi).as("band"),
        xxhash64((lit(bi) +: (0 until rows).map(r =>
          element_at(col("sig"), bi * rows + r + 1))): _*).as("bh"))
    }
    val buckets = sig.select(col(idCol), explode(array(bandStructs: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val cand = pairsByBucket(buckets, idCol, Seq("band", "bh"), maxBucketSize)
    // exact-Jaccard verification restricted to LSH candidates
    if (arrayVerify) verifyJaccardArrays(cand, ex, idCol, threshold)
    else verifyJaccard(cand, ex, idCol, threshold)
  }

  /** MinHash signature table (id, sig: array<bigint>) — the unit that gets
    * PERSISTED for incremental dedup: signatures are mergeable state (a
    * doc's signature never changes), so a rolling crawl stores one row per
    * historical doc and never re-shingles history. Same lane construction
    * as [[minhashLshPairs]] (xxhash64 re-hash per lane, per-doc minima in
    * one typed-imperative aggregate). */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, numHashes: Int = 64): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    hashedShingles(docs, idCol, textCol, shingleN)
      .groupBy(idCol)
      .agg(call_function("graft_minhash", col("h"), lit(numHashes)).as("sig"))
  }

  /** LSH band-bucket table (id, band, bh) of a signature table — the
    * persisted historical BAND INDEX. At 100 TB this is a parquet table
    * bucketed by (band, bh): the daily batch's bands equi-join it
    * co-located, and appending a new day is a pure insert (band hashes are
    * a function of the signature alone). Identical band hashing to
    * [[minhashLshPairs]], so candidate sets agree exactly with the batch
    * formulation. */
  def minhashBands(sig: DataFrame, idCol: String, numHashes: Int,
                   rows: Int): DataFrame = {
    require(numHashes % rows == 0, s"numHashes ($numHashes) must divide into rows of $rows")
    val bands = numHashes / rows
    val bandStructs = (0 until bands).map { bi =>
      struct(lit(bi).as("band"),
        xxhash64((lit(bi) +: (0 until rows).map(r =>
          element_at(col("sig"), bi * rows + r + 1))): _*).as("bh"))
    }
    sig.select(col(idCol), explode(array(bandStructs: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.bh").as("bh"))
  }

  /** Incremental NEAR-dup — the LSH twin of [[incrementalDedup]] and the
    * shape a rolling 100 TB crawl actually runs: the new batch's MinHash
    * bands equi-join the PERSISTED historical band index ([[minhashBands]]
    * output), so history is never re-shingled and never rescanned
    * pair-wise; the only history touched is (a) the band index (co-located
    * bucketed join, batch side 1000× smaller → broadcast) and (b) the
    * signature rows of the few candidate ids (hash join on id).
    * Verification is SIGNATURE-ONLY: estimated Jaccard = matching lanes /
    * numHashes (unbiased, σ = √(j(1−j)/numHashes) ≈ 0.06 at 64 lanes) —
    * exact-Jaccard confirmation would need candidate text fetches; do that
    * downstream if the use case needs exactness (the batch-mode
    * [[minhashLshPairs]] is the exact-verified reference).
    *
    * Returns (batch_id, hist_id, est_jaccard) for candidates with
    * estimate ≥ threshold. */
  def incrementalNearDup(batchSig: DataFrame, histIndex: DataFrame,
                         histSig: DataFrame, idCol: String,
                         numHashes: Int, rows: Int,
                         threshold: Double): DataFrame =
    incrementalNearDupBands(
      minhashBands(batchSig, idCol, numHashes, rows),
      histIndex, batchSig, histSig, idCol, numHashes, threshold)

  /** [[incrementalNearDup]] entered at the BAND level: both band tables
    * may be PERSISTED, and when both are written bucketed by (band, bh)
    * with the same bucket count ([[graft.sources.Bucketing]]) the
    * candidate equi-join plans with ZERO exchanges — the co-located form
    * the rolling-crawl scaladoc promises (IncrementalNearDupSpec pins the
    * no-Exchange plan on real bucketed tables). */
  def incrementalNearDupBands(batchBands: DataFrame, histIndex: DataFrame,
                              batchSig: DataFrame, histSig: DataFrame,
                              idCol: String, numHashes: Int,
                              threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    val bBands = batchBands
      .select(col(idCol).as("batch_id"), col("band"), col("bh"))
    val hIdx = histIndex.select(col(idCol).as("hist_id"), col("band"), col("bh"))
    val cand = bBands.join(hIdx, Seq("band", "bh"))
      .select("batch_id", "hist_id").distinct()
    val bs = batchSig.select(col(idCol).as("batch_id"), col("sig").as("__sig_b"))
    val hs = histSig.select(col(idCol).as("hist_id"), col("sig").as("__sig_h"))
    cand.join(bs, "batch_id").join(hs, "hist_id")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("__sig_b"), col("__sig_h"),
            (x, y) => (x === y).cast("long")),
          lit(0L), (acc, z) => acc + z).cast("double") / numHashes)
      .filter(col("est_jaccard") >= threshold)
      .select("batch_id", "hist_id", "est_jaccard")
  }

  /** Large-star contraction step (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14): for each node u, connect every
    * strictly-LARGER neighbor v to m = min({u} ∪ Γ(u)). Input/output edges
    * are (u, v) with u > v; the step preserves connectivity and never emits
    * self-loops (m ≤ u < emitted first endpoint). Output size ≤ |E| rows:
    * each undirected edge is emitted only from its smaller endpoint's star.
    * One window on the symmetrized adjacency — no join, and deliberately NO
    * `distinct`: the consumer is always [[smallStar]], whose min-window is
    * duplicate-insensitive and re-shuffles on `u` anyway, so a dedup here
    * would buy nothing and cost a full extra shuffle per round. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    sym
      .withColumn("m", least(col("u"), min("v").over(Window.partitionBy("u"))))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
  }

  /** Small-star contraction step: for each node u, connect u and all its
    * SMALLER neighbors to m = min of those neighbors. Input/output edges
    * are (u, v) with u > v (so the per-u window sees exactly the smaller
    * neighbors). Emits (v, m) for each smaller neighbor v plus (u, m);
    * v == m self-loops are dropped. `dedup = false` skips the canonicalizing
    * `distinct` for intermediate fused rounds — safe because the next
    * [[largeStar]]'s min-window is duplicate-insensitive and row count stays
    * O(|E| + |V|) per step; the LAST step of each materialized chain must
    * dedup so the convergence probe sees a canonical set and |E| cannot
    * accrete duplicates across iterations. */
  private def smallStar(e: DataFrame, dedup: Boolean = true): DataFrame = {
    val withM = e.withColumn("m", min("v").over(Window.partitionBy("u")))
    val out = withM.select(col("v").as("u"), col("m").as("v"))
      .union(withM.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
    if (dedup) out.distinct() else out
  }

  /** Collapse near-dup PAIRS into duplicate clusters: connected components
    * by ALTERNATING large-star / small-star contraction (Kiveris et al.,
    * SoCC'14) — converges in O(log² n) rounds on ANY component shape
    * (chains included), where min-label flooding needs O(diameter) rounds.
    * At the fixpoint the edge set is a star forest: every non-root node
    * carries exactly one edge to its component's minimum id.
    *
    * Scale hygiene:
    *  - both steps are windows over the edge list only (docs join happens
    *    once, at the end) — no per-round join against the full corpus;
    *  - TWO alternating rounds are fused into each materialized action:
    *    large→small→large→small with a single canonicalizing `distinct` at
    *    the end ([[smallStar]] dedup flag), then one `localCheckpoint` and
    *    one probe. Per fused iteration that is 4 window shuffles + 1
    *    distinct + 1 probe agg — versus 4 windows + 4 distincts + 2 probes
    *    for the same two rounds materialized singly. Lineage stays two
    *    rounds deep — a lost executor replays two rounds, not the whole
    *    chain (at 100 TB on a real cluster prefer reliable
    *    `checkpoint()`/staging writes over local blocks);
    *  - convergence is a STRUCTURAL star-forest test folded into the single
    *    action that materializes the iteration (no second job): the edge
    *    set is a star forest iff no node sources two edges and no node is
    *    both a source and a target (edges are canonically (u, v), u > v, so
    *    sources are non-roots and targets are roots). Unlike comparing
    *    consecutive (count, hash) probes this is EXACT — no collision
    *    caveat — and detects the fixpoint the moment it is reached instead
    *    of one confirming iteration later, which halves the loop's jobs on
    *    the common small-cluster graphs that converge in one iteration.
    *
    * Bounded-edge-set shortcut: once the (always-shrinking) edge list fits
    * under `maxDriverEdges`, the remaining contraction happens as ONE
    * driver-side union-find over the collected edges — the same
    * bounded-metadata discipline as the IVF centroid literals and the
    * bloom-filter collect. This is not a small-scale hack but the shape a
    * production CC takes: near-dup PAIR sets are sparse relative to the
    * corpus (each doc pairs with a handful of near-twins, and candidate
    * generation is bucket-bounded), so the edge list is typically orders of
    * magnitude under the corpus size from the start; when it is not, the
    * distributed rounds run first and every round shrinks it toward the
    * star forest. The default gate (2²² edges ≈ 64 MB at two longs/edge) is
    * far inside a driver heap; `maxDriverEdges = 0` forces the pure
    * distributed loop (the cross-validation spec runs both and asserts
    * equality). Union-by-min keeps the representative EXACTLY the component
    * minimum — identical output to the distributed fixpoint, and the
    * per-iteration job cascade (4 windows + distinct + probe, each a
    * scheduler round-trip) collapses to one collect of an already-counted
    * edge list.
    *
    * This is the representative/cluster path that makes a keep-list out of
    * pairwise output: keep `id == cluster`, drop the rest. Throws if the
    * loop exits without reaching the star-forest fixpoint (labels could
    * point at a non-root, silently breaking the keep-list recipe).
    *
    * Returns (id, cluster, is_duplicate) for every doc in `docs` —
    * unpaired docs are their own singleton cluster. */
  def nearDupClusters(docs: DataFrame, pairs: DataFrame, idCol: String,
                      maxIter: Int = 50,
                      maxDriverEdges: Long = 1L << 22,
                      reliableEvery: Int = 0): DataFrame = {
    // star-forest violations: a node sourcing >1 edge (cu > 1) or acting as
    // both source and target (cu >= 1 and more appearances than sourcings).
    // Zero violations <=> the edge set IS a star forest rooted at each
    // component's minimum: both contraction steps preserve the original
    // components and never drop a node (a node keeps a source edge through
    // any smaller neighbor and is its own star's target when locally
    // minimal), so a violation-free state has one star per component whose
    // root — the unique pure target under u > v canonical edges — is the
    // component min. Empty edge set: zero violations, trivially done.
    // The probe also returns |E| (Σ sources — each canonical edge has one)
    // from the SAME action, feeding the driver-finish gate for free.
    def probe(df: DataFrame): (Long, Long) = {
      val r = df.select(col("u").as("n"), lit(1L).as("iu"))
        .union(df.select(col("v").as("n"), lit(0L).as("iu")))
        .groupBy("n").agg(sum("iu").as("cu"), count(lit(1)).as("ct"))
        .agg(count(when(col("cu") > 1 || (col("cu") >= 1 && col("ct") > col("cu")),
          1)).as("viol"), sum("cu").as("ne")).head
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    // checkpoint-block bookkeeping: localCheckpoint blocks are RDD-level —
    // invisible to `spark.catalog.clearCache()` and reclaimed by the
    // ContextCleaner only after a GC notices the dropped reference. In an
    // iterative loop that laziness is an eviction-pressure leak (every
    // superseded iteration's blocks linger in the storage pool, measured as
    // multi-× pass variance at bench scale), so each iteration unpersists
    // its predecessor DETERMINISTICALLY the moment its own blocks are
    // materialized — the same superseded-generation unpersist discipline
    // GraphX's Pregel loop applies. Safe because the probe action has
    // already truncated `next`'s lineage; only the FINAL edge set must stay
    // persisted (the returned plan reads it), and that one reference is the
    // caller's to drop.
    val sc = docs.sparkSession.sparkContext
    def snapIds: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    def free(ids: Set[Int]): Unit =
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (ids.contains(id)) rdd.unpersist(blocking = false)
      }
    // the init checkpoint materializes the (possibly expensive) pairs plan
    // exactly once, EAGERLY: every consumer below reads the edge list at
    // least twice in one action (the probe's union branches, largeStar's
    // symmetrize union), and a lazy checkpoint's blocks don't exist until
    // AFTER the first action — concurrent branch tasks would each recompute
    // the full pairs plan (measured ~2× the whole q55 plan on q65)
    val preInit = snapIds
    var edges = pairs
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    var liveIds = snapIds -- preInit
    // the driver finish round-trips ids through Long — sound only for
    // integral id types; anything else keeps the pure distributed loop
    val idType = docs.schema(idCol).dataType
    val gate = idType match {
      case ByteType | ShortType | IntegerType | LongType => maxDriverEdges
      case _ => 0L
    }
    var (viol, ne) = probe(edges)
    var i = 0
    while (viol > 0 && ne > gate && i < maxIter) {
      // two fused rounds per action; only the final smallStar dedups (the
      // intermediate rounds' min-windows are duplicate-insensitive).
      // Eager materialization either way: the probe's union reads the
      // result twice. reliableEvery > 0 upgrades every k-th round to a
      // durable checkpoint (fault-tolerance contract: Ckpt.step).
      val pre = snapIds
      val next = Ckpt.step(
        smallStar(largeStar(smallStar(largeStar(edges), dedup = false))),
        i / 2 + 1, reliableEvery)
      val pr = probe(next)
      viol = pr._1; ne = pr._2
      val nextIds = snapIds -- pre
      free(liveIds) // predecessor blocks: superseded, release now
      liveIds = nextIds
      edges = next
      i += 2
    }
    val spark = docs.sparkSession
    val roots: DataFrame =
      if (viol == 0L) {
        // star forest: each non-root u has exactly one edge (u → component
        // min); min() is belt-and-braces against a non-star state that
        // slipped the probe
        edges.groupBy("u").agg(min("v").as("cluster"))
          .select(col("u").as("id"), col("cluster"))
      } else if (ne <= gate) {
        // bounded driver finish: union-find with union-by-min (attach the
        // LARGER root under the smaller), so every component's final root
        // is exactly its minimum id — the distributed fixpoint's labels
        val es = edges.select(col("u").cast("long"), col("v").cast("long")).collect()
        edges.unpersist(blocking = false) // nothing downstream reads the blocks
        val parent = new java.util.HashMap[Long, Long](es.length * 2)
        def find(a: Long): Long = {
          var x = a
          var p = parent.getOrDefault(x, x)
          while (p != x) { // path-halving
            val gp = parent.getOrDefault(p, p)
            parent.put(x, gp)
            x = gp
            p = parent.getOrDefault(x, x)
          }
          x
        }
        es.foreach { row =>
          val ra = find(row.getLong(0)); val rb = find(row.getLong(1))
          if (ra != rb) {
            if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
          }
        }
        val labels = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        es.foreach { row =>
          val u = row.getLong(0); val v = row.getLong(1)
          val ru = find(u); val rv = find(v)
          if (ru != u) labels += ((u, ru))
          if (rv != v) labels += ((v, rv))
        }
        import spark.implicits._
        val dedupLabels = labels.distinct.toSeq
        // small label sets ride the plan as a LocalRelation (accurate stats
        // => broadcast join against docs); big-but-bounded ones go through
        // parallelize to keep the logical plan itself lean
        val df =
          if (dedupLabels.size <= (1 << 20)) dedupLabels.toDF("id", "cluster")
          else spark.sparkContext.parallelize(dedupLabels,
            math.max(1, dedupLabels.size >> 20)).toDF("id", "cluster")
        df.select(col("id").cast(idType).as("id"),
          col("cluster").cast(idType).as("cluster"))
      } else {
        throw new IllegalStateException(
          s"nearDupClusters did not converge in $maxIter rounds; raise maxIter")
      }
    docs.select(col(idCol).as("id"))
      .join(roots, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
      .withColumn("is_duplicate", (col("id") =!= col("cluster")).cast("int"))
  }

  // SimHash vote packing: 3 bit-counters per long accumulator, 21 bits each.
  // 64 independent ±1 vote sums would need 64 agg expressions — past
  // `spark.sql.codegen.hugeMethodLimit` the hash aggregate falls back to
  // interpreted mode. Packing cuts it to 22 sums + 1 count. Each lane holds
  // the COUNT of set bits at that position (votes recover as 2·count − n);
  // lanes cannot carry into each other for documents under 2^20 tokens
  // (ANSI-safe: worst-case lane-2 sum is 2^42·2^20 = 2^62 < Long.Max).
  private val SimhashLanes = 3
  private val SimhashLaneBits = 21
  private val SimhashMaxTokens = 1L << 20

  /** 64-bit SimHash per document: per-token xxhash64, per-bit majority vote,
    * sign-assembled. Pure column expressions — one hash aggregate with
    * lane-packed counters (see above), fully codegen'd.
    * Documents are capped at 2^20 tokens (lane-overflow bound); longer docs
    * must be chunked upstream. */
  /** Blocking-quality harness: measured pair recall and reduction ratio of
    * an approximate candidate generator (LSH bands, SimHash chunks) against
    * the exact pair set — the dedup twin of the ANN recall harness
    * (q153): an approximate blocker without a recall number is a speed
    * claim with no quality denominator. Reduction ratio = 1 − candidates /
    * all-pairs, the fraction of the quadratic cost the blocking avoided.
    * Three tiny aggregates over pair tables; nothing corpus-sized moves.
    *
    * Returns one row: (n_truth, n_cand, n_hit, pair_recall,
    * reduction_ratio). */
  def blockingQuality(truth: DataFrame, candidates: DataFrame, nDocs: Long,
                      scoreOut: Column => Column): DataFrame = {
    val t = truth.select(col("id_a"), col("id_b")).distinct()
    val c = candidates.select(col("id_a"), col("id_b")).distinct()
    val nt = t.agg(count(lit(1)).as("n_truth"))
    val nc = c.agg(count(lit(1)).as("n_cand"))
    val nh = t.join(c, Seq("id_a", "id_b")).agg(count(lit(1)).as("n_hit"))
    val allPairs = nDocs.toDouble * (nDocs - 1) / 2.0
    nt.crossJoin(broadcast(nc)).crossJoin(broadcast(nh))
      .select(col("n_truth"), col("n_cand"), col("n_hit"),
        scoreOut(when(col("n_truth") > 0,
          col("n_hit").cast("double") / col("n_truth")).otherwise(lit(1.0)))
          .as("pair_recall"),
        scoreOut(lit(1.0) - col("n_cand") / lit(allPairs)).as("reduction_ratio"))
  }

  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs
      .select(col(idCol), slice(TextOps.tokens(col(textCol)), 1, SimhashMaxTokens.toInt).as("ts"))
      .select(col(idCol), explode(col("ts")).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val nGroups = (64 + SimhashLanes - 1) / SimhashLanes // 22
    val packed = (0 until nGroups).map { k =>
      val lanes = (0 until SimhashLanes).filter(l => k * SimhashLanes + l < 64).map { l =>
        shiftleft(shiftright(col("h"), k * SimhashLanes + l).bitwiseAND(lit(1L)), l * SimhashLaneBits)
      }
      sum(lanes.reduce(_ + _)).as(s"p$k")
    }
    val votes = tok.groupBy(idCol).agg(count(lit(1)).as("n"), packed: _*)
    // bit j set iff its set-bit count wins the majority: 2·count > n
    // (identical to the ±1 vote-sum formulation: 2c − n > 0)
    val assembled = (0 until 64).map { j =>
      val k = j / SimhashLanes
      val l = j % SimhashLanes
      val c = shiftright(col(s"p$k"), l * SimhashLaneBits)
        .bitwiseAND(lit((1L << SimhashLaneBits) - 1))
      shiftleft((c * 2 > col("n")).cast("long"), j)
    }.reduce(_ + _) // disjoint bits: sum == bitwise OR
    votes.select(col(idCol), assembled.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ `maxDist`, using the
    * pigeonhole trick: split the 64-bit hash into `maxDist+1` chunks; any
    * pair within distance shares at least one exact chunk → equi-join on
    * (chunk index, chunk value), then verify with bit_count(xor).
    * `maxBucketSize` defaults to uncapped — near-identical docs share ALL
    * chunks, so capping silently drops whole duplicate clusters; see
    * [[capBuckets]] before enabling it. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3, maxBucketSize: Int = Int.MaxValue): DataFrame = {
    require(maxDist >= 1 && maxDist <= 31, s"maxDist must be in [1,31], got $maxDist")
    val nChunks = maxDist + 1
    val width = 64 / nChunks
    val sh = simhash(docs, idCol, textCol)
    val chunks = (0 until nChunks).map { c =>
      struct(lit(c).as("ci"),
        shiftright(col("simhash"), c * width).bitwiseAND(lit((1L << width) - 1)).as("cv"))
    }
    val buckets = capBuckets(
      sh.select(col(idCol), col("simhash"), explode(array(chunks: _*)).as("ck"))
        .select(col(idCol), col("simhash"), col("ck.ci").as("ci"), col("ck.cv").as("cv")),
      Seq("ci", "cv"), maxBucketSize)
    // Carry the simhash value THROUGH the bucket self-join: the verdict is
    // computed from (h_a, h_b) directly, so no re-join against the signature
    // table is needed — the expensive vote aggregate has exactly two
    // consumers, and they are identical exchanges (ReuseExchange → computed
    // once), which is why no persist() is needed either.
    val a = buckets.select(col(idCol).as("id_a"), col("simhash").as("h_a"),
      col("ci"), col("cv"))
    val b = buckets.select(col(idCol).as("id_b"), col("simhash").as("h_b"),
      col("ci"), col("cv"))
    a.join(b, Seq("ci", "cv"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "h_a", "h_b")
      .distinct() // h_a/h_b are functions of the ids — distinct pairs survive
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }

  /** Fuzzy (edit-distance) duplicate pairs — the record-linkage primitive
    * for near-identical documents a token-set measure can't separate
    * ("same text, three typos" scores high Jaccard AND high n-gram sim;
    * edit distance is the direct claim). Candidates come from an equi-join
    * on (blockCols, length bucket) — never a cross join. Side b explodes
    * each row to buckets {lb−1, lb}, so a pair lands in the candidate set
    * iff the two docs' buckets differ by at most 1, with side a always
    * holding the lower-or-equal bucket — boundary-straddling pairs
    * (lengths 99/101 around a bucket edge) are candidates too. Since a
    * true pair satisfies |len_a − len_b| ≤ maxDist (edit distance ≥ the
    * length gap), its buckets can differ by at most 1 whenever
    * lenBucket > maxDist — so with that sizing the blocking has FULL
    * recall, not "sound-ish": zero pairs within maxDist are ever missed,
    * at ~2× the candidate volume of same-bucket-only. The confirm step
    * uses Spark's THRESHOLDED levenshtein — the DP aborts early once
    * `maxDist` is exceeded, O(maxDist·len) not O(len²) per pair.
    *
    * Returns confirmed pairs: (id_a, id_b, edit_dist), id_a < id_b. */
  def fuzzyDupPairs(docs: DataFrame, idCol: String, textCol: String,
                    blockCols: Seq[String], lenBucket: Int,
                    maxDist: Int): DataFrame = {
    // the FULL-recall proof above needs lenBucket > maxDist (otherwise a
    // true pair's buckets can differ by >1 and the ±1 blocking drops it)
    require(lenBucket > maxDist && maxDist >= 0,
      s"need lenBucket > maxDist for full blocking recall, " +
        s"got lenBucket=$lenBucket maxDist=$maxDist")
    val keyed = docs.select(
      (col(idCol) +: col(textCol) +: blockCols.map(col)) :+
        floor(length(col(textCol)) / lenBucket).cast("int").as("__lb"): _*)
    // side a is the STREAMED side of the candidate join (b broadcasts) and
    // carries the thresholded-DP confirm: spread it so the per-pair DP work
    // runs at cluster parallelism instead of inheriting the scan's single
    // row-group partition (profiled: both 2.7 s single-task stages of q196
    // — the orderBy sample pass and the final pass — were the whole
    // candidate+DP pipeline on one core; guide §2.5 input skew)
    val a = Spread.ifNarrow(keyed.select(col(idCol).as("id_a") +:
      col(textCol).as("t_a") +: blockCols.map(col) :+ col("__lb"): _*))
    // b carries its TRUE bucket in __lb_b and joins on the exploded
    // {lb−1, lb}: a match means a.__lb ∈ {b.lb−1, b.lb}, i.e. side a's
    // bucket ≤ side b's. A cross-bucket pair therefore appears exactly
    // once (lower-bucket doc on side a); a same-bucket pair appears in
    // both orders and is halved by the id test below. The downward explode
    // is GATED on len mod lenBucket < maxDist: a doc deeper than maxDist
    // into its bucket cannot be within maxDist of anything in the bucket
    // below (len_a ≤ lb·L−1 forces len_b − len_a > maxDist), and any true
    // straddling pair's higher doc provably passes the gate — so the gate
    // loses zero recall while cutting the extra candidate volume from
    // 2× to ~(1 + maxDist/lenBucket)× (q196 sf0.1: 5.9 → 5.1 s median).
    val b = keyed.select(col(idCol).as("id_b") +: col(textCol).as("t_b") +:
      blockCols.map(col) :+ col("__lb").as("__lb_b") :+
      explode(when(pmod(length(col(textCol)), lit(lenBucket)) < maxDist,
          array(col("__lb") - 1, col("__lb")))
        .otherwise(array(col("__lb")))).as("__lb"): _*)
    // ONE explicit conjunction, cheapest test first: separate .filter
    // calls merge into the join condition in surprising order (measured
    // with the DP predicate ahead of the dedup predicate — every pair
    // confirmed TWICE, 4 s → 11.5 s at sf0.1). Authored order is preserved
    // and short-circuits: the pair-dedup test kills half the same-bucket
    // pairs, the |len difference| bound (edit distance ≥ it) kills most of
    // the rest, and only survivors pay the O(maxDist·len) thresholded DP.
    // The surviving few recompute the distance once more in the output
    // projection — negligible against double-confirming every candidate.
    val confirmed =
      (col("__lb") < col("__lb_b") || col("id_a") < col("id_b")) &&
      abs(length(col("t_a")) - length(col("t_b"))) <= maxDist &&
      levenshtein(col("t_a"), col("t_b"), maxDist) >= 0
    a.join(b, blockCols :+ "__lb")
      .filter(confirmed)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        levenshtein(col("t_a"), col("t_b"), maxDist).as("edit_dist"))
  }

  /** The CANDIDATE pair set of [[fuzzyDupPairs]] — same (blockCols, ±1
    * length-bucket) join and |len diff| ≤ maxDist bound, WITHOUT the DP
    * confirm — for measuring blocking quality ([[blockingQuality]]): with
    * `lenBucket = Int.MaxValue` every doc lands in bucket 0 and this
    * degrades to the exact length-bound-only candidate set, the recall
    * denominator. Deliberately repeats the join rather than sharing a
    * helper with [[fuzzyDupPairs]]: the confirm conjunction's authored
    * ordering there is perf-critical (see its comment) and must not be
    * split into separate filters.
    *
    * Returns (id_a, id_b), id_a < id_b. */
  def fuzzyDupCandidates(docs: DataFrame, idCol: String, textCol: String,
                         blockCols: Seq[String], lenBucket: Int,
                         maxDist: Int): DataFrame = {
    require(lenBucket > maxDist && maxDist >= 0,
      s"need lenBucket > maxDist for full blocking recall, " +
        s"got lenBucket=$lenBucket maxDist=$maxDist")
    val keyed = docs.select(
      (col(idCol) +: blockCols.map(col)) :+ length(col(textCol)).as("__len") :+
        floor(length(col(textCol)) / lenBucket).cast("int").as("__lb"): _*)
    // same streamed-side spread as [[fuzzyDupPairs]] (see its comment)
    val a = Spread.ifNarrow(keyed.select(col(idCol).as("id_a") +:
      col("__len").as("__len_a") +: blockCols.map(col) :+ col("__lb"): _*))
    // same gated downward explode as [[fuzzyDupPairs]] (see its comment)
    val b = keyed.select(col(idCol).as("id_b") +: col("__len").as("__len_b") +:
      blockCols.map(col) :+ col("__lb").as("__lb_b") :+
      explode(when(pmod(col("__len"), lit(lenBucket)) < maxDist,
          array(col("__lb") - 1, col("__lb")))
        .otherwise(array(col("__lb")))).as("__lb"): _*)
    a.join(b, blockCols :+ "__lb")
      .filter((col("__lb") < col("__lb_b") || col("id_a") < col("id_b")) &&
        abs(col("__len_a") - col("__len_b")) <= maxDist)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
  }
}
