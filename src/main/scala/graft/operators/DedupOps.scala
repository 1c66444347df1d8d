package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact hash dedup,
  * MinHash+LSH banding, SimHash, and shared-shingle n-gram Jaccard.
  *
  * Scale design: every variant is a shuffle-bounded equi-join — candidate
  * pairs come from `groupBy`/join on a BUCKET key (band hash, simhash chunk,
  * shared shingle), never a cross join. At 100 TB the only quadratic step is
  * within-bucket pair expansion, bounded by bucket size (tunable via
  * bands/rows and shingle width).
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

  /** Drop bucket keys whose membership exceeds `maxBucketSize` before a
    * within-bucket pair expansion. A pathological bucket of 10⁶ members
    * would expand to 5·10¹¹ pairs; the cap bounds the worst case at
    * `maxBucketSize²/2` per bucket. Recall tradeoff: pairs whose ONLY shared
    * bucket is oversized are lost — for LSH-style multi-bucket schemes they
    * usually co-occur in a smaller bucket too. The window reuses the same
    * hash partitioning as the self-join that follows (no extra shuffle). */
  private def capBuckets(buckets: DataFrame, keyCols: Seq[String], maxBucketSize: Int): DataFrame =
    buckets
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

  /** Exact pairwise Jaccard ≥ `threshold` via PREFIX FILTERING
    * (AllPairs/PPJoin): order each document's shingles by ascending global
    * document frequency (rarest first, ties on value — a total order), keep
    * only the first `|A| − ⌈t·|A|⌉ + 1` as the candidate-generating prefix.
    * Any pair with J ≥ t MUST share a prefix shingle, so candidate
    * generation never joins on the corpus's hottest shingles — the classic
    * hot-bucket blowup (a shingle shared by 10⁶ docs → 10¹² pair rows) is
    * structurally bounded, with zero recall loss at the given threshold.
    *
    * Verification is count-based on the FULL shingle sets: |A∩B| falls out
    * of `groupBy(pair).count()` on the candidate×shingle equi-join and
    * |A∪B| = |A|+|B|−|A∩B| — no array intersection is ever materialized. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold must be in (0,1], got $threshold")
    val sh = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__t"))
      .select(col(idCol), TextOps.shingleSet(col("__t"), n).as("sh"))
    // explode_outer: plain explode triggers InferFiltersFromGenerate, whose
    // size(sh)>0 predicate is pushed below the token projection and re-expands
    // the shingle lambda with an inline split per element (~10x slowdown).
    // No persist (see object scaladoc): identical exchanges below are deduped
    // by ReuseExchange; the remaining branches re-scan linearly.
    // ONE shingle evaluation total (persist; see object scaladoc) feeding
    // the doc-frequency aggregate, the prefix sides, and both verification
    // streams; sizes fall out of the same id-partitioned window as rn.
    val ex = sh.select(col(idCol), explode_outer(col("sh")).as("s"))
      .filter(col("s").isNotNull)
      .persist()
    val docFreq = ex.groupBy("s").agg(count(lit(1)).as("df"))
    val wId = Window.partitionBy(idCol)
    val ranked = ex.join(docFreq, "s")
      .withColumn("rn", row_number().over(wId.orderBy(col("df"), col("s"))))
      .withColumn("sz", count(lit(1)).over(wId)) // distinct per doc: count = |set|
      .persist()
    val prefix = ranked
      .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
    val cand = prefix.select(col(idCol).as("id_a"), col("s"))
      .join(prefix.select(col(idCol).as("id_b"), col("s")), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val common = cand
      .join(ranked.select(col(idCol).as("id_a"), col("s"), col("sz").as("sz_a")), "id_a")
      .join(ranked.select(col(idCol).as("id_b"), col("s"), col("sz").as("sz_b")), Seq("id_b", "s"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_common"), max("sz_a").as("sz_a"), max("sz_b").as("sz_b"))
    common
      .withColumn("jaccard",
        col("n_common") / (col("sz_a") + col("sz_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signatures + LSH banding: shingle→xxhash64→k independent
    * re-hashes (`xxhash64(h, i)` — overflow-free under ANSI mode, unlike the
    * classic `a·h+b` permutation) with per-doc mins; band hash per
    * `rows`-sized slice; pairs sharing any band bucket are candidates, then
    * verified with exact Jaccard. Returns (id_a, id_b, jaccard) for verified
    * pairs ≥ `threshold`. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, numHashes: Int = 64, rows: Int = 4,
                      threshold: Double = 0.3, maxBucketSize: Int = 10000): DataFrame = {
    require(numHashes % rows == 0, s"numHashes ($numHashes) must divide evenly into rows of $rows")
    val bands = numHashes / rows
    val sh = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__t"))
      .select(col(idCol), TextOps.shingleSet(col("__t"), shingleN).as("sh"))
    // explode_outer + isNotNull + persist (see ngramJaccardPairs): the
    // signature aggregate and both verification streams prune differently,
    // so only materialization shares the shingle evaluation.
    val ex = sh.select(col(idCol), explode_outer(col("sh")).as("s"))
      .filter(col("s").isNotNull)
      .persist()
    val exploded = ex.select(col(idCol), xxhash64(col("s")).as("h"))
    val mins = (0 until numHashes).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    val sig = exploded.groupBy(idCol).agg(mins.head, mins.tail: _*)
    val bandStructs = (0 until bands).map { bi =>
      struct(lit(bi).as("band"),
        xxhash64((lit(bi) +: (0 until rows).map(r => col(s"m${bi * rows + r}"))): _*).as("bh"))
    }
    val buckets = sig.select(col(idCol), explode(array(bandStructs: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val cand = pairsByBucket(buckets, idCol, Seq("band", "bh"), maxBucketSize)
    // exact-Jaccard verification restricted to LSH candidates, count-based
    // (see ngramJaccardPairs): join candidates to both shingle streams.
    val sizes = ex.groupBy(idCol).agg(count(lit(1)).cast("int").as("sz"))
    val common = cand
      .join(ex.select(col(idCol).as("id_a"), col("s")), "id_a")
      .join(ex.select(col(idCol).as("id_b"), col("s")), Seq("id_b", "s"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        col("n_common") / (col("sz_a") + col("sz_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
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
    * (chunk index, chunk value), then verify with bit_count(xor). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3, maxBucketSize: Int = 10000): DataFrame = {
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
}
