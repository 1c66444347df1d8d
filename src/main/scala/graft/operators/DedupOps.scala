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
  * Caching note: these ops `persist()` their exploded shingle/signature
  * intermediates (they feed 3+ plan branches). The blocks live until the
  * session evicts them (LRU) or the caller runs
  * `spark.catalog.clearCache()`; long-lived sessions running many corpora
  * should clear between runs. */
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

  /** Distinct candidate pairs (a < b) sharing at least one exploded bucket
    * key. `buckets` must be (id, key...) with one row per bucket membership. */
  private def pairsByBucket(buckets: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val a = buckets.toDF(buckets.columns.map(c => s"a_$c"): _*)
    val b = buckets.toDF(buckets.columns.map(c => s"b_$c"): _*)
    val cond = keyCols.map(k => col(s"a_$k") === col(s"b_$k")).reduce(_ && _) &&
      col(s"a_$idCol") < col(s"b_$idCol")
    a.join(b, cond)
      .select(col(s"a_$idCol").as("id_a"), col(s"b_$idCol").as("id_b"))
      .distinct()
  }

  /** Exact pairwise Jaccard over shared-shingle candidates: pairs with no
    * common shingle have J = 0, so the equi-join on shingle loses nothing
    * for any threshold > 0.
    *
    * Count-based formulation: |A∩B| falls directly out of `groupBy(pair)
    * .count()` on the shingle equi-join (each shared distinct shingle is one
    * joined row) and |A∪B| = |A|+|B|-|A∩B| — no array intersection is ever
    * materialized, which is ~50× cheaper than `array_intersect` per pair on
    * wide shingle sets and keeps everything in hash joins/aggregates. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double): DataFrame = {
    val sh = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__t"))
      .select(col(idCol), TextOps.shingleSet(col("__t"), n).as("sh"))
    // explode_outer: plain explode triggers InferFiltersFromGenerate, whose
    // size(sh)>0 predicate is pushed below the token projection and re-expands
    // the shingle lambda with an inline split per element (~10x slowdown).
    // The exploded table feeds 3+ plan branches (self-join sides, sizes), so
    // persist it: one shingle evaluation total instead of one per branch.
    val ex = sh.select(col(idCol), explode_outer(col("sh")).as("s"))
      .filter(col("s").isNotNull)
      .persist()
    // shingle sets are distinct per doc, so |set| = exploded row count
    val sizes = ex.groupBy(idCol).agg(count(lit(1)).cast("int").as("sz"))
    val common = ex.select(col(idCol).as("id_a"), col("s"))
      .join(ex.select(col(idCol).as("id_b"), col("s")), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), "id_b")
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
                      threshold: Double = 0.3): DataFrame = {
    require(numHashes % rows == 0, s"numHashes ($numHashes) must divide evenly into rows of $rows")
    val bands = numHashes / rows
    val sh = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__t"))
      .select(col(idCol), TextOps.shingleSet(col("__t"), shingleN).as("sh"))
    // one shingle evaluation total (see ngramJaccardPairs): the exploded
    // table feeds the signature agg AND both verification streams.
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
    val cand = pairsByBucket(buckets, idCol, Seq("band", "bh"))
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

  /** 64-bit SimHash per document: per-token xxhash64, per-bit ±1 vote sums,
    * sign-assembled. Pure column expressions (64 conditional sums inside one
    * hash aggregate). */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitVotes = (0 until 64).map { j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)).as(s"b$j")
    }
    val votes = tok.groupBy(idCol).agg(bitVotes.head, bitVotes.tail: _*)
    val assembled = (0 until 64).map { j =>
      shiftleft((col(s"b$j") > 0).cast("long"), j)
    }.reduce(_ + _) // disjoint bits: sum == bitwise OR
    votes.select(col(idCol), assembled.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ `maxDist`, using the
    * pigeonhole trick: split the 64-bit hash into `maxDist+1` chunks; any
    * pair within distance shares at least one exact chunk → equi-join on
    * (chunk index, chunk value), then verify with bit_count(xor). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    require(maxDist >= 1 && maxDist <= 31, s"maxDist must be in [1,31], got $maxDist")
    val nChunks = maxDist + 1
    val width = 64 / nChunks
    // tiny (one row per doc) but feeds 3 plan branches (bucketing + both
    // sides of the verification join) — persist to compute the 64-vote
    // aggregation once
    val sh = simhash(docs, idCol, textCol).persist()
    val chunks = (0 until nChunks).map { c =>
      struct(lit(c).as("ci"),
        shiftright(col("simhash"), c * width).bitwiseAND(lit((1L << width) - 1)).as("cv"))
    }
    val buckets = sh.select(col(idCol), col("simhash"), explode(array(chunks: _*)).as("ck"))
      .select(col(idCol), col("simhash"), col("ck.ci").as("ci"), col("ck.cv").as("cv"))
    val cand = pairsByBucket(buckets.drop("simhash"), idCol, Seq("ci", "cv"))
    cand
      .join(sh.select(col(idCol).as("id_a"), col("simhash").as("h_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("simhash").as("h_b")), "id_b")
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }
}
