package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Similarity search over embedding columns (`Array[Float]`): brute-force
  * cosine top-k as the exactness baseline, and a random-hyperplane LSH
  * bucketed variant as the scale path (candidates come from an equi-join on
  * the bucket signature, not a cross join).
  *
  * All vector math is higher-order array expressions (`zip_with` /
  * `aggregate`) with explicit float→double casts BEFORE multiplication so
  * results are bit-reproducible across engines. */
object SimilarityOps {

  /** Float array → double array (cast before arithmetic, not after). */
  def toDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential-fold dot product — deterministic association order.
    * Portable HOF form; the DataFrame ops below use the codegen'd
    * [[graft.functions.DotProduct]] (identical accumulation order, so
    * bit-identical results) once registered on the session. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Codegen'd dot product (requires [[VectorFunctions.register]]). */
  def dotFast(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** L2 norm via the same sequential fold. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Codegen'd L2 norm (requires [[VectorFunctions.register]]). */
  def normFast(a: Column): Column = call_function("graft_l2norm", a)

  /** Cosine similarity of two double arrays; null when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val na = norm(a); val nb = norm(b)
    when(na > 0 && nb > 0, dot(a, b) / (na * nb))
  }

  /** Brute-force top-k cosine neighbors of one query vector: the query row
    * is broadcast, so the scan is a single pass with no shuffle until the
    * final TakeOrdered(k). */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     queryId: Long, k: Int, scoreOut: Column => Column): DataFrame = {
    VectorFunctions.register(emb.sparkSession)
    val e = emb.select(col(idCol), toDouble(col(vecCol)).as("v"))
    // query norm is a constant of the one broadcast row — compute it there,
    // not once per scanned row
    val q = e.filter(col(idCol) === queryId)
      .select(col("v").as("qv"), normFast(col("v")).as("qn"))
    val na = normFast(col("v"))
    e.crossJoin(broadcast(q))
      .withColumn("cos_sim", scoreOut(
        when(na > 0 && col("qn") > 0, dotFast(col("v"), col("qv")) / (na * col("qn")))))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
      .select(idCol, "cos_sim")
  }

  /** Deterministic random hyperplanes (seeded Gaussian), as literal arrays
    * baked into the plan — tiny (planes × dim doubles), no broadcast needed. */
  def hyperplanes(seed: Long, planes: Int, dim: Int): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket signature of a double-array column. */
  def lshBucket(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val lp = array(p.map(lit): _*)
      shiftleft((dot(v, lp) > 0).cast("long"), i)
    }.reduce(_ + _)

  /** LSH-bucketed ANN: candidates share the query's bucket signature, then
    * exact cosine + top-k within the bucket. Recall is tunable via number of
    * planes (fewer planes → bigger buckets → higher recall, more work). */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String, queryId: Long,
              k: Int, seed: Long, nPlanes: Int, dim: Int,
              scoreOut: Column => Column): DataFrame = {
    VectorFunctions.register(emb.sparkSession)
    val hp = hyperplanes(seed, nPlanes, dim)
    val e = emb.select(col(idCol), toDouble(col(vecCol)).as("v"))
      .withColumn("bucket", lshBucket(col("v"), hp))
    val q = e.filter(col(idCol) === queryId)
      .select(col("v").as("qv"), col("bucket").as("qbucket"), normFast(col("v")).as("qn"))
    val na = normFast(col("v"))
    e.join(broadcast(q), col("bucket") === col("qbucket"))
      .withColumn("cos_sim", scoreOut(
        when(na > 0 && col("qn") > 0, dotFast(col("v"), col("qv")) / (na * col("qn")))))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
      .select(idCol, "cos_sim")
  }

  /** Multi-probe LSH ANN: candidates lie in any bucket within Hamming
    * distance `probeDist` of the query's signature — the OR-amplification
    * recall lever over [[lshTopK]]'s single probe (a near neighbor flips
    * each sign bit with probability θ/π, so probing 1-bit-off buckets
    * recovers most single-probe misses). The probe set is expressed as
    * `bit_count(bucket ⊕ qbucket) ≤ d` against the one broadcast query row;
    * on a bucket-partitioned table at scale this reads `Σ C(planes, i≤d)`
    * partitions instead of one. */
  def lshTopKMultiProbe(emb: DataFrame, idCol: String, vecCol: String, queryId: Long,
                        k: Int, seed: Long, nPlanes: Int, dim: Int, probeDist: Int,
                        scoreOut: Column => Column): DataFrame = {
    require(probeDist >= 0 && probeDist <= nPlanes, s"probeDist must be in [0,$nPlanes]")
    VectorFunctions.register(emb.sparkSession)
    val hp = hyperplanes(seed, nPlanes, dim)
    val e = emb.select(col(idCol), toDouble(col(vecCol)).as("v"))
      .withColumn("bucket", lshBucket(col("v"), hp))
    val q = e.filter(col(idCol) === queryId)
      .select(col("v").as("qv"), col("bucket").as("qbucket"), normFast(col("v")).as("qn"))
    val na = normFast(col("v"))
    e.join(broadcast(q),
        bit_count(col("bucket").bitwiseXOR(col("qbucket"))) <= probeDist)
      .withColumn("cos_sim", scoreOut(
        when(na > 0 && col("qn") > 0, dotFast(col("v"), col("qv")) / (na * col("qn")))))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
      .select(idCol, "cos_sim")
  }

  /** Squared L2 between two driver-side vectors (trainer hot loop). */
  private def d2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val x = a(i) - b(i); s += x * x; i += 1 }
    s
  }

  /** Deterministic driver-side Lloyd's k-means with k-means++ seeding —
    * the quantizer trainer shared by [[fitIvf]] and [[fitPq]]. Quantizer
    * codebooks are conventionally trained on a BOUNDED in-memory sample
    * (the centroids need the distribution, not every point; FAISS trains
    * on ≲ 256 samples per centroid): the distributed-KMeans alternative
    * costs maxIter Spark jobs PER FIT, which at m=16 PQ subspaces is
    * hundreds of scheduler round-trips to fit kilobytes of centroids —
    * measured 6× slower end-to-end on the q105 gate. The sample is sorted
    * before training so centroids are a pure function of (data, seed),
    * independent of scan partition order. Empty clusters keep their
    * previous center. */
  private[graft] def kmeansLite(pts: Array[Array[Double]], k: Int, seed: Long,
                                    maxIter: Int): Array[Array[Double]] = {
    require(pts.nonEmpty, "cannot fit a quantizer on an empty sample")
    val rnd = new scala.util.Random(seed)
    val n = pts.length
    val dim = pts.head.length
    val centers = Array.ofDim[Array[Double]](k)
    centers(0) = pts(rnd.nextInt(n)).clone()
    // k-means++: sample each next center ∝ distance² to the nearest chosen
    val best = Array.fill(n)(Double.MaxValue)
    for (c <- 1 until k) {
      var i = 0
      while (i < n) {
        val dd = d2(pts(i), centers(c - 1)); if (dd < best(i)) best(i) = dd; i += 1
      }
      val tot = best.sum
      centers(c) =
        if (tot <= 0) pts(rnd.nextInt(n)).clone()
        else {
          var r = rnd.nextDouble() * tot; var j = 0
          while (j < n - 1 && r > best(j)) { r -= best(j); j += 1 }
          pts(j).clone()
        }
    }
    // -1 sentinel: the first pass must always register as a change, or a
    // first assignment that matches the default zeros (always true for
    // k = 1) would skip the averaging step entirely and return raw seed
    // points instead of centroids
    val assign = Array.fill(n)(-1)
    var changed = true
    var iter = 0
    while (changed && iter < maxIter) {
      changed = false
      var i = 0
      while (i < n) {
        var bc = 0; var bd = Double.MaxValue; var c = 0
        while (c < k) { val dd = d2(pts(i), centers(c)); if (dd < bd) { bd = dd; bc = c }; c += 1 }
        if (assign(i) != bc) { assign(i) = bc; changed = true }
        i += 1
      }
      if (changed) {
        val sums = Array.fill(k)(new Array[Double](dim))
        val cnts = new Array[Int](k)
        var p = 0
        while (p < n) {
          val a = assign(p); cnts(a) += 1
          var j = 0; while (j < dim) { sums(a)(j) += pts(p)(j); j += 1 }
          p += 1
        }
        for (c <- 0 until k if cnts(c) > 0) {
          var j = 0; while (j < dim) { centers(c)(j) = sums(c)(j) / cnts(c); j += 1 }
        }
      }
      iter += 1
    }
    centers
  }

  /** Bounded, order-independent training sample for the quantizer fits.
    * Determinism is a pure function of (row content, seed), NEVER of the
    * scan layout: `Dataset.sample` is per-partition seeded and `limit`
    * keeps whichever rows arrive first, so either would change the
    * codebooks when a file is split differently. Instead every row gets a
    * content hash xxhash64(seed, id); the fraction keeps rows below a
    * hash threshold, and the cap keeps the `maxTrainRows` SMALLEST hashes
    * (a deterministic pseudo-random subset via TakeOrdered — one pass, no
    * full sort). Finally sorted by id on the driver so the Lloyd loop
    * sees a canonical order. */
  private def trainSample(e: DataFrame, idCol: String, trainFraction: Double,
                          seed: Long, maxTrainRows: Int): Array[Array[Double]] = {
    require(trainFraction > 0 && trainFraction <= 1.0,
      s"trainFraction must be in (0,1], got $trainFraction")
    val h = xxhash64(lit(seed), col(idCol))
    val base = e.select(col(idCol), col("v"), h.as("__h"))
    val sampled =
      if (trainFraction < 1.0)
        // plain SIGNED threshold: xxhash64 is uniform over the whole
        // signed Long range, so keeping hashes below
        // Long.MinValue + fraction·2^64 keeps `fraction` of the rows —
        // no unsigned-compare trick is involved (or needed)
        base.filter(h < lit((Long.MinValue.toDouble +
          trainFraction * 2.0 * Long.MaxValue.toDouble).toLong))
      else base
    sampled.orderBy(col("__h"), col(idCol)).limit(maxTrainRows)
      .collect()
      .sortBy(_.get(0).toString)
      .map(_.getSeq[Double](1).toArray)
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer assigns every
    * vector to its nearest centroid cell; queries probe the `nProbe`
    * nearest cells and run exact cosine inside them. The index build
    * (`fitIvf`) is an offline, amortized step — the serving path is one
    * broadcast of the query row and a cell-membership filter, which on a
    * cell-partitioned table reads exactly `nProbe` partitions. Centroids
    * are fit driver-side on a bounded sample ([[kmeansLite]] — the
    * `collect` is capped at `maxTrainRows`, index-build metadata, not
    * data) and travel as plan literals (`nCells × dim` doubles); the
    * ASSIGNMENT of every vector is pure plan arithmetic (the same
    * struct-argmin as the probe ranking), a linear scan at any scale. */
  def fitIvf(emb: DataFrame, idCol: String, vecCol: String,
             nCells: Int, seed: Long, trainFraction: Double = 1.0,
             maxIter: Int = 20, maxTrainRows: Int = 100000): (DataFrame, Seq[Array[Double]]) = {
    // spread the single-row-group scan: cell assignment and the PQ encode
    // riding on `indexed` are per-row interpreted HOF folds over literal
    // codebooks — profiled as a 3 s single-task stage on q110 when the
    // scan's one partition flowed through (guide §2.5). trainSample is
    // hash-ordered, so the collected sample is partitioning-independent.
    val e = Spread.ifNarrow(emb.select(col(idCol), toDouble(col(vecCol)).as("v")))
    val centers = kmeansLite(trainSample(e, idCol, trainFraction, seed, maxTrainRows),
      nCells, seed, maxIter).toIndexedSeq
    val cell = element_at(array_sort(cellDists(centers)), 1)("cell")
    (e.select(col(idCol), col("v"), cell.as("cell")), centers)
  }

  /** Distance² of the `v` column to each literal centroid, as a sortable
    * (dist, cell) struct array — shared by the query-side probe ranking
    * ([[ivfTopK]]) and the soft re-assignment ([[softAssign]]). */
  private def cellDists(centers: Seq[Array[Double]]): Column =
    // one runtime loop over the literal centroid table — nCells unrolled
    // 64-dim fold expressions bloat the generated class (same fix as the
    // PQ paths: codegen size must not scale with the codebook)
    zip_with(
      transform(bookLit(centers), c =>
        aggregate(zip_with(col("v"), c, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x)),
      sequence(lit(0), lit(centers.size - 1)),
      (d, i) => struct(d.as("d"), i.as("cell")))

  /** Serving path over a fitted IVF index: probe the `nProbe` cells whose
    * centroids are closest to the query (ranking happens in-plan on the one
    * broadcast query row — no driver-side vector math). */
  def ivfTopK(indexed: DataFrame, centers: Seq[Array[Double]], idCol: String,
              queryId: Long, k: Int, nProbe: Int,
              scoreOut: Column => Column): DataFrame = {
    VectorFunctions.register(indexed.sparkSession)
    // sort + slice over the (dist², cell) structs picks the nProbe nearest
    // cells, all inside the single query row
    val q = indexed.filter(col(idCol) === queryId)
      .select(col("v").as("qv"), normFast(col("v")).as("qn"),
        transform(slice(array_sort(cellDists(centers)), 1, nProbe), s => s("cell")).as("probe"))
    val na = normFast(col("v"))
    indexed.join(broadcast(q), array_contains(col("probe"), col("cell")))
      .withColumn("cos_sim", scoreOut(
        when(na > 0 && col("qn") > 0, dotFast(col("v"), col("qv")) / (na * col("qn")))))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
      .select(idCol, "cos_sim")
  }

  /** Embedding near-dup pairs WITHOUT a given blocking column: the IVF
    * coarse-quantizer cells from [[fitIvf]] become the blocking key, so the
    * quadratic term is bounded by cell sizes the index already balanced.
    * Same-cell recall only (near-identical vectors quantize together;
    * boundary pairs split across adjacent cells are the documented miss —
    * [[ivfCosinePairsSoft]] is the recall fix). */
  def ivfCosinePairs(indexed: DataFrame, idCol: String, threshold: Double,
                     scoreOut: Column => Column): DataFrame =
    blockedCosinePairs(indexed, idCol, "v", "cell", threshold, scoreOut)

  /** Re-assign each vector to its `nAssign` nearest centroid cells, one row
    * per (vector, cell) — SOFT assignment. Distance ranking happens in-plan
    * per row (centroids are literals); the cell list is bound to a column
    * BEFORE the generator so no filter inferred from the explode can push
    * below the projection and re-expand the distance arithmetic per element
    * (the repo's documented HOF pitfall). */
  def softAssign(indexed: DataFrame, centers: Seq[Array[Double]],
                 nAssign: Int): DataFrame = {
    require(nAssign >= 1 && nAssign <= centers.size,
      s"nAssign must be in [1, ${centers.size}], got $nAssign")
    val others = indexed.columns.filterNot(_ == "cell").map(col).toIndexedSeq
    indexed
      .withColumn("__cells",
        transform(slice(array_sort(cellDists(centers)), 1, nAssign), s => s("cell")))
      .select(others :+ explode_outer(col("__cells")).as("cell"): _*)
      .filter(col("cell").isNotNull)
  }

  /** IVF pair search with SOFT assignment: each vector blocks on its
    * `nAssign` nearest cells, so a boundary pair whose members quantize
    * into ADJACENT cells still shares a block (both list each other's cell
    * among their nearest). Candidates are deduped on (id_a, id_b) BEFORE
    * the dot product — a pair sharing several cells is scored once. Work
    * scales by nAssign× rows in the join input; recall of boundary pairs
    * is what it buys (measured in the spec). */
  def ivfCosinePairsSoft(indexed: DataFrame, centers: Seq[Array[Double]],
                         idCol: String, threshold: Double, nAssign: Int,
                         scoreOut: Column => Column): DataFrame = {
    VectorFunctions.register(indexed.sparkSession)
    // cast + norm ONCE per row before the pair join (blockedCosinePairs
    // discipline) — a per-pair transform would rebuild both arrays in the
    // scoring loop
    val e = softAssign(
      indexed.withColumn("v", toDouble(col("v"))).withColumn("nv", normFast(col("v"))),
      centers, nAssign)
    val a = e.select(col(idCol).as("id_a"), col("cell"), col("v").as("va"), col("nv").as("na"))
    val b = e.select(col(idCol).as("id_b"), col("cell"), col("v").as("vb"), col("nv").as("nb"))
    a.join(b, Seq("cell")).filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos_sim",
        when(col("na") > 0 && col("nb") > 0,
          dotFast(col("va"), col("vb")) / (col("na") * col("nb"))))
      .filter(col("cos_sim") > threshold)
      .select(col("id_a"), col("id_b"), scoreOut(col("cos_sim")).as("cos_sim"))
  }

  /** Embedding-space outlier scoring: L2 distance of every vector to its
    * block's centroid, ranked within the block (the mislabeled/garbage
    * detector that complements near-dup REMOVAL — far-from-every-centroid
    * vectors are the suspects). The centroid is a distributed vector mean
    * via `Summarizer.mean` — one grouped aggregate, NO per-dimension
    * explode, so the shuffle carries one partial mean per (partition,
    * block) instead of rows × dim element rows. Centroids (one row per
    * block) broadcast back for the distance pass.
    *
    * Ranks are computed on the ROUNDED distance (`scoreOut`), ties on the
    * id — deterministic across engines and re-runs even though the mean's
    * summation order is not. */
  def centroidOutliers(emb: DataFrame, idCol: String, vecCol: String,
                       blockCol: String, topK: Int,
                       scoreOut: Column => Column): DataFrame = {
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    import org.apache.spark.ml.stat.Summarizer
    import org.apache.spark.sql.expressions.Window
    val e = emb.select(col(idCol), col(blockCol).as("blk"), toDouble(col(vecCol)).as("v"))
    val cent = e.groupBy("blk")
      .agg(vector_to_array(Summarizer.mean(array_to_vector(col("v")))).as("m"))
    val w = Window.partitionBy("blk").orderBy(col("dist").desc, col(idCol))
    e.join(broadcast(cent), "blk")
      .withColumn("dist", scoreOut(sqrt(aggregate(
        zip_with(col("v"), col("m"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x))))
      .withColumn("rk", row_number().over(w))
      .withColumn("is_outlier", (col("rk") <= topK).cast("int"))
      .select(col(idCol), col("blk").as(blockCol), col("dist"), col("rk"), col("is_outlier"))
  }

  /** Blocked exact near-dup pairs: equi-join on a blocking key (here a
    * label/cluster column) bounds the quadratic term to block sizes — the
    * standard scale pattern when a clustering or coarse quantizer exists. */
  def blockedCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
                         blockCol: String, threshold: Double,
                         scoreOut: Column => Column): DataFrame = {
    // Norms are a per-ROW function: compute once before the pair join, not
    // once per pair — cuts the per-pair work to a single dot product.
    VectorFunctions.register(emb.sparkSession)
    val e = emb.select(col(idCol), col(blockCol), toDouble(col(vecCol)).as("v"))
      .withColumn("nv", normFast(col("v")))
    val a = e.select(col(idCol).as("id_a"), col(blockCol).as("blk"),
      col("v").as("va"), col("nv").as("na"))
    val b = e.select(col(idCol).as("id_b"), col(blockCol).as("blk"),
      col("v").as("vb"), col("nv").as("nb"))
    a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim",
        when(col("na") > 0 && col("nb") > 0, dotFast(col("va"), col("vb")) / (col("na") * col("nb"))))
      .filter(col("cos_sim") > threshold)
      .select(col("id_a"), col("id_b"), scoreOut(col("cos_sim")).as("cos_sim"))
  }

  /** Banded sign-LSH cosine candidate pairs (id_a < id_b) — the
    * SCALE-PATH candidate generator for density clustering
    * ([[graft.operators.ClusterOps.dbscan]]) and near-dup search: the
    * nPlanes-bit sign signature is split into `nPlanes / bandBits`
    * bands, a pair becomes a candidate when ANY band matches exactly
    * (classic AND-OR amplification: per-band match prob = p^bandBits,
    * candidate prob = 1 − (1 − p^bandBits)^bands, p = 1 − θ/π), and only
    * candidates pay the exact dot product — computed once per DISTINCT
    * pair, after the (id_a, id_b) dedup, never inside the band join.
    * Every stage is an equi-join keyed on (band, band_value): at corpus
    * scale the band table is shuffle-partitioned by bucket and the
    * quadratic term is bounded by bucket size, the same economics as the
    * q59/q213 machinery. Recall is tunable (more bands ↑ recall, bigger
    * bandBits ↓ candidate volume); the q344 gate pins bucketed ≡ exact
    * on the fixture by verifying the LSH path against the brute-force
    * DuckDB oracle (the q213 contract — a recall regression is a hash
    * mismatch, not a silent quality drop). The returned cosine is
    * rounded by `scoreOut` BEFORE the threshold compare, matching
    * [[exactCosinePairs]]'s boundary-stability convention. */
  def lshBandedCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
                           threshold: Double, nPlanes: Int, bandBits: Int,
                           dim: Int, seed: Long,
                           scoreOut: Column => Column): DataFrame = {
    require(nPlanes >= bandBits && nPlanes <= 62 && nPlanes % bandBits == 0,
      s"need bandBits <= nPlanes <= 62 with bandBits | nPlanes, got $nPlanes/$bandBits")
    VectorFunctions.register(emb.sparkSession)
    val hp = hyperplanes(seed, nPlanes, dim)
    val nBands = nPlanes / bandBits
    // spread the single-row-group scan BEFORE the signature fold: unspread,
    // the band self-join's streamed side inherits the scan's ONE partition
    // and the whole candidate-pair production (the quadratic term) runs
    // single-task — profiled 2.05 s of q344's 6.8 s as one 32-core-idle
    // stage writing the 12M-pair exchange (guide §2.5 input skew)
    val sig = Spread.ifNarrow(emb.select(col(idCol), toDouble(col(vecCol)).as("v")))
      .withColumn("__bkt", lshBucket(col("v"), hp))
      .persist()
    val bandStructs = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("__bkt"), b * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1)).as("bv"))
    }
    val bands = sig
      .select(col(idCol), explode(array(bandStructs: _*)).as("__bb"))
      .select(col(idCol), col("__bb.band").as("band"), col("__bb.bv").as("bv"))
    val cand = bands.select(col(idCol).as("id_a"), col("band"), col("bv"))
      .join(bands.select(col(idCol).as("id_b"), col("band"), col("bv")),
        Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val va = sig.select(col(idCol).as("id_a"), col("v").as("va"),
      normFast(col("v")).as("na"))
    val vb = sig.select(col(idCol).as("id_b"), col("v").as("vb"),
      normFast(col("v")).as("nb"))
    cand.join(va, "id_a").join(vb, "id_b")
      .withColumn("cos_sim", scoreOut(
        when(col("na") > 0 && col("nb") > 0,
          dotFast(col("va"), col("vb")) / (col("na") * col("nb")))))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** Exact all-pairs cosine candidates (id_a < id_b) above a threshold
    * applied to the dec6-ROUNDED similarity — the boundary-stable
    * candidate generator for density clustering ([[graft.operators.
    * ClusterOps.dbscan]]): a pair at cos ≈ threshold must fall on the
    * same side in every replaying engine, so the comparison runs on the
    * rounded value. Deliberately QUADRATIC (one BNLJ over the vector
    * table) — correct as the small-table / oracle-parity path only; at
    * corpus scale feed dbscan the LSH-bucketed candidates instead (the
    * q59/q213 machinery — same output shape, recall-bounded). */
  def exactCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
                       threshold: Double,
                       scoreOut: Column => Column): DataFrame = {
    VectorFunctions.register(emb.sparkSession)
    // deliberately quadratic, but not deliberately SERIAL: spread the
    // streamed side so the BNLJ's n² dot products run at cluster
    // parallelism instead of the scan's one row-group partition
    val e = Spread.ifNarrow(emb.select(col(idCol), toDouble(col(vecCol)).as("v")))
      .withColumn("nv", normFast(col("v")))
    val a = e.select(col(idCol).as("id_a"), col("v").as("va"), col("nv").as("na"))
    val b = e.select(col(idCol).as("id_b"), col("v").as("vb"), col("nv").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos_sim", scoreOut(
        when(col("na") > 0 && col("nb") > 0,
          dotFast(col("va"), col("vb")) / (col("na") * col("nb")))))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** Symmetric per-vector int8 quantization (the storage/serving format
    * ANN indexes ship at scale — 4× smaller than float32, SIMD-friendly):
    * scale = 127 / max|x|, q_i = floor(x_i·scale + 0.5). A pure per-row
    * linear scan — no shuffle — emitting audit scalars (saturation count,
    * quantized sum/extrema) rather than the int8 payload, so the math is
    * verifiable cross-engine. The explicit floor(+0.5) formula (not the
    * engine's `round`) is bit-deterministic in both Spark and DuckDB; a
    * zero vector keeps scale 0 and quantizes to all zeros. */
  def int8Quantize(emb: DataFrame, idCol: String, vecCol: String,
                   scoreOut: Column => Column): DataFrame = {
    val q = emb
      .select(col(idCol), toDouble(col(vecCol)).as("v"))
      .withColumn("max_abs", array_max(transform(col("v"), x => abs(x))))
      .withColumn("scale", when(col("max_abs") > 0, lit(127.0) / col("max_abs"))
        .otherwise(lit(0.0)))
      .withColumn("q", transform(col("v"),
        x => floor(x * col("scale") + lit(0.5)).cast("int")))
    q.select(
      col(idCol),
      size(col("v")).as("dim"),
      scoreOut(col("max_abs")).as("max_abs"),
      aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("q_sum"),
      array_min(col("q")).as("q_min"),
      array_max(col("q")).as("q_max"),
      size(filter(col("q"), x => abs(x) === 127)).as("n_sat"))
  }

  /** Codebook `j` (k codewords × sub dims) as one literal 2-D array. */
  private def bookLit(cb: Seq[Array[Double]]): Column =
    array(cb.map(cw => array(cw.map(lit).toIndexedSeq: _*)): _*)

  /** Squared L2 of subspace-`j`'s slice of `v` against EVERY codeword of
    * the literal book, as a k-length array — one runtime loop, not k
    * unrolled expressions (m × k unrolled HOFs measured multi-second
    * codegen compile time on the q105 gate). */
  private def subDists(v: Column, start: Int, sub: Int, book: Column): Column =
    transform(book, cw =>
      aggregate(zip_with(slice(v, start, sub), cw, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x))

  /** Product quantization (Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", TPAMI'11) — the compression end of the ANN family
    * (brute → LSH → IVF → PQ): split each vector into `m` subspaces, fit an
    * independent k-means codebook of `k` codewords per subspace on a SAMPLE
    * (the codebooks need the distribution, not every point — same contract
    * as [[fitIvf]]), and store each vector as `m` small codes. At 64 dims,
    * m=8, k=16 that is 8 bytes per vector instead of 256 — the format that
    * lets a 100 TB embedding corpus serve from a fraction of the memory.
    *
    * Returns (encoded, codebooks): `encoded` keeps the raw vector alongside
    * `code: array<int>` (the gate keeps both for cross-validation; a
    * production index persists only the codes), `codebooks` is m × k
    * codewords of dim/m doubles. Encoding is PURE PLAN ARITHMETIC — the
    * codebooks travel as literals and the argmin per subspace is the same
    * sort-one-struct-array trick as [[ivfTopK]]'s probe ranking, so the
    * encode pass is a linear scan with no shuffle and no UDF. */
  def fitPq(emb: DataFrame, idCol: String, vecCol: String,
            m: Int, k: Int, seed: Long, trainFraction: Double = 1.0,
            maxIter: Int = 20, maxTrainRows: Int = 100000): (DataFrame, Seq[Seq[Array[Double]]]) = {
    // same narrow-scan spread as [[fitIvf]] (the PQ encode is the
    // expensive per-row pass); trainSample stays partitioning-independent
    val e = Spread.ifNarrow(emb.select(col(idCol), toDouble(col(vecCol)).as("v")))
    val sample = trainSample(e, idCol, trainFraction, seed, maxTrainRows)
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val sub = dim / m
    // one collected sample feeds all m subspace fits — slicing on the
    // driver costs nothing next to m distributed fits' job overhead
    val codebooks = (0 until m).map { j =>
      kmeansLite(sample.map(_.slice(j * sub, (j + 1) * sub)), k, seed + j, maxIter)
        .toIndexedSeq
    }
    (e.withColumn("code", pqCodes(col("v"), codebooks)), codebooks)
  }

  /** PQ encoding of `v` against the literal codebooks: per subspace, the
    * argmin codeword index via the struct-sort trick, with each distance
    * array built by one runtime loop over the literal book. Shared by the
    * flat-PQ and residual-PQ (IVFPQ) encode passes. */
  private def pqCodes(v: Column, codebooks: Seq[Seq[Array[Double]]]): Column = {
    val sub = codebooks.head.head.length
    array(codebooks.indices.map { j =>
      val dists = zip_with(subDists(v, j * sub + 1, sub, bookLit(codebooks(j))),
        sequence(lit(0), lit(codebooks(j).size - 1)),
        (d, c) => struct(d.as("d"), c.as("c")))
      element_at(array_sort(dists), 1)("c")
    }: _*)
  }

  /** Residual of `v` against its assigned cell's centroid (the literal
    * centroid table indexed by the `cell` column) — the quantity IVFPQ's
    * codebooks model. */
  private def residual(v: Column, cell: Column, centers: Seq[Array[Double]]): Column =
    zip_with(v, element_at(bookLit(centers), cell + 1), (x, c) => x - c)

  /** IVFPQ (Jégou et al. '11 §IV — IVFADC): the production ANN index shape.
    * The IVF coarse quantizer assigns each vector a cell; PQ then encodes
    * the RESIDUAL v − centroid(cell), whose spread is far smaller than the
    * raw vectors', so the same m × k codebook budget spends its precision
    * where it matters. Index = (id, cell, 8-byte code); serving probes a
    * handful of cells and never touches raw vectors.
    *
    * Both quantizer fits are bounded driver-side samples ([[trainSample]]);
    * cell assignment AND residual encoding are pure plan arithmetic over
    * literal centroid/codebook tables — two linear scans, no shuffle, no
    * UDF. Returns (encoded index keeping `v` for gate cross-validation,
    * coarse centroids, residual codebooks). */
  def fitIvfPq(emb: DataFrame, idCol: String, vecCol: String,
               nCells: Int, m: Int, k: Int, seed: Long,
               trainFraction: Double = 1.0, maxIter: Int = 20,
               maxTrainRows: Int = 100000): (DataFrame, Seq[Array[Double]], Seq[Seq[Array[Double]]]) = {
    val (indexed, centers) = fitIvf(emb, idCol, vecCol, nCells, seed,
      trainFraction, maxIter, maxTrainRows)
    val r = residual(col("v"), col("cell"), centers)
    // the codebooks are fit on a bounded sample of RESIDUALS — one extra
    // linear pass; the residual itself is recomputed in-plan at encode
    // time rather than materialized per row
    val sample = trainSample(indexed.select(col(idCol), r.as("v")), idCol,
      trainFraction, seed + 1, maxTrainRows)
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val sub = dim / m
    val codebooks = (0 until m).map { j =>
      kmeansLite(sample.map(_.slice(j * sub, (j + 1) * sub)), k, seed + j, maxIter)
        .toIndexedSeq
    }
    (indexed.withColumn("code", pqCodes(r, codebooks)), centers, codebooks)
  }

  /** IVFPQ serving: probe the `nProbe` cells nearest the query, rank
    * candidates by ADC against a PER-CELL distance table built from the
    * query's residual in THAT cell (the residual differs per probed cell,
    * so each probed cell carries its own m × k table — Jégou '11's IVFADC
    * lookup structure). All tables live in the single broadcast query row;
    * each candidate costs m array lookups on its 8-byte code — the scan
    * touches (cell, code) only, never raw vectors. */
  def ivfPqTopK(encoded: DataFrame, centers: Seq[Array[Double]],
                codebooks: Seq[Seq[Array[Double]]], idCol: String,
                queryId: Long, k: Int, nProbe: Int,
                scoreOut: Column => Column): DataFrame = {
    val m = codebooks.size
    val sub = codebooks.head.head.length
    def tbl(r: Column): Column =
      array((0 until m).map(j => subDists(r, j * sub + 1, sub, bookLit(codebooks(j)))): _*)
    val q = encoded.filter(col(idCol) === queryId)
      .select(transform(slice(array_sort(cellDists(centers)), 1, nProbe), s =>
        struct(s("cell").as("cell"),
          tbl(residual(col("v"), s("cell"), centers)).as("tbl"))).as("ptabs"))
    encoded.select(col(idCol), col("cell"), col("code"))
      .join(broadcast(q), exists(col("ptabs"), p => p("cell") === col("cell")))
      .withColumn("__tbl",
        element_at(filter(col("ptabs"), p => p("cell") === col("cell")), 1)("tbl"))
      .withColumn("adc_dist2", scoreOut(aggregate(
        zip_with(col("code"), col("__tbl"), (c, t) => element_at(t, c + 1)),
        lit(0.0), (acc, x) => acc + x)))
      .orderBy(col("adc_dist2").asc, col(idCol))
      .limit(k)
      .select(idCol, "adc_dist2")
  }

  /** PQ top-k by ASYMMETRIC DISTANCE COMPUTATION: the one query row builds
    * an m × k lookup table of exact subspace distances to every codeword
    * (`tbl`), the table broadcasts, and each candidate's approximate
    * squared L2 is m table lookups indexed by its codes — NO vector
    * arithmetic per candidate, which is the entire point: at scale the
    * scan touches only the 8-byte code column, never the raw vectors.
    * On L2-normalized vectors ascending ADC distance ≈ descending cosine,
    * so this ranks comparably to the cosine-based ANN variants. */
  def pqTopK(encoded: DataFrame, codebooks: Seq[Seq[Array[Double]]],
             idCol: String, queryId: Long, k: Int,
             scoreOut: Column => Column): DataFrame = {
    val m = codebooks.size
    val sub = codebooks.head.head.length
    val tbl = array((0 until m).map { j =>
      subDists(col("v"), j * sub + 1, sub, bookLit(codebooks(j)))
    }: _*)
    val q = encoded.filter(col(idCol) === queryId).select(tbl.as("tbl"))
    encoded.select(col(idCol), col("code")).crossJoin(broadcast(q))
      .withColumn("adc_dist2", scoreOut(aggregate(
        zip_with(col("code"), col("tbl"), (c, t) => element_at(t, c + 1)),
        lit(0.0), (acc, x) => acc + x)))
      .orderBy(col("adc_dist2").asc, col(idCol))
      .limit(k)
      .select(idCol, "adc_dist2")
  }

  /** Deterministic cyclic Jacobi eigensolver for a symmetric matrix — the
    * driver-side finish of [[fitPca]] (dim × dim, e.g. 64×64: microseconds;
    * the eigenproblem size is the EMBEDDING dimension, never the corpus).
    * Plain cyclic sweeps with the standard stable rotation (Golub & Van
    * Loan §8.5); iteration order is fixed, so the result is a pure
    * function of the input matrix. Returns (eigenvalues, eigenvectors as
    * rows), unsorted. */
  private[graft] def jacobiEigen(m: Array[Array[Double]],
                                 maxSweeps: Int = 64,
                                 tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > tol) {
      off = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          off += apq * apq
          if (math.abs(apq) > tol * 1e-3) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s   => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val eig = Array.tabulate(n)(i => a(i)(i))
    val vecs = Array.tabulate(n)(j => Array.tabulate(n)(i => v(i)(j)))
    (eig, vecs)
  }

  /** PCA fit in ONE distributed pass: the first and second moments — mean
    * vector and mean outer product — come from a single grouped aggregate
    * (`Summarizer.mean` over the dim- and dim²-length arrays, partial-
    * merged map-side like any Spark aggregate), the population covariance
    * C = E[vvᵀ] − µµᵀ assembles on the driver, and the dim × dim
    * eigenproblem finishes with [[jacobiEigen]]. The collect is ONE row of
    * dim + dim² doubles (64-dim → 33 KB) — fixed-size fit metadata, the
    * same contract as the k-means codebooks, independent of corpus size.
    *
    * Eigenpairs are sorted by descending eigenvalue (ties: first
    * occurrence) and each component's sign is canonicalized (entry of
    * largest magnitude — lowest index on ties — made positive), so the
    * basis is a pure function of the data: re-runs, re-partitions and
    * re-layouts produce the identical transform up to float summation
    * noise in the moments.
    *
    * Returns (mean, eigenvalues desc, components as rows, n). */
  def fitPca(emb: DataFrame, idCol: String, vecCol: String, k: Int)
      : (Array[Double], Array[Double], Seq[Array[Double]], Long) = {
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    import org.apache.spark.ml.stat.Summarizer
    // spread the narrow scan: the dim² outer product per row (4096 doubles
    // at dim 64) otherwise aggregates in ONE task (profiled 1.7 s at
    // sf0.1); the moment sums drift only in the last ulp under the changed
    // partial order, absorbed by the dec6 rounding downstream
    val e = Spread.ifNarrow(emb.select(toDouble(col(vecCol)).as("v")))
    val outer = flatten(transform(col("v"), x => transform(col("v"), y => x * y)))
    val row = e.agg(
      vector_to_array(Summarizer.mean(array_to_vector(col("v")))).as("m"),
      vector_to_array(Summarizer.mean(array_to_vector(outer))).as("m2"),
      count(lit(1)).as("n")).head()
    val mean = row.getSeq[Double](0).toArray
    val m2 = row.getSeq[Double](1).toArray
    val n = row.getLong(2)
    val dim = mean.length
    require(k >= 1 && k <= dim, s"k must be in [1, $dim], got $k")
    val cov = Array.tabulate(dim, dim)((i, j) => m2(i * dim + j) - mean(i) * mean(j))
    val (eig, vecs) = jacobiEigen(cov)
    val order = eig.zipWithIndex.sortBy { case (ev, i) => (-ev, i) }.map(_._2)
    val comps = order.take(k).map { idx =>
      val w = vecs(idx)
      val pivot = w.zipWithIndex.maxBy { case (x, i) => (math.abs(x), -i) }._2
      if (w(pivot) < 0) w.map(-_) else w.clone()
    }
    (mean, order.take(k).map(eig), comps.toIndexedSeq, n)
  }

  /** Project every vector onto a fitted PCA basis: center against the
    * literal mean, then one runtime loop over the literal component matrix
    * (k × dim doubles in the plan — same no-codegen-blowup discipline as
    * the PQ codebooks). A pure linear scan, no shuffle, no UDF; at 100 TB
    * this is the dimensionality-reduction pass that turns 1 KB float rows
    * into k-float rows before ANN indexing or clustering.
    *
    * Returns (id, proj: array<double>[k]). */
  def pcaProject(emb: DataFrame, idCol: String, vecCol: String,
                 mean: Array[Double], components: Seq[Array[Double]]): DataFrame = {
    val meanLit = array(mean.map(lit).toIndexedSeq: _*)
    val wLit = array(components.map(w => array(w.map(lit).toIndexedSeq: _*)): _*)
    emb.select(col(idCol), toDouble(col(vecCol)).as("v"))
      .withColumn("__c", zip_with(col("v"), meanLit, (x, mu) => x - mu))
      .select(col(idCol), transform(wLit, w =>
        aggregate(zip_with(col("__c"), w, (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x)).as("proj"))
  }

  /** Contrastive hard-negative mining: for each query vector, the top-k
    * most-cosine-similar vectors with a DIFFERENT label — the triplet-loss
    * training pairs an embedding model needs ("looks like the anchor,
    * isn't") that random negatives can't provide. The query set is a
    * bounded, explicitly-listed id set (an epoch mines for a batch of
    * anchors, not all-pairs): its rows broadcast, the corpus streams past
    * in ONE scan scoring all queries at once, and the per-query top-k is
    * a window over candidates. At 100 TB, swap the scan for an ANN probe
    * per query and pre-prune per-partition top-k before the window; the
    * interface is unchanged.
    *
    * Returns (query_id, id, label, cos_sim, rank) with rank ≤ k per
    * query, ranked on the ROUNDED similarity with id tiebreak. */
  def hardNegatives(emb: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, queryIds: Seq[Long], k: Int,
                    scoreOut: Column => Column): DataFrame = {
    require(queryIds.nonEmpty && queryIds.size <= 1024,
      s"query set must be bounded: got ${queryIds.size}")
    VectorFunctions.register(emb.sparkSession)
    val e = emb.select(col(idCol), col(labelCol).as("lbl"),
      toDouble(col(vecCol)).as("v"))
    val q = e.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col("lbl").as("qlbl"),
        col("v").as("qv"), normFast(col("v")).as("qn"))
    val na = normFast(col("v"))
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col(idCol))
    e.crossJoin(broadcast(q))
      .filter(col("lbl") =!= col("qlbl"))
      .withColumn("cos_sim", scoreOut(
        when(na > 0 && col("qn") > 0, dotFast(col("v"), col("qv")) / (na * col("qn")))
          .otherwise(lit(0.0))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("lbl").as(labelCol),
        col("cos_sim"), col("rank"))
  }

  /** Triplet dataset construction for contrastive training: per anchor,
    * the hardest POSITIVE (same label, most similar, excluding self) and
    * the hardest NEGATIVE (different label, most similar) — the (anchor,
    * pos, neg) rows a triplet/InfoNCE loss consumes, with the margin
    * recorded so curriculum filtering (keep only margin < m "hard"
    * triplets) is a plain filter downstream. Same bounded-anchor /
    * one-scan contract as [[hardNegatives]]: both candidate scans ride the
    * SAME broadcast of the anchor rows.
    *
    * Returns (query_id, pos_id, pos_sim, neg_id, neg_sim, margin). */
  def tripletMine(emb: DataFrame, idCol: String, vecCol: String,
                  labelCol: String, queryIds: Seq[Long],
                  scoreOut: Column => Column): DataFrame = {
    require(queryIds.nonEmpty && queryIds.size <= 1024,
      s"anchor set must be bounded: got ${queryIds.size}")
    VectorFunctions.register(emb.sparkSession)
    val e = emb.select(col(idCol), col(labelCol).as("lbl"),
      toDouble(col(vecCol)).as("v"))
    val q = e.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col("lbl").as("qlbl"),
        col("v").as("qv"), normFast(col("v")).as("qn"))
    val na = normFast(col("v"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cos_sim", scoreOut(
        when(na > 0 && col("qn") > 0, dotFast(col("v"), col("qv")) / (na * col("qn")))
          .otherwise(lit(0.0))))
    val w = Window.partitionBy("query_id", "side")
      .orderBy(col("cos_sim").desc, col(idCol))
    scored
      .withColumn("side", when(col("lbl") === col("qlbl"), "pos").otherwise("neg"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .groupBy("query_id")
      .agg(
        max(when(col("side") === "pos", col(idCol))).as("pos_id"),
        max(when(col("side") === "pos", col("cos_sim"))).as("pos_sim"),
        max(when(col("side") === "neg", col(idCol))).as("neg_id"),
        max(when(col("side") === "neg", col("cos_sim"))).as("neg_sim"))
      .select(col("query_id"), col("pos_id"), col("pos_sim"),
        col("neg_id"), col("neg_sim"),
        scoreOut(col("pos_sim") - col("neg_sim")).as("margin"))
  }

  /** ANN recall harness: measured recall@k of an approximate index against
    * the exact brute-force ranking, per anchor — "measure, don't guess"
    * made first-class, because an ANN variant without a recall number is
    * a speed claim with no quality denominator. The anchor set is bounded
    * (serving-path eval, same contract as [[mmrRerank]]); each anchor
    * costs one ANN probe + one exact scan at gate scale, and in
    * production the exact side runs once offline per eval refresh.
    *
    * Returns (query_id, k, n_overlap, recall) plus a ("__mean__", …)
    * summary row. */
  def annRecall(emb: DataFrame, idCol: String, vecCol: String,
                queryIds: Seq[Long], k: Int,
                annTopK: Long => DataFrame,
                scoreOut: Column => Column): DataFrame = {
    require(queryIds.nonEmpty && queryIds.size <= 256,
      s"eval anchor set must be bounded: got ${queryIds.size}")
    val spark = emb.sparkSession
    val rows = queryIds.map { qid =>
      val exact = bruteForceTopK(emb, idCol, vecCol, qid, k, scoreOut)
        .select(col(idCol).cast("long")).collect().map(_.getLong(0)).toSet
      val approx = annTopK(qid)
        .select(col(idCol).cast("long")).collect().map(_.getLong(0)).toSet
      val overlap = (exact intersect approx).size
      // recall@k convention: when the exact list is short (corpus < k+1),
      // the denominator is what was retrievable, not the requested k —
      // dividing by k would silently understate recall
      val denom = math.min(k, exact.size)
      (qid.toString, k, overlap,
        if (denom == 0) 0.0 else overlap.toDouble / denom)
    }
    val mean = rows.map(_._4).sum / rows.size
    import spark.implicits._
    (rows :+ (("__mean__", k, rows.map(_._3).sum, mean)))
      .toDF("query_id", "k", "n_overlap", "recall")
      .select(col("query_id"), col("k"), col("n_overlap"),
        scoreOut(col("recall")).as("recall"))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) of N retrieval
    * rankings — the standard hybrid-search combiner (BM25 ⊕ dense ANN):
    * score(d) = Σ_lists 1/(c + rank_list(d)), requiring no score
    * calibration between lists. Inputs are (id, rank) frames; a document
    * absent from a list simply contributes nothing (the usual convention).
    * One union + one grouped aggregate over candidate-list-sized inputs —
    * the corpus itself is never touched. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val tagged = rankings.map(_.select(col(idCol), col("rank")))
    tagged.reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_lists"),
        sum(lit(1.0) / (lit(c.toDouble) + col("rank"))).as("rrf_score"))
  }

  /** Maximal-Marginal-Relevance re-rank (Carbonell & Goldstein, SIGIR'98):
    * from the query's top-`candN` cosine candidates, greedily pick `k`
    * maximizing λ·relevance − (1−λ)·max-similarity-to-already-picked — the
    * diversity pass a retrieval-augmented pipeline runs AFTER ANN, so its
    * context window isn't k copies of the same document.
    *
    * The greedy argmax is inherently sequential in k, so the candidate set
    * (and only it) comes to the driver: `candN` rows of (id, sim, vec) —
    * BOUNDED serving-path metadata (capped at 4096), the same contract as
    * the quantizer fits, never corpus-scale. Candidate generation itself
    * is the distributed [[bruteForceTopK]] scan (swap in any ANN variant
    * at scale). Fully deterministic: candidates sort by (−relevance, id),
    * ties in the greedy argmax break on the lower id, and all driver
    * arithmetic is fixed-order.
    *
    * Returns (mmr_rank, id, relevance, max_sim_sel, mmr_score) — for
    * rank 1 `max_sim_sel` is 0 by convention. */
  def mmrRerank(emb: DataFrame, idCol: String, vecCol: String,
                queryId: Long, candN: Int, k: Int, lambda: Double,
                scoreOut: Column => Column): DataFrame = {
    require(candN <= 4096, s"MMR candidate set is driver-bounded: candN $candN > 4096")
    require(k >= 1 && k <= candN, s"k must be in [1, $candN], got $k")
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    val spark = emb.sparkSession
    VectorFunctions.register(spark)
    val e = emb.select(col(idCol), toDouble(col(vecCol)).as("v"))
    val q = e.filter(col(idCol) === queryId)
      .select(col("v").as("qv"), normFast(col("v")).as("qn"))
    val na = normFast(col("v"))
    val cands = e.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("rel",
        when(na > 0 && col("qn") > 0, dotFast(col("v"), col("qv")) / (na * col("qn")))
          .otherwise(lit(0.0)))
      .orderBy(col("rel").desc, col(idCol))
      .limit(candN)
      .select(col(idCol).cast("long"), col("rel"), col("v"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Double](2).toArray))
      .sortBy { case (id, rel, _) => (-rel, id) }
    val norms = cands.map { case (_, _, v) => math.sqrt(v.map(x => x * x).sum) }
    def pairSim(i: Int, j: Int): Double = {
      val (vi, vj) = (cands(i)._3, cands(j)._3)
      if (norms(i) == 0 || norms(j) == 0) 0.0
      else {
        var s = 0.0; var d = 0
        while (d < vi.length) { s += vi(d) * vj(d); d += 1 }
        s / (norms(i) * norms(j))
      }
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    val maxSimSel = Array.fill(cands.length)(0.0)
    val picked = Array.fill(cands.length)(false)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double, Double)]
    var rank = 1
    // the corpus may hold fewer than k non-query rows — return what exists
    // rather than indexing past the exhausted candidate set
    val kEff = math.min(k, cands.length)
    while (rank <= kEff) {
      var bestIdx = -1; var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < cands.length) {
        if (!picked(i)) {
          val score = lambda * cands(i)._2 - (1 - lambda) * maxSimSel(i)
          // strict > plus canonical candidate order = lowest id wins ties
          if (score > bestScore) { bestScore = score; bestIdx = i }
        }
        i += 1
      }
      picked(bestIdx) = true
      selected += bestIdx
      out += ((rank, cands(bestIdx)._1, cands(bestIdx)._2, maxSimSel(bestIdx), bestScore))
      i = 0
      while (i < cands.length) {
        if (!picked(i)) {
          val s = pairSim(i, bestIdx)
          if (s > maxSimSel(i)) maxSimSel(i) = s
        }
        i += 1
      }
      rank += 1
    }
    import spark.implicits._
    out.toSeq.toDF("mmr_rank", "id", "relevance", "max_sim_sel", "mmr_score")
      .select(col("mmr_rank"), col("id").as(idCol),
        scoreOut(col("relevance")).as("relevance"),
        scoreOut(col("max_sim_sel")).as("max_sim_sel"),
        scoreOut(col("mmr_score")).as("mmr_score"))
  }

  /** Matryoshka truncation evaluation (Kusupati et al. '22): how much of
    * the full-dimension top-k survives when the embedding column is
    * truncated to its first `d` dimensions — the measurement behind
    * "store 64 dims, search 8 first" tiered retrieval. For each budget,
    * the top-k is a TakeOrdered scan over the ROUNDED truncated cosine
    * (id tiebreak — deterministic cross-engine ranks, the q133
    * discipline: never a corpus-wide rank window); overlap against the
    * full-dimension list folds in one k·|dims|-row join. The budget loop
    * is driver-bounded (≤8 budgets), the same contract as [[annRecall]].
    *
    * Returns one row per budget: (dim_budget, k, n_overlap, recall),
    * ordered by budget; the full-dimension row is the recall=1 sanity
    * anchor. */
  def matryoshkaRecall(emb: DataFrame, idCol: String, vecCol: String,
                       queryId: Long, k: Int, dims: Seq[Int],
                       scoreOut: Column => Column): DataFrame = {
    require(dims.nonEmpty && dims.size <= 8, s"budget set must be bounded, got ${dims.size}")
    require(dims == dims.sorted && dims.distinct == dims, "budgets must be ascending, distinct")
    VectorFunctions.register(emb.sparkSession)
    val e = emb.select(col(idCol), toDouble(col(vecCol)).as("v"))
    def topkAt(d: Int): DataFrame = {
      val q = e.filter(col(idCol) === queryId)
        .select(slice(col("v"), 1, d).as("qv"))
      val sv = slice(col("v"), 1, d)
      val na = normFast(sv)
      e.crossJoin(broadcast(q.withColumn("qn", normFast(col("qv")))))
        .withColumn("cos_sim", scoreOut(
          when(na > 0 && col("qn") > 0, dotFast(sv, col("qv")) / (na * col("qn")))))
        .orderBy(col("cos_sim").desc, col(idCol))
        .limit(k)
        .select(col(idCol))
    }
    val fullSet = topkAt(dims.max).withColumn("__hit", lit(1))
    dims.map(d => topkAt(d).select(lit(d).as("dim_budget"), col(idCol)))
      .reduce(_ unionByName _)
      .join(fullSet, Seq(idCol), "left")
      .groupBy("dim_budget")
      .agg(count(lit(1)).as("k"),
        sum(coalesce(col("__hit"), lit(0))).as("n_overlap"))
      .select(col("dim_budget"), col("k"), col("n_overlap"),
        scoreOut(col("n_overlap").cast("double") / col("k")).as("recall"))
      .orderBy("dim_budget")
  }

  /** Mean pairwise cosine of a deterministic id-sampled subset — the
    * corpus-diversity number a curation pass reads before/after dedup
    * ("did near-dup removal actually spread the embedding cloud?"). The
    * sample is `id % sampleMod == 0` (reproducible in any engine, no RNG);
    * the pair table is sample²/2 rows of DISTRIBUTED work — sampleMod
    * bounds it independently of corpus size, the operator's scale knob.
    *
    * Returns one row: (n_sample, n_pairs, mean_cos, min_cos, max_cos). */
  def sampleDiversity(emb: DataFrame, idCol: String, vecCol: String,
                      sampleMod: Long,
                      scoreOut: Column => Column): DataFrame = {
    require(sampleMod >= 1, s"sampleMod must be positive, got $sampleMod")
    VectorFunctions.register(emb.sparkSession)
    val e = emb.filter(col(idCol) % sampleMod === 0)
      .select(col(idCol), toDouble(col(vecCol)).as("v"))
      .withColumn("n", normFast(col("v")))
    val a = e.select(col(idCol).as("id1"), col("v").as("v1"), col("n").as("n1"))
    val b = e.select(col(idCol).as("id2"), col("v").as("v2"), col("n").as("n2"))
    val pairs = a.join(b, col("id1") < col("id2"))
      .select(when(col("n1") > 0 && col("n2") > 0,
        dotFast(col("v1"), col("v2")) / (col("n1") * col("n2"))).as("cos"))
    val nRow = e.agg(count(lit(1)).as("n_sample"))
    nRow.crossJoin(broadcast(pairs.agg(
        count(lit(1)).as("n_pairs"), avg("cos").as("m"),
        min("cos").as("lo"), max("cos").as("hi"))))
      .select(col("n_sample"), col("n_pairs"),
        scoreOut(col("m")).as("mean_cos"),
        scoreOut(col("lo")).as("min_cos"),
        scoreOut(col("hi")).as("max_cos"))
  }

  /** PQ reconstruction-distortion report — the quality denominator for
    * the PQ/IVFPQ compression family (the storage twin of [[annRecall]]):
    * per subspace, the mean squared error between each vector's slice and
    * its assigned codeword, the raw slice energy, and their ratio (the
    * relative quantization error a codebook budget buys). The decode is
    * pure plan arithmetic against the literal codebooks — one linear
    * scan, no shuffle before the m-row aggregate. Codebook-specific
    * numbers → rows-only gate; PqDistortionSpec pins the contracts
    * (ratio in [0,1]-ish, k = n distinct points → ~0 distortion,
    * distortion monotone non-increasing in k).
    *
    * Returns one row per subspace (subspace, n, mse_per_dim,
    * energy_per_dim, distortion_ratio) plus a (-1, …) overall row. */
  def pqDistortion(emb: DataFrame, idCol: String, vecCol: String,
                   m: Int, k: Int, seed: Long,
                   scoreOut: Column => Column): DataFrame = {
    val (encoded, codebooks) = fitPq(emb, idCol, vecCol, m, k, seed)
    val sub = codebooks.head.head.length
    val perSub = (0 until m).map { j =>
      val cw = element_at(bookLit(codebooks(j)),
        element_at(col("code"), j + 1) + 1)
      val sl = slice(col("v"), j * sub + 1, sub)
      struct(lit(j).as("subspace"),
        aggregate(zip_with(sl, cw, (x, y) => (x - y) * (x - y)),
          lit(0.0), _ + _).as("se"),
        aggregate(transform(sl, x => x * x), lit(0.0), _ + _).as("sxx"))
    }
    val el = encoded.select(explode(array(perSub: _*)).as("z"))
      .select(col("z.subspace").as("subspace"), col("z.se").as("se"),
        col("z.sxx").as("sxx"))
    def report(df: DataFrame, tag: Column): DataFrame =
      df.agg(count(lit(1)).as("n"), sum("se").as("tse"), sum("sxx").as("tsxx"))
        .select(tag.as("subspace"), col("n"),
          scoreOut(col("tse") / (col("n") * sub)).as("mse_per_dim"),
          scoreOut(col("tsxx") / (col("n") * sub)).as("energy_per_dim"),
          scoreOut(when(col("tsxx") > 0, col("tse") / col("tsxx"))
            .otherwise(lit(0.0))).as("distortion_ratio"))
    (0 until m).map(j => report(el.filter(col("subspace") === j), lit(j)))
      .reduce(_ unionByName _)
      .unionByName(report(el, lit(-1)))
  }

  /** Leave-one-out kNN classification eval over the labeled embedding
    * table — "do these embeddings separate the labels", the
    * representation-quality check that recall@k can't answer. Query set =
    * the deterministic `idCol % sampleMod == 0` slice (bounded pair
    * table: (n/sampleMod) × n, the q184 modulus contract; the query side
    * broadcasts). Neighbors rank by the ROUNDED cosine with the neighbor
    * id as tiebreak and the vote breaks ties toward the smaller label —
    * the q133 determinism discipline, so any engine replays the same
    * prediction.
    *
    * Returns per true label (label, n_queries, n_correct, accuracy) plus
    * a (-1, …) overall row. */
  def knnLabelEval(emb: DataFrame, idCol: String, vecCol: String,
                   labelCol: String, k: Int, sampleMod: Int,
                   scoreOut: Column => Column): DataFrame = {
    require(k >= 1 && k <= 64 && sampleMod >= 1, "bounded k and sampleMod")
    VectorFunctions.register(emb.sparkSession)
    val e = emb.select(col(idCol), col(labelCol).as("lbl"),
      toDouble(col(vecCol)).as("v"))
    val q = e.filter(col(idCol) % sampleMod === 0)
      .select(col(idCol).as("qid"), col("lbl").as("qlbl"),
        col("v").as("qv"), normFast(col("v")).as("qn"))
    val na = normFast(col("v"))
    val wR = Window.partitionBy("qid")
      .orderBy(col("cos_sim").desc, col(idCol).asc)
    val votes = e.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("qid"))
      .withColumn("cos_sim", scoreOut(
        when(na > 0 && col("qn") > 0, dotFast(col("v"), col("qv")) / (na * col("qn")))
          .otherwise(lit(0.0))))
      .withColumn("rk", row_number().over(wR))
      .filter(col("rk") <= k)
      .groupBy("qid", "qlbl", "lbl")
      .agg(count(lit(1)).as("nv"))
    val wV = Window.partitionBy("qid")
      .orderBy(col("nv").desc, col("lbl").asc)
    val pred = votes
      .withColumn("vr", row_number().over(wV))
      .filter(col("vr") === 1)
      .select(col("qid"), col("qlbl"),
        (col("lbl") === col("qlbl")).cast("long").as("ok"))
    def report(df: DataFrame, tag: Column): DataFrame =
      df.groupBy(tag.as("label"))
        .agg(count(lit(1)).as("n_queries"), sum("ok").as("n_correct"),
          scoreOut(sum("ok").cast("double") / count(lit(1))).as("accuracy"))
    report(pred, col("qlbl").cast("int"))
      .unionByName(report(pred, lit(-1)))
      .orderBy("label")
  }

  /** Grid-density outlier detection over a low-dim projection of the
    * embedding space: bin each point into a hypercube cell of side `h`
    * on `dims` leading coordinates, count per cell, and flag points in
    * cells holding fewer than `minPts` neighbors — DBSCAN's density
    * intuition without its pairwise radius search. The per-cell count is
    * one groupBy-sized aggregate and the flag is a count window keyed by
    * the SAME cell id (one exchange total); nothing ever compares point
    * pairs, so the operator is a two-pass linear scan at any corpus size.
    * Flag quality depends on h tracking the data scale (the classic grid
    * caveat); points on a cell edge belong to exactly one cell, so the
    * flag is deterministic.
    *
    * Returns per label: (label, n_points, n_outliers, outlier_rate,
    * n_cells). */
  def gridDensityOutliers(emb: DataFrame, idCol: String, vecCol: String,
                          labelCol: String, dims: Int, h: Double,
                          minPts: Int,
                          scoreOut: Column => Column): DataFrame = {
    require(dims >= 1 && h > 0 && minPts >= 1,
      s"bad grid params: dims=$dims h=$h minPts=$minPts")
    val cell = concat_ws(",", (1 to dims).map(i =>
      floor(element_at(col(vecCol), i).cast("double") / lit(h))
        .cast("long").cast("string")): _*)
    val binned = emb.select(col(idCol), col(labelCol), cell.as("__cell"))
    val wC = Window.partitionBy("__cell")
    binned
      .withColumn("__n_cell", count(lit(1)).over(wC))
      .groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_points"),
        sum((col("__n_cell") < minPts).cast("long")).as("n_outliers"),
        scoreOut(avg((col("__n_cell") < minPts).cast("double")))
          .as("outlier_rate"),
        countDistinct(col("__cell")).as("n_cells"))
      .orderBy("label")
  }
}
