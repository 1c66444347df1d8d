package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column — the clustering
  * stage a curation pipeline runs corpus-wide (SemDeDup-style cluster-
  * then-prune; q84/q122 consume cluster ids). The existing
  * [[SimilarityOps.kmeansLite]] trains centroids driver-side on a hash
  * sample (the FAISS-style IVF recipe — right when only the CODEBOOK
  * matters); this operator is the other regime: every row needs ITS
  * assignment, so assignment runs distributed and only the k×d centroid
  * table ever touches the driver.
  *
  * Scale contract per iteration: one scan computing each row's argmin
  * distance (k unrolled codegen expressions — no UDF), one map-side-
  * combined aggregate of (sum-vector, count) per cluster, and a k-row
  * collect. Shuffle volume is O(k·d) per iteration regardless of corpus
  * size; the corpus is scanned `iters`+1 times. Centroids are ROUNDED
  * (dec6) each iteration, so an external replay (numpy in
  * tools/crosscheck_stats.py) reproduces the trajectory exactly.
  */
object ClusterOps {

  /** Deterministic init: the vectors of the k smallest ids — trivially
    * replayable by any engine, unlike a sampled k-means++ (document the
    * tradeoff: on adversarial data, k-means++ seeds better; pass your
    * own `init` then). Returns (cluster_id, n_points, inertia,
    * centroid_norm) — cluster ids are 0-based init order. */
  def lloyd(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
            iters: Int, scoreOut: Column => Column,
            init: Option[Array[Array[Double]]] = None): DataFrame = {
    require(k >= 2 && k <= 64, s"2 <= k <= 64, got $k")
    require(iters >= 1 && iters <= 32, s"1 <= iters <= 32, got $iters")
    val base = vecs
      .select(col(idCol).as("id"),
        transform(col(vecCol), _.cast("double")).as("v"))
      .filter(col("v").isNotNull)
      .persist()
    def rnd6(x: Double): Double =
      math.floor(x * 1e6 + graft.queries.Q.BIAS) / 1e6
    var cents: Array[Array[Double]] = init.getOrElse {
      base.orderBy("id").limit(k).collect()
        .map(_.getSeq[Double](1).toArray)
    }
    require(cents.length == k, s"need $k init centroids, got ${cents.length}")
    def centCol(c: Array[Double]): Column =
      array(c.map(lit(_)): _*)
    def dist2(c: Array[Double]): Column =
      aggregate(zip_with(col("v"), centCol(c),
        (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x)
    // argmin over the k distances; array_position takes the FIRST match,
    // so ties break to the lowest cluster id — the replay convention
    def assignCol(cs: Array[Array[Double]]): Column = {
      val ds = array(cs.map(dist2): _*)
      (array_position(ds, array_min(ds)) - 1L).cast("int")
    }
    for (_ <- 1 to iters) {
      val sums = base
        .select(assignCol(cents).as("c"), col("v"))
        .select(col("c"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("c", "pos").agg(sum("x").as("s"), count(lit(1)).as("n"))
        .groupBy("c").agg(
          map_from_arrays(collect_list("pos"), collect_list(col("s") / col("n")))
            .as("m"))
        .collect()
      val next = cents.clone()
      sums.foreach { r =>
        val c = r.getInt(0)
        val m = r.getMap[Int, Double](1)
        next(c) = (0 until cents(c).length).map(i => rnd6(m(i))).toArray
      }
      cents = next // empty clusters keep their previous centroid
    }
    val spark = vecs.sparkSession
    import spark.implicits._
    val finalDist = array(cents.map(dist2): _*)
    val normTab = cents.zipWithIndex
      .map { case (c, i) => (i, math.sqrt(c.map(x => x * x).sum)) }
      .toSeq.toDF("cluster_id", "__cn")
    base
      .select(assignCol(cents).as("cluster_id"),
        element_at(finalDist, col("cluster_id") + 1).as("__d2"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_points"), sum("__d2").as("__in"))
      .join(normTab, Seq("cluster_id"), "left")
      .select(col("cluster_id"), col("n_points"),
        scoreOut(col("__in")).as("inertia"),
        scoreOut(col("__cn")).as("centroid_norm"))
  }

  /** DBSCAN (Ester, Kriegel, Sander & Xu, KDD'96) over a PRECOMPUTED
    * eps-neighbor pair list — candidate generation is pluggable, which
    * is the whole scale story: the gate feeds exact all-pairs
    * ([[SimilarityOps.exactCosinePairs]], quadratic, oracle-replayable);
    * a 100 TB run feeds LSH-bucketed candidates (the q59/q213 machinery)
    * and inherits their recall bound. Conventions made deterministic so
    * any engine replays the same partition: a point is CORE when its
    * eps-neighborhood (including itself) holds ≥ `minPts` points;
    * clusters are connected components of the core-core subgraph labeled
    * by their minimum core id ([[DedupOps.nearDupClusters]]' star-forest
    * contraction — log-round flooding, not a sequential seed scan);
    * BORDER points adopt the MINIMUM cluster label among their core
    * neighbors (the textbook first-come assignment is scan-order-
    * dependent — min is its order-free replacement); everything else is
    * NOISE.
    *
    * Returns one row per point: (id, n_neighbors, point_type, cluster) —
    * cluster is null for noise. */
  def dbscan(points: DataFrame, idCol: String, pairs: DataFrame,
             minPts: Int, reliableEvery: Int = 0): DataFrame = {
    require(minPts >= 2, s"minPts must be >= 2, got $minPts")
    // Canonicalize + dedup the pair feed: a generator that emits the same
    // pair from multiple LSH bands (or symmetric (a,b)/(b,a) rows) would
    // otherwise double-count n_neighbors and misclassify core points. The
    // distinct is one shuffle on the (already small relative to the CC
    // contraction) pair table — cheap insurance that makes the documented
    // "swap in bucketed candidates" path safe by construction.
    val p2 = pairs
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .distinct()
      .persist()
    val sym = p2.unionAll(p2.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val ncnt = sym.groupBy(col("id_a").as(idCol))
      .agg(count(lit(1)).as("n_neighbors"))
    val withN = points.select(col(idCol)).join(ncnt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"))
      .persist()
    val core = withN.filter(col("n_neighbors") + lit(1) >= minPts)
      .select(col(idCol))
    val coreEdges = p2
      .join(core.select(col(idCol).as("id_a")), "id_a")
      .join(core.select(col(idCol).as("id_b")), "id_b")
      .select("id_a", "id_b")
    val coreClusters = DedupOps
      .nearDupClusters(core, coreEdges, idCol, reliableEvery = reliableEvery)
      .select(col("id").as(idCol), col("cluster"))
    val nbrCluster = sym
      .join(coreClusters.select(col(idCol).as("id_b"), col("cluster")), "id_b")
      .groupBy(col("id_a").as(idCol))
      .agg(min("cluster").as("__bc"))
    withN.join(coreClusters, Seq(idCol), "left")
      .join(nbrCluster, Seq(idCol), "left")
      .select(col(idCol), col("n_neighbors"),
        when(col("cluster").isNotNull, lit("core"))
          .when(col("__bc").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("point_type"),
        coalesce(col("cluster"), col("__bc")).as("cluster"))
  }
}
