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
}
