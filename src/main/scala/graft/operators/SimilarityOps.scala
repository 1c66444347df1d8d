package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
