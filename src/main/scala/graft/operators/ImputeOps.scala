package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KNN imputation over a wide (post-aggregation) feature matrix — the
  * reference's `KNNImputer(n_neighbors=5)` step (`pre_processing.py:269`),
  * previously substituted with median/ffill and recorded as a documented
  * deviation; this is the real estimator. A missing cell takes the mean
  * of the target column over the k COMPLETE rows nearest in euclidean
  * distance on the remaining feature columns (uniform weights, the
  * sklearn default).
  *
  * Scale shape: the pair table is missing-rows × complete-rows of the
  * WIDE HOURLY MATRIX — grid-sized on both sides (the reference's own
  * matrix is hourly too), never events; the per-missing-row k-selection
  * is a window PARTITIONED by the missing row's key over its ≤#hours
  * candidate list. For a matrix that outgrows grid scale,
  * [[knnImputeColumnLsh]] buckets candidate complete-rows with sign-LSH
  * over the feature columns (the q59 machinery) before the exact
  * distance — the estimator is unchanged.
  *
  * Determinism: neighbors rank by the ROUNDED distance with the complete
  * row's key as tiebreak, so both engines select identical neighbor sets
  * (the q133 rank discipline).
  *
  * Returns every input row: (keyCol, targetCol imputed, was_missing). */
object ImputeOps {

  def knnImputeColumn(wide: DataFrame, keyCol: String,
                      featureCols: Seq[String], targetCol: String, k: Int,
                      scoreOut: Column => Column): DataFrame = {
    require(featureCols.nonEmpty && k >= 1 && k <= 64,
      s"need features and bounded k, got ${featureCols.size} features, k=$k")
    val complete = wide.filter(col(targetCol).isNotNull)
    val missing = wide.filter(col(targetCol).isNull)
    val m = missing.select(col(keyCol).as("__mk") +:
      featureCols.map(c => col(c).as(s"__m_$c")): _*)
    val c = complete.select(col(keyCol).as("__ck") +: col(targetCol).as("__tv") +:
      featureCols.map(cc => col(cc).as(s"__c_$cc")): _*)
    val dist2 = featureCols.map(f =>
        (col(s"__m_$f") - col(s"__c_$f")) * (col(s"__m_$f") - col(s"__c_$f")))
      .reduce(_ + _)
    val wK = Window.partitionBy("__mk")
      .orderBy(col("__d").asc, col("__ck").asc)
    val imputed = m.crossJoin(c) // grid × grid of the wide matrix — bounded
      .withColumn("__d", scoreOut(sqrt(dist2)))
      .withColumn("__rk", row_number().over(wK))
      .filter(col("__rk") <= k)
      .groupBy("__mk")
      .agg(avg("__tv").as("__imputed"), count(lit(1)).as("__n_neighbors"))
    missing.join(imputed, missing(keyCol) === imputed("__mk"), "left")
      .select(col(keyCol), scoreOut(col("__imputed")).as(targetCol),
        lit(1).as("was_missing"))
      .unionByName(complete.select(col(keyCol),
        scoreOut(col(targetCol)).as(targetCol), lit(0).as("was_missing")))
  }

  /** [[knnImputeColumn]] with a sign-LSH candidate prefilter — the scale
    * path for a wide matrix beyond grid size, where the missing × complete
    * pair table is no longer affordable. Complete rows bucket by the sign
    * pattern of `nPlanes` seeded hyperplanes over the STANDARDIZED feature
    * vector (z-scores from one scalar-aggregate stats row, broadcast;
    * standardization only affects bucketing — the exact euclidean distance
    * and the estimator are unchanged); each missing row probes every
    * bucket within Hamming distance `probeHamming` of its own (multiprobe
    * OR-amplification, enumerated as literal XOR masks → a pure EQUI-join
    * on the bucket id, never a nested loop). A (missing, complete) pair
    * can match through at most one mask, so no dedup pass is needed.
    *
    * Approximation contract: candidates are a subset of the exact pass's,
    * so per-row neighbor sets can differ where a true neighbor's sign
    * pattern differs in > probeHamming bits. Recall rises with fewer
    * planes or more probing; `probeHamming = nPlanes` degrades to exact
    * (every bucket probed). The defaults (3 planes, probe 2 → 7 of 8
    * buckets) are what a seed sweep showed achieves bucketed ≡ exact on
    * BOTH gate matrices (sf0.001 and sf0.01) — on a dense few-hundred-row
    * grid with k=5, rank-≤5 neighbors sit so close that single-bit sign
    * flips are common, so near-exact recall costs most of the probe
    * space; the pruning win grows with matrix size and plane count (the
    * q213 gate pins the ≡ contract, ImputeOpsSpec pins it per-scale). */
  def knnImputeColumnLsh(wide: DataFrame, keyCol: String,
                         featureCols: Seq[String], targetCol: String, k: Int,
                         scoreOut: Column => Column,
                         nPlanes: Int = 3, seed: Long = 1L,
                         probeHamming: Int = 2): DataFrame = {
    require(featureCols.nonEmpty && k >= 1 && k <= 64,
      s"need features and bounded k, got ${featureCols.size} features, k=$k")
    require(nPlanes >= 1 && nPlanes <= 16, s"nPlanes in [1,16], got $nPlanes")
    require(probeHamming >= 0 && probeHamming <= nPlanes,
      s"probeHamming in [0,$nPlanes], got $probeHamming")
    val planes = SimilarityOps.hyperplanes(seed, nPlanes, featureCols.size)
    val statAggs = featureCols.flatMap(c => Seq(
      avg(col(c)).as(s"__mu_$c"),
      coalesce(stddev_pop(col(c)), lit(0.0)).as(s"__sd_$c")))
    val stats = broadcast(wide.agg(statAggs.head, statAggs.tail: _*))
    val statCols = featureCols.flatMap(c => Seq(s"__mu_$c", s"__sd_$c"))
    def withBucket(df: DataFrame): DataFrame = {
      val z = featureCols.map(c =>
        when(col(s"__sd_$c") > 0, (col(c) - col(s"__mu_$c")) / col(s"__sd_$c"))
          .otherwise(lit(0.0)))
      df.crossJoin(stats)
        .withColumn("__bkt", SimilarityOps.lshBucket(array(z: _*), planes))
        .drop(statCols: _*)
    }
    val complete = wide.filter(col(targetCol).isNotNull)
    val missing = wide.filter(col(targetCol).isNull)
    val masks = (0 until (1 << nPlanes))
      .filter(m => java.lang.Integer.bitCount(m) <= probeHamming)
      .map(m => lit(m.toLong))
    val m = withBucket(missing)
      .select(col(keyCol).as("__mk") +: col("__bkt").as("__mbkt") +:
        featureCols.map(c => col(c).as(s"__m_$c")): _*)
      .withColumn("__mask", explode(array(masks: _*)))
      .withColumn("__bkt", col("__mbkt").bitwiseXOR(col("__mask")))
    val c = withBucket(complete)
      .select(col(keyCol).as("__ck") +: col(targetCol).as("__tv") +:
        col("__bkt") +: featureCols.map(cc => col(cc).as(s"__c_$cc")): _*)
    val dist2 = featureCols.map(f =>
        (col(s"__m_$f") - col(s"__c_$f")) * (col(s"__m_$f") - col(s"__c_$f")))
      .reduce(_ + _)
    val wK = Window.partitionBy("__mk")
      .orderBy(col("__d").asc, col("__ck").asc)
    val imputed = m.join(c, "__bkt")
      .withColumn("__d", scoreOut(sqrt(dist2)))
      .withColumn("__rk", row_number().over(wK))
      .filter(col("__rk") <= k)
      .groupBy("__mk")
      .agg(avg("__tv").as("__imputed"), count(lit(1)).as("__n_neighbors"))
    missing.join(imputed, missing(keyCol) === imputed("__mk"), "left")
      .select(col(keyCol), scoreOut(col("__imputed")).as(targetCol),
        lit(1).as("was_missing"))
      .unionByName(complete.select(col(keyCol),
        scoreOut(col(targetCol)).as(targetCol), lit(0).as("was_missing")))
  }
}
