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
  * candidate list. For a matrix that outgrows grid scale, bucket
  * candidates with the LSH/IVF machinery (SimilarityOps) before the
  * exact distance — the estimator is unchanged.
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
}
