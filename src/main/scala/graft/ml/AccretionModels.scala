package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{GBTClassifier, RandomForestClassifier}
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, RegressionEvaluator}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.GBTRegressor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ML parity layer (SURVEY §7.1 step 9): the reference's three predictor
  * heads (`models.py:726-904`, `models_backup.py` fit) and the prescriptor
  * loop (`train_models_simple.py:655-862`) re-expressed on `spark.ml` —
  * gradient-boosted trees replace XGBoost/LightGBM/LSTM (the nearest
  * Spark-native models; inference is `Model.transform`, fully distributed).
  *
  * Time-based split, not random: the reference holds out the LAST 20 %
  * (`train_models_simple.py:323-328`) because shuffled splits leak future
  * sensor state into training — preserved here via a timestamp threshold. */
object AccretionModels {

  /** Numeric feature columns of a labeled kiln frame (excludes keys/labels). */
  def featureColumns(df: DataFrame, exclude: Set[String]): Array[String] =
    df.schema.fields.collect {
      case f if !exclude.contains(f.name) &&
        (f.dataType.typeName == "double" || f.dataType.typeName == "integer" ||
         f.dataType.typeName == "long") => f.name
    }

  /** Time-based train/test split at the `frac` quantile of the ts column
    * (quantile over epoch seconds — approxQuantile rejects TimestampType). */
  def timeSplit(df: DataFrame, tsCol: String, frac: Double): (DataFrame, DataFrame) = {
    val epochs = df.withColumn("__ep", unix_timestamp(col(tsCol)).cast("double"))
    val cut = epochs.stat.approxQuantile("__ep", Array(frac), 0.001).head
    (epochs.filter(col("__ep") <= cut).drop("__ep"),
     epochs.filter(col("__ep") > cut).drop("__ep"))
  }

  private def assembler(features: Array[String]) = new VectorAssembler()
    .setInputCols(features).setOutputCol("features").setHandleInvalid("keep")

  /** Tree models reject NaN vector entries; window features are null at
    * series heads (lags, warm-up frames) — zero-fill them (the reference
    * fillna path, `pre_processing.py:275-277`). */
  def prep(df: DataFrame, features: Array[String]): DataFrame =
    df.na.fill(0.0, features.toIndexedSeq)

  /** Head 1: binary accretion-risk classifier (reference binary head). */
  def fitBinaryHead(train: DataFrame, features: Array[String],
                    labelCol: String): PipelineModel =
    new Pipeline().setStages(Array(
      assembler(features),
      new GBTClassifier().setLabelCol(labelCol).setFeaturesCol("features")
        .setMaxIter(20).setMaxDepth(4).setSeed(42)))
      .fit(prep(train, features))

  /** Head 2: days-to-critical regressor (rows with a live countdown only,
    * as the reference filters to pre-event rows). */
  def fitDaysHead(train: DataFrame, features: Array[String],
                  labelCol: String): PipelineModel =
    new Pipeline().setStages(Array(
      assembler(features),
      new GBTRegressor().setLabelCol(labelCol).setFeaturesCol("features")
        .setMaxIter(20).setMaxDepth(4).setSeed(42)))
      .fit(prep(train.filter(col(labelCol).isNotNull), features))

  /** Head 3: forming-zone multiclass classifier (reference
    * `zone_classifier`, `models.py:864-904`) with the reference's
    * sorted-unique class→index mapping (`models.py:876-882`, the P8 dict
    * encode). RandomForest stands in for the reference's MLP —
    * `GBTClassifier` is binary-only in spark.ml and RF is the nearest
    * native multiclass tree model. Collecting the ≤ n_zones distinct
    * labels is bounded metadata, not data. Returns the fitted model and
    * the ordered class list for [[predictZone]]'s inverse mapping. */
  def fitZoneHead(train: DataFrame, features: Array[String],
                  labelCol: String): (PipelineModel, Seq[Int]) = {
    val valid = train.filter(col(labelCol).isNotNull)
    val classes = valid.select(col(labelCol).cast("int")).distinct()
      .collect().map(_.getInt(0)).sorted.toIndexedSeq
    require(classes.nonEmpty, s"no non-null $labelCol labels to fit on")
    val toIdx = classes.zipWithIndex.foldLeft(lit(null).cast("double")) {
      case (acc, (z, i)) => when(col(labelCol) === z, i.toDouble).otherwise(acc)
    }
    val model = new Pipeline().setStages(Array(
      assembler(features),
      new RandomForestClassifier().setLabelCol("__zone_idx").setFeaturesCol("features")
        .setNumTrees(30).setMaxDepth(6).setSeed(42)))
      .fit(prep(valid, features).withColumn("__zone_idx", toIdx))
    (model, classes)
  }

  /** Inverse class mapping on top of `transform`: adds `predicted_zone`
    * (the reference's `zone_classes[pred]` lookup, `models.py:963`). */
  def predictZone(model: PipelineModel, classes: Seq[Int], df: DataFrame): DataFrame = {
    val feats = model.stages.head.asInstanceOf[VectorAssembler].getInputCols
    model.transform(prep(df, feats))
      .withColumn("predicted_zone",
        element_at(array(classes.map(lit): _*), col("prediction").cast("int") + 1))
  }

  /** Accuracy of the zone head on rows with a label. */
  def zoneAccuracy(model: PipelineModel, classes: Seq[Int], test: DataFrame,
                   labelCol: String): Double = {
    val labeled = predictZone(model, classes, test.filter(col(labelCol).isNotNull))
    labeled.agg(avg((col("predicted_zone") === col(labelCol)).cast("double")))
      .head.getDouble(0)
  }

  /** Prescriptor (reference `KilnAccretionPrescriptor`): one regressor per
    * controllable parameter, trained on pre-event windows to predict the
    * parameter value associated with low subsequent risk. */
  def fitPrescriptor(train: DataFrame, features: Array[String],
                     controlCols: Seq[String]): Map[String, PipelineModel] =
    controlCols.map { c =>
      val feats = features.filterNot(_ == c)
      // fill only the FEATURES — zero-filling the control column would
      // fabricate label values; null-label rows are dropped instead
      c -> new Pipeline().setStages(Array(
        assembler(feats),
        new GBTRegressor().setLabelCol(c).setFeaturesCol("features")
          .setMaxIter(10).setMaxDepth(3).setSeed(42)))
        .fit(prep(train.filter(col(c).isNotNull), feats))
    }.toMap

  /** Correlation-sign adjustment targets for the prescriptor (reference
    * `train_models_simple.py:745-794`): for each control variable,
    * Pearson-correlate it with the risk label (sample stds must both be
    * positive, NaN correlations count 0), derive the fixed adjustment
    * direction `-0.05 · sign(corr)` — positively-correlated controls get
    * prescribed DOWN, negatively-correlated UP — and emit a per-row target
    * `adj_<var>`: `adjustment · var` for non-zero values, `adjustment` for
    * zeros, 0 for nulls.
    *
    * One distributed aggregation computes every correlation and std in a
    * single pass; only the K scalar coefficients come to the driver
    * (bounded metadata, not data), and the targets are literal-coefficient
    * column arithmetic — no second scan, no UDF. */
  def prescriptorTargets(df: DataFrame, controlCols: Seq[String],
                         targetCol: String): DataFrame = {
    require(controlCols.nonEmpty, "need at least one control column")
    // covariance + stds, with the correlation formed AFTER the std guard
    // (corr() itself would divide by zero on a no-variation column under
    // ANSI mode — the reference checks stds before correlating too)
    val aggs = controlCols.flatMap { c =>
      Seq(covar_samp(col(c).cast("double"), col(targetCol).cast("double")).as(s"__cov_$c"),
        stddev_samp(col(c)).as(s"__sd_$c"))
    } :+ stddev_samp(col(targetCol).cast("double")).as("__sd_t")
    val row = df.agg(aggs.head, aggs.tail: _*).head
    def num(name: String): Double =
      Option(row.getAs[Any](name)).fold(Double.NaN)(_.asInstanceOf[Double])
    val sdT = num("__sd_t")
    val adjCols = controlCols.map { c =>
      val sd = num(s"__sd_$c")
      val r = num(s"__cov_$c") / (sd * sdT)
      val corrV = if (sd > 0 && sdT > 0 && !r.isNaN) r else 0.0
      val adjustment = -0.05 * math.signum(corrV)
      when(col(c).isNull, lit(0.0))
        .when(col(c) === 0, lit(adjustment))
        .otherwise(lit(adjustment) * col(c))
        .as(s"adj_$c")
    }
    df.select(df.columns.map(col).toIndexedSeq ++ adjCols: _*)
  }

  /** Prescriptor heads trained on the correlation-sign targets (the
    * reference's actual fit: X → Y_adjustments, not X → parameter value):
    * one regressor per control predicting its `adj_<var>` target. */
  def fitPrescriptorAdjustments(train: DataFrame, features: Array[String],
                                controlCols: Seq[String],
                                targetCol: String): Map[String, PipelineModel] = {
    val withTargets = prescriptorTargets(train, controlCols, targetCol)
    controlCols.map { c =>
      val feats = features.filterNot(_ == c)
      c -> new Pipeline().setStages(Array(
        assembler(feats),
        new GBTRegressor().setLabelCol(s"adj_$c").setFeaturesCol("features")
          .setMaxIter(10).setMaxDepth(3).setSeed(42)))
        .fit(prep(withTargets, feats))
    }.toMap
  }

  /** AUC for the binary head (reference `evaluate`, `models.py:976-1034`). */
  def auc(model: PipelineModel, test: DataFrame, labelCol: String): Double =
    new BinaryClassificationEvaluator().setLabelCol(labelCol)
      .setRawPredictionCol("rawPrediction").setMetricName("areaUnderROC")
      .evaluate(model.transform(prep(test, model.stages.head.asInstanceOf[VectorAssembler].getInputCols)))

  /** RMSE for the regression heads. */
  def rmse(model: PipelineModel, test: DataFrame, labelCol: String): Double =
    new RegressionEvaluator().setLabelCol(labelCol)
      .setPredictionCol("prediction").setMetricName("rmse")
      .evaluate(model.transform(prep(test.filter(col(labelCol).isNotNull), model.stages.head.asInstanceOf[VectorAssembler].getInputCols)))

  /** Model sink/source (reference `joblib.dump`/`load`, SURVEY S4,
    * `models.py:1036-1046`): spark.ml's native MLWritable format —
    * distributed-filesystem-friendly, versioned metadata + parquet params. */
  def save(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)
  def load(path: String): PipelineModel = PipelineModel.load(path)

  /** Incremental model update (reference `update_incrementally`,
    * `models.py:1066-1178`, triggered from `dashboard.py:2055-2133`): refit
    * the head on the TRAILING `days`-day window of the labeled frame and
    * report the evaluation metric before and after — the reference's
    * "metrics improvement" contract. GBTs have no warm-start in spark.ml
    * (neither do the reference's sklearn `.fit` calls — they retrain on the
    * recent slice too), so "incremental" means incremental DATA, which is
    * also the only shape that scales: the window filter prunes the scan to
    * the recent partitions before any shuffle.
    *
    * Returns (updatedModel, metricBefore, metricAfter) where the metric is
    * AUC for a classifier head and RMSE for a regressor head, both
    * evaluated on the recent window. */
  def refitRecent(model: PipelineModel, labeled: DataFrame, tsCol: String,
                  days: Int, features: Array[String], labelCol: String,
                  isClassifier: Boolean): (PipelineModel, Double, Double) = {
    // timestamp interval arithmetic, not date_sub: date_sub coerces to DATE
    // and would stretch the window boundary back to midnight
    val cutoff = labeled.agg(
      (max(col(tsCol)) - expr(s"INTERVAL $days DAYS")).as("c"))
      .head.getTimestamp(0)
    val recent = labeled.filter(col(tsCol) >= lit(cutoff))
    val (refit, metric) =
      if (isClassifier)
        (fitBinaryHead(recent, features, labelCol),
          (m: PipelineModel) => auc(m, recent, labelCol))
      else
        (fitDaysHead(recent, features, labelCol),
          (m: PipelineModel) => rmse(m, recent, labelCol))
    (refit, metric(model), metric(refit))
  }

  /** Incremental-learning metrics TIME SERIES (reference
    * `get_training_history`, consumed by the dashboard's
    * `update_incremental_learning_metrics` chart, `dashboard.py:1937-2053`):
    * walk the labeled frame forward through `updateTimes`, refit the head on
    * the trailing `days`-day window at each update ([[refitRecent]] — the
    * reference appends one history entry per `update_incrementally` call),
    * and emit one row per update: (update_ts, metric_before, metric_after,
    * improved). `metric_before` is the incoming model's score on the new
    * window — the dashboard's regression-spotting signal — and the chained
    * refits mean update k's "before" model is update k−1's "after", exactly
    * the reference's history semantics.
    *
    * The per-update loop is driver-side by nature (each refit is a
    * distributed fit over the window's rows; K updates = K bounded jobs,
    * not a per-row loop), and K is the number of UPDATE EVENTS — dashboard
    * metadata, never data-scale. */
  def incrementalHistory(initial: PipelineModel, labeled: DataFrame,
                         tsCol: String, updateTimes: Seq[java.sql.Timestamp],
                         days: Int, features: Array[String], labelCol: String,
                         isClassifier: Boolean): DataFrame = {
    require(updateTimes.nonEmpty, "need at least one update time")
    var cur = initial
    val rows = updateTimes.sorted.map { t =>
      val upTo = labeled.filter(col(tsCol) <= lit(t))
      val (refit, before, after) =
        refitRecent(cur, upTo, tsCol, days, features, labelCol, isClassifier)
      cur = refit
      (t, before, after, after >= before)
    }
    labeled.sparkSession.createDataFrame(rows)
      .toDF("update_ts", "metric_before", "metric_after", "improved")
  }

  /** Top-k feature importances of a fitted tree head (reference O3,
    * `train_models_simple.py:448-449`). */
  def featureImportances(model: PipelineModel, features: Array[String],
                         k: Int): Seq[(String, Double)] = {
    val imp = model.stages.last match {
      case m: org.apache.spark.ml.classification.GBTClassificationModel => m.featureImportances
      case m: org.apache.spark.ml.regression.GBTRegressionModel => m.featureImportances
    }
    features.zip(imp.toArray).sortBy(-_._2).take(k).toSeq
  }
}
