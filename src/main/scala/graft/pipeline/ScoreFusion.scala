package graft.pipeline

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ml.AccretionModels

/** Serving-path score fusion (`dashboard.py:382-479`, `predict_accretion`):
  * the dashboard's actually-served status combines the RULE detector
  * ([[ZoneRules.flags]] — 3+ zones below their temperature floor) with the
  * MODEL heads ([[AccretionModels]]), per these reference rules:
  *
  *  - `is_forming`  = model binary prediction OR direct detection;
  *  - `probability` = max(model P(forming), 0.7 if directly detected) —
  *    rule evidence FLOORS the served probability, it never lowers it;
  *  - `days_to_critical` = days-head prediction, falling back to the fixed
  *    15 (detected) / 30 (not) when no days head is available;
  *  - `zone` = the rule side's most-affected zone when directly detected
  *    (the argmax of threshold drop), else the zone head's prediction.
  *
  * The reference fuses one row (the latest); here the same algebra runs
  * over EVERY row of the frame — per-row column expressions plus
  * `Model.transform` (distributed inference), so the whole history can be
  * scored in one pass on a cluster and the "latest" row is a filter, not a
  * code path. [[fuseRules]] is the no-model fallback branch
  * (`dashboard.py:476-479`), pure column algebra and SQL-expressible — it
  * carries the oracle gate (q111) for the fusion constants; the model
  * branch is gated by ScoreFusionSpec on the deterministic kiln fixture.
  *
  * NOTE: like the reference (which runs `fillna` before `predict`), the
  * returned frame's feature columns are zero-filled for model input; the
  * rule flags are computed BEFORE the fill, so a NULL temperature still
  * counts as not-low rather than as a 0 °C reading. */
object ScoreFusion {

  private def modelFeatures(m: PipelineModel): Array[String] =
    m.stages.head.asInstanceOf[VectorAssembler].getInputCols

  // spark.ml transform byproducts, dropped after each head's score is kept
  private val mlTmp = Seq("features", "rawPrediction", "probability", "prediction")

  /** No-model fallback fusion (`dashboard.py:476-479`): rules only, fixed
    * probability/days constants, zone 5 as the reference's default when
    * nothing is detected. Appends `is_forming`, `probability`,
    * `days_to_critical`, `zone` to [[ZoneRules.flags]]'s columns. */
  def fuseRules(wide: DataFrame,
                thresholds: Map[Int, Double] = ZoneRules.defaultThresholds): DataFrame =
    ZoneRules.flags(wide, thresholds)
      .withColumn("is_forming", col("direct_detection"))
      .withColumn("probability",
        when(col("direct_detection") === 1, 0.7).otherwise(0.1))
      .withColumn("days_to_critical",
        when(col("direct_detection") === 1, 15.0).otherwise(30.0))
      .withColumn("zone", coalesce(col("most_affected_zone"), lit(5)))

  /** Full fusion: rule flags + the binary head, optionally the days and
    * zone heads. Appends `model_probability`, `model_pred` (and
    * `model_days` / `predicted_zone` when those heads are given) plus the
    * fused `is_forming`, `probability`, `days_to_critical`, `zone`.
    * When no zone head is given and no direct detection fired, `zone` is
    * null — the reference leaves the key absent on that path. */
  def fuse(wide: DataFrame, binary: PipelineModel,
           daysHead: Option[PipelineModel] = None,
           zoneHead: Option[(PipelineModel, Seq[Int])] = None,
           thresholds: Map[Int, Double] = ZoneRules.defaultThresholds): DataFrame = {
    val flagged = ZoneRules.flags(wide, thresholds)
    val b = binary.transform(AccretionModels.prep(flagged, modelFeatures(binary)))
      .withColumn("model_probability",
        element_at(vector_to_array(col("probability")), 2))
      .withColumn("model_pred", col("prediction").cast("int"))
      .drop(mlTmp: _*)
    val d = daysHead.fold(b) { m =>
      m.transform(AccretionModels.prep(b, modelFeatures(m)))
        .withColumn("model_days", col("prediction"))
        .drop(mlTmp: _*)
    }
    val z = zoneHead.fold(d) { case (m, classes) =>
      AccretionModels.predictZone(m, classes, d).drop(mlTmp: _*)
    }
    val headZone: Column =
      if (zoneHead.isDefined) col("predicted_zone") else lit(null).cast("int")
    z
      .withColumn("is_forming",
        (col("model_pred") === 1 || col("direct_detection") === 1).cast("int"))
      .withColumn("probability",
        greatest(col("model_probability"),
          when(col("direct_detection") === 1, 0.7).otherwise(0.0)))
      .withColumn("days_to_critical",
        daysHead.fold(when(col("direct_detection") === 1, 15.0).otherwise(30.0))(
          _ => col("model_days")))
      .withColumn("zone",
        when(col("direct_detection") === 1, col("most_affected_zone"))
          .otherwise(headZone))
  }
}
