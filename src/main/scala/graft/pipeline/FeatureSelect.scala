package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The reference's priority-class feature cap (`reduce_dimension`,
  * `pre_processing.py:1564-1739`): prune a too-wide training matrix to
  * ≤ `maxFeatures` columns by walking fixed pattern classes in priority
  * order. This is pure SCHEMA logic — the plan impact is one `select`, so
  * Catalyst prunes the dropped columns all the way into the scan; at 100 TB
  * the cap is what keeps the assembled feature vector (and the shuffle
  * width of every downstream stage) bounded.
  *
  * Class patterns and per-class caps mirror the reference, including its
  * quirks (the `_roll_`/`_lag_` trailing-underscore suffix tests, the
  * 5-per-base lag/roll allowance, proportional backfill order). Selection
  * preserves first-seen order within a class, dedups across classes, and
  * never drops the critical class. */
object FeatureSelect {

  private def containsAny(c: String, pats: Seq[String]): Boolean =
    pats.exists(c.contains)

  /** The ordered keep-list for a schema; `reduceDimension` applies it. */
  def selectColumns(columns: Seq[String], maxFeatures: Int = 500): Seq[String] = {
    if (columns.size <= maxFeatures) return columns

    // 1. critical — always kept, never capped
    val critical = columns.filter(c =>
      c.startsWith("target_") || c.startsWith("days_to_") ||
        c == "accretion_zone" || c == "accretion_warning_level" ||
        c == "accretion_early_warning_score" || c == "accretion_indicator_score" ||
        c == "accretion_early_warning_count")
    // 2. accretion-specific indicators
    val indicators = columns.filter(c =>
      c.toLowerCase.contains("accretion") ||
        containsAny(c, Seq("quality_shift", "coal_consumption_vs_baseline",
          "high_coal_consumption", "temp_drop", "cooling_pattern",
          "unusual_temp_divergence", "spread_zscore", "zones_with_drops")))
    // 3. temperature drops
    val tempDrops = columns.filter(c =>
      c.contains("_drop_pct") || c.contains("_consec_drops") || c.contains("cooling_"))
      .take(30)
    // 4. raw temperature
    val temps = columns.filter(c =>
      (c.contains("ZONE_") && !c.endsWith("_anomaly") &&
        !c.startsWith("diff_") && !c.startsWith("gradient_")) ||
        (c.contains("shell_") && !c.endsWith("_roll_") && !c.endsWith("_lag_")))
      .take(20)
    // 5. derived temperature
    val derived = columns.filter(c =>
      (c.startsWith("diff_") || c.startsWith("gradient_") || c.startsWith("roc_")) &&
        c.contains("ZONE_"))
      .take(30)
    // 6. operational: coal, quality, then other mis_ columns
    val coal = columns.filter(c => c.contains("COAL") || c.contains("coal"))
    val quality = columns.filter(c => containsAny(c, Seq("DRI", "LUMPS", "PELLETS", "FINES")))
    val ops = (coal ++ quality ++
      columns.filter(c => c.startsWith("mis_") && !coal.contains(c) && !quality.contains(c)).take(20))
      .distinct
    // 7. ratios / efficiency
    val ratios = columns.filter(c => c.startsWith("ratio_") || c.contains("efficiency")).take(30)
    // 8-9. lag / rolling: 5 per important base first, then a global topping
    val importantBases = (coal ++ quality ++ tempDrops ++ temps.take(5)).distinct
    def perBaseThenTopUp(pred: String => Boolean, topUp: Int): Seq[String] = {
      val perBase = importantBases.flatMap(b => columns.filter(c => pred(c) && c.contains(b)).take(5))
      val more = columns.filter(c => pred(c) && !perBase.contains(c)).take(topUp)
      (perBase ++ more).distinct
    }
    val lags = perBaseThenTopUp(_.contains("_lag_"), 50)
    val rolls = perBaseThenTopUp(c => c.contains("_roll_") || c.contains("_ma"), 50)
    // 10. anomaly flags
    val anomalies = columns.filter(_.endsWith("_anomaly")).take(50)

    val keep = (critical ++ indicators ++ tempDrops ++ temps ++ derived ++
      ops ++ ratios ++ lags ++ rolls ++ anomalies).distinct
    if (keep.size <= maxFeatures) keep
    else {
      // over budget: refill strictly by priority, capping each class at the
      // remaining room (reference's second pass)
      val ordered = Seq(indicators, tempDrops, ops, temps ++ derived ++ ratios,
        anomalies, lags ++ rolls)
      ordered.foldLeft(critical.distinct) { (acc, cls) =>
        val room = maxFeatures - acc.size
        if (room <= 0) acc else acc ++ cls.distinct.filterNot(acc.contains).take(room)
      }
    }
  }

  /** Apply the cap: one narrow `select`, column pruning reaches the scan.
    * `exclude` columns (index/key columns, e.g. a DatetimeIndex analogue)
    * never compete for the cap and always survive, leading the output. */
  def reduceDimension(df: DataFrame, maxFeatures: Int = 500,
                      exclude: Seq[String] = Nil): DataFrame = {
    val features = df.columns.filterNot(exclude.contains).toIndexedSeq
    val keep = selectColumns(features, maxFeatures)
    // always project exclude-first, even when the cap does not bind — the
    // documented column order is part of the contract, not a cap side effect
    df.select((exclude.filter(df.columns.contains) ++ keep).map(c => col(s"`$c`")): _*)
  }
}
