package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The dashboard's rule-based accretion detector (`dashboard.py:382-427`):
  * fixed per-zone temperature thresholds, a low-zone counter, the
  * "3+ low zones" direct-detection trigger, and the most-affected-zone
  * argmax (largest drop below threshold, FIRST max in ascending-zone order —
  * Python's `max` over a dict returns the first maximal key).
  *
  * Plus the A10 max-with-floor normalization from
  * `pre_processing.py:1376-1390`: `count / max(8, count.max())` — the floor
  * keeps a quiet kiln (few low zones ever) from inflating the normalized
  * risk. The corpus max comes from a 1-row aggregate cross-joined back
  * (broadcast, no global window sort — the q45 pattern).
  *
  * Everything is `when`/`greatest` column algebra over the wide hourly
  * frame — no UDF, fully codegen'd, embarrassingly parallel per row except
  * the single-value max aggregate. */
object ZoneRules {

  /** Expected-minimum temperature per zone (`dashboard.py:392-404`). */
  val defaultThresholds: Map[Int, Double] = Map(
    0 -> 750.0, 1 -> 775.0, 2 -> 800.0, 3 -> 825.0, 4 -> 850.0,
    5 -> 875.0, 6 -> 875.0, 7 -> 875.0, 8 -> 850.0, 9 -> 825.0, 10 -> 800.0)

  /** Stateless rule columns — per-row expressions only, so this stage
    * composes onto batch AND streaming frames alike: appends `zones_low`,
    * `direct_detection`, `most_affected_zone`. Zones absent from the frame
    * are skipped, as the reference skips missing columns. */
  def flags(wide: DataFrame,
            thresholds: Map[Int, Double] = defaultThresholds): DataFrame = {
    val zones = thresholds.keys.toSeq.sorted.filter(z => wide.columns.contains(s"ZONE_$z"))
    require(zones.nonEmpty, "no ZONE_<z> columns found")
    def temp(z: Int): Column = col(s"ZONE_$z")
    def low(z: Int): Column = temp(z) < thresholds(z)
    def drop(z: Int): Column = lit(thresholds(z)) - temp(z)

    // when/otherwise, not a bare cast: a NULL temperature must count as
    // not-low (pandas NaN < thr is False; the oracle's CASE yields 0) —
    // a bare cast would nullify the whole sum and silently drop alerts
    val nLow = zones.map(z => when(low(z), 1).otherwise(0)).reduce(_ + _)
    // drop of the worst low zone; greatest() skips the NULLs of non-low zones
    val lowDrops = zones.map(z => when(low(z), drop(z)))
    val maxDrop = if (lowDrops.size == 1) lowDrops.head else greatest(lowDrops: _*)
    // first zone (ascending) attaining the max drop — Python max() tie-break
    val mostAffected = zones.foldRight(lit(null).cast("int")) { (z, rest) =>
      when(low(z) && drop(z) === maxDrop, lit(z)).otherwise(rest)
    }
    wide
      .withColumn("zones_low", nLow)
      .withColumn("direct_detection", (col("zones_low") >= 3).cast("int"))
      .withColumn("most_affected_zone",
        when(col("direct_detection") === 1, mostAffected).cast("int"))
  }

  /** Batch detection: [[flags]] plus the A10 max-with-floor normalization
    * (`zones_low / max(8, corpus max)`) — the corpus max is a 1-row
    * aggregate cross-joined back (broadcast). */
  def detect(wide: DataFrame,
             thresholds: Map[Int, Double] = defaultThresholds): DataFrame = {
    val flagged = flags(wide, thresholds)
    val floorMax = flagged.agg(
      greatest(lit(8), max(col("zones_low"))).as("__max_zones"))
    flagged.crossJoin(broadcast(floorMax))
      .withColumn("temp_risk_normalized",
        col("zones_low").cast("double") / col("__max_zones"))
      .drop("__max_zones")
  }
}
