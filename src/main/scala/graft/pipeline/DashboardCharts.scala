package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The dashboard's FUSED chart-callback queries — the compositions the
  * serving layer actually runs, as opposed to the primitives they are built
  * from (J2 joins, A4 row-sums, P4 ratios, which the gate covers
  * separately).
  *
  * Scale note: both are daily-grain frames (one row per day after the mis
  * rollup), so at 100 TB the inputs to these serving queries are already
  * reduced — the joins are broadcastable by construction and no shuffle of
  * raw data happens here. */
object DashboardCharts {

  /** Material terms the quality-scatter pattern-matches
    * (`dashboard.py:1869-1872`). */
  private val materialTerms = Seq("IRON ORE", "COAL", "FINES", "LIMESTONE", "COKE")

  /** Material-quality vs accretion scatter input
    * (`dashboard.py:1841-1935`): inner join mis × wide shell on DATE,
    * select the `*QUALITY*` material columns, and row-sum every
    * `ZONE_*_ACCRETION` indicator into TOTAL_ACCRETION. Mirrors pandas
    * `df[cols].sum(axis=1)` null semantics: missing indicators count 0. */
  def qualityAccretion(mis: DataFrame, shellWide: DataFrame): DataFrame = {
    val materialCols = mis.columns.filter(c =>
      materialTerms.exists(c.contains) && c.contains("QUALITY"))
    val accretionCols = shellWide.columns.filter(c =>
      c.contains("ZONE_") && c.endsWith("_ACCRETION"))
    require(materialCols.nonEmpty && accretionCols.nonEmpty,
      s"need *QUALITY* material columns and ZONE_*_ACCRETION columns; " +
        s"got ${materialCols.length} and ${accretionCols.length}")
    val total = accretionCols
      .map(c => coalesce(col(s"`$c`").cast("double"), lit(0.0)))
      .reduce(_ + _)
    mis.join(shellWide, Seq("DATE"), "inner")
      .withColumn("TOTAL_ACCRETION", total)
      .select(col("DATE") +: materialCols.map(c => col(s"`$c`")) :+
        col("TOTAL_ACCRETION"): _*)
  }

  /** Material consumption + ratios (`dashboard.py:1655-1736`): the
    * consumption series plus ore/coal ratio, and coal-per-tonne-DRI —
    * both divisions zero-guarded to null (pandas would emit inf). */
  def materialRatio(mis: DataFrame): DataFrame = {
    def c(n: String) = col(s"`$n`")
    val coal = c("GROSS COAL CONSUMPTION")
    val prod = c("PRODUCTION ACTUAL")
    mis.select(
      col("DATE"),
      c("IRON ORE CONSUMPTION").as("iron_ore_t"),
      coal.as("coal_t"),
      when(coal =!= 0, c("IRON ORE CONSUMPTION") / coal).as("ore_coal_ratio"),
      when(prod =!= 0, coal / prod).as("coal_per_tdri"))
  }
}
