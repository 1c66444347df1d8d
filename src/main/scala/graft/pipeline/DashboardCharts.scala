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

  /** Production-quality grade chart input (`dashboard.py:1500-1653`):
    * grade A/B series discovered by name substring, grade proportions with
    * pandas semantics (`total.replace(0, nan)` then `fillna(0)` — a
    * zero-production day reads as 0 %, not a division error), and the
    * accretion-day context flag from the FIRST column containing
    * `ACCRETION` in column order (the chart's `next(...)` scan), 0 when no
    * such column exists. */
  def productionQuality(mis: DataFrame): DataFrame = {
    def find(sub: String): String = mis.columns.find(_.contains(sub)).getOrElse(
      throw new IllegalArgumentException(s"no column containing '$sub'"))
    val a = col(s"`${find("GRADE A")}`")
    val b = col(s"`${find("GRADE B")}`")
    val total = a + b
    val accretion = mis.columns.find(_.contains("ACCRETION"))
      .map(c => (col(s"`$c`") > 0).cast("int")).getOrElse(lit(0))
    mis.select(
      col("DATE"),
      a.as("grade_a"), b.as("grade_b"),
      col("`PRODUCTION ACTUAL`").as("production_actual"),
      coalesce(when(total =!= 0.0, a / total * 100.0), lit(0.0)).as("grade_a_pct"),
      coalesce(when(total =!= 0.0, b / total * 100.0), lit(0.0)).as("grade_b_pct"),
      accretion.as("accretion_day"))
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
