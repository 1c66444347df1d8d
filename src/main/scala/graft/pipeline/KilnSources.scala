package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.CsvIO
import graft.operators.{TimeSeriesOps, WindowOps}
import org.apache.spark.sql.expressions.Window

/** Exact-schema adapters for the reference's five kiln tables
  * (FIXTURES.md §A; generator schemas at `data_generator.py:764-1029`):
  * typed CSV loaders, the long↔wide reshapes each table needs
  * (multi-measure pivots with flattened `MEASURE_KEY` names,
  * `pre_processing.py:110-157`), and the aligned hourly matrix with
  * prefixed columns (`mis_`, `air_`, `shell_`, `qrt_`, `ZONE_*`) that the
  * reference's feature stages consume (`pre_processing.py:180-243`).
  *
  * Vocabularies (fans, positions, zones) are fixed per the generator, so
  * every pivot passes explicit value lists — no discovery pass. */
object KilnSources {

  val zones: Seq[Int] = 0 to 10
  val qrtZones: Seq[Int] = 2 to 10
  val fans: Seq[String] = (2 to 9).map(i => f"SAF$i%02d") :+ "CB"
  val tsFmt = "yyyy-MM-dd HH:mm:ss"

  /** `zone_temperature.csv` — wide, 2-minute (`data_generator.py:975-986`). */
  val zoneTemperatureSchema: StructType = StructType(
    StructField("DATETIME", StringType) +:
      zones.map(z => StructField(s"ZONE_$z", DoubleType)))

  /** `qrt_temperature.csv` — long, 2-hourly (`data_generator.py:897-903`). */
  val qrtSchema: StructType = StructType(Seq(
    StructField("DATETIME", StringType),
    StructField("ZONE", IntegerType),
    StructField("TEMPERATURE", DoubleType)))

  /** `shell_temperature.csv` — long, daily (`data_generator.py:849-855`). */
  val shellSchema: StructType = StructType(Seq(
    StructField("DATE", StringType),
    StructField("POSITION", StringType),
    StructField("SHELL_TEMP_0", DoubleType),
    StructField("SHELL_TEMP_90", DoubleType),
    StructField("SHELL_TEMP_180", DoubleType),
    StructField("SHELL_TEMP_270", DoubleType),
    StructField("SHELL_TEMP_AVG", DoubleType)))

  /** `air_calibration.csv` — long, daily, multi-measure (`data_generator.py:869-875`). */
  val airSchema: StructType = StructType(Seq(
    StructField("DATE", StringType),
    StructField("FAN", StringType),
    StructField("DAMPER", DoubleType),
    StructField("VELOCITY", DoubleType),
    StructField("AIR_FLOW", DoubleType)))

  /** `mis_report.csv` — wide, daily; note the SPACES in real column names
    * (`data_generator.py:764-799`), a quoting test the loaders must survive. */
  val misSchema: StructType = StructType(Seq(
    StructField("DATE", StringType),
    StructField("CAMP_DAY", IntegerType),
    StructField("PRODUCTION ACTUAL", DoubleType),
    StructField("PRODUCTION PLAN", DoubleType),
    StructField("IRON ORE CONSUMPTION", DoubleType),
    StructField("GROSS COAL CONSUMPTION", DoubleType),
    StructField("COAL_PER_TDRI", DoubleType),
    StructField("POWER", DoubleType),
    StructField("KILN_AVAILABILITY", DoubleType),
    StructField("FEED_LOSS_REASON", StringType)))

  def loadZone(s: SparkSession, p: String): DataFrame =
    CsvIO.read(s, p, zoneTemperatureSchema, Map("DATETIME" -> tsFmt))
  def loadQrt(s: SparkSession, p: String): DataFrame =
    CsvIO.read(s, p, qrtSchema, Map("DATETIME" -> tsFmt))
  def loadShell(s: SparkSession, p: String): DataFrame =
    CsvIO.read(s, p, shellSchema, Map("DATE" -> "yyyy-MM-dd"))
  def loadAir(s: SparkSession, p: String): DataFrame =
    CsvIO.read(s, p, airSchema, Map("DATE" -> "yyyy-MM-dd"))
  def loadMis(s: SparkSession, p: String): DataFrame =
    CsvIO.read(s, p, misSchema, Map("DATE" -> "yyyy-MM-dd"))

  /** Wide zone table → long (ts, zone, temp) for the pipeline (R3 unpivot;
    * reference iterates `ZONE_*` columns, discovered BY NAME PATTERN —
    * `pre_processing.py:850` — so unexpected extra columns are ignored). */
  def zoneWideToLong(zoneWide: DataFrame): DataFrame = {
    val zoneCols = zoneWide.columns.filter(_.startsWith("ZONE_"))
    zoneWide.unpivot(
        Array(col("DATETIME").as("ts")),
        zoneCols.map(c => col(s"`$c`")),
        "zone_name", "temp")
      .withColumn("zone", regexp_extract(col("zone_name"), "ZONE_(\\d+)", 1).cast("int"))
      .select("ts", "zone", "temp")
  }

  /** QRT long → wide `QRT_ZONE_k` columns (R1 + R2 flattening,
    * `pre_processing.py:150-157`). */
  def qrtWide(qrt: DataFrame): DataFrame =
    qrt.groupBy(col("DATETIME").as("ts"))
      .pivot("ZONE", qrtZones.map(_.toString))
      .agg(avg("TEMPERATURE"))
      .select(col("ts") +: qrtZones.map(z => col(s"`$z`").as(s"QRT_ZONE_$z")): _*)

  /** Air long → wide multi-measure `DAMPER_SAF02, VELOCITY_SAF02, ...`
    * (R1 multi-measure + R2, `pre_processing.py:110-117`). Spark emits
    * `key_agg` names for multi-agg pivots; rename to the reference's
    * `MEASURE_KEY` convention. */
  def airWide(air: DataFrame): DataFrame = {
    val pivoted = air.groupBy(col("DATE").as("ts"))
      .pivot("FAN", fans)
      .agg(avg("DAMPER").as("DAMPER"), avg("VELOCITY").as("VELOCITY"),
        avg("AIR_FLOW").as("AIR_FLOW"))
    // one select, not 27 chained renames — every withColumnRenamed adds a
    // Project node the analyzer re-resolves against the whole pivot schema
    val renamed = fans.flatMap { f =>
      Seq("DAMPER", "VELOCITY", "AIR_FLOW").map(m => col(s"`${f}_$m`").as(s"${m}_$f"))
    }
    pivoted.select(col("ts") +: renamed: _*)
  }

  /** Shell long → per-position averages flattened as `SHELL_TEMP_AVG_<pos>`
    * (`pre_processing.py:130-138`); positions sanitized for column names. */
  def shellWide(shell: DataFrame, positions: Seq[String]): DataFrame = {
    val pivoted = shell.groupBy(col("DATE").as("ts"))
      .pivot("POSITION", positions)
      .agg(avg("SHELL_TEMP_AVG"))
    pivoted.select(col("ts") +: positions.map(p =>
      col(s"`$p`").as(s"SHELL_TEMP_AVG_${p.replaceAll("[^A-Za-z0-9]", "_")}")): _*)
  }

  /** The reference's central artifact: every table resampled to the hourly
    * timeline and column-prefixed, one wide aligned matrix
    * (`align_time_series`, `pre_processing.py:180-243`):
    * zone 2-min → hourly mean; qrt 2-h → hourly ffill (the linear-interp
    * variant lives in TimeSeriesOps.interpolateCol); daily tables → hourly
    * ffill. */
  def alignAll(zoneWide: DataFrame, qrt: DataFrame, shell: DataFrame,
               air: DataFrame, mis: DataFrame, positions: Seq[String]): DataFrame = {
    // hourly zone means straight off the WIDE frame: one groupBy with an
    // avg per ZONE_* column replaces the unpivot→group→re-pivot round trip
    // (3 shuffles of the 11×-exploded long table → 1 shuffle of the wide
    // one); avg skips nulls identically in both formulations
    val zoneCols = zoneWide.columns.filter(_.startsWith("ZONE_"))
    val zoneAggs = zoneCols.map(c => avg(col(s"`$c`")).as(c))
    val zoneHourly = zoneWide
      .groupBy(date_trunc("hour", col("DATETIME")).as("ts"))
      .agg(zoneAggs.head, zoneAggs.tail: _*)
    val grid = TimeSeriesOps.timeline(zoneWide.select(col("DATETIME").as("ts")), "ts")

    def prefixed(df: DataFrame, prefix: String): DataFrame =
      df.select(col("ts") +: df.columns.filterNot(_ == "ts").map(c =>
        col(s"`$c`").as(prefix + c.replaceAll("[^A-Za-z0-9_]", "_"))): _*)
    val sources = Seq(
      zoneHourly,
      prefixed(qrtWide(qrt), "qrt_"),
      prefixed(shellWide(shell, positions), "shell_"),
      prefixed(airWide(air), "air_"),
      prefixed(mis.withColumnRenamed("DATE", "ts"), "mis_"))
    val joined = sources.foldLeft(grid) { (acc, src) =>
      acc.join(src.withColumn("ts", date_trunc("hour", col("ts"))), Seq("ts"), "left")
    }
    // sparse sources (daily / 2-hourly) forward-fill onto the hourly grid —
    // all columns in ONE projection over one shared window sort, not a
    // withColumn per column (each adds an analyzer pass over ~50 columns)
    val w = Window.orderBy("ts") // post-aggregation hourly grid
    val fillCols = joined.columns.filter(c =>
      c.startsWith("qrt_") || c.startsWith("shell_") || c.startsWith("air_") ||
        (c.startsWith("mis_") && joined.schema(c).dataType != StringType)).toSet
    joined.select(joined.columns.map { c =>
      if (fillCols(c)) WindowOps.ffill(col(s"`$c`"), w).as(c) else col(s"`$c`")
    }: _*)
  }
}
