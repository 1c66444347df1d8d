package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 30-day five-table kiln fixture (FIXTURES.md §A schemas,
  * generator semantics from `data_generator.py:764-1029`) used to drive the
  * end-to-end pipeline through the DuckDB oracle gate (q72/q73/q74).
  *
  * Everything is synthesized from an integer grid with DYADIC-rational
  * arithmetic only (granularity 2^-6): every temperature/flow value is an
  * exact IEEE double and every SUM of them is exact regardless of fold
  * order, so Spark's partial aggregation and DuckDB's sequential fold give
  * bit-identical hourly means. "Noise" comes from integer modular patterns
  * (`(i·k) % p`), not trig or RNG — nothing engine-specific anywhere.
  *
  * One accretion event is embedded: zones 4-6 ramp down from day 10 to a
  * −112.5 °C drop (zone 5) at day 15 — enough to trip the anomaly/cooling
  * feature paths and the interval labeler. */
object KilnFixture {

  val days = 30
  val ticks2m: Long = days * 720L  // 2-minute cadence
  val qrtTicks: Long = days * 12L  // 2-hour cadence
  val positions: Seq[String] = Seq("O/L CONE", "MID", "1st no.")
  val reasons: Seq[String] = Seq("Normal operation", "Material bridging",
    "Feeder malfunction", "Raw material shortage", "Power interruption")

  private val t0 = "2024-01-01 00:00:00"
  private def ts0 = to_timestamp(lit(t0))
  private def date0 = to_date(lit("2024-01-01"))

  // accretion-event window in 2-min ticks: [day 10, day 15)
  val evStart = 7200L
  val evEnd = 10800L

  /** `zone_temperature` — wide, 2-minute (A1). */
  def zoneWide(s: SparkSession): DataFrame = {
    val zoneCols = KilnSources.zones.map { z =>
      val noise = (col("id") * (z + 3) % 97).cast("double") * lit(0.25)
      val coef = 0.015625 * (2 - math.abs(z - 5)) // dyadic
      val drop =
        if (math.abs(z - 5) <= 1)
          when(col("id") >= evStart && col("id") < evEnd,
            -(col("id") - evStart).cast("double") * lit(coef)).otherwise(lit(0.0))
        else lit(0.0)
      (lit(750.0 + 12.5 * z) + noise + drop).as(s"ZONE_$z")
    }
    s.range(ticks2m).select(
      (ts0 + expr("make_dt_interval(0, 0, 0, id * 120)")).as("DATETIME") +: zoneCols: _*)
  }

  /** `qrt_temperature` — long, 2-hourly, zones 2-10 (A2). */
  def qrt(s: SparkSession): DataFrame =
    s.range(qrtTicks * 9)
      .select(expr("id div 9").as("j"), (col("id") % 9 + 2).cast("int").as("ZONE"))
      .select(
        (ts0 + expr("make_dt_interval(0, 0, 0, j * 7200)")).as("DATETIME"),
        col("ZONE"),
        (lit(650.0) + col("ZONE").cast("double") * 25.0 +
          (col("j") * (col("ZONE") + 7) % 89).cast("double") * 0.5).as("TEMPERATURE"))

  /** `shell_temperature` — long, daily, 3 positions (A3 subset; one name
    * with '/' and ' ' to exercise sanitization). */
  def shell(s: SparkSession): DataFrame =
    s.range(days * 3L)
      .select(expr("id div 3").as("d"), (col("id") % 3).cast("int").as("p"))
      .select(
        date_add(date0, col("d").cast("int")).as("DATE"),
        element_at(array(positions.map(lit): _*), col("p") + 1).as("POSITION"),
        (lit(100.0) + col("p").cast("double") * 50.0 +
          (col("d") * (col("p") + 2) % 31).cast("double") * 0.5).as("avg0"))
      .select(col("DATE"), col("POSITION"),
        (col("avg0") - 2.0).as("SHELL_TEMP_0"), (col("avg0") - 1.0).as("SHELL_TEMP_90"),
        (col("avg0") + 1.0).as("SHELL_TEMP_180"), (col("avg0") + 2.0).as("SHELL_TEMP_270"),
        col("avg0").as("SHELL_TEMP_AVG"))

  /** `air_calibration` — long, daily, 9 fans × 3 measures (A4). */
  def air(s: SparkSession): DataFrame =
    s.range(days * 9L)
      .select(expr("id div 9").as("d"), (col("id") % 9).cast("int").as("f"))
      .select(
        date_add(date0, col("d").cast("int")).as("DATE"),
        element_at(array(KilnSources.fans.map(lit): _*), col("f") + 1).as("FAN"),
        (lit(30.0) + col("f").cast("double") * 5.0 +
          (col("d") * (col("f") + 2) % 23).cast("double") * 0.25).as("DAMPER"),
        (lit(5.0) + col("f").cast("double") +
          (col("d") * (col("f") + 3) % 17).cast("double") * 0.125).as("VELOCITY"),
        (lit(50000.0) + col("f").cast("double") * 500.0 +
          (col("d") * (col("f") + 5) % 41).cast("double") * 2.0).as("AIR_FLOW"))

  /** `mis_report` — wide, daily (A5 subset; spaces in names kept). */
  def mis(s: SparkSession): DataFrame =
    s.range(days.toLong)
      .select(
        date_add(date0, col("id").cast("int")).as("DATE"),
        (col("id") + 1).cast("int").as("CAMP_DAY"),
        (lit(400.0) + (col("id") % 13).cast("double") * 1.5).as("PRODUCTION ACTUAL"),
        lit(450.0).as("PRODUCTION PLAN"),
        (lit(600.0) + (col("id") % 7).cast("double") * 2.25).as("IRON ORE CONSUMPTION"),
        (lit(300.0) + (col("id") % 11).cast("double") * 1.25).as("GROSS COAL CONSUMPTION"),
        (lit(0.8125) + (col("id") * 3 % 9).cast("double") * 0.0078125).as("IRON ORE QUALITY"),
        (lit(0.75) + (col("id") * 5 % 11).cast("double") * 0.0078125).as("COAL QUALITY"),
        // grade split: dyadic steps; day 7 produces NEITHER grade, so the
        // production-quality chart's zero-total division guard BINDS
        when(col("id") === 7, 0.0)
          .otherwise(lit(250.0) + (col("id") % 9).cast("double") * 1.25)
          .as("PRODUCTION GRADE A"),
        when(col("id") === 7, 0.0)
          .otherwise(lit(120.0) + (col("id") % 6).cast("double") * 0.75)
          .as("PRODUCTION GRADE B"),
        lit(0.75).as("COAL_PER_TDRI"),
        (lit(12000.0) + col("id").cast("double") * 8.0).as("POWER"),
        lit(95.5).as("KILN_AVAILABILITY"),
        element_at(array(reasons.map(lit): _*), (col("id") % 5).cast("int") + 1)
          .as("FEED_LOSS_REASON"))

  /** Post-processed wide shell frame with per-zone accretion indicator
    * columns — the shape `dashboard.py:1877` pattern-matches
    * (`ZONE_*_ACCRETION`); indicator windows bracket the embedded event. */
  def shellAccretionWide(s: SparkSession): DataFrame =
    s.range(days.toLong).select(
      date_add(date0, col("id").cast("int")).as("DATE"),
      when(col("id") >= 11 && col("id") < 15, 1).otherwise(0).as("ZONE_4_ACCRETION"),
      when(col("id") >= 10 && col("id") < 16, 1).otherwise(0).as("ZONE_5_ACCRETION"),
      when(col("id") >= 12 && col("id") < 15, 1).otherwise(0).as("ZONE_6_ACCRETION"))

  /** `accretion_events` — one interval: zone 5, day 10 → critical day 15 (A6). */
  def events(s: SparkSession): DataFrame =
    s.range(1).select(
      lit(1).as("EVENT_ID"),
      lit(5).as("ZONE"),
      to_timestamp(lit("2024-01-11 00:00:00")).as("START_DATE"),
      to_timestamp(lit("2024-01-16 00:00:00")).as("CRITICAL_DATE"),
      to_timestamp(lit("2024-01-21 00:00:00")).as("CLEARED_DATE"),
      lit(5).as("DURATION_DAYS"))

  /** Events renamed to the pipeline's lowercase contract. */
  def eventsForPipeline(s: SparkSession): DataFrame =
    events(s).select(
      col("EVENT_ID").as("event_id"), col("ZONE").as("zone"),
      col("START_DATE").as("start_date"), col("CRITICAL_DATE").as("critical_date"))
}
