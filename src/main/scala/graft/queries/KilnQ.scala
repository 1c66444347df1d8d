package graft.queries

import org.apache.spark.sql.functions._
import graft.pipeline.{KilnFixture, KilnPipeline, KilnSources, ZoneRules}
import Q.{dec6, r6}
import scala.collection.immutable.ListMap

/** The reference's ACTUAL end-to-end path, oracle-checked: the five-table
  * aligned hourly matrix (`align_time_series`, `pre_processing.py:180-243`)
  * and the full preprocess→feature→risk→label pipeline
  * (`pre_processing.py:1741-2020`), both running on the deterministic
  * [[KilnFixture]] and recomputed independently by DuckDB from
  * `generate_series` — no parquet input, pure arithmetic parity.
  *
  * The fixture's dyadic-rational discipline (see KilnFixture) makes every
  * intermediate mean bit-identical across engines; final float outputs are
  * still dec6/r6-rounded per the repo's oracle-float rules. */
object KilnQ {

  // ---- shared DuckDB CTE fragments (mirror KilnFixture formulas) ----

  /** zone temperature LONG at 2-min cadence for the given zone list. */
  private def zlSql(zones: String): String =
    s"""zl AS (
       |  SELECT TIMESTAMP '2024-01-01 00:00:00' + i.i * INTERVAL 2 MINUTE AS ts, z.z AS zone,
       |    750.0 + 12.5 * z.z + ((i.i * (z.z + 3)) % 97) * 0.25 +
       |    CASE WHEN i.i >= 7200 AND i.i < 10800 AND abs(z.z - 5) <= 1
       |         THEN -(i.i - 7200) * (0.015625 * (2 - abs(z.z - 5))) ELSE 0.0 END AS temp
       |  FROM (SELECT unnest(generate_series(0, 21599)) AS i) i
       |  CROSS JOIN (SELECT unnest([$zones]) AS z) z)""".stripMargin

  private val gridSql =
    """grid AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
      |  TIMESTAMP '2024-01-30 23:00:00', INTERVAL 1 HOUR)) AS ts)""".stripMargin

  /** The full preprocess→feature→risk→label pipeline as DuckDB CTEs,
    * ending in `e` = one row per (ts, zone) with temp/anomaly/drops_12h/
    * risk_score/accretion_active/dtc — shared by q73 (long output) and
    * q75 (pivoted training matrix). */
  private val pipeSql: String =
    s"""${zlSql("0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10")},
       |zh AS (SELECT date_trunc('hour', ts) AS ts, zone, avg(temp) AS temp
       |  FROM zl GROUP BY 1, 2),
       |a AS (SELECT ts, zone, temp,
       |    count(temp) OVER wp AS cnt,
       |    avg(temp) OVER wp AS m,
       |    greatest(stddev_pop(temp) OVER wp, 0.001) AS sd,
       |    lag(temp) OVER wz AS prev_temp
       |  FROM zh
       |  WINDOW wp AS (PARTITION BY zone ORDER BY ts
       |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING),
       |  wz AS (PARTITION BY zone ORDER BY ts)),
       |b AS (SELECT ts, zone, temp,
       |    CASE WHEN cnt <= 12 THEN 0
       |         WHEN temp < m - 2.0 * sd THEN -1
       |         WHEN temp > m + 2.0 * sd THEN 1 ELSE 0 END AS anomaly,
       |    CASE WHEN cnt > 12 THEN m END AS am,
       |    CASE WHEN prev_temp IS NOT NULL AND temp < prev_temp THEN 1 ELSE 0 END AS cooling_dec
       |  FROM a),
       |c AS (SELECT *,
       |    CAST(sum(CASE WHEN anomaly = -1 THEN 1 ELSE 0 END) OVER (
       |      PARTITION BY zone ORDER BY ts
       |      ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS BIGINT) AS drops_12h
       |  FROM b),
       |d AS (SELECT *, greatest(least(
       |    CASE WHEN anomaly = -1 THEN 1.0 ELSE 0.0 END * 0.4
       |    + coalesce(drops_12h / 12.0, 0.0) * 0.3
       |    + CASE WHEN cooling_dec = 1 THEN 1.0 ELSE 0.0 END * 0.1
       |    + coalesce(CASE WHEN am > 0 THEN (am - temp) / am ELSE 0.0 END, 0.0) * 0.2,
       |    1.0), 0.0) AS risk_score
       |  FROM c),
       |e AS (SELECT d.*,
       |    CASE WHEN ev.zone = d.zone THEN 1 ELSE 0 END AS accretion_active,
       |    CASE WHEN ev.zone = d.zone
       |         THEN (epoch(ev.critical_date) - epoch(d.ts)) / 86400.0 END AS dtc
       |  FROM d LEFT JOIN (SELECT 5 AS zone,
       |      TIMESTAMP '2024-01-11 00:00:00' AS start_date,
       |      TIMESTAMP '2024-01-16 00:00:00' AS critical_date) ev
       |    ON d.ts >= ev.start_date AND d.ts < ev.critical_date)""".stripMargin

  /** q75's pivot config: zones × these measures, capped to `tmMax` features
    * by [[graft.pipeline.FeatureSelect.selectColumns]] — the oracle SQL is
    * GENERATED from the same keep-list, so the numeric content of exactly
    * the surviving columns is what DuckDB re-verifies (the selection order
    * itself is pinned independently by FeatureSelectSpec). */
  private val tmValueCols = Seq("temp", "anomaly", "risk_score", "accretion_active")
  private val tmMax = 20

  val queries: ListMap[String, Q] = ListMap(

    // T5/S-family flagship: KilnSources.alignAll over all five fixture
    // tables — hourly zone means, 2-hourly/daily sources ffilled onto the
    // grid, prefixed wide columns (string columns NOT filled, by design).
    "q72_kiln_align" -> Q(
      (s, _) => {
        val aligned = KilnSources.alignAll(
          KilnFixture.zoneWide(s), KilnFixture.qrt(s), KilnFixture.shell(s),
          KilnFixture.air(s), KilnFixture.mis(s), KilnFixture.positions)
        aligned.select(
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          dec6(col("ZONE_0")).as("zone_0"),
          dec6(col("ZONE_5")).as("zone_5"),
          dec6(col("ZONE_10")).as("zone_10"),
          dec6(col("qrt_QRT_ZONE_2")).as("qrt_zone_2"),
          dec6(col("qrt_QRT_ZONE_10")).as("qrt_zone_10"),
          dec6(col("shell_SHELL_TEMP_AVG_O_L_CONE")).as("shell_ol_cone"),
          dec6(col("air_DAMPER_SAF02")).as("damper_saf02"),
          dec6(col("air_AIR_FLOW_CB")).as("air_flow_cb"),
          dec6(col("mis_PRODUCTION_ACTUAL")).as("prod_actual"),
          col("mis_FEED_LOSS_REASON").as("reason"))
          .orderBy("ts")
      },
      Some(s"""WITH $gridSql,
              |${zlSql("0, 5, 10")},
              |zh AS (SELECT date_trunc('hour', ts) AS ts, zone, avg(temp) AS temp
              |  FROM zl GROUP BY 1, 2),
              |zw AS (SELECT ts,
              |  max(CASE WHEN zone = 0 THEN temp END) AS zone_0,
              |  max(CASE WHEN zone = 5 THEN temp END) AS zone_5,
              |  max(CASE WHEN zone = 10 THEN temp END) AS zone_10
              |  FROM zh GROUP BY ts),
              |q AS (SELECT TIMESTAMP '2024-01-01 00:00:00' + j.j * INTERVAL 2 HOUR AS ts, z.z AS zone,
              |    650.0 + 25.0 * z.z + ((j.j * (z.z + 7)) % 89) * 0.5 AS temperature
              |  FROM (SELECT unnest(generate_series(0, 359)) AS j) j
              |  CROSS JOIN (SELECT unnest([2, 10]) AS z) z),
              |qw AS (SELECT ts,
              |  max(CASE WHEN zone = 2 THEN temperature END) AS qrt_zone_2,
              |  max(CASE WHEN zone = 10 THEN temperature END) AS qrt_zone_10
              |  FROM q GROUP BY ts),
              |sh AS (SELECT CAST(DATE '2024-01-01' + CAST(d.d AS INTEGER) AS TIMESTAMP) AS ts,
              |    100.0 + ((d.d * 2) % 31) * 0.5 AS shell_ol_cone
              |  FROM (SELECT unnest(generate_series(0, 29)) AS d) d),
              |ar AS (SELECT CAST(DATE '2024-01-01' + CAST(d.d AS INTEGER) AS TIMESTAMP) AS ts,
              |    30.0 + ((d.d * 2) % 23) * 0.25 AS damper_saf02,
              |    54000.0 + ((d.d * 13) % 41) * 2.0 AS air_flow_cb
              |  FROM (SELECT unnest(generate_series(0, 29)) AS d) d),
              |m AS (SELECT CAST(DATE '2024-01-01' + CAST(d.d AS INTEGER) AS TIMESTAMP) AS ts,
              |    400.0 + (d.d % 13) * 1.5 AS prod_actual,
              |    CASE (d.d % 5) WHEN 0 THEN 'Normal operation' WHEN 1 THEN 'Material bridging'
              |      WHEN 2 THEN 'Feeder malfunction' WHEN 3 THEN 'Raw material shortage'
              |      ELSE 'Power interruption' END AS reason
              |  FROM (SELECT unnest(generate_series(0, 29)) AS d) d),
              |j AS (SELECT g.ts, zw.zone_0, zw.zone_5, zw.zone_10,
              |    qw.qrt_zone_2, qw.qrt_zone_10, sh.shell_ol_cone,
              |    ar.damper_saf02, ar.air_flow_cb, m.prod_actual, m.reason
              |  FROM grid g
              |  LEFT JOIN zw ON g.ts = zw.ts
              |  LEFT JOIN qw ON g.ts = qw.ts
              |  LEFT JOIN sh ON g.ts = sh.ts
              |  LEFT JOIN ar ON g.ts = ar.ts
              |  LEFT JOIN m ON g.ts = m.ts),
              |f AS (SELECT ts, zone_0, zone_5, zone_10,
              |    last_value(qrt_zone_2 IGNORE NULLS) OVER w AS qrt_zone_2,
              |    last_value(qrt_zone_10 IGNORE NULLS) OVER w AS qrt_zone_10,
              |    last_value(shell_ol_cone IGNORE NULLS) OVER w AS shell_ol_cone,
              |    last_value(damper_saf02 IGNORE NULLS) OVER w AS damper_saf02,
              |    last_value(air_flow_cb IGNORE NULLS) OVER w AS air_flow_cb,
              |    last_value(prod_actual IGNORE NULLS) OVER w AS prod_actual,
              |    reason
              |  FROM j WINDOW w AS (ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              |SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
              |${r6("zone_0")} AS zone_0, ${r6("zone_5")} AS zone_5, ${r6("zone_10")} AS zone_10,
              |${r6("qrt_zone_2")} AS qrt_zone_2, ${r6("qrt_zone_10")} AS qrt_zone_10,
              |${r6("shell_ol_cone")} AS shell_ol_cone,
              |${r6("damper_saf02")} AS damper_saf02, ${r6("air_flow_cb")} AS air_flow_cb,
              |${r6("prod_actual")} AS prod_actual, reason
              |FROM f ORDER BY ts""".stripMargin)),

    // The full KilnPipeline.process (align → features → risk → label) on the
    // fixture readings + one accretion interval, verified column-by-column.
    "q73_kiln_label" -> Q(
      (s, _) => {
        val readings = KilnSources.zoneWideToLong(KilnFixture.zoneWide(s))
        val out = KilnPipeline.process(readings, KilnFixture.eventsForPipeline(s))
        out.select(
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("zone"),
          dec6(col("temp")).as("temp"),
          col("anomaly"),
          col("drops_12h"),
          dec6(col("risk_score")).as("risk_score"),
          col("risk_level"),
          col("accretion_active"),
          dec6(col("days_to_critical")).as("days_to_critical"),
          col("accretion_next_24h"), col("accretion_next_48h"), col("accretion_next_72h"))
          .orderBy("ts", "zone")
      },
      Some(s"""WITH $pipeSql
              |SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, zone,
              |${r6("temp")} AS temp, anomaly, drops_12h,
              |${r6("risk_score")} AS risk_score,
              |CASE WHEN risk_score < 0.25 THEN 'Low' WHEN risk_score < 0.5 THEN 'Moderate'
              |     WHEN risk_score < 0.75 THEN 'High' ELSE 'Critical' END AS risk_level,
              |accretion_active,
              |${r6("dtc")} AS days_to_critical,
              |CASE WHEN dtc IS NOT NULL AND dtc >= 0 AND dtc <= 1.0 THEN 1 ELSE 0 END AS accretion_next_24h,
              |CASE WHEN dtc IS NOT NULL AND dtc >= 0 AND dtc <= 2.0 THEN 1 ELSE 0 END AS accretion_next_48h,
              |CASE WHEN dtc IS NOT NULL AND dtc >= 0 AND dtc <= 3.0 THEN 1 ELSE 0 END AS accretion_next_72h
              |FROM e ORDER BY ts, zone""".stripMargin)),

    // The dashboard's rule-based accretion detector (dashboard.py:382-427):
    // per-zone thresholds, 3+-low-zones trigger, most-affected-zone argmax
    // (first max, ascending zone — Python max() tie-break), and the A10
    // max-with-floor normalization count/max(8, max(count))
    // (pre_processing.py:1376-1390; the floor BINDS on this fixture).
    "q74_zone_rules" -> Q(
      (s, _) => {
        val aggs = KilnSources.zones.map(z => avg(s"ZONE_$z").as(s"ZONE_$z"))
        val hourly = KilnFixture.zoneWide(s)
          .groupBy(date_trunc("hour", col("DATETIME")).as("ts"))
          .agg(aggs.head, aggs.tail: _*)
        ZoneRules.detect(hourly)
          .select(
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
            col("zones_low"),
            col("direct_detection"),
            col("most_affected_zone"),
            dec6(col("temp_risk_normalized")).as("temp_risk_norm"))
          .orderBy("ts")
      },
      Some {
        val zs = ZoneRules.defaultThresholds.keys.toSeq.sorted
        val thr = ZoneRules.defaultThresholds
        val zw = zs.map(z => s"max(CASE WHEN zone = $z THEN temp END) AS z$z").mkString(",\n|  ")
        val nLow = zs.map(z => s"CASE WHEN z$z < ${thr(z)} THEN 1 ELSE 0 END").mkString(" + ")
        val maxDrop = zs.map(z => s"CASE WHEN z$z < ${thr(z)} THEN ${thr(z)} - z$z END").mkString(", ")
        val argmax = zs.map(z => s"WHEN z$z < ${thr(z)} AND ${thr(z)} - z$z = max_drop THEN $z")
          .mkString("CASE ", " ", " END")
        s"""WITH ${zlSql(zs.mkString(", "))},
           |zh AS (SELECT date_trunc('hour', ts) AS ts, zone, avg(temp) AS temp
           |  FROM zl GROUP BY 1, 2),
           |zw AS (SELECT ts,
           |  $zw
           |  FROM zh GROUP BY ts),
           |f AS (SELECT *,
           |  ($nLow) AS zones_low,
           |  greatest($maxDrop) AS max_drop
           |  FROM zw)
           |SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, zones_low,
           |CASE WHEN zones_low >= 3 THEN 1 ELSE 0 END AS direct_detection,
           |CASE WHEN zones_low >= 3 THEN $argmax END AS most_affected_zone,
           |${r6("CAST(zones_low AS DOUBLE) / greatest(8, max(zones_low) OVER ())")} AS temp_risk_norm
           |FROM f ORDER BY ts""".stripMargin
      }),

    // The reference's FINAL training artifact (`pre_processing.py:1941`,
    // reduce_dimension 1564-1739): the labeled frame pivoted wide with
    // ZONE_<z>_<feature> names, capped by the priority-class feature
    // selector. The cap BINDS here (44 pivot columns, tmMax = 20), so the
    // gate exercises both the pivot arithmetic and the selection; DuckDB
    // recomputes the surviving columns via conditional aggregation over
    // the same pipeline CTEs.
    "q75_training_matrix" -> Q(
      (s, _) => {
        val readings = KilnSources.zoneWideToLong(KilnFixture.zoneWide(s))
        val labeled = KilnPipeline.process(readings, KilnFixture.eventsForPipeline(s))
        val tm = KilnPipeline.trainingMatrix(labeled, KilnSources.zones, tmValueCols, tmMax)
        tm.select(tm.columns.map {
          case "ts" => date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts")
          case c if c.endsWith("_temp") || c.endsWith("_risk_score") => dec6(col(c)).as(c)
          case c => col(c)
        }.toIndexedSeq: _*).orderBy("ts")
      },
      Some {
        val pivotCols = for (z <- KilnSources.zones; f <- tmValueCols)
          yield s"ZONE_${z}_$f"
        val kept = graft.pipeline.FeatureSelect.selectColumns(pivotCols, tmMax)
        val zf = "^ZONE_(\\d+)_(.+)$".r
        val exprs = kept.map { c =>
          val m = zf.findFirstMatchIn(c).get
          val base = s"max(CASE WHEN zone = ${m.group(1)} THEN ${m.group(2)} END)"
          val e = if (m.group(2) == "temp" || m.group(2) == "risk_score") r6(base) else base
          s"""$e AS "$c""""
        }.mkString(",\n|")
        s"""WITH $pipeSql
           |SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           |$exprs
           |FROM e GROUP BY ts ORDER BY ts""".stripMargin
      }),

    // Fused dashboard chart: material quality vs accretion severity
    // (dashboard.py:1841-1935) — mis ⨝ wide-shell inner join on DATE,
    // pattern-selected *QUALITY* columns, ZONE_*_ACCRETION row-sum.
    "q76_quality_accretion" -> Q(
      (s, _) => graft.pipeline.DashboardCharts.qualityAccretion(
          KilnFixture.mis(s), KilnFixture.shellAccretionWide(s))
        .select(
          date_format(col("DATE"), "yyyy-MM-dd").as("date"),
          dec6(col("`IRON ORE QUALITY`")).as("iron_ore_quality"),
          dec6(col("`COAL QUALITY`")).as("coal_quality"),
          dec6(col("TOTAL_ACCRETION")).as("total_accretion"))
        .orderBy("date"),
      Some(s"""WITH m AS (SELECT CAST(d.d AS INTEGER) AS d,
              |    DATE '2024-01-01' + CAST(d.d AS INTEGER) AS dt,
              |    0.8125 + ((d.d * 3) % 9) * 0.0078125 AS iron_q,
              |    0.75 + ((d.d * 5) % 11) * 0.0078125 AS coal_q
              |  FROM (SELECT unnest(generate_series(0, 29)) AS d) d),
              |sa AS (SELECT DATE '2024-01-01' + CAST(d.d AS INTEGER) AS dt,
              |    CASE WHEN d.d >= 11 AND d.d < 15 THEN 1 ELSE 0 END AS z4,
              |    CASE WHEN d.d >= 10 AND d.d < 16 THEN 1 ELSE 0 END AS z5,
              |    CASE WHEN d.d >= 12 AND d.d < 15 THEN 1 ELSE 0 END AS z6
              |  FROM (SELECT unnest(generate_series(0, 29)) AS d) d)
              |SELECT strftime(m.dt, '%Y-%m-%d') AS date,
              |${r6("iron_q")} AS iron_ore_quality,
              |${r6("coal_q")} AS coal_quality,
              |${r6("CAST(z4 + z5 + z6 AS DOUBLE)")} AS total_accretion
              |FROM m JOIN sa ON m.dt = sa.dt ORDER BY date""".stripMargin)),

    // Fused dashboard chart: material consumption + ore/coal ratio and
    // coal-per-tDRI with zero-guards (dashboard.py:1655-1736).
    "q77_material_ratio" -> Q(
      (s, _) => graft.pipeline.DashboardCharts.materialRatio(KilnFixture.mis(s))
        .select(
          date_format(col("DATE"), "yyyy-MM-dd").as("date"),
          dec6(col("iron_ore_t")).as("iron_ore_t"),
          dec6(col("coal_t")).as("coal_t"),
          dec6(col("ore_coal_ratio")).as("ore_coal_ratio"),
          dec6(col("coal_per_tdri")).as("coal_per_tdri"))
        .orderBy("date"),
      Some(s"""WITH m AS (SELECT
              |    DATE '2024-01-01' + CAST(d.d AS INTEGER) AS dt,
              |    400.0 + (d.d % 13) * 1.5 AS prod_actual,
              |    600.0 + (d.d % 7) * 2.25 AS iron_ore,
              |    300.0 + (d.d % 11) * 1.25 AS coal
              |  FROM (SELECT unnest(generate_series(0, 29)) AS d) d)
              |SELECT strftime(dt, '%Y-%m-%d') AS date,
              |${r6("iron_ore")} AS iron_ore_t,
              |${r6("coal")} AS coal_t,
              |CASE WHEN coal <> 0 THEN ${r6("iron_ore / coal")} END AS ore_coal_ratio,
              |CASE WHEN prod_actual <> 0 THEN ${r6("coal / prod_actual")} END AS coal_per_tdri
              |FROM m ORDER BY date""".stripMargin)),

    // Fused dashboard chart: production-quality grade proportions
    // (dashboard.py:1500-1653) — grade A/B series + pandas-semantics
    // percentages (zero-total day 7 reads 0 %, not an error) + the
    // accretion-day context flag from the first ACCRETION column in
    // column order (here ZONE_4_ACCRETION after the join).
    "q79_production_quality" -> Q(
      (s, _) => graft.pipeline.DashboardCharts.productionQuality(
          KilnFixture.mis(s).join(KilnFixture.shellAccretionWide(s), Seq("DATE"), "inner"))
        .select(
          date_format(col("DATE"), "yyyy-MM-dd").as("date"),
          dec6(col("grade_a")).as("grade_a"),
          dec6(col("grade_b")).as("grade_b"),
          dec6(col("production_actual")).as("production_actual"),
          dec6(col("grade_a_pct")).as("grade_a_pct"),
          dec6(col("grade_b_pct")).as("grade_b_pct"),
          col("accretion_day"))
        .orderBy("date"),
      Some(s"""WITH m AS (SELECT CAST(d.d AS INTEGER) AS d,
              |    DATE '2024-01-01' + CAST(d.d AS INTEGER) AS dt,
              |    CASE WHEN d.d = 7 THEN 0.0 ELSE 250.0 + (d.d % 9) * 1.25 END AS ga,
              |    CASE WHEN d.d = 7 THEN 0.0 ELSE 120.0 + (d.d % 6) * 0.75 END AS gb,
              |    400.0 + (d.d % 13) * 1.5 AS prod,
              |    CASE WHEN d.d >= 11 AND d.d < 15 THEN 1 ELSE 0 END AS acc4
              |  FROM (SELECT unnest(generate_series(0, 29)) AS d) d)
              |SELECT strftime(dt, '%Y-%m-%d') AS date,
              |${r6("ga")} AS grade_a, ${r6("gb")} AS grade_b,
              |${r6("prod")} AS production_actual,
              |${r6("coalesce(ga / nullif(ga + gb, 0) * 100.0, 0.0)")} AS grade_a_pct,
              |${r6("coalesce(gb / nullif(ga + gb, 0) * 100.0, 0.0)")} AS grade_b_pct,
              |acc4 AS accretion_day
              |FROM m ORDER BY date""".stripMargin)),

    // Serving-path fusion, RULE branch (`dashboard.py:476-479` — the
    // fallback dict `predict_accretion` serves when no model is loaded):
    // ZoneRules flags plus the fused probability/days/zone constants.
    // The model branch of the same fusion (ScoreFusion.fuse) is spec-gated
    // on the fixture instead — GBT probabilities aren't oracle-stable.
    "q111_rule_fusion" -> Q(
      (s, _) => {
        val aggs = KilnSources.zones.map(z => avg(s"ZONE_$z").as(s"ZONE_$z"))
        val hourly = KilnFixture.zoneWide(s)
          .groupBy(date_trunc("hour", col("DATETIME")).as("ts"))
          .agg(aggs.head, aggs.tail: _*)
        graft.pipeline.ScoreFusion.fuseRules(hourly)
          .select(
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
            col("zones_low"),
            col("is_forming"),
            dec6(col("probability")).as("probability"),
            dec6(col("days_to_critical")).as("days_to_critical"),
            col("zone"))
          .orderBy("ts")
      },
      Some {
        val zs = ZoneRules.defaultThresholds.keys.toSeq.sorted
        val thr = ZoneRules.defaultThresholds
        val zw = zs.map(z => s"max(CASE WHEN zone = $z THEN temp END) AS z$z").mkString(",\n|  ")
        val nLow = zs.map(z => s"CASE WHEN z$z < ${thr(z)} THEN 1 ELSE 0 END").mkString(" + ")
        val maxDrop = zs.map(z => s"CASE WHEN z$z < ${thr(z)} THEN ${thr(z)} - z$z END").mkString(", ")
        val argmax = zs.map(z => s"WHEN z$z < ${thr(z)} AND ${thr(z)} - z$z = max_drop THEN $z")
          .mkString("CASE ", " ", " END")
        s"""WITH ${zlSql(zs.mkString(", "))},
           |zh AS (SELECT date_trunc('hour', ts) AS ts, zone, avg(temp) AS temp
           |  FROM zl GROUP BY 1, 2),
           |zw AS (SELECT ts,
           |  $zw
           |  FROM zh GROUP BY ts),
           |f AS (SELECT *,
           |  ($nLow) AS zones_low,
           |  greatest($maxDrop) AS max_drop
           |  FROM zw),
           |g AS (SELECT ts, zones_low,
           |  CASE WHEN zones_low >= 3 THEN 1 ELSE 0 END AS dd,
           |  CASE WHEN zones_low >= 3 THEN $argmax END AS maz
           |  FROM f)
           |SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, zones_low,
           |dd AS is_forming,
           |${r6("CASE WHEN dd = 1 THEN 0.7 ELSE 0.1 END")} AS probability,
           |${r6("CASE WHEN dd = 1 THEN 15.0 ELSE 30.0 END")} AS days_to_critical,
           |coalesce(maz, 5) AS zone
           |FROM g ORDER BY ts""".stripMargin
      })
  )
}
