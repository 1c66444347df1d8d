package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{JoinOps, TimeSeriesOps}
import Q.{dec4, dec6, r6}
import scala.collection.immutable.ListMap

/** Time-series alignment suite (SURVEY §2.4 T1-T6, §2.5 J1-J6): timeline
  * generation, down/upsampling with ffill and linear interpolation, as-of
  * and nearest joins, interval (range) joins and look-back labeling — the
  * reference's `align_time_series` + `create_target_variables` re-expressed
  * on the `events`/`orders`/`lineitem` testdata.
  *
  * Scale shape of every query here: raw data is reduced by ONE hash
  * aggregation keyed by (hour, series); everything after runs on the small
  * hourly grid (#hours × #series rows), with window sorts partitioned by
  * series. Interval sides of range joins are broadcast.
  */
object TimeSeriesQ {

  /** Common DuckDB CTE fragments for the hourly grid over `events`. */
  private[queries] val sqlGrid =
    """grid AS (SELECT unnest(generate_series(a, b, INTERVAL 1 HOUR)) AS ts
      |  FROM (SELECT date_trunc('hour', min(ts)) AS a,
      |               date_trunc('hour', max(ts)) AS b FROM events))""".stripMargin
  private[queries] val sqlHourly =
    """hourly AS (SELECT date_trunc('hour', ts) AS ts, event_type, avg(value) AS v
      |  FROM events GROUP BY 1, 2)""".stripMargin
  private[queries] val sqlAligned =
    s"""$sqlGrid,
       |$sqlHourly,
       |types AS (SELECT DISTINCT event_type FROM events),
       |aligned AS (SELECT g.ts, t.event_type, h.v
       |  FROM grid g CROSS JOIN types t
       |  LEFT JOIN hourly h ON h.ts = g.ts AND h.event_type = t.event_type)""".stripMargin

  /** Spark side of the dense (grid × event_type) frame with hourly means. */
  private[graft] def aligned(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val hourly = ev.groupBy(date_trunc("hour", col("ts")).as("ts"), col("event_type"))
      .agg(avg("value").as("v"))
    val grid = TimeSeriesOps.timeline(ev, "ts")
    val types = ev.select("event_type").distinct()
    TimeSeriesOps.alignToGrid(grid, types, hourly, Seq("ts", "event_type"))
  }

  val queries: ListMap[String, Q] = ListMap(

    // T4/A3: tumbling-window downsample (reference `resample('1h').mean()`,
    // `pre_processing.py:240`) — the one shuffle that touches raw rows.
    "q20_hourly_downsample" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("ts"), col("event_type"))
        .agg(count(lit(1)).as("n"), dec4(avg("value")).as("avg_value"),
          dec4(sum("value")).as("sum_value"))
        .orderBy("ts", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS ts, event_type, count(*) AS n,
             |floor((avg(value)) * 10000.0 + 0.500618034) / 10000.0 AS avg_value, floor((sum(value)) * 10000.0 + 0.500618034) / 10000.0 AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY ts, event_type""".stripMargin)),

    // T1: canonical hourly timeline (reference `pd.date_range`,
    // `pre_processing.py:199-204`) via sequence+explode — no driver collect.
    "q21_timeline" -> Q(
      (s, d) => TimeSeriesOps.timeline(Tables.events(s, d), "ts").orderBy("ts"),
      Some(s"""WITH $sqlGrid SELECT ts FROM grid ORDER BY ts""")),

    // T2/T5/J1: align to grid + forward-fill upsample (reference
    // `resample('1h').ffill()` + timeline join, `pre_processing.py:208-241`).
    "q22_resample_ffill" -> Q(
      (s, d) => TimeSeriesOps.ffillCols(aligned(s, d), Seq("event_type"), "ts", Seq("v"))
        .select(col("ts"), col("event_type"), dec4(col("v")).as("v_ff"))
        .orderBy("ts", "event_type"),
      Some(s"""WITH $sqlAligned
              |SELECT ts, event_type, floor((last_value(v IGNORE NULLS) OVER (
              |  PARTITION BY event_type ORDER BY ts
              |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 10000.0 + 0.500618034) / 10000.0 AS v_ff
              |FROM aligned ORDER BY ts, event_type""".stripMargin)),

    // T3: linear interpolation upsample (reference `resample('1h')
    // .interpolate()`, `pre_processing.py:229`); pandas edge rules — leading
    // nulls stay null, trailing carry last valid (SURVEY §7.4-2).
    "q23_resample_interpolate" -> Q(
      (s, d) => TimeSeriesOps.interpolateCol(aligned(s, d), Seq("event_type"), "ts", "v", "v_i")
        .select(col("ts"), col("event_type"), dec4(col("v_i")).as("v_interp"))
        .orderBy("ts", "event_type"),
      Some(s"""WITH $sqlAligned,
              |x AS (SELECT ts, event_type, v,
              |  last_value(v IGNORE NULLS) OVER wp AS pv,
              |  last_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS) OVER wp AS pt,
              |  first_value(v IGNORE NULLS) OVER wn AS nv,
              |  first_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS) OVER wn AS nt
              |  FROM aligned
              |  WINDOW wp AS (PARTITION BY event_type ORDER BY ts
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              |  wn AS (PARTITION BY event_type ORDER BY ts
              |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
              |SELECT ts, event_type, floor((CASE
              |  WHEN v IS NOT NULL THEN v
              |  WHEN pv IS NOT NULL AND nv IS NOT NULL AND date_diff('second', pt, nt) > 0
              |    THEN pv + (nv - pv) * date_diff('second', pt, ts) / date_diff('second', pt, nt)
              |  WHEN pv IS NOT NULL THEN pv END) * 10000.0 + 0.500618034) / 10000.0 AS v_interp
              |FROM x ORDER BY ts, event_type""".stripMargin)),

    // J6: as-of join — latest raw event value at or before each grid slot,
    // per series. Union-then-window formulation: one shuffle on the key, no
    // range-join explosion (scales to billions of rows per side).
    // As-of join with a 10-minute staleness tolerance: matches older than
    // the tolerance null out (pandas merge_asof tolerance semantics) —
    // the serving-join behavior when a series goes quiet.
    "q163_asof_tolerance" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val right = ev.groupBy("event_type", "ts")
          .agg(max_by(col("value"), col("event_id")).as("value"))
        val grid = TimeSeriesOps.timeline(ev, "ts")
        val left = grid.crossJoin(broadcast(ev.select("event_type").distinct()))
        TimeSeriesOps.asofJoinTolerance(left, right, Seq("event_type"), "ts", "ts",
            Seq("value"), toleranceSeconds = 600)
          .select(col("ts"), col("event_type"), col("value"))
          .orderBy("ts", "event_type")
      },
      Some(s"""WITH $sqlGrid,
              |g AS (SELECT grid.ts, t.event_type FROM grid
              |      CROSS JOIN (SELECT DISTINCT event_type FROM events) t),
              |r AS (SELECT event_type, ts, arg_max(value, event_id) AS value
              |      FROM events GROUP BY 1, 2)
              |SELECT g.ts, g.event_type,
              |  CASE WHEN r.ts IS NOT NULL
              |    AND epoch_us(g.ts) - epoch_us(r.ts) <= 600 * 1000000
              |  THEN r.value END AS value
              |FROM g ASOF LEFT JOIN r
              |  ON g.event_type = r.event_type AND g.ts >= r.ts
              |ORDER BY g.ts, g.event_type""".stripMargin)),

    "q24_asof_join" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        // dedupe exact-duplicate (type, ts) on the right deterministically
        val right = ev.groupBy("event_type", "ts").agg(max_by(col("value"), col("event_id")).as("value"))
        val grid = TimeSeriesOps.timeline(ev, "ts")
        val left = grid.crossJoin(broadcast(ev.select("event_type").distinct()))
        TimeSeriesOps.asofJoinLast(left, right, Seq("event_type"), "ts", "ts", Seq("value"))
          .select(col("ts"), col("event_type"), col("value"))
          .orderBy("ts", "event_type")
      },
      Some(s"""WITH $sqlGrid,
              |g AS (SELECT grid.ts, t.event_type FROM grid
              |      CROSS JOIN (SELECT DISTINCT event_type FROM events) t),
              |r AS (SELECT event_type, ts, arg_max(value, event_id) AS value
              |      FROM events GROUP BY 1, 2)
              |SELECT g.ts, g.event_type, r.value
              |FROM g ASOF LEFT JOIN r
              |  ON g.event_type = r.event_type AND g.ts >= r.ts
              |ORDER BY g.ts, g.event_type""".stripMargin)),

    // J6 through the CUSTOM OPERATOR path: the same as-of semantics planned
    // via graft.plans.AsOfJoin -> AsOfJoinExec (logical node + strategy +
    // physical merge join), oracle-identical to q24's union-then-window.
    // The raw events feed the right side directly: the operator's
    // rightTiebreak ordering resolves duplicate (type, ts) to max event_id
    // in the merge itself — no dedup pre-aggregation, one shuffle of the
    // right side instead of two (the groupBy's hash(type, ts) partitioning
    // can't serve the merge's hash(type) distribution).
    // MEASURED at sf0.1: cold/cold fresh-JVM 1.39 s (q24) vs 1.50 s (q24b)
    // = 1.08×; warm steady state 0.44 s vs 0.51 s = 1.16×. Any larger gap
    // in a full-suite run is warm-state asymmetry, not operator cost: q24's
    // window/agg codegen paths are pre-warmed by q20-q23, while the native
    // merge path is always the suite's first (and only) use of its class.
    "q24b_asof_native" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val grid = TimeSeriesOps.timeline(ev, "ts")
        val left = grid.crossJoin(broadcast(ev.select("event_type").distinct()))
        graft.operators.JoinOps.asofJoinNative(left, ev.select("event_type", "ts", "value", "event_id"),
            Seq("event_type"), "ts", "ts", Seq("value"), rightTiebreak = Seq("event_id"))
          .select(col("ts"), col("event_type"), col("value"))
          .orderBy("ts", "event_type")
      },
      Some(s"""WITH $sqlGrid,
              |g AS (SELECT grid.ts, t.event_type FROM grid
              |      CROSS JOIN (SELECT DISTINCT event_type FROM events) t),
              |r AS (SELECT event_type, ts, arg_max(value, event_id) AS value
              |      FROM events GROUP BY 1, 2)
              |SELECT g.ts, g.event_type, r.value
              |FROM g ASOF LEFT JOIN r
              |  ON g.event_type = r.event_type AND g.ts >= r.ts
              |ORDER BY g.ts, g.event_type""".stripMargin)),

    // T6: nearest-neighbor reindex (reference `reindex(method='nearest')`,
    // `data_generator.py:953`); ties resolve to the previous value.
    "q25_nearest_reindex" -> Q(
      (s, d) => TimeSeriesOps.nearestCols(aligned(s, d), Seq("event_type"), "ts", "v", "v_n")
        .select(col("ts"), col("event_type"), dec4(col("v_n")).as("v_nearest"))
        .orderBy("ts", "event_type"),
      Some(s"""WITH $sqlAligned,
              |x AS (SELECT ts, event_type, v,
              |  last_value(v IGNORE NULLS) OVER wp AS pv,
              |  last_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS) OVER wp AS pt,
              |  first_value(v IGNORE NULLS) OVER wn AS nv,
              |  first_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS) OVER wn AS nt
              |  FROM aligned
              |  WINDOW wp AS (PARTITION BY event_type ORDER BY ts
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              |  wn AS (PARTITION BY event_type ORDER BY ts
              |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
              |SELECT ts, event_type, floor((CASE
              |  WHEN pv IS NOT NULL AND (nv IS NULL OR
              |    date_diff('second', pt, ts) <= date_diff('second', ts, nt)) THEN pv
              |  WHEN nv IS NOT NULL THEN nv END) * 10000.0 + 0.500618034) / 10000.0 AS v_nearest
              |FROM x ORDER BY ts, event_type""".stripMargin)),

    // J3: interval (range) join — facts vs broadcast interval windows
    // (reference `create_target_variables`, `pre_processing.py:1443-1562`).
    // Formulated scale-first: inner BNLJ against the broadcast tiny side,
    // aggregate, then left-join interval list back for empty intervals.
    "q26_interval_join" -> Q(
      (s, d) => {
        val iv = Tables.orders(s, d).filter(col("o_orderkey") % 500 === 0)
          .select("o_orderkey", "o_orderdate")
        val li = Tables.lineitem(s, d)
        // binned path rather than broadcast BNLJ (q73 gates that op): even
        // with a broadcastable interval side, the BNLJ evaluates every
        // interval predicate against every fact — O(|facts|·|intervals|).
        // Binning makes it a broadcast HASH join on the bin key (per-fact
        // work = bucket occupancy), measured 5× on this query at sf0.1;
        // bin = the 30-day interval length, so each interval spans ≤2 bins.
        val matched = JoinOps.binnedRangeJoin(li, iv, col("l_shipdate"),
            col("o_orderdate"), col("o_orderdate") + expr("INTERVAL 30 DAYS"),
            binSeconds = 30L * 86400)
          .groupBy("o_orderkey")
          .agg(count(lit(1)).as("n_items"), sum("l_extendedprice").as("rev"))
        iv.select("o_orderkey").join(matched, Seq("o_orderkey"), "left")
          .select(col("o_orderkey"),
            coalesce(col("n_items"), lit(0L)).as("n_items"),
            dec4(col("rev")).as("rev"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, count(l_orderkey) AS n_items,
             |floor((sum(l_extendedprice)) * 10000.0 + 0.500618034) / 10000.0 AS rev
             |FROM (SELECT * FROM orders WHERE o_orderkey % 500 = 0) o
             |LEFT JOIN lineitem
             |  ON l_shipdate >= o_orderdate
             | AND l_shipdate < o_orderdate + INTERVAL 30 DAY
             |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin)),

    // J4: look-back labeling — "error within next 24 h" per user, expressed
    // as a following-frame window min (reference `accretion_next_24h`,
    // `simple_pre_processing.py:520-535`). No join at all: one partitioned sort.
    "q27_lookback_label" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(1, Long.MaxValue)
        val nextErr = min(when(col("event_type") === "error", col("ts"))).over(w)
        Tables.events(s, d)
          .withColumn("error_next_24h",
            when(nextErr.isNotNull && nextErr <= col("ts") + expr("INTERVAL 24 HOURS"), 1)
              .otherwise(0))
          .select("event_id", "user_id", "ts", "error_next_24h")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, ts,
             |coalesce(CAST(min(CASE WHEN event_type = 'error' THEN ts END) OVER (
             |  PARTITION BY user_id ORDER BY ts, event_id
             |  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
             |  <= ts + INTERVAL 24 HOUR AS INT), 0) AS error_next_24h
             |FROM events ORDER BY event_id""".stripMargin)),

    // J5: per-day severity curve inside interval windows (reference
    // `get_active_accretions` `((t-t0)/(t1-t0))^1.5`, `data_generator.py:131-151`),
    // via sequence+explode of each interval's day range.
    "q28_interval_severity" -> Q(
      (s, d) => Tables.orders(s, d).filter(col("o_orderkey") % 500 === 0)
        .select(col("o_orderkey"), col("o_orderdate"),
          explode(expr("sequence(o_orderdate, o_orderdate + interval 29 days, interval 1 day)")).as("day"))
        .withColumn("severity", dec6(JoinOps.severity(col("day"), col("o_orderdate"),
          col("o_orderdate") + expr("INTERVAL 30 DAYS"))))
        .select("o_orderkey", "day", "severity")
        .orderBy("o_orderkey", "day"),
      Some("""WITH iv AS (SELECT o_orderkey, o_orderdate,
             |  unnest(generate_series(o_orderdate, o_orderdate + INTERVAL 29 DAY,
             |    INTERVAL 1 DAY)) AS day
             |  FROM orders WHERE o_orderkey % 500 = 0)
             |SELECT o_orderkey, day,
             |floor((pow(least(date_diff('second', o_orderdate, day) / 2592000.0, 1.0), 1.5)) * 1000000.0 + 0.500618034) / 1000000.0
             |  AS severity
             |FROM iv ORDER BY o_orderkey, day""".stripMargin)),

    // T5/R1: the reference's central artifact — one wide aligned hourly
    // matrix: grid ⟕ per-type hourly means pivoted to columns, forward-filled
    // (`align_time_series`, `pre_processing.py:180-243`). Pivot uses an
    // explicit value list (no discovery pass).
    "q29_align_wide" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val types = Seq("click", "error", "purchase", "signup", "view")
        val hourlyWide = ev
          .groupBy(date_trunc("hour", col("ts")).as("ts"))
          .pivot("event_type", types).agg(avg("value"))
        val grid = TimeSeriesOps.timeline(ev, "ts")
        val w = Window.orderBy("ts") // post-aggregation grid: ≤ #hours rows
        val joined = grid.join(hourlyWide, Seq("ts"), "left")
        types.foldLeft(joined) { (df, t) =>
            df.withColumn(t, graft.operators.WindowOps.ffill(col(t), w))
          }
          .select(col("ts") +: types.map(t => dec4(col(t)).as(s"v_$t")): _*)
          .orderBy("ts")
      },
      Some(s"""WITH $sqlGrid,
              |$sqlHourly,
              |wide AS (SELECT ts,
              |  avg(CASE WHEN event_type = 'click' THEN v END) AS click,
              |  avg(CASE WHEN event_type = 'error' THEN v END) AS error,
              |  avg(CASE WHEN event_type = 'purchase' THEN v END) AS purchase,
              |  avg(CASE WHEN event_type = 'signup' THEN v END) AS signup,
              |  avg(CASE WHEN event_type = 'view' THEN v END) AS view
              |  FROM hourly GROUP BY ts)
              |SELECT g.ts,
              |  floor((last_value(w.click IGNORE NULLS) OVER win) * 10000.0 + 0.500618034) / 10000.0 AS v_click,
              |  floor((last_value(w.error IGNORE NULLS) OVER win) * 10000.0 + 0.500618034) / 10000.0 AS v_error,
              |  floor((last_value(w.purchase IGNORE NULLS) OVER win) * 10000.0 + 0.500618034) / 10000.0 AS v_purchase,
              |  floor((last_value(w.signup IGNORE NULLS) OVER win) * 10000.0 + 0.500618034) / 10000.0 AS v_signup,
              |  floor((last_value(w.view IGNORE NULLS) OVER win) * 10000.0 + 0.500618034) / 10000.0 AS v_view
              |FROM grid g LEFT JOIN wide w ON g.ts = w.ts
              |WINDOW win AS (ORDER BY g.ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |ORDER BY g.ts""".stripMargin)),

    // Cadence diagnostic (reference pd.infer_freq, pre_processing.py:396):
    // modal inter-arrival gap per raw series (irregular -> inferred freq
    // null, the reference's fall-back-to-hourly branch) plus the hourly
    // grid as a perfectly-regular series (inferred freq = 3.6e9 us).
    "q78_cadence" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val grid = TimeSeriesOps.timeline(ev, "ts")
          .withColumn("event_type", lit("__hourly_grid__"))
        TimeSeriesOps.inferCadence(ev, Seq("event_type"), "ts")
          .union(TimeSeriesOps.inferCadence(grid, Seq("event_type"), "ts"))
          .orderBy("event_type")
      },
      Some(s"""WITH $sqlGrid,
              |gp AS (
              |  SELECT event_type,
              |    epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP)))
              |      OVER (PARTITION BY event_type ORDER BY ts) AS gap
              |  FROM events
              |  UNION ALL
              |  SELECT '__hourly_grid__' AS event_type,
              |    epoch_us(ts) - lag(epoch_us(ts)) OVER (ORDER BY ts) AS gap
              |  FROM grid),
              |c AS (SELECT event_type, gap, count(*) AS cnt
              |  FROM gp WHERE gap IS NOT NULL GROUP BY 1, 2),
              |m AS (SELECT event_type, gap,
              |    row_number() OVER (PARTITION BY event_type ORDER BY cnt DESC, gap ASC) AS rn,
              |    count(*) OVER (PARTITION BY event_type) AS n
              |  FROM c)
              |SELECT event_type, gap AS modal_gap_us, CAST(n AS BIGINT) AS n_gap_values,
              |  CASE WHEN n = 1 AND gap > 0 THEN gap END AS inferred_freq_us
              |FROM m WHERE rn = 1 ORDER BY event_type""".stripMargin)),

    // J3 at large-large scale: the same point-in-interval labeling as q26
    // but WITHOUT broadcasting the interval side — range BINNING turns the
    // non-equi join into a hash equi-join on a time-bucket key
    // (JoinOps.binnedRangeJoin; 15-day bins against 30-day intervals →
    // ≤ 3 bin rows per interval). This is the shape that survives when the
    // interval side is itself a 100 TB-scale event log. MEASURED at sf0.1:
    // at 10× the q26 interval density (%50 → 21.6M matched pairs) the
    // binned equi-join ran 5.2 s where the broadcast BNLJ took 91 s (17×);
    // the gate uses %150 to keep the bench suite lean, the ratio holds.
    // OHLC resample bars (pandas `resample('h').ohlc()`): candlestick
    // summary per series per hour — open/close via min_by/max_by over the
    // (ts, event_id) struct, so the whole bar table is ONE map-side-
    // combinable hash aggregate: no window, no per-bucket sort, cost scales
    // with bar cardinality, not event count. Oracle re-derives open/close
    // with a (ts, event_id)-ordered row_number, the same total order.
    "q245_ohlc_bars" -> Q(
      (s, d) => TimeSeriesOps.ohlcBars(Tables.events(s, d),
          "event_type", "ts", "event_id", "value", truncUnit = "hour")
        .select(col("event_type"), col("bar_ts"), col("open"), col("high"),
          col("low"), col("close"), col("n_rows"),
          dec6(col("mean_value")).as("mean_value"))
        .orderBy("event_type", "bar_ts"),
      Some(s"""WITH r AS (SELECT event_type, date_trunc('hour', ts) AS bar_ts,
              |  value,
              |  row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
              |    ORDER BY ts, event_id) AS ra,
              |  row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
              |    ORDER BY ts DESC, event_id DESC) AS rd
              |  FROM events)
              |SELECT event_type, bar_ts,
              |  max(CASE WHEN ra = 1 THEN value END) AS open,
              |  max(value) AS high, min(value) AS low,
              |  max(CASE WHEN rd = 1 THEN value END) AS close,
              |  count(*) AS n_rows, ${r6("avg(value)")} AS mean_value
              |FROM r GROUP BY 1, 2
              |ORDER BY event_type, bar_ts""".stripMargin)),

    "q104_range_binned" -> Q(
      (s, d) => {
        val iv = Tables.orders(s, d).filter(col("o_orderkey") % 150 === 0)
          .select("o_orderkey", "o_orderdate")
        val li = Tables.lineitem(s, d).select("l_shipdate", "l_extendedprice")
        JoinOps.binnedRangeJoin(li, iv, col("l_shipdate"),
            col("o_orderdate"), col("o_orderdate") + expr("INTERVAL 30 DAYS"),
            binSeconds = 15L * 86400)
          .groupBy("o_orderkey")
          .agg(count(lit(1)).as("n_items"), dec4(sum("l_extendedprice")).as("rev"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, count(*) AS n_items,
             |floor((sum(l_extendedprice)) * 10000.0 + 0.500618034) / 10000.0 AS rev
             |FROM (SELECT * FROM orders WHERE o_orderkey % 150 = 0) o
             |JOIN lineitem
             |  ON l_shipdate >= o_orderdate
             | AND l_shipdate < o_orderdate + INTERVAL 30 DAY
             |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin))
  )
}
