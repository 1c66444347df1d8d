package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{CorpusOps, TimeSeriesOps, WindowOps}
import Q.{dec4, dec6, r4, r6}
import scala.collection.immutable.ListMap

/** Coverage completions for SURVEY §2 items not exercised elsewhere:
  * daily truth rollup with list aggregation (A11 + the ZONES_AFFECTED
  * array mapping), adjacent-series conjunction patterns (W9), scaler
  * transforms (§2.12), and the KNN-imputation substitution via per-series
  * median + ffill (§2.12, documented deviation). */
object ExtrasQ {

  /** q209/q213 gate fixture: the hourly wide matrix (ffill → pivot →
    * complete-rows filter) with deterministic md5-nibble dropout (~1/8 of
    * hours) planted on the click column. */
  private def knnGateMatrix(s: org.apache.spark.sql.SparkSession,
                            d: String): org.apache.spark.sql.DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val wS = Window.partitionBy("event_type").orderBy("ts")
    val filled = TimeSeriesQ.aligned(s, d)
      .withColumn("vf", WindowOps.ffill(col("v"), wS))
    val wide = filled.groupBy(col("ts").as("h"))
      .pivot("event_type", types).agg(first("vf"))
      .filter(types.map(t => col(t).isNotNull).reduce(_ && _))
    val hs = (unix_micros(col("h")) / lit(3600000000L)).cast("long")
    wide.withColumn("click",
      when(conv(substring(md5(hs.cast("string")), 1, 1), 16, 10)
        .cast("int") < 2, lit(null).cast("double"))
        .otherwise(col("click")))
  }

  /** Shared exact-KNN oracle for q209 AND its LSH twin q213 (bucketed ≡
    * exact on this matrix is the spec-pinned contract). */
  private val knnImputeOracle: String =
    s"""WITH ${TimeSeriesQ.sqlAligned},
       |ff AS (SELECT ts, event_type,
       |  last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY ts
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vf
       |  FROM aligned),
       |wide AS (SELECT ts AS h,
       |  max(CASE WHEN event_type = 'click' THEN vf END) AS click,
       |  max(CASE WHEN event_type = 'error' THEN vf END) AS error,
       |  max(CASE WHEN event_type = 'purchase' THEN vf END) AS purchase,
       |  max(CASE WHEN event_type = 'signup' THEN vf END) AS signup,
       |  max(CASE WHEN event_type = 'view' THEN vf END) AS view
       |  FROM ff GROUP BY ts),
       |base AS (SELECT * FROM wide WHERE click IS NOT NULL
       |  AND error IS NOT NULL AND purchase IS NOT NULL
       |  AND signup IS NOT NULL AND view IS NOT NULL),
       |dropped AS (SELECT h,
       |  CASE WHEN strpos('0123456789abcdef', substring(md5(
       |    CAST(CAST(epoch_us(h) / 3600000000 AS BIGINT) AS VARCHAR)), 1, 1)) - 1 < 2
       |  THEN NULL ELSE click END AS click,
       |  error, purchase, signup, view FROM base),
       |m AS (SELECT h, error, purchase, signup, view FROM dropped
       |  WHERE click IS NULL),
       |c AS (SELECT h, click, error, purchase, signup, view FROM dropped
       |  WHERE click IS NOT NULL),
       |pairs AS (SELECT m.h AS mk, c.h AS ck, c.click AS tv,
       |  ${r6("""sqrt((m.error - c.error) * (m.error - c.error)
       |    + (m.purchase - c.purchase) * (m.purchase - c.purchase)
       |    + (m.signup - c.signup) * (m.signup - c.signup)
       |    + (m.view - c.view) * (m.view - c.view))""")} AS dd
       |  FROM m CROSS JOIN c),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY mk
       |    ORDER BY dd, ck) AS r FROM pairs),
       |imp AS (SELECT mk, avg(tv) AS iv FROM rk WHERE r <= 5 GROUP BY mk)
       |SELECT h, ${r6("iv")} AS click, 1 AS was_missing
       |FROM m JOIN imp ON m.h = imp.mk
       |UNION ALL
       |SELECT h, ${r6("click")} AS click, 0 AS was_missing FROM c
       |ORDER BY h""".stripMargin

  val queries: ListMap[String, Q] = ListMap(

    // A11 + §1.4 array mapping: daily rollup — count, max, and the
    // comma-joined entity list (`accretion_truth`, `data_generator.py:1013-1029`,
    // ZONES_AFFECTED at `:1022`). Sorted-set join keeps it deterministic.
    "q19_daily_rollup" -> Q(
      (s, d) => Tables.events(s, d)
        .filter(col("event_type") === "error")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(
          count(lit(1)).as("n_events"),
          dec4(max("value")).as("max_value"),
          countDistinct(col("user_id")).as("n_users"),
          concat_ws(",", array_sort(collect_set(col("user_id").cast("string"))))
            .as("users_affected"))
        .orderBy("day"),
      Some(s"""SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_events,
              |${r4("max(value)")} AS max_value,
              |count(DISTINCT user_id) AS n_users,
              |array_to_string(list_sort(list_distinct(list(CAST(user_id AS VARCHAR)))), ',')
              |  AS users_affected
              |FROM events WHERE event_type = 'error'
              |GROUP BY 1 ORDER BY day""".stripMargin)),

    // W9: multi-column conjunction pattern — adjacent series cooling
    // simultaneously (`pre_processing.py:948-966`): per-hour count of
    // adjacent type-pairs both below their trailing mean.
    "q42_adjacent_pattern" -> Q(
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val wide = Tables.events(s, d)
          .groupBy(date_trunc("hour", col("ts")).as("ts"))
          .pivot("event_type", types).agg(avg("value"))
        val w = Window.orderBy("ts") // hourly grid
        val cooled = types.foldLeft(wide) { (df, t) =>
          df.withColumn(s"c_$t",
            when(col(t) < avg(col(t)).over(w.rowsBetween(-24, -1)), 1).otherwise(0))
        }
        val pairFlags = types.sliding(2).map { case Seq(a, b) =>
          (col(s"c_$a") === 1 && col(s"c_$b") === 1).cast("int")
        }.toSeq
        cooled
          .withColumn("adjacent_pairs_cooling", pairFlags.reduce(_ + _))
          .withColumn("any_adjacent", (col("adjacent_pairs_cooling") > 0).cast("int"))
          .select("ts", "adjacent_pairs_cooling", "any_adjacent")
          .orderBy("ts")
      },
      Some("""WITH wide AS (SELECT date_trunc('hour', ts) AS ts,
             |  avg(CASE WHEN event_type = 'click' THEN value END) AS click,
             |  avg(CASE WHEN event_type = 'error' THEN value END) AS error,
             |  avg(CASE WHEN event_type = 'purchase' THEN value END) AS purchase,
             |  avg(CASE WHEN event_type = 'signup' THEN value END) AS signup,
             |  avg(CASE WHEN event_type = 'view' THEN value END) AS view
             |  FROM events GROUP BY 1),
             |c AS (SELECT ts,
             |  CASE WHEN click < avg(click) OVER w THEN 1 ELSE 0 END AS c_click,
             |  CASE WHEN error < avg(error) OVER w THEN 1 ELSE 0 END AS c_error,
             |  CASE WHEN purchase < avg(purchase) OVER w THEN 1 ELSE 0 END AS c_purchase,
             |  CASE WHEN signup < avg(signup) OVER w THEN 1 ELSE 0 END AS c_signup,
             |  CASE WHEN view < avg(view) OVER w THEN 1 ELSE 0 END AS c_view
             |  FROM wide
             |  WINDOW w AS (ORDER BY ts ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
             |p AS (SELECT ts,
             |  (CASE WHEN c_click = 1 AND c_error = 1 THEN 1 ELSE 0 END
             |   + CASE WHEN c_error = 1 AND c_purchase = 1 THEN 1 ELSE 0 END
             |   + CASE WHEN c_purchase = 1 AND c_signup = 1 THEN 1 ELSE 0 END
             |   + CASE WHEN c_signup = 1 AND c_view = 1 THEN 1 ELSE 0 END)
             |  AS adjacent_pairs_cooling FROM c)
             |SELECT ts, adjacent_pairs_cooling,
             |CASE WHEN adjacent_pairs_cooling > 0 THEN 1 ELSE 0 END AS any_adjacent
             |FROM p ORDER BY ts""".stripMargin)),

    // §2.12 scalers: standard/min-max/robust scaling as plain aggregates
    // (`pre_processing.py:288-315`) — grouped stats cross-joined back.
    "q43_scaling" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d).filter(col("l_orderkey") % 100 === 0)
        val stats = li.groupBy("l_returnflag").agg(
          avg("l_quantity").as("m"), stddev_samp(col("l_quantity")).as("sd"),
          min("l_quantity").as("mn"), max("l_quantity").as("mx"),
          expr("percentile(l_quantity, 0.5)").as("med"),
          expr("percentile(l_quantity, 0.75) - percentile(l_quantity, 0.25)").as("iqr"))
        li.join(stats, "l_returnflag")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            dec6(when(col("sd") > 0, (col("l_quantity") - col("m")) / col("sd"))).as("z_std"),
            dec6(when(col("mx") =!= col("mn"),
              (col("l_quantity") - col("mn")) / (col("mx") - col("mn")))).as("z_minmax"),
            dec6(when(col("iqr") > 0, (col("l_quantity") - col("med")) / col("iqr"))).as("z_robust"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some(s"""WITH li AS (SELECT * FROM lineitem WHERE l_orderkey % 100 = 0),
              |st AS (SELECT l_returnflag, avg(l_quantity) AS m,
              |  stddev_samp(l_quantity) AS sd, min(l_quantity) AS mn, max(l_quantity) AS mx,
              |  quantile_cont(l_quantity, 0.5) AS med,
              |  quantile_cont(l_quantity, 0.75) - quantile_cont(l_quantity, 0.25) AS iqr
              |  FROM li GROUP BY 1)
              |SELECT l_orderkey, l_linenumber, li.l_returnflag,
              |${r6("CASE WHEN sd > 0 THEN (l_quantity - m) / sd END")} AS z_std,
              |${r6("CASE WHEN mx <> mn THEN (l_quantity - mn) / (mx - mn) END")} AS z_minmax,
              |${r6("CASE WHEN iqr > 0 THEN (l_quantity - med) / iqr END")} AS z_robust
              |FROM li JOIN st ON li.l_returnflag = st.l_returnflag
              |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // S7: JSON ser/de of row payloads (reference frame<->json callback bus,
    // `dashboard.py:798-806`): struct -> compact JSON string -> field
    // extraction roundtrip; Spark and DuckDB emit the same compact format
    // for int/string fields.
    "q48_json_roundtrip" -> Q(
      (s, d) => Tables.events(s, d)
        .filter(col("event_id") % 200 === 0)
        .withColumn("js", to_json(struct(col("event_id"), col("event_type"))))
        .withColumn("rt_type", get_json_object(col("js"), "$.event_type"))
        .withColumn("rt_id", get_json_object(col("js"), "$.event_id").cast("long"))
        .select("event_id", "js", "rt_type", "rt_id")
        .orderBy("event_id"),
      Some("""SELECT event_id,
             |to_json(struct_pack(event_id := event_id, event_type := event_type)) AS js,
             |json_extract_string(to_json(struct_pack(event_id := event_id,
             |  event_type := event_type)), '$.event_type') AS rt_type,
             |CAST(json_extract_string(to_json(struct_pack(event_id := event_id,
             |  event_type := event_type)), '$.event_id') AS BIGINT) AS rt_id
             |FROM events WHERE event_id % 200 = 0 ORDER BY event_id""".stripMargin)),

    // §2.12 KNN-imputation substitution (documented deviation, SURVEY
    // §7.4-4): sparse grid slots filled by ffill, remaining leading nulls by
    // the per-series median — the reference's own fallback modes
    // (`pre_processing.py:274-279`).
    "q44_impute" -> Q(
      (s, d) => {
        val a = TimeSeriesQ.aligned(s, d)
        val w = Window.partitionBy("event_type").orderBy("ts")
        val med = Window.partitionBy("event_type")
        a.withColumn("v_ff", WindowOps.ffill(col("v"), w))
          .withColumn("med", expr("percentile(v, 0.5)").over(med))
          .select(col("ts"), col("event_type"),
            dec4(coalesce(col("v_ff"), col("med"))).as("v_imputed"))
          .orderBy("ts", "event_type")
      },
      Some(s"""WITH ${TimeSeriesQ.sqlAligned},
              |x AS (SELECT ts, event_type,
              |  last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY ts
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ff,
              |  quantile_cont(v, 0.5) OVER (PARTITION BY event_type) AS med
              |  FROM aligned)
              |SELECT ts, event_type, ${r4("coalesce(v_ff, med)")} AS v_imputed
              |FROM x ORDER BY ts, event_type""".stripMargin)),

    // §2.11's session semantics in batch form (gaps-and-islands): the
    // oracle-gated twin of the streaming `Sessionize.sessionize` — same
    // 12 h idle gap, same boundaries; SessionizeSpec cross-validates the
    // two paths row-for-row on a closed input.
    "q88_sessionize" -> Q(
      (s, d) => graft.streaming.Sessionize.sessionizeBatch(
          Tables.events(s, d), "user_id", "ts", "value", "event_id",
          gapSeconds = 12L * 3600)
        .select(col("user_id"), col("session_idx"), col("n_events"),
          col("session_start"), col("session_end"),
          dec6(col("sum_value")).as("sum_value"))
        .orderBy("user_id", "session_idx"),
      Some(s"""WITH e AS (SELECT user_id, event_id, ts, value, epoch_us(ts) AS us
              |  FROM events),
              |marked AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
              |    OR us - lag(us) OVER w > 43200000000 THEN 1 ELSE 0 END AS new_sess
              |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
              |numbered AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id
              |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS session_idx
              |  FROM marked)
              |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
              |  count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end,
              |  ${r6("sum(value)")} AS sum_value
              |FROM numbered GROUP BY user_id, session_idx
              |ORDER BY user_id, session_idx""".stripMargin)),

    // KNN imputation (closes SURVEY §7.4-4's documented deviation): the
    // reference's KNNImputer(n_neighbors=5) over the hourly wide matrix.
    // Dropout is planted deterministically (md5 nibble of the hour, ~1/8
    // of rows — the CorpusFixture convention) on the click column; each
    // missing cell takes the mean of the 5 euclidean-nearest complete
    // hours on the other four series. Neighbor sets rank on rounded
    // distances with hour tiebreaks, so both engines pick identically.
    "q209_knn_impute" -> Q(
      (s, d) => graft.operators.ImputeOps.knnImputeColumn(knnGateMatrix(s, d),
          "h", featureCols = Seq("error", "purchase", "signup", "view"),
          targetCol = "click", k = 5, scoreOut = dec6)
        .orderBy("h"),
      Some(knnImputeOracle)),

    // The LSH-prefiltered twin of q209 (the wide-matrix scale path:
    // sign-LSH buckets over standardized features, multiprobe Hamming ≤ 2
    // as a pure equi-join, exact distance within candidates). Shares
    // q209's EXACT oracle on purpose: bucketed ≡ exact on this matrix is
    // the spec-pinned contract (ImputeOpsSpec), so a recall regression in
    // the prefilter shows up here as a hash mismatch, not just a slower
    // plan.
    "q213_knn_impute_lsh" -> Q(
      (s, d) => graft.operators.ImputeOps.knnImputeColumnLsh(
          knnGateMatrix(s, d), "h",
          featureCols = Seq("error", "purchase", "signup", "view"),
          targetCol = "click", k = 5, scoreOut = dec6)
        .orderBy("h"),
      Some(knnImputeOracle)),

    // Last-touch attribution: purchase value credited to the user's most
    // recent prior non-purchase event type — revenue by acquisition
    // touchpoint, conservation guaranteed via the "(none)" bucket.
    "q216_last_touch" -> Q(
      (s, d) => graft.operators.EventOps.lastTouchAttribution(
          Tables.events(s, d), "user_id", "ts", "event_id", "event_type",
          "value", conversionType = "purchase", scoreOut = dec6)
        .orderBy("channel"),
      Some(s"""WITH t AS (SELECT user_id, ts, event_id, event_type, value,
              |  last_value(CASE WHEN event_type <> 'purchase'
              |      THEN event_type END IGNORE NULLS) OVER (
              |    PARTITION BY user_id ORDER BY ts, event_id
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
              |  FROM events)
              |SELECT coalesce(touch, '(none)') AS channel,
              |  count(*) AS n_conversions, ${r6("sum(value)")} AS revenue
              |FROM t WHERE event_type = 'purchase'
              |GROUP BY 1 ORDER BY channel""".stripMargin)),

    // Linear multi-touch attribution: each purchase's value split equally
    // across the touches since the previous purchase — q216's fairness
    // counterpart; the two bracket any position-weighted scheme. Revenue
    // is conserved (the "(none)" bucket keeps untouched conversions).
    "q229_linear_touch" -> Q(
      (s, d) => graft.operators.EventOps.linearAttribution(
          Tables.events(s, d), "user_id", "ts", "event_id", "event_type",
          "value", conversionType = "purchase", scoreOut = dec6)
        .orderBy("channel"),
      Some(s"""WITH e AS (SELECT user_id, ts, event_id, event_type,
              |  CAST(value AS DOUBLE) AS v,
              |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isc
              |  FROM events),
              |g AS (SELECT *, sum(isc) OVER (PARTITION BY user_id
              |    ORDER BY ts DESC, event_id DESC
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
              |  FROM e),
              |f AS (SELECT * FROM g WHERE grp > 0),
              |w AS (SELECT *,
              |  max(CASE WHEN isc = 1 THEN v END)
              |    OVER (PARTITION BY user_id, grp) AS cv,
              |  sum(1 - isc) OVER (PARTITION BY user_id, grp) AS nt FROM f),
              |c AS (SELECT
              |  CASE WHEN isc = 0 THEN event_type ELSE '(none)' END AS channel,
              |  CASE WHEN isc = 0 THEN cv / nt
              |       WHEN nt = 0 THEN v END AS credit FROM w)
              |SELECT channel, count(*) AS n_touches,
              |  ${r6("sum(credit)")} AS revenue
              |FROM c WHERE credit IS NOT NULL
              |GROUP BY 1 ORDER BY channel""".stripMargin)),

    // Time-decay attribution — the third of the attribution family:
    // 0.5^(Δh/halfLife) per touch, normalized within the conversion
    // group; recency rewarded smoothly vs linear's equal split.
    "q241_time_decay_touch" -> Q(
      (s, d) => graft.operators.EventOps.timeDecayAttribution(
          Tables.events(s, d), "user_id", "ts", "event_id", "event_type",
          "value", conversionType = "purchase", halfLifeHours = 24.0,
          scoreOut = dec6)
        .orderBy("channel"),
      Some(s"""WITH e AS (SELECT user_id, ts, event_id, event_type,
              |  CAST(value AS DOUBLE) AS v, epoch_us(ts) AS us,
              |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isc
              |  FROM events),
              |g AS (SELECT *, sum(isc) OVER (PARTITION BY user_id
              |    ORDER BY ts DESC, event_id DESC
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
              |  FROM e),
              |f AS (SELECT * FROM g WHERE grp > 0),
              |w0 AS (SELECT *,
              |  max(CASE WHEN isc = 1 THEN v END)
              |    OVER (PARTITION BY user_id, grp) AS cv,
              |  max(CASE WHEN isc = 1 THEN us END)
              |    OVER (PARTITION BY user_id, grp) AS cus FROM f),
              |w1 AS (SELECT *,
              |  CASE WHEN isc = 0 THEN
              |    power(0.5, CAST(cus - us AS DOUBLE) / (3600e6 * 24.0)) END
              |    AS wt FROM w0),
              |w2 AS (SELECT *,
              |  sum(wt) OVER (PARTITION BY user_id, grp) AS sw FROM w1),
              |c AS (SELECT
              |  CASE WHEN isc = 0 THEN event_type ELSE '(none)' END AS channel,
              |  CASE WHEN isc = 0 THEN cv * wt / sw
              |       WHEN sw IS NULL THEN v END AS credit FROM w2)
              |SELECT channel, count(*) AS n_touches,
              |  ${r6("sum(credit)")} AS revenue
              |FROM c WHERE credit IS NOT NULL
              |GROUP BY 1 ORDER BY channel""".stripMargin)),

    // SCD2 as-of reconstruction: the per-user dimension state at one
    // instant, recovered from q145's [valid_from, valid_to) intervals —
    // the read side of slowly-changing dimensions ("what did the table
    // look like on Jan 15"), and the batch twin of time-travel reads.
    // The interval predicate prunes to at most one row per user.
    "q230_scd2_asof" -> Q(
      (s, d) => {
        val asOfUs = lit(1705276800000000L) // 2024-01-15T00:00:00Z
        graft.operators.EventOps.scd2Build(
            Tables.events(s, d), "user_id", "ts", "event_id", "event_type")
          .filter(col("valid_from_us") <= asOfUs &&
            (col("valid_to_us").isNull || col("valid_to_us") > asOfUs))
          .select(col("user_id"), col("state"), col("valid_from_us"))
          .orderBy("user_id")
      },
      Some("""WITH x AS (SELECT user_id, event_type AS state,
             |  epoch_us(ts) AS ts_us, event_id,
             |  lag(event_type) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id) AS prev_state FROM events),
             |ch AS (SELECT user_id, state, ts_us, event_id FROM x
             |  WHERE prev_state IS NULL OR state <> prev_state),
             |f AS (SELECT user_id, state, ts_us AS valid_from_us,
             |  lead(ts_us) OVER (PARTITION BY user_id
             |    ORDER BY ts_us, event_id) AS valid_to_us FROM ch)
             |SELECT user_id, state, valid_from_us FROM f
             |WHERE valid_from_us <= 1705276800000000
             |  AND (valid_to_us IS NULL OR valid_to_us > 1705276800000000)
             |ORDER BY user_id""".stripMargin)),

    // Session-depth distribution: how many sessions have k events, plus
    // per-depth duration stats — the engagement-depth histogram over
    // q88's sessionization (sessions collapse to one row each first, so
    // the distribution aggregate is session-sized, not event-sized).
    "q207_session_depth" -> Q(
      (s, d) => graft.streaming.Sessionize.sessionizeBatch(
          Tables.events(s, d), "user_id", "ts", "value", "event_id",
          gapSeconds = 12L * 3600)
        .withColumn("dur_h",
          (unix_micros(col("session_end")) - unix_micros(col("session_start")))
            / lit(3600e6))
        .groupBy(col("n_events").as("depth"))
        .agg(count(lit(1)).as("n_sessions"),
          dec6(avg("dur_h")).as("mean_duration_h"),
          dec6(max("dur_h")).as("max_duration_h"))
        .orderBy("depth"),
      Some(s"""WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us
              |  FROM events),
              |marked AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
              |    OR us - lag(us) OVER w > 43200000000 THEN 1 ELSE 0 END AS new_sess
              |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
              |numbered AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id
              |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS session_idx
              |  FROM marked),
              |sess AS (SELECT user_id, session_idx, count(*) AS depth,
              |  (max(us) - min(us)) / 3600e6 AS dur_h
              |  FROM numbered GROUP BY user_id, session_idx)
              |SELECT depth, count(*) AS n_sessions,
              |  ${r6("avg(dur_h)")} AS mean_duration_h,
              |  ${r6("max(dur_h)")} AS max_duration_h
              |FROM sess GROUP BY depth ORDER BY depth""".stripMargin)),

    // Anomaly episodes: consecutive anomalous hours merged into incidents
    // (gaps-and-islands over q195's seasonal-adjusted flags) — pagers act
    // on EPISODES with a start, an end and a peak, not on hourly points.
    "q208_anomaly_episodes" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wS = Window.partitionBy("event_type")
        val dec = graft.operators.SeasonalOps.stlDecompose(
          Tables.events(s, d), "event_type", "ts", "value", halfWin = 12,
          scoreOut = dec6)
        val flagged = dec
          .withColumn("mu", avg("residual").over(wS))
          .withColumn("sd",
            sqrt(avg(col("residual") * col("residual")).over(wS) -
              avg(col("residual")).over(wS) * avg(col("residual")).over(wS)))
          .withColumn("z", (col("residual") - col("mu")) / col("sd"))
          .filter(abs(col("z")) > 3.0)
        val wI = Window.partitionBy("event_type").orderBy("h")
        flagged
          .withColumn("prev_h", lag("h", 1).over(wI))
          .withColumn("brk",
            when(col("prev_h").isNull ||
              unix_micros(col("h")) - unix_micros(col("prev_h")) > 3600e6, 1)
              .otherwise(0))
          .withColumn("episode",
            sum("brk").over(wI.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("event_type", "episode")
          .agg(min("h").as("episode_start"), max("h").as("episode_end"),
            count(lit(1)).as("n_hours"),
            dec6(max(abs(col("z")))).as("peak_abs_z"))
          .orderBy("event_type", "episode")
      },
      Some(s"""WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
              |  avg(CAST(value AS DOUBLE)) AS y FROM events GROUP BY 1, 2),
              |tr AS (SELECT event_type, h, y,
              |  avg(y) OVER (PARTITION BY event_type ORDER BY h
              |    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS trend
              |  FROM hourly),
              |se AS (SELECT event_type, h, y, trend,
              |  avg(y - trend) OVER (PARTITION BY event_type, hour(h)) AS s_raw
              |  FROM tr),
              |ce AS (SELECT event_type, h,
              |  ${r6("""y - trend
              |    - (s_raw - avg(s_raw) OVER (PARTITION BY event_type))""")} AS residual
              |  FROM se),
              |zz AS (SELECT event_type, h, residual,
              |  avg(residual) OVER (PARTITION BY event_type) AS mu,
              |  sqrt(avg(residual * residual) OVER (PARTITION BY event_type)
              |    - avg(residual) OVER (PARTITION BY event_type)
              |      * avg(residual) OVER (PARTITION BY event_type)) AS sd
              |  FROM ce),
              |fl AS (SELECT event_type, h, (residual - mu) / sd AS z FROM zz
              |  WHERE abs((residual - mu) / sd) > 3.0),
              |mk AS (SELECT *, CASE WHEN lag(h) OVER w IS NULL
              |    OR epoch_us(h) - epoch_us(lag(h) OVER w) > 3600e6 THEN 1 ELSE 0 END
              |    AS brk
              |  FROM fl WINDOW w AS (PARTITION BY event_type ORDER BY h)),
              |ep AS (SELECT *, sum(brk) OVER (PARTITION BY event_type ORDER BY h
              |    ROWS UNBOUNDED PRECEDING) AS episode FROM mk)
              |SELECT event_type, CAST(episode AS BIGINT) AS episode,
              |  min(h) AS episode_start, max(h) AS episode_end,
              |  count(*) AS n_hours, ${r6("max(abs(z))")} AS peak_abs_z
              |FROM ep GROUP BY event_type, episode
              |ORDER BY event_type, episode""".stripMargin)),

    // SkewOps in the gate: salted two-phase aggregation over the skewed
    // event_type key must be EXACTLY the plain group-by (algebraic
    // aggregates recombine losslessly) — the oracle is that plain group-by.
    "q89_salted_agg" -> Q(
      (s, d) => {
        import graft.operators.SkewOps
        SkewOps.saltedAgg(Tables.events(s, d), Seq("event_type"), nSalts = 8,
            Seq(SkewOps.countAll("n"), SkewOps.sumOf("value", "sum_value"),
              SkewOps.minOf("value", "min_value"), SkewOps.maxOf("value", "max_value")))
          .select(col("event_type"), col("n"),
            dec6(col("sum_value")).as("sum_value"),
            col("min_value"), col("max_value"))
          .orderBy("event_type")
      },
      Some(s"""SELECT event_type, count(*) AS n,
              |${r6("sum(value)")} AS sum_value,
              |min(value) AS min_value, max(value) AS max_value
              |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Z-order clustering key (Maintenance.clusterBy's curve): Morton
    // interleave of (user_id, minute-of-epoch) — the write-time layout
    // that keeps parquet min/max tight on BOTH dimensions. Pure integer
    // shift/mask algebra, so DuckDB reproduces the key bit-for-bit; the
    // layout benefit itself is measured on real footers in ZOrderSpec.
    "q119_zorder_key" -> Q(
      (s, d) => {
        import graft.functions.ZOrder
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            expr("unix_micros(ts) div 60000000").as("minute"),
            ZOrder.zorderKey(col("user_id"),
              expr("unix_micros(ts) div 60000000"), bits = 16).as("zkey"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, user_id,
              |epoch_us(ts) // 60000000 AS minute,
              |${graft.functions.ZOrder.zorderSql("user_id", "epoch_us(ts) // 60000000")} AS zkey
              |FROM events ORDER BY event_id""".stripMargin)),

    // Cohort retention: users cohort by first-event day; n active users at
    // each day offset 0..7. The raw log collapses to distinct (user, day)
    // map-side; count(*) of those rows IS distinct users.
    "q139_retention_cohorts" -> Q(
      (s, d) => graft.operators.EventOps.retentionCohorts(
          Tables.events(s, d), "user_id", "ts", maxOffset = 7)
        // date → string for the cross-engine compare (q19 precedent: the
        // gate's column normalizer treats DATE differently per engine)
        .select(date_format(col("cohort_date"), "yyyy-MM-dd").as("cohort_day"),
          col("day_offset"), col("n_users"))
        .orderBy("cohort_day", "day_offset"),
      Some("""WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
             |  FROM events),
             |coh AS (SELECT u, d, min(d) OVER (PARTITION BY u) AS cohort_date
             |  FROM ud),
             |o AS (SELECT cohort_date,
             |  CAST(d - cohort_date AS INT) AS day_offset FROM coh
             |  WHERE d - cohort_date <= 7)
             |SELECT strftime(cohort_date, '%Y-%m-%d') AS cohort_day,
             |  day_offset, count(*) AS n_users
             |FROM o GROUP BY cohort_date, day_offset
             |ORDER BY cohort_day, day_offset""".stripMargin)),

    // Ordered funnel view → click → purchase (each step strictly after the
    // previous): Spark computes per-user completion with running window
    // minima in ONE scan; the oracle states the same semantics as stepwise
    // self-joins (min click after first view, min purchase after that).
    "q140_event_funnel" -> Q(
      (s, d) => graft.operators.EventOps.orderedFunnel(
        Tables.events(s, d), "user_id", "ts", "event_type",
        steps = ("view", "click", "purchase"), scoreOut = dec6),
      Some(s"""WITH v AS (SELECT user_id, min(ts) AS v FROM events
              |  WHERE event_type = 'view' GROUP BY user_id),
              |c AS (SELECT e.user_id, min(e.ts) AS c FROM events e
              |  JOIN v ON e.user_id = v.user_id
              |  WHERE e.event_type = 'click' AND e.ts > v.v GROUP BY e.user_id),
              |p AS (SELECT e.user_id, min(e.ts) AS p FROM events e
              |  JOIN c ON e.user_id = c.user_id
              |  WHERE e.event_type = 'purchase' AND e.ts > c.c GROUP BY e.user_id),
              |n AS (SELECT (SELECT count(*) FROM v) AS n_step1,
              |  (SELECT count(*) FROM c) AS n_step2,
              |  (SELECT count(*) FROM p) AS n_step3)
              |SELECT n_step1, n_step2, n_step3,
              |  ${r6("CAST(n_step2 AS DOUBLE) / n_step1")} AS rate_12,
              |  ${r6("CAST(n_step3 AS DOUBLE) / n_step1")} AS rate_13
              |FROM n""".stripMargin)),

    // Local peaks on the hourly error series: strictly above both
    // neighbors and above mean + 1.5 sigma — the spike inventory.
    "q177_local_peaks" -> Q(
      (s, d) => graft.operators.EventOps.localPeaks(
          Tables.events(s, d).filter(col("event_type") === "error"),
          "event_type", "ts", "value", kSigma = 1.5, scoreOut = dec6)
        .orderBy("h"),
      Some(s"""WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
              |  avg(CAST(value AS DOUBLE)) AS v FROM events
              |  WHERE event_type = 'error' GROUP BY event_type, h),
              |st AS (SELECT event_type, avg(v) AS gm, stddev_pop(v) AS gs
              |  FROM hourly GROUP BY event_type),
              |x AS (SELECT hourly.event_type, h, v,
              |  lag(v) OVER (PARTITION BY hourly.event_type ORDER BY h) AS prev_v,
              |  lead(v) OVER (PARTITION BY hourly.event_type ORDER BY h) AS next_v,
              |  gm, gs FROM hourly JOIN st USING (event_type))
              |SELECT event_type, h, ${r6("v")} AS v, ${r6("prev_v")} AS prev_v,
              |  ${r6("next_v")} AS next_v
              |FROM x WHERE prev_v IS NOT NULL AND next_v IS NOT NULL
              |  AND v > prev_v AND v > next_v AND v > gm + 1.5 * gs
              |ORDER BY h""".stripMargin)),

    // Cohort LTV curve: cumulative per-cohort value by day offset — the
    // revenue companion of q139's retention.
    "q173_cohort_ltv" -> Q(
      (s, d) => graft.operators.EventOps.cohortLtv(
          Tables.events(s, d), "user_id", "ts", "value", maxOffset = 7,
          scoreOut = dec6)
        .orderBy("cohort_day", "day_offset"),
      Some(s"""WITH ud AS (SELECT user_id AS u, CAST(ts AS DATE) AS d,
              |  count(*) AS n, sum(CAST(value AS DOUBLE)) AS dv
              |  FROM events GROUP BY u, d),
              |coh AS (SELECT u, d, dv, min(d) OVER (PARTITION BY u) AS cohort
              |  FROM ud),
              |o AS (SELECT cohort, CAST(d - cohort AS INT) AS day_offset,
              |  count(*) AS n_users, sum(dv) AS day_value FROM coh
              |  WHERE d - cohort <= 7 GROUP BY cohort, day_offset),
              |c AS (SELECT cohort, day_offset, n_users, day_value,
              |  sum(day_value) OVER (PARTITION BY cohort ORDER BY day_offset
              |    ROWS UNBOUNDED PRECEDING) AS cum_value FROM o)
              |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day, day_offset,
              |  n_users, ${r6("day_value")} AS day_value,
              |  ${r6("cum_value")} AS cum_value
              |FROM c ORDER BY cohort_day, day_offset""".stripMargin)),

    // LTTB-lite visual downsampling, 24 points PER event-type series:
    // per equal-count bucket, keep the largest-triangle point against the
    // neighbor buckets' mean anchors (fixed anchors make the sequential
    // original one distributed window pass). Multi-series gate: the rank
    // comes from the grouped range-partitioned prefix sum, never a global
    // row_number over the raw stream.
    "q175_lttb_downsample" -> Q(
      (s, d) => graft.operators.EventOps.lttbDownsample(
          Tables.events(s, d), "event_type",
          "ts", "event_id", "value", buckets = 24, scoreOut = dec6)
        .orderBy("event_type", "bucket"),
      Some(s"""WITH based AS (SELECT event_type, ts, event_id,
              |  CAST(value AS DOUBLE) AS v,
              |  CAST(epoch_us(ts) AS DOUBLE) AS t,
              |  row_number() OVER (PARTITION BY event_type
              |    ORDER BY ts, event_id) AS rn
              |  FROM events),
              |tot AS (SELECT event_type, count(*) AS nt FROM based
              |  GROUP BY event_type),
              |bk AS (SELECT based.*, least(CAST(floor((rn - 1) * 24 / nt) AS INT), 23)
              |  AS bucket FROM based JOIN tot USING (event_type)),
              |m0 AS (SELECT event_type, bucket, avg(t) AS mt, avg(v) AS mv
              |  FROM bk GROUP BY event_type, bucket),
              |m AS (SELECT event_type, bucket, mv AS ov,
              |  lag(mt) OVER (PARTITION BY event_type ORDER BY bucket) AS pt,
              |  lag(mv) OVER (PARTITION BY event_type ORDER BY bucket) AS pv,
              |  lead(mt) OVER (PARTITION BY event_type ORDER BY bucket) AS qt,
              |  lead(mv) OVER (PARTITION BY event_type ORDER BY bucket) AS qv
              |  FROM m0),
              |a AS (SELECT bk.event_type, bk.bucket, bk.ts, bk.event_id, bk.v,
              |  CASE WHEN pt IS NOT NULL AND qt IS NOT NULL
              |    THEN abs((pt - t) * (qv - v) - (qt - t) * (pv - v))
              |    ELSE abs(v - ov) END AS area
              |  FROM bk JOIN m USING (event_type, bucket)),
              |r AS (SELECT event_type, bucket, ts, v,
              |  row_number() OVER (PARTITION BY event_type, bucket
              |    ORDER BY area DESC, event_id) AS rk FROM a)
              |SELECT event_type, bucket, ts, ${r6("v")} AS value FROM r
              |WHERE rk = 1 ORDER BY event_type, bucket""".stripMargin)),

    // Cross-correlation lag scan: does 'click' lead 'purchase', and by
    // how many hours — one bounded-explode join scans all 12 lags; the
    // explicit moment formula keeps both engines bit-aligned.
    "q165_xcorr_lags" -> Q(
      (s, d) => graft.operators.EventOps.xcorrLagScan(
          Tables.events(s, d), "event_type", "ts", "value",
          seriesX = "purchase", seriesY = "click", maxLag = 12, scoreOut = dec6)
        .orderBy("lag"),
      Some(s"""WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
              |  avg(CAST(value AS DOUBLE)) AS y FROM events GROUP BY event_type, h),
              |x AS (SELECT h, y AS xv FROM hourly WHERE event_type = 'purchase'),
              |ylag AS (SELECT u.lag, h + to_hours(u.lag) AS h, y AS yv
              |  FROM hourly, LATERAL (SELECT unnest(generate_series(0, 12)) AS lag) u
              |  WHERE event_type = 'click'),
              |j AS (SELECT lag, xv, yv FROM x JOIN ylag USING (h)),
              |m AS (SELECT lag, count(*) AS n, avg(xv) AS mx, avg(yv) AS my,
              |  avg(xv * yv) AS mxy, avg(xv * xv) AS mxx, avg(yv * yv) AS myy
              |  FROM j GROUP BY lag)
              |SELECT lag, n,
              |  ${r6("""(mxy - mx * my)
              |    / (sqrt(mxx - mx * mx) * sqrt(myy - my * my))""")} AS xcorr
              |FROM m ORDER BY lag""".stripMargin)),

    // Seasonal-naive forecast baseline + MASE over the last day of the
    // month per event type — the scale-free benchmark every forecaster
    // must beat; the 24 h season attaches by equi-join (gap-robust).
    "q164_seasonal_naive_mase" -> Q(
      (s, d) => graft.operators.EventOps.seasonalNaiveMase(
          Tables.events(s, d), "event_type", "ts", "value",
          testFrom = "2024-01-30 00:00:00", scoreOut = dec6)
        .orderBy("event_type"),
      Some(s"""WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
              |  avg(CAST(value AS DOUBLE)) AS y FROM events GROUP BY event_type, h),
              |j AS (SELECT a.event_type, a.h, a.y, b.y AS y_prev,
              |  abs(a.y - b.y) AS abs_err
              |  FROM hourly a JOIN hourly b
              |    ON a.event_type = b.event_type
              |    AND a.h = b.h + INTERVAL 24 HOURS),
              |t AS (SELECT event_type, count(*) AS n_test, avg(abs_err) AS mae_test
              |  FROM j WHERE h >= TIMESTAMP '2024-01-30 00:00:00' GROUP BY event_type),
              |i AS (SELECT event_type, avg(abs_err) AS mae_insample
              |  FROM j WHERE h < TIMESTAMP '2024-01-30 00:00:00' GROUP BY event_type)
              |SELECT t.event_type, n_test, ${r6("mae_test")} AS mae_test,
              |  ${r6("mae_insample")} AS mae_insample,
              |  ${r6("CASE WHEN mae_insample > 0 THEN mae_test / mae_insample END")} AS mase
              |FROM t JOIN i ON t.event_type = i.event_type
              |ORDER BY t.event_type""".stripMargin)),

    // Incremental rollup maintenance: merge the last-6-days batch rollup
    // into the first-24-days stored rollup and emit the maintained view —
    // proven exact against a full recompute by the oracle (sums compared
    // under biased rounding, counts/extrema exactly).
    "q152_rollup_merge" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        // cut mid-month so every event_type group genuinely MERGES two
        // partials (a day-keyed rollup would make the merge vacuously
        // disjoint)
        val cut = lit("2024-01-25").cast("timestamp")
        val old = graft.operators.EventOps.rollupOf(
          ev.filter(col("ts") < cut), Seq("event_type"), "value")
        val delta = graft.operators.EventOps.rollupOf(
          ev.filter(col("ts") >= cut), Seq("event_type"), "value")
        graft.operators.EventOps.mergeRollup(old, delta, Seq("event_type"))
          .select(col("event_type"), col("n"),
            dec6(col("sum_v")).as("sum_v"), col("min_v"), col("max_v"),
            dec6(col("sum_v") / col("n")).as("avg_v"))
          .orderBy("event_type")
      },
      Some(s"""WITH x AS (SELECT event_type, CAST(value AS DOUBLE) AS v FROM events)
              |SELECT event_type, count(*) AS n,
              |  ${r6("sum(v)")} AS sum_v, min(v) AS min_v, max(v) AS max_v,
              |  ${r6("sum(v) / count(*)")} AS avg_v
              |FROM x GROUP BY event_type
              |ORDER BY event_type""".stripMargin)),

    // ANN recall@10 of the IVF index (4 cells, 2 probes) against exact
    // brute force for five anchors — the measured quality denominator
    // every approximate index must carry. Index-parameter-specific →
    // rows-only.
    "q153_ann_recall" -> Q(
      (s, d) => {
        import graft.operators.SimilarityOps
        val emb = Tables.embeddings(s, d)
        val (indexed, centers) = SimilarityOps.fitIvf(emb, "vec_id", "embedding",
          nCells = 4, seed = 11L)
        SimilarityOps.annRecall(emb, "vec_id", "embedding",
          queryIds = Seq(0L, 7L, 21L, 33L, 42L), k = 10,
          annTopK = qid => SimilarityOps.ivfTopK(indexed, centers, "vec_id",
            qid, k = 10, nProbe = 2, scoreOut = dec6),
          scoreOut = dec6)
      },
      None),

    // Mergeable histogram quantile rollup: per-day value sketches + the
    // merged-corpus p50/p90/p99 — the quantile twin of the q106 HLL
    // rollup. The fixed-bin counters and the walk-and-interpolate
    // estimate are pure arithmetic, so the oracle replays the sketch
    // exactly (bin cells, cumulative walk, linear interpolation — the
    // HistogramSketch.quantile expression mirrored term for term);
    // HistogramSketchSpec still pins the one-bin-width error bound,
    // exact sketch-level merge, and repartition invariance.
    "q141_hist_quantiles" -> Q(
      (s, d) => graft.operators.EventOps.histQuantileRollup(
          Tables.events(s, d), "ts", "value",
          bins = 1000, lo = 0.0, hi = 500.0, scoreOut = dec6)
        .orderBy("day"),
      Some {
        // mirrors HistogramSketch.cell / .quantile with bins=1000,
        // lo=0.0, hi=500.0: w = (hi - lo) / bins, est = lo + (bin-1)*w
        // + (target - cum_prev)/c * w; bin 0 = underflow -> lo,
        // bin 1001 = overflow -> hi
        val wexpr = "((500.0 - 0.0) / 1000)"
        s"""WITH v AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
           |  CAST(value AS DOUBLE) AS v FROM events),
           |cells AS (SELECT day, CASE WHEN v < 0.0 THEN 0
           |    WHEN v >= 500.0 THEN 1001
           |    ELSE 1 + least(CAST(floor((v - 0.0) / (500.0 - 0.0) * 1000)
           |      AS INT), 999) END AS bin FROM v),
           |hd AS (SELECT day, bin, CAST(count(*) AS DOUBLE) AS c
           |  FROM cells GROUP BY 1, 2),
           |ha AS (SELECT '__all__' AS day, bin, CAST(count(*) AS DOUBLE) AS c
           |  FROM cells GROUP BY bin),
           |h AS (SELECT * FROM hd UNION ALL SELECT * FROM ha),
           |n AS (SELECT day, sum(c) AS n FROM h GROUP BY 1),
           |cum AS (SELECT day, bin, c, sum(c) OVER (PARTITION BY day
           |  ORDER BY bin) AS ci FROM h),
           |qt AS (SELECT n.day, q, n.n FROM n,
           |  (VALUES (0.5), (0.9), (0.99)) t(q)
           |  WHERE n.day = '__all__' OR q = 0.5),
           |pick AS (SELECT cum.day, qt.q, cum.bin, cum.c,
           |  cum.ci - cum.c AS cp, qt.n,
           |  row_number() OVER (PARTITION BY cum.day, qt.q
           |    ORDER BY cum.bin) AS rn
           |  FROM cum JOIN qt ON qt.day = cum.day AND cum.ci >= qt.q * qt.n),
           |est AS (SELECT day, q, CASE WHEN bin = 0 THEN 0.0
           |    WHEN bin = 1001 THEN 500.0
           |    ELSE 0.0 + (bin - 1) * $wexpr + ((q * n - cp) / c) * $wexpr
           |  END AS e FROM pick WHERE rn = 1)
           |SELECT n.day, CAST(n.n AS BIGINT) AS n,
           |  ${r6("max(CASE WHEN est.q = 0.5 THEN est.e END)")} AS p50,
           |  CASE WHEN n.day = '__all__' THEN
           |    ${r6("max(CASE WHEN est.q = 0.9 THEN est.e END)")} END AS p90,
           |  CASE WHEN n.day = '__all__' THEN
           |    ${r6("max(CASE WHEN est.q = 0.99 THEN est.e END)")} END AS p99
           |FROM n JOIN est ON n.day = est.day
           |GROUP BY n.day, n.n ORDER BY n.day""".stripMargin
      }),

    // PSI feature-drift monitor: value distribution of the first half of
    // the month vs the second, 10 fixed bins + under/overflow, Laplace-
    // smoothed proportions — Σ psi_contrib is the drift score a serving
    // pipeline alerts on.
    "q142_psi_drift" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val cut = lit("2024-01-16").cast("timestamp")
        graft.operators.StatOps.psi(
            ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
            "value", bins = 10, lo = 0.0, hi = 500.0, scoreOut = dec6)
          .orderBy("bin")
      },
      Some(s"""WITH rb AS (SELECT CASE WHEN CAST(value AS DOUBLE) < 0.0 THEN -1
              |    WHEN CAST(value AS DOUBLE) >= 500.0 THEN 10
              |    ELSE least(CAST(floor(CAST(value AS DOUBLE) / 50.0) AS INT), 9) END AS bin
              |  FROM events WHERE ts < TIMESTAMP '2024-01-16'),
              |cb AS (SELECT CASE WHEN CAST(value AS DOUBLE) < 0.0 THEN -1
              |    WHEN CAST(value AS DOUBLE) >= 500.0 THEN 10
              |    ELSE least(CAST(floor(CAST(value AS DOUBLE) / 50.0) AS INT), 9) END AS bin
              |  FROM events WHERE ts >= TIMESTAMP '2024-01-16'),
              |ra AS (SELECT bin, count(*) AS n_ref FROM rb GROUP BY bin),
              |ca AS (SELECT bin, count(*) AS n_cur FROM cb GROUP BY bin),
              |j AS (SELECT coalesce(ra.bin, ca.bin) AS bin,
              |  coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
              |  FROM ra FULL OUTER JOIN ca ON ra.bin = ca.bin),
              |t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM j),
              |p AS (SELECT bin, n_ref, n_cur,
              |  (n_ref + 0.5) / (tr + 5.0) AS pr,
              |  (n_cur + 0.5) / (tc + 5.0) AS pc FROM j, t)
              |SELECT bin, CAST(n_ref AS BIGINT) AS n_ref,
              |  CAST(n_cur AS BIGINT) AS n_cur,
              |  ${r6("pr")} AS p_ref, ${r6("pc")} AS p_cur,
              |  ${r6("(pc - pr) * ln(pc / pr)")} AS psi_contrib
              |FROM p ORDER BY bin""".stripMargin)),

    // Hour-of-day seasonal profile + residual anomaly counts per event
    // type: "normal for 3 am, anomalous for noon" — the seasonality-aware
    // complement of the trailing z-score detector.
    "q143_seasonal_profile" -> Q(
      (s, d) => graft.operators.EventOps.seasonalProfile(
          Tables.events(s, d), "event_type", "ts", "value",
          zCut = 3.0, scoreOut = dec6)
        .orderBy("event_type", "hour"),
      Some(s"""WITH x AS (SELECT event_type,
              |  CAST(EXTRACT(hour FROM ts) AS INT) AS hour,
              |  CAST(value AS DOUBLE) AS v FROM events),
              |wv AS (SELECT event_type, hour, v,
              |  avg(v) OVER (PARTITION BY event_type, hour) AS mu,
              |  stddev_pop(v) OVER (PARTITION BY event_type, hour) AS sigma
              |  FROM x)
              |SELECT event_type, hour, count(*) AS n,
              |  ${r6("max(mu)")} AS mu, ${r6("max(sigma)")} AS sigma,
              |  CAST(sum(CASE WHEN sigma > 0 AND abs(v - mu) > 3.0 * sigma
              |    THEN 1 ELSE 0 END) AS BIGINT) AS n_anom
              |FROM wv GROUP BY event_type, hour
              |ORDER BY event_type, hour""".stripMargin)),

    // One-sided CUSUM changepoint alarms per event type (k=50 drift
    // allowance, h=500 alarm threshold) — the recursion is rewritten as
    // prefix-sum minus running-min, so both engines fold the identical
    // window arithmetic in the identical (ts, event_id) order.
    "q144_cusum" -> Q(
      (s, d) => graft.operators.StatOps.cusum(
          Tables.events(s, d), "event_type", "ts", "event_id", "value",
          k = 50.0, h = 500.0, scoreOut = dec6)
        .orderBy("event_type"),
      Some(s"""WITH x AS (SELECT event_type, ts, event_id,
              |  CAST(value AS DOUBLE) AS v FROM events),
              |wv AS (SELECT event_type, ts, event_id,
              |  sum(v - 50.0) OVER (PARTITION BY event_type
              |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS s FROM x),
              |c AS (SELECT event_type,
              |  s - least(min(s) OVER (PARTITION BY event_type
              |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING), 0.0) AS c
              |  FROM wv)
              |SELECT event_type, count(*) AS n,
              |  ${r6("max(c)")} AS max_cusum,
              |  CAST(sum(CASE WHEN c > 500.0 THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n_alarms
              |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // SCD2 dimension build: consecutive duplicate states collapse, each
    // survivor gets [valid_from, valid_to) from the next change — epoch-
    // micros integers keep the interval end engine-portable.
    "q145_scd2_intervals" -> Q(
      (s, d) => graft.operators.EventOps.scd2Build(
          Tables.events(s, d), "user_id", "ts", "event_id", "event_type")
        .orderBy("user_id", "valid_from_us"),
      Some("""WITH x AS (SELECT user_id, event_type AS state,
             |  epoch_us(ts) AS ts_us, event_id,
             |  lag(event_type) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id) AS prev_state FROM events),
             |ch AS (SELECT user_id, state, ts_us, event_id FROM x
             |  WHERE prev_state IS NULL OR state <> prev_state),
             |f AS (SELECT user_id, state, ts_us AS valid_from_us,
             |  lead(ts_us) OVER (PARTITION BY user_id
             |    ORDER BY ts_us, event_id) AS valid_to_us FROM ch)
             |SELECT user_id, state, valid_from_us, valid_to_us,
             |  CAST(valid_to_us IS NULL AS INT) AS is_current
             |FROM f ORDER BY user_id, valid_from_us""".stripMargin)),

    // First-order Markov transition matrix of per-user event sequences —
    // the bigram LM of event streams.
    "q146_markov_transitions" -> Q(
      (s, d) => graft.operators.EventOps.markovTransitions(
          Tables.events(s, d), "user_id", "ts", "event_id", "event_type",
          scoreOut = dec6)
        .orderBy("cur_state", "next_state"),
      Some(s"""WITH x AS (SELECT event_type AS cur_state,
              |  lead(event_type) OVER (PARTITION BY user_id
              |    ORDER BY ts, event_id) AS next_state FROM events),
              |p AS (SELECT cur_state, next_state, count(*) AS n FROM x
              |  WHERE next_state IS NOT NULL GROUP BY cur_state, next_state)
              |SELECT cur_state, next_state, n,
              |  ${r6("CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY cur_state)")} AS p
              |FROM p ORDER BY cur_state, next_state""".stripMargin)),

    // Next-event prediction accuracy of the q146 Markov model, evaluated
    // on its own transitions: predicted next = argmax p per current state
    // (ties -> lexicographically smallest), accuracy = the probability
    // mass the argmax captures. The whole eval runs on the transition
    // MATRIX (states^2 rows), never rescanning events.
    "q222_markov_accuracy" -> Q(
      (s, d) => {
        val m = graft.operators.EventOps.markovTransitions(
          Tables.events(s, d), "user_id", "ts", "event_id", "event_type",
          scoreOut = identity)
        val wS = Window.partitionBy("cur_state")
          .orderBy(col("n").desc, col("next_state").asc)
        val pred = m.withColumn("rk", row_number().over(wS))
        val per = pred.groupBy("cur_state")
          .agg(sum("n").as("n_total"),
            max(when(col("rk") === 1, col("next_state"))).as("predicted"),
            sum(when(col("rk") === 1, col("n")).otherwise(lit(0L))).as("n_correct"))
          .select(col("cur_state"), col("predicted"), col("n_total"),
            col("n_correct"),
            dec6(col("n_correct").cast("double") / col("n_total")).as("accuracy"))
        val overall = per.agg(sum("n_total").as("n_total"),
            sum("n_correct").as("n_correct"))
          .select(lit("__all__").as("cur_state"), lit(null).cast("string").as("predicted"),
            col("n_total"), col("n_correct"),
            dec6(col("n_correct").cast("double") / col("n_total")).as("accuracy"))
        per.unionByName(overall).orderBy("cur_state")
      },
      Some(s"""WITH x AS (SELECT event_type AS cur_state,
              |  lead(event_type) OVER (PARTITION BY user_id
              |    ORDER BY ts, event_id) AS next_state FROM events),
              |p AS (SELECT cur_state, next_state, count(*) AS n FROM x
              |  WHERE next_state IS NOT NULL GROUP BY 1, 2),
              |rk AS (SELECT *, row_number() OVER (PARTITION BY cur_state
              |    ORDER BY n DESC, next_state) AS r FROM p),
              |per AS (SELECT cur_state,
              |  max(CASE WHEN r = 1 THEN next_state END) AS predicted,
              |  CAST(sum(n) AS BIGINT) AS n_total,
              |  CAST(sum(CASE WHEN r = 1 THEN n ELSE 0 END) AS BIGINT) AS n_correct
              |  FROM rk GROUP BY cur_state)
              |SELECT cur_state, predicted, n_total, n_correct,
              |  ${r6("CAST(n_correct AS DOUBLE) / n_total")} AS accuracy
              |FROM per
              |UNION ALL
              |SELECT '__all__', NULL, CAST(sum(n_total) AS BIGINT),
              |  CAST(sum(n_correct) AS BIGINT),
              |  ${r6("CAST(sum(n_correct) AS DOUBLE) / sum(n_total)")}
              |FROM per ORDER BY cur_state""".stripMargin)),

    // STL-lite classical decomposition per event-type series: centered
    // 25h rolling-mean trend, zero-centered hour-of-day seasonal,
    // residual — the detrended/deseasonalized anomaly input. Every window
    // is partitioned by series (or series × hour-of-day) over the hourly
    // grid.
    "q180_stl_decompose" -> Q(
      (s, d) => graft.operators.SeasonalOps.stlDecompose(
          Tables.events(s, d), "event_type", "ts", "value", halfWin = 12,
          scoreOut = dec6)
        .orderBy("event_type", "h"),
      Some(s"""WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
              |  avg(CAST(value AS DOUBLE)) AS y FROM events GROUP BY 1, 2),
              |tr AS (SELECT event_type, h, y,
              |  avg(y) OVER (PARTITION BY event_type ORDER BY h
              |    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS trend
              |  FROM hourly),
              |se AS (SELECT event_type, h, y, trend,
              |  avg(y - trend) OVER (PARTITION BY event_type, hour(h)) AS s_raw
              |  FROM tr),
              |ce AS (SELECT event_type, h, y, trend,
              |  s_raw - avg(s_raw) OVER (PARTITION BY event_type) AS seasonal
              |  FROM se)
              |SELECT event_type, h, ${r6("y")} AS y, ${r6("trend")} AS trend,
              |  ${r6("seasonal")} AS seasonal,
              |  ${r6("y - trend - seasonal")} AS residual
              |FROM ce ORDER BY event_type, h""".stripMargin)),

    // Single most-likely mean-shift changepoint per series: argmax over
    // split points of |mean_left - mean_right| * sqrt(k(n-k)/n) from one
    // per-series cumulative sum over the hourly grid.
    "q181_changepoint" -> Q(
      (s, d) => graft.operators.SeasonalOps.meanShiftChangepoint(
          Tables.events(s, d), "event_type", "ts", "value", scoreOut = dec6)
        .orderBy("event_type"),
      Some(s"""WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
              |  avg(CAST(value AS DOUBLE)) AS y FROM events GROUP BY 1, 2),
              |c AS (SELECT event_type, h,
              |  count(*) OVER (PARTITION BY event_type ORDER BY h
              |    ROWS UNBOUNDED PRECEDING) AS k,
              |  sum(y) OVER (PARTITION BY event_type ORDER BY h
              |    ROWS UNBOUNDED PRECEDING) AS cum,
              |  count(*) OVER (PARTITION BY event_type) AS n,
              |  sum(y) OVER (PARTITION BY event_type) AS tot
              |  FROM hourly),
              |st AS (SELECT event_type, h, k, n, cum / k AS mean_l,
              |  (tot - cum) / (n - k) AS mean_r,
              |  abs(cum / k - (tot - cum) / (n - k))
              |    * sqrt(k * (n - k) / CAST(n AS DOUBLE)) AS stat
              |  FROM c WHERE k < n),
              |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
              |    ORDER BY ${r6("stat")} DESC, h) AS rk FROM st)
              |SELECT event_type, h AS split_h, k AS n_left, n - k AS n_right,
              |  ${r6("mean_l")} AS mean_left, ${r6("mean_r")} AS mean_right,
              |  ${r6("stat")} AS shift_stat
              |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin)),

    // Repeat-purchase cadence: the inter-purchase gap distribution over
    // users with 2+ purchases — the replenishment-cycle read behind
    // "when to re-engage". Lag per user over purchase events only;
    // percentiles over the user-gap pairs (approx_percentile at scale,
    // q17 convention).
    "q205_purchase_cadence" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val gaps = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("prev", lag("ts", 1).over(w))
          .filter(col("prev").isNotNull)
          .select(((unix_micros(col("ts")) - unix_micros(col("prev")))
            / lit(86400e6)).as("gap_days"))
        gaps.agg(count(lit(1)).as("n_gaps"),
          dec6(expr("percentile(gap_days, 0.5)")).as("median_gap_days"),
          dec6(expr("percentile(gap_days, 0.9)")).as("p90_gap_days"),
          dec6(avg("gap_days")).as("mean_gap_days"))
      },
      Some(s"""WITH p AS (SELECT user_id, ts, event_id FROM events
              |  WHERE event_type = 'purchase'),
              |g AS (SELECT (epoch_us(ts) - epoch_us(lag(ts) OVER (
              |    PARTITION BY user_id ORDER BY ts, event_id))) / 86400e6
              |    AS gap_days FROM p),
              |x AS (SELECT gap_days FROM g WHERE gap_days IS NOT NULL)
              |SELECT count(*) AS n_gaps,
              |  ${r6("quantile_cont(gap_days, 0.5)")} AS median_gap_days,
              |  ${r6("quantile_cont(gap_days, 0.9)")} AS p90_gap_days,
              |  ${r6("avg(gap_days)")} AS mean_gap_days
              |FROM x""".stripMargin)),

    // Daily event-type composition: each type's share of the day's
    // events — the stacked-area dashboard series; shares from a
    // day-partitioned total window over the (day, type) aggregate.
    "q206_daily_composition" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("day")
        Tables.events(s, d)
          .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("share", dec6(col("n") / sum("n").over(w)))
          .orderBy("day", "event_type")
      },
      Some(s"""WITH c AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
              |  event_type, count(*) AS n FROM events GROUP BY 1, 2)
              |SELECT day, event_type, n,
              |  ${r6("CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY day)")} AS share
              |FROM c ORDER BY day, event_type""".stripMargin)),

    // SLO burn rate (SRE fast/slow-burn policy): hourly error-event share
    // vs a 1% budget, with the trailing-6h average burn — the alert pair
    // (1h fast spike, 6h sustained) from the SRE workbook. One hourly
    // aggregate + one 6-row trailing window per... the single global
    // hourly series is grid-sized and the window partitions on the
    // constant policy key via rowsBetween on the ordered grid.
    "q204_slo_burn" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val hourly = Tables.events(s, d)
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n_events"),
            sum((col("event_type") === "error").cast("long")).as("n_errors"))
        val w = Window.orderBy("h").rowsBetween(-5, 0) // trailing 6 hourly rows
        hourly
          .withColumn("rate", col("n_errors").cast("double") / col("n_events"))
          .withColumn("burn_1h", col("rate") / lit(0.01))
          .withColumn("burn_6h", avg(col("rate")).over(w) / lit(0.01))
          .select(col("h"), col("n_events"), col("n_errors"),
            dec6(col("rate")).as("error_rate"),
            dec6(col("burn_1h")).as("burn_1h"),
            dec6(col("burn_6h")).as("burn_6h"),
            (col("burn_1h") > 14.4).cast("int").as("fast_burn"),
            (col("burn_6h") > 6.0).cast("int").as("slow_burn"))
          .orderBy("h")
      },
      Some(s"""WITH hourly AS (SELECT date_trunc('hour', ts) AS h,
              |  count(*) AS n_events,
              |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              |    AS BIGINT) AS n_errors
              |  FROM events GROUP BY 1),
              |r AS (SELECT h, n_events, n_errors,
              |  CAST(n_errors AS DOUBLE) / n_events AS rate,
              |  avg(CAST(n_errors AS DOUBLE) / n_events) OVER (ORDER BY h
              |    ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS rate6
              |  FROM hourly)
              |SELECT h, n_events, n_errors,
              |  ${r6("rate")} AS error_rate,
              |  ${r6("rate / 0.01")} AS burn_1h,
              |  ${r6("rate6 / 0.01")} AS burn_6h,
              |  CAST(rate / 0.01 > 14.4 AS INT) AS fast_burn,
              |  CAST(rate6 / 0.01 > 6.0 AS INT) AS slow_burn
              |FROM r ORDER BY h""".stripMargin)),

    // New vs returning actives per day — the growth-vs-retention lead
    // metric; first-seen day from the distinct (user, day) collapse.
    "q202_new_vs_returning" -> Q(
      (s, d) => graft.operators.EventOps.newVsReturning(
          Tables.events(s, d), "user_id", "ts", scoreOut = dec6)
        .orderBy("day"),
      Some("""WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
             |  FROM events),
             |f AS (SELECT u, min(d) AS d0 FROM ud GROUP BY u)
             |SELECT strftime(d, '%Y-%m-%d') AS day,
             |  count(*) AS n_active,
             |  CAST(sum(CASE WHEN d = d0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
             |  CAST(count(*) - sum(CASE WHEN d = d0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_returning
             |FROM ud JOIN f USING (u)
             |GROUP BY d ORDER BY day""".stripMargin)),

    // Rolling 7-day active users per day — the WAU curve from the
    // (user, day) collapse joined to the bounded day grid; HLL union at
    // extreme scale (q106 machinery), exact here as the oracle surface.
    "q203_rolling_wau" -> Q(
      (s, d) => graft.operators.EventOps.rollingActiveUsers(
          Tables.events(s, d), "user_id", "ts", windowDays = 7)
        .orderBy("day"),
      Some("""WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
             |  FROM events),
             |g AS (SELECT DISTINCT d AS gd FROM ud)
             |SELECT strftime(gd, '%Y-%m-%d') AS day,
             |  count(DISTINCT u) AS n_active_7d
             |FROM ud JOIN g ON d <= gd AND d > gd - 7
             |GROUP BY gd ORDER BY day""".stripMargin)),

    // Round-7 flagship composite: one health row per series — grid size,
    // outage count, seasonal-adjusted anomaly count, most-likely
    // changepoint, OLS trend + fit, seasonal/trend strengths — the
    // single-glance triage board every per-series diagnostic above feeds.
    // Five agg-sized frames join on the series key; every component is
    // individually oracle-verified (q181/q187/q188/q193/q195).
    "q200_series_health" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val So = graft.operators.SeasonalOps
        val ev = Tables.events(s, d)
        val cp = So.meanShiftChangepoint(ev, "event_type", "ts", "value", dec6)
          .select(col("event_type"), col("split_h"), col("shift_stat"))
        val ols = So.olsTrend(ev, "event_type", "ts", "value", dec6)
          .select(col("event_type"), col("slope_per_hour"), col("r2"))
        val ss = So.seasonalStrength(ev, "event_type", "ts", "value", 12, dec6)
        val gaps = graft.operators.EventOps.gapOutages(ev, "event_type", "ts", 2.0, dec6)
          .groupBy("event_type").agg(count(lit(1)).as("n_outages"))
        val wS = Window.partitionBy("event_type")
        val anom = So.stlDecompose(ev, "event_type", "ts", "value", 12, dec6)
          .withColumn("mu", avg("residual").over(wS))
          .withColumn("sd",
            sqrt(avg(col("residual") * col("residual")).over(wS) -
              avg(col("residual")).over(wS) * avg(col("residual")).over(wS)))
          .filter(abs((col("residual") - col("mu")) / col("sd")) > 3.0)
          .groupBy("event_type").agg(count(lit(1)).as("n_anomalies"))
        ss.join(ols, Seq("event_type"))
          .join(cp, Seq("event_type"))
          .join(gaps, Seq("event_type"), "left")
          .join(anom, Seq("event_type"), "left")
          .select(col("event_type"), col("n_hours"),
            coalesce(col("n_outages"), lit(0L)).as("n_outages"),
            coalesce(col("n_anomalies"), lit(0L)).as("n_anomalies"),
            col("split_h"), col("shift_stat"),
            col("slope_per_hour"), col("r2"),
            col("seasonal_strength"), col("trend_strength"))
          .orderBy("event_type")
      },
      Some(s"""WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
              |  avg(CAST(value AS DOUBLE)) AS y FROM events GROUP BY 1, 2),
              |tr AS (SELECT event_type, h, y,
              |  avg(y) OVER (PARTITION BY event_type ORDER BY h
              |    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS trend
              |  FROM hourly),
              |se AS (SELECT event_type, h, y, trend,
              |  avg(y - trend) OVER (PARTITION BY event_type, hour(h)) AS s_raw
              |  FROM tr),
              |ce AS (SELECT event_type, ${r6("trend")} AS rtrend,
              |  ${r6("s_raw - avg(s_raw) OVER (PARTITION BY event_type)")} AS rseasonal,
              |  ${r6("""y - trend
              |    - (s_raw - avg(s_raw) OVER (PARTITION BY event_type))""")} AS residual
              |  FROM se),
              |zz AS (SELECT event_type, residual,
              |  avg(residual) OVER (PARTITION BY event_type) AS mu,
              |  sqrt(avg(residual * residual) OVER (PARTITION BY event_type)
              |    - avg(residual) OVER (PARTITION BY event_type)
              |      * avg(residual) OVER (PARTITION BY event_type)) AS sd
              |  FROM ce),
              |anom AS (SELECT event_type, count(*) AS n_anomalies FROM zz
              |  WHERE abs((residual - mu) / sd) > 3.0 GROUP BY event_type),
              |strength AS (SELECT event_type, count(*) AS n_hours,
              |  avg(residual * residual) - avg(residual) * avg(residual) AS vr,
              |  avg((rseasonal + residual) * (rseasonal + residual))
              |    - avg(rseasonal + residual) * avg(rseasonal + residual) AS vsr,
              |  avg((rtrend + residual) * (rtrend + residual))
              |    - avg(rtrend + residual) * avg(rtrend + residual) AS vtr
              |  FROM ce GROUP BY event_type),
              |cum AS (SELECT event_type, h,
              |  count(*) OVER (PARTITION BY event_type ORDER BY h
              |    ROWS UNBOUNDED PRECEDING) AS k,
              |  sum(y) OVER (PARTITION BY event_type ORDER BY h
              |    ROWS UNBOUNDED PRECEDING) AS cum,
              |  count(*) OVER (PARTITION BY event_type) AS n,
              |  sum(y) OVER (PARTITION BY event_type) AS tot
              |  FROM hourly),
              |st AS (SELECT event_type, h,
              |  abs(cum / k - (tot - cum) / (n - k))
              |    * sqrt(k * (n - k) / CAST(n AS DOUBLE)) AS stat
              |  FROM cum WHERE k < n),
              |cp AS (SELECT event_type, h AS split_h, ${r6("stat")} AS shift_stat,
              |  row_number() OVER (PARTITION BY event_type
              |    ORDER BY ${r6("stat")} DESC, h) AS rk FROM st),
              |ob AS (SELECT event_type, y,
              |  CAST((epoch_us(h) - min(epoch_us(h)) OVER (PARTITION BY event_type))
              |    / 3600000000 AS DOUBLE) AS t FROM hourly),
              |om AS (SELECT event_type,
              |  avg(t) AS mt, avg(y) AS my, avg(t * t) AS mtt,
              |  avg(t * y) AS mty, avg(y * y) AS myy FROM ob GROUP BY event_type),
              |ols AS (SELECT event_type,
              |  ${r6("(mty - mt * my) / (mtt - mt * mt)")} AS slope_per_hour,
              |  ${r6("""CASE WHEN myy - my * my > 0
              |    THEN (mty - mt * my) * (mty - mt * my)
              |      / ((mtt - mt * mt) * (myy - my * my)) ELSE 0.0 END""")} AS r2
              |  FROM om),
              |gp AS (SELECT event_type, ts AS gap_end,
              |  lag(ts) OVER (PARTITION BY event_type ORDER BY ts) AS gap_start
              |  FROM events),
              |gaps AS (SELECT event_type, count(*) AS n_outages FROM gp
              |  WHERE (epoch_us(gap_end) - epoch_us(gap_start)) / 3600e6 > 2.0
              |  GROUP BY event_type)
              |SELECT s.event_type, s.n_hours,
              |  CAST(coalesce(gaps.n_outages, 0) AS BIGINT) AS n_outages,
              |  CAST(coalesce(anom.n_anomalies, 0) AS BIGINT) AS n_anomalies,
              |  cp.split_h, cp.shift_stat, ols.slope_per_hour, ols.r2,
              |  ${r6("""greatest(0.0, 1.0 - CASE WHEN s.vsr > 0
              |    THEN s.vr / s.vsr ELSE 1.0 END)""")} AS seasonal_strength,
              |  ${r6("""greatest(0.0, 1.0 - CASE WHEN s.vtr > 0
              |    THEN s.vr / s.vtr ELSE 1.0 END)""")} AS trend_strength
              |FROM strength s
              |JOIN ols USING (event_type)
              |JOIN cp ON cp.event_type = s.event_type AND cp.rk = 1
              |LEFT JOIN gaps USING (event_type)
              |LEFT JOIN anom USING (event_type)
              |ORDER BY s.event_type""".stripMargin)),

    // Day-of-week × hour-of-day activity heatmap (long form) — the
    // dashboard staple behind staffing/capacity reads. Weekday is pure
    // date arithmetic anchored on a known Monday (engine-neutral: no
    // dayofweek() whose week origin differs between engines).
    "q197_dow_hod_heatmap" -> Q(
      (s, d) => Tables.events(s, d)
        .select(
          (pmod(datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")),
            lit(7)) + 1).cast("int").as("dow_iso"),
          hour(col("ts")).as("hod"),
          col("value").cast("double").as("v"))
        .groupBy("dow_iso", "hod")
        .agg(count(lit(1)).as("n_events"), dec6(avg("v")).as("avg_value"))
        .orderBy("dow_iso", "hod"),
      Some(s"""SELECT
              |  CAST((date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7 + 7) % 7 + 1
              |    AS INT) AS dow_iso,
              |  hour(ts) AS hod,
              |  count(*) AS n_events,
              |  ${r6("avg(CAST(value AS DOUBLE))")} AS avg_value
              |FROM events GROUP BY 1, 2 ORDER BY dow_iso, hod""".stripMargin)),

    // Top-10 user-journey trigrams: the most common 3-step event-type
    // sequences — TakeOrdered over the |types|³-key aggregate.
    "q189_journey_trigrams" -> Q(
      (s, d) => graft.operators.EventOps.journeyTrigrams(
        Tables.events(s, d), "user_id", "ts", "event_id", "event_type",
        topK = 10, scoreOut = dec6),
      Some(s"""WITH g AS (SELECT event_type AS step1,
              |  lead(event_type, 1) OVER w AS step2,
              |  lead(event_type, 2) OVER w AS step3
              |  FROM events
              |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              |c AS (SELECT step1, step2, step3, count(*) AS n FROM g
              |  WHERE step2 IS NOT NULL AND step3 IS NOT NULL
              |  GROUP BY 1, 2, 3),
              |t AS (SELECT sum(n) AS nt FROM c)
              |SELECT step1, step2, step3, n, ${r6("CAST(n AS DOUBLE) / nt")} AS share
              |FROM c, t
              |ORDER BY n DESC, step1, step2, step3 LIMIT 10""".stripMargin)),

    // Conversion lag: first 'view' to first subsequent 'purchase' per
    // user — rate + median/p90 delay, the funnel's time dimension.
    "q191_conversion_lag" -> Q(
      (s, d) => graft.operators.EventOps.conversionLag(
        Tables.events(s, d), "user_id", "ts", "event_type",
        fromType = "view", toType = "purchase", scoreOut = dec6),
      Some(s"""WITH f AS (SELECT user_id, min(ts) AS t_from FROM events
              |  WHERE event_type = 'view' GROUP BY user_id),
              |t AS (SELECT user_id, ts AS t_to FROM events
              |  WHERE event_type = 'purchase'),
              |l AS (SELECT f.user_id, f.t_from,
              |  min(CASE WHEN t.t_to >= f.t_from THEN t.t_to END) AS t_conv
              |  FROM f LEFT JOIN t USING (user_id)
              |  GROUP BY f.user_id, f.t_from),
              |g AS (SELECT user_id, t_conv,
              |  (epoch_us(t_conv) - epoch_us(t_from)) / 1e6 AS lag_s FROM l)
              |SELECT count(*) AS n_users_from,
              |  count(t_conv) AS n_converted,
              |  ${r6("CAST(count(t_conv) AS DOUBLE) / count(*)")} AS conversion_rate,
              |  ${r6("quantile_cont(lag_s, 0.5)")} AS median_lag_s,
              |  ${r6("quantile_cont(lag_s, 0.9)")} AS p90_lag_s
              |FROM g""".stripMargin)),

    // Outage inventory: inter-event gaps over 2 hours per series — the
    // "sensor went dark" ranges rolling statistics must not trust.
    "q193_gap_outages" -> Q(
      (s, d) => graft.operators.EventOps.gapOutages(
          Tables.events(s, d), "event_type", "ts", minGapHours = 2.0,
          scoreOut = dec6)
        .orderBy("event_type", "gap_start"),
      Some(s"""WITH g AS (SELECT event_type, ts AS gap_end,
              |  lag(ts) OVER (PARTITION BY event_type ORDER BY ts) AS gap_start
              |  FROM events),
              |x AS (SELECT event_type, gap_start, gap_end,
              |  (epoch_us(gap_end) - epoch_us(gap_start)) / 3600e6 AS gap_hours
              |  FROM g)
              |SELECT event_type, gap_start, gap_end,
              |  ${r6("gap_hours")} AS gap_hours
              |FROM x WHERE gap_hours > 2.0
              |ORDER BY event_type, gap_start""".stripMargin)),

    // Seasonal-adjusted anomalies: z-score the STL RESIDUAL against its
    // per-series σ and keep |z| > 3 — the deseasonalized upgrade of the
    // trailing-z detector (W10/q36): "high for 3 am" fires, "normal
    // morning peak" doesn't. Composes q180's decomposition; every window
    // is series-partitioned.
    "q195_seasonal_anomalies" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val dec = graft.operators.SeasonalOps.stlDecompose(
          Tables.events(s, d), "event_type", "ts", "value", halfWin = 12,
          scoreOut = dec6)
        val wS = Window.partitionBy("event_type")
        dec
          .withColumn("mu", avg("residual").over(wS))
          .withColumn("sd",
            sqrt(avg(col("residual") * col("residual")).over(wS) -
              avg(col("residual")).over(wS) * avg(col("residual")).over(wS)))
          .withColumn("z", (col("residual") - col("mu")) / col("sd"))
          .filter(abs(col("z")) > 3.0)
          .select(col("event_type"), col("h"), col("y"), col("residual"),
            dec6(col("z")).as("z"))
          .orderBy("event_type", "h")
      },
      Some(s"""WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
              |  avg(CAST(value AS DOUBLE)) AS y FROM events GROUP BY 1, 2),
              |tr AS (SELECT event_type, h, y,
              |  avg(y) OVER (PARTITION BY event_type ORDER BY h
              |    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS trend
              |  FROM hourly),
              |se AS (SELECT event_type, h, y, trend,
              |  avg(y - trend) OVER (PARTITION BY event_type, hour(h)) AS s_raw
              |  FROM tr),
              |ce AS (SELECT event_type, h, ${r6("y")} AS y,
              |  ${r6("""y - trend
              |    - (s_raw - avg(s_raw) OVER (PARTITION BY event_type))""")} AS residual
              |  FROM se),
              |zz AS (SELECT event_type, h, y, residual,
              |  avg(residual) OVER (PARTITION BY event_type) AS mu,
              |  sqrt(avg(residual * residual) OVER (PARTITION BY event_type)
              |    - avg(residual) OVER (PARTITION BY event_type)
              |      * avg(residual) OVER (PARTITION BY event_type)) AS sd
              |  FROM ce)
              |SELECT event_type, h, y, residual,
              |  ${r6("(residual - mu) / sd")} AS z
              |FROM zz WHERE abs((residual - mu) / sd) > 3.0
              |ORDER BY event_type, h""".stripMargin)),

    // Hyndman seasonal/trend strength from the STL components: the "is
    // this series seasonal at all" triage over q180's decomposition.
    "q188_seasonal_strength" -> Q(
      (s, d) => graft.operators.SeasonalOps.seasonalStrength(
          Tables.events(s, d), "event_type", "ts", "value", halfWin = 12,
          scoreOut = dec6)
        .orderBy("event_type"),
      Some(s"""WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
              |  avg(CAST(value AS DOUBLE)) AS y FROM events GROUP BY 1, 2),
              |tr AS (SELECT event_type, h, y,
              |  avg(y) OVER (PARTITION BY event_type ORDER BY h
              |    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS trend
              |  FROM hourly),
              |se AS (SELECT event_type, h, y, trend,
              |  avg(y - trend) OVER (PARTITION BY event_type, hour(h)) AS s_raw
              |  FROM tr),
              |ce AS (SELECT event_type, y, trend,
              |  s_raw - avg(s_raw) OVER (PARTITION BY event_type) AS sea_raw
              |  FROM se),
              |cc AS (SELECT event_type, ${r6("trend")} AS trend,
              |  ${r6("sea_raw")} AS seasonal,
              |  ${r6("y - trend - sea_raw")} AS residual FROM ce),
              |ag AS (SELECT event_type, count(*) AS n_hours,
              |  avg(residual * residual) - avg(residual) * avg(residual) AS vr,
              |  avg((seasonal + residual) * (seasonal + residual))
              |    - avg(seasonal + residual) * avg(seasonal + residual) AS vsr,
              |  avg((trend + residual) * (trend + residual))
              |    - avg(trend + residual) * avg(trend + residual) AS vtr
              |  FROM cc GROUP BY event_type)
              |SELECT event_type, n_hours,
              |  ${r6("""greatest(0.0, 1.0 - CASE WHEN vsr > 0
              |    THEN vr / vsr ELSE 1.0 END)""")} AS seasonal_strength,
              |  ${r6("""greatest(0.0, 1.0 - CASE WHEN vtr > 0
              |    THEN vr / vtr ELSE 1.0 END)""")} AS trend_strength
              |FROM ag ORDER BY event_type""".stripMargin)),

    // Longest consecutive-day activity streak per user — gaps-and-islands
    // on the distinct (user, day) collapse; island id = day − row_number.
    // Best island per user by (length DESC, start ASC); day columns cross
    // the gate as formatted strings (DATE discipline).
    "q248_activity_streaks" -> Q(
      (s, d) => graft.operators.EventOps.activityStreaks(
          Tables.events(s, d), "user_id", "ts")
        .orderBy("user"),
      Some("""WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
             |  FROM events),
             |i AS (SELECT u, d, d - CAST(row_number() OVER (PARTITION BY u
             |  ORDER BY d) AS INT) AS g FROM ud),
             |isl AS (SELECT u, g, count(*) AS len, min(d) AS s, max(d) AS f
             |  FROM i GROUP BY u, g),
             |r AS (SELECT u, len, s, f,
             |  row_number() OVER (PARTITION BY u ORDER BY len DESC, s) AS rn,
             |  sum(len) OVER (PARTITION BY u) AS nad,
             |  count(*) OVER (PARTITION BY u) AS ns FROM isl)
             |SELECT u AS user, CAST(nad AS BIGINT) AS n_active_days,
             |  ns AS n_streaks, len AS longest_streak,
             |  strftime(s, '%Y-%m-%d') AS streak_start,
             |  strftime(f, '%Y-%m-%d') AS streak_end
             |FROM r WHERE rn = 1 ORDER BY u""".stripMargin)),

    // RFM segmentation: per-user recency/frequency/monetary scored 1-5 by
    // empirical quintile THRESHOLDS (one scalar percentile agg broadcast
    // back — no global ranking window; 100 TB swap = approx_percentile).
    // Cuts and monetary are dec6-rounded on both engines before the
    // comparison, so interpolated cut bits can never disagree.
    "q253_rfm_segments" -> Q(
      (s, d) => graft.operators.EventOps.rfmSegments(
          Tables.events(s, d), "user_id", "ts", "value", scoreOut = dec6)
        .orderBy("user"),
      Some(s"""WITH pu AS (SELECT user_id AS u,
              |    date_diff('day', max(CAST(ts AS DATE)),
              |      (SELECT max(CAST(ts AS DATE)) FROM events)) AS rec,
              |    count(*) AS freq, ${r6("sum(value)")} AS mon
              |  FROM events GROUP BY user_id),
              |cuts AS (SELECT
              |    list_transform(quantile_cont(rec, [0.2, 0.4, 0.6, 0.8]),
              |      x -> ${r6("x")}) AS cr,
              |    list_transform(quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]),
              |      x -> ${r6("x")}) AS cf,
              |    list_transform(quantile_cont(mon, [0.2, 0.4, 0.6, 0.8]),
              |      x -> ${r6("x")}) AS cm
              |  FROM pu),
              |sc AS (SELECT u, rec, freq, mon,
              |    1 + len(list_filter(cr, c -> rec < c)) AS r_score,
              |    1 + len(list_filter(cf, c -> freq > c)) AS f_score,
              |    1 + len(list_filter(cm, c -> mon > c)) AS m_score
              |  FROM pu, cuts)
              |SELECT u AS user, CAST(rec AS INT) AS recency_days, freq AS frequency,
              |  mon AS monetary, r_score, f_score, m_score,
              |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
              |      THEN 'champion'
              |    WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
              |    WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
              |    WHEN r_score <= 2 THEN 'hibernating'
              |    ELSE 'regular' END AS segment
              |FROM sc ORDER BY u""".stripMargin)),

    // Weekly-cohort DOLLAR retention matrix: revenue per (first-activity
    // week, age-in-weeks) with the week-0 share — "value came back", not
    // just "users came back". One user-keyed agg joined back on the same
    // key, one matrix agg, cohort-sized week-0 broadcast.
    "q263_revenue_cohorts" -> Q(
      (s, d) => graft.operators.EventOps.revenueCohorts(
          Tables.events(s, d), "user_id", "ts", "value", scoreOut = dec6)
        .orderBy("cohort_week", "age_weeks"),
      Some(s"""WITH ev AS (SELECT user_id AS u,
              |    CAST(date_trunc('week', ts) AS DATE) AS w, value AS v
              |  FROM events),
              |fw AS (SELECT u, min(w) AS cw FROM ev GROUP BY u),
              |cells AS (SELECT cw,
              |    CAST(floor(date_diff('day', cw, w) / 7) AS INT) AS age_weeks,
              |    count(DISTINCT u) AS n_active_users, sum(v) AS rev
              |  FROM ev JOIN fw USING (u) GROUP BY 1, 2),
              |w0 AS (SELECT cw, rev AS rev0 FROM cells WHERE age_weeks = 0)
              |SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, age_weeks,
              |  n_active_users, ${r6("rev")} AS revenue,
              |  ${r6("rev / rev0")} AS pct_of_week0
              |FROM cells JOIN w0 USING (cw)
              |ORDER BY cohort_week, age_weeks""".stripMargin)),

    // Weekly growth accounting: new/retained/resurrected per active
    // (user, week) from the gap to the PREVIOUS active week; churned
    // emitted the week after the last activity. new + resurrected −
    // churned telescopes to the net-active delta. One user-partitioned
    // window over the distinct (user, week) collapse.
    "q265_growth_accounting" -> Q(
      (s, d) => graft.operators.EventOps.growthAccounting(
          Tables.events(s, d), "user_id", "ts")
        .orderBy("week"),
      Some("""WITH uw AS (SELECT DISTINCT user_id AS u,
             |    CAST(date_trunc('week', ts) AS DATE) AS w FROM events),
             |m AS (SELECT u, w, lag(w) OVER pw AS lw, lead(w) OVER pw AS nw
             |  FROM uw WINDOW pw AS (PARTITION BY u ORDER BY w)),
             |r AS (SELECT w, CASE WHEN lw IS NULL THEN 'new'
             |    WHEN date_diff('day', lw, w) = 7 THEN 'retained'
             |    ELSE 'resurrected' END AS cls FROM m
             |  UNION ALL
             |  SELECT w + 7, 'churned' FROM m
             |  WHERE nw IS NULL OR date_diff('day', w, nw) > 7)
             |SELECT strftime(w, '%Y-%m-%d') AS week,
             |  count(CASE WHEN cls = 'new' THEN 1 END) AS n_new,
             |  count(CASE WHEN cls = 'retained' THEN 1 END) AS n_retained,
             |  count(CASE WHEN cls = 'resurrected' THEN 1 END) AS n_resurrected,
             |  count(CASE WHEN cls = 'churned' THEN 1 END) AS n_churned
             |FROM r GROUP BY w ORDER BY week""".stripMargin)),

    // Peak session concurrency per day — the sweep-line classic: ±1
    // deltas at session starts/ends (30-min gap sessions), ONE globally
    // ordered running sum on the range-partitioned two-phase
    // orderedPrefixSum (the q172/q175 machinery — no single-partition
    // window anywhere), then a per-day max. Starts sort before ends at
    // the same instant (d DESC) so single-event sessions still register.
    "q266_peak_concurrency" -> Q(
      (s, d) => {
        val sess = graft.streaming.Sessionize.sessionizeBatch(
            Tables.events(s, d), "user_id", "ts", "value", "event_id",
            gapSeconds = 1800L)
          .select(col("user_id").as("u"), col("session_idx").as("si"),
            col("session_start").as("st"), col("session_end").as("en"))
        val deltas = sess.select(col("st").as("t"), lit(1).as("dl"),
            col("u"), col("si"))
          .unionAll(sess.select(col("en").as("t"), lit(-1).as("dl"),
            col("u"), col("si")))
        graft.operators.CorpusOps.orderedPrefixSum(deltas,
            Seq(col("t").asc, col("dl").desc, col("u").asc, col("si").asc),
            col("dl").cast("long"), "conc")
          .groupBy(date_format(to_date(col("t")), "yyyy-MM-dd").as("day"))
          .agg(max(col("conc")).cast("long").as("peak_concurrent"),
            count(when(col("dl") === 1, 1)).as("n_sessions_started"))
          .orderBy("day")
      },
      Some(s"""WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us
              |  FROM events),
              |marked AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
              |    OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns
              |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
              |numbered AS (SELECT *, sum(ns) OVER (PARTITION BY user_id
              |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS si
              |  FROM marked),
              |sess AS (SELECT user_id AS u, si, min(ts) AS st, max(ts) AS en
              |  FROM numbered GROUP BY u, si),
              |deltas AS (SELECT st AS t, 1 AS dl, u, si FROM sess
              |  UNION ALL SELECT en, -1, u, si FROM sess),
              |cum AS (SELECT t, dl,
              |    sum(dl) OVER (ORDER BY t, dl DESC, u, si
              |      ROWS UNBOUNDED PRECEDING) AS conc
              |  FROM deltas)
              |SELECT strftime(CAST(t AS DATE), '%Y-%m-%d') AS day,
              |  CAST(max(conc) AS BIGINT) AS peak_concurrent,
              |  count(CASE WHEN dl = 1 THEN 1 END) AS n_sessions_started
              |FROM cum GROUP BY 1 ORDER BY day""".stripMargin)),
  )
}
