package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.CorpusOps
import Q.{dec4, dec6, r4, r6}
import scala.collection.immutable.ListMap

/** Statistical-inference gate entries split out of ExtrasQ (round-9
  * hygiene; the experiment-design/causal entries moved on to
  * [[ExperimentQ]] in round 10, the series-diagnostic / survival /
  * regression entries to [[SeriesStatQ]] in round 12): hypothesis
  * tests (Welch, KS, Mann-Whitney, ANOVA, Kruskal-Wallis), robust
  * statistics (MAD, Tukey, winsorized), distribution forensics
  * (Benford, Hill, Cramér's V, entropy, burstiness), correlation
  * (matrix, rolling, Spearman), and the quantile machinery. Same
  * Q/oracle discipline as every other suite. */
object StatQ {

  val queries: ListMap[String, Q] = ListMap(

    // Two-sample KS drift test: exact ECDF max-gap between the first and
    // second half of the month, with the 95% critical line — the
    // nonparametric complement of the binned PSI (q142).
    "q170_ks_test" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val cut = lit("2024-01-16").cast("timestamp")
        graft.operators.StatOps.ksTest(
          ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
          "value", scoreOut = dec6)
      },
      Some(s"""WITH ra AS (SELECT CAST(value AS DOUBLE) AS x FROM events
              |  WHERE ts < TIMESTAMP '2024-01-16'),
              |rb AS (SELECT CAST(value AS DOUBLE) AS x FROM events
              |  WHERE ts >= TIMESTAMP '2024-01-16'),
              |ca AS (SELECT x, count(*) AS c FROM ra GROUP BY x),
              |cb AS (SELECT x, count(*) AS c FROM rb GROUP BY x),
              |ea AS (SELECT x, CAST(sum(c) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
              |    AS DOUBLE) / (SELECT sum(c) FROM ca) AS f,
              |  (SELECT sum(c) FROM ca) AS n_ref FROM ca),
              |eb AS (SELECT x, CAST(sum(c) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
              |    AS DOUBLE) / (SELECT sum(c) FROM cb) AS f,
              |  (SELECT sum(c) FROM cb) AS n_cur FROM cb),
              |j AS (SELECT coalesce(ea.x, eb.x) AS x, ea.f AS f_ref, eb.f AS f_cur,
              |  ea.n_ref, eb.n_cur FROM ea FULL OUTER JOIN eb ON ea.x = eb.x),
              |ff AS (SELECT
              |  coalesce(last_value(f_ref IGNORE NULLS)
              |    OVER (ORDER BY x ROWS UNBOUNDED PRECEDING), 0.0) AS fr,
              |  coalesce(last_value(f_cur IGNORE NULLS)
              |    OVER (ORDER BY x ROWS UNBOUNDED PRECEDING), 0.0) AS fc,
              |  n_ref, n_cur FROM j),
              |agg AS (SELECT CAST(max(n_ref) AS BIGINT) AS n_ref,
              |  CAST(max(n_cur) AS BIGINT) AS n_cur,
              |  max(abs(fr - fc)) AS d FROM ff)
              |SELECT n_ref, n_cur, ${r6("d")} AS ks_d,
              |  ${r6("1.358 * sqrt(CAST(n_ref + n_cur AS DOUBLE) / (n_ref * n_cur))")}
              |    AS d_crit_95,
              |  CAST(d > 1.358 * sqrt(CAST(n_ref + n_cur AS DOUBLE) / (n_ref * n_cur))
              |    AS INT) AS drifted
              |FROM agg""".stripMargin)),



    // Mann-Whitney U between the two month halves: rank-based location-
    // shift test with midrank ties + tie-corrected sigma — ranks live on
    // the distinct-value table, not the row stream.
    "q171_mann_whitney" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val cut = lit("2024-01-16").cast("timestamp")
        graft.operators.StatOps.mannWhitneyU(
          ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
          "value", scoreOut = dec6)
      },
      Some(s"""WITH pooled AS (
              |  SELECT CAST(value AS DOUBLE) AS x, 'a' AS s FROM events
              |    WHERE ts < TIMESTAMP '2024-01-16'
              |  UNION ALL
              |  SELECT CAST(value AS DOUBLE) AS x, 'b' AS s FROM events
              |    WHERE ts >= TIMESTAMP '2024-01-16'),
              |bv AS (SELECT x, count(*) AS t,
              |  sum(CASE WHEN s = 'a' THEN 1 ELSE 0 END) AS ta
              |  FROM pooled GROUP BY x),
              |rk AS (SELECT t, ta,
              |  (sum(t) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) * 2 - t + 1) / 2.0
              |    AS midrank FROM bv),
              |ag AS (SELECT CAST(sum(ta) AS DOUBLE) AS na,
              |  CAST(sum(t - ta) AS DOUBLE) AS nb,
              |  sum(ta * midrank) AS ra,
              |  CAST(sum(t * t * t - t) AS DOUBLE) AS tie FROM rk),
              |st AS (SELECT na, nb, ra - na * (na + 1) / 2 AS u,
              |  na * nb / 2.0 AS mu,
              |  sqrt(na * nb / 12.0 * ((na + nb + 1)
              |    - tie / ((na + nb) * (na + nb - 1)))) AS sigma FROM ag)
              |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
              |  ${r6("u")} AS u, ${r6("mu")} AS mu, ${r6("sigma")} AS sigma,
              |  ${r6("(u - mu) / sigma")} AS z,
              |  CAST(abs((u - mu) / sigma) > 1.96 AS INT) AS significant_95
              |FROM st""".stripMargin)),



    // Gini coefficient of per-user event-count concentration — how
    // unequally activity distributes across users.
    "q172_gini_activity" -> Q(
      (s, d) => {
        val perUser = Tables.events(s, d)
          .groupBy("user_id").agg(count(lit(1)).as("n_events"))
        graft.operators.StatOps.giniConcentration(perUser, "user_id",
          "n_events", scoreOut = dec6)
      },
      Some(s"""WITH pu AS (SELECT user_id, CAST(count(*) AS DOUBLE) AS x
              |  FROM events GROUP BY user_id),
              |rk AS (SELECT x, row_number() OVER (ORDER BY x, user_id) AS i FROM pu),
              |ag AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS tot,
              |  sum(i * x) AS ix FROM rk)
              |SELECT CAST(n AS BIGINT) AS n_units, ${r6("tot")} AS total,
              |  ${r6("2.0 * ix / (n * tot) - (n + 1) / n")} AS gini
              |FROM ag""".stripMargin)),



    // Sketch-binned KS (rows-only: approx_percentile boundaries are not
    // reproducible in DuckDB) — the 100 TB form of q170 for continuous
    // measures: ECDFs over 64 pooled-quantile bins, support table
    // bins-sized by construction. SketchBinnedSpec pins the error bound
    // against the exact q170 statistic.
    "q178_ks_binned" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val cut = lit("2024-01-16").cast("timestamp")
        graft.operators.StatOps.ksTestBinned(
          ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
          "value", bins = 64, scoreOut = dec6)
      }),



    // Sketch-binned Mann-Whitney (rows-only, same reason) — q171's
    // midrank algebra on the 64-bin pooled-quantile index; rank table
    // bins-sized by construction. SketchBinnedSpec pins the z tolerance.
    "q179_mw_binned" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val cut = lit("2024-01-16").cast("timestamp")
        graft.operators.StatOps.mannWhitneyUBinned(
          ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
          "value", bins = 64, scoreOut = dec6)
      }),



    // Benford first-digit forensics on the value column: observed vs
    // log10(1+1/d) expectation with chi-square terms — the fabricated-
    // data test; the first digit derives from log10-floor normalization,
    // no string formatting.
    "q167_benford_digits" -> Q(
      (s, d) => graft.operators.StatOps.benfordDigits(
          Tables.events(s, d), "value", scoreOut = dec6)
        .orderBy("digit"),
      Some(s"""WITH x AS (SELECT CAST(value AS DOUBLE) AS v FROM events
              |  WHERE CAST(value AS DOUBLE) > 0),
              |dg AS (SELECT CAST(floor(v / pow(10.0, floor(log10(v)))) AS INT)
              |  AS digit FROM x),
              |c AS (SELECT digit, count(*) AS n FROM dg GROUP BY digit),
              |t AS (SELECT sum(n) AS nt FROM c),
              |p AS (SELECT digit, n, CAST(n AS DOUBLE) / nt AS p_obs,
              |  log10(1.0 + 1.0 / digit) AS p_benford, nt FROM c, t)
              |SELECT digit, n, ${r6("p_obs")} AS p_obs,
              |  ${r6("p_benford")} AS p_benford,
              |  ${r6("nt * (p_obs - p_benford) * (p_obs - p_benford) / p_benford")}
              |    AS chi2_term
              |FROM p ORDER BY digit""".stripMargin)),



    // Entropy rate of the event-type process under its Markov model —
    // how predictable the next action is (bot/template detection).
    "q166_sequence_entropy" -> Q(
      (s, d) => graft.operators.EventOps.sequenceEntropyRate(
        Tables.events(s, d), "user_id", "ts", "event_id", "event_type",
        scoreOut = dec6),
      Some(s"""WITH x AS (SELECT event_type AS cur,
              |  lead(event_type) OVER (PARTITION BY user_id
              |    ORDER BY ts, event_id) AS nxt FROM events),
              |pc AS (SELECT cur, nxt, count(*) AS n FROM x
              |  WHERE nxt IS NOT NULL GROUP BY cur, nxt),
              |tot AS (SELECT sum(n) AS nt FROM pc),
              |rowp AS (SELECT cur, n,
              |  CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY cur) AS p FROM pc),
              |agg AS (SELECT sum((CAST(n AS DOUBLE) / nt) * -ln(p)) AS h,
              |  count(DISTINCT cur) AS ns, max(nt) AS ntr FROM rowp, tot)
              |SELECT CAST(ntr AS BIGINT) AS n_transitions,
              |  CAST(ns AS BIGINT) AS n_states,
              |  ${r6("h")} AS entropy_rate,
              |  ${r6("ln(CAST(ns AS DOUBLE))")} AS max_entropy,
              |  ${r6("1.0 - h / ln(CAST(ns AS DOUBLE))")} AS predictability
              |FROM agg""".stripMargin)),



    // Inter-arrival burstiness per user (Goh-Barabási B): metronomes at
    // −1, Poisson at 0, bursts toward 1 — bot-vs-organic separation.
    // Limited to 40 users for a bounded gate result.
    "q176_burstiness" -> Q(
      (s, d) => graft.operators.EventOps.burstiness(
          Tables.events(s, d).filter(col("user_id") < 40),
          "user_id", "ts", "event_id", scoreOut = dec6)
        .orderBy("user_id"),
      Some(s"""WITH g AS (SELECT user_id,
              |  (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
              |    ORDER BY ts, event_id)) / 1000000.0 AS gap
              |  FROM events WHERE user_id < 40),
              |a AS (SELECT user_id, count(*) AS n_gaps, avg(gap) AS m,
              |  stddev_pop(gap) AS sd FROM g WHERE gap IS NOT NULL
              |  GROUP BY user_id)
              |SELECT user_id, n_gaps, ${r6("m")} AS mean_gap_s,
              |  ${r6("sd")} AS std_gap_s,
              |  ${r6("(sd - m) / (sd + m)")} AS burstiness
              |FROM a WHERE n_gaps >= 2 ORDER BY user_id""".stripMargin)),



    // Robust outliers via MAD modified z-score (|0.6745·(x−med)/MAD| > 3.5)
    // — immune to the outliers it hunts, unlike the σ-based detectors.
    // Exact interpolated medians on both engines.
    "q157_mad_outliers" -> Q(
      (s, d) => graft.operators.StatOps.madOutliers(
          Tables.events(s, d), "event_type", "value", zCut = 3.5, scoreOut = dec6)
        .orderBy("event_type"),
      Some(s"""WITH x AS (SELECT event_type, CAST(value AS DOUBLE) AS v FROM events),
              |m AS (SELECT event_type, quantile_cont(v, 0.5) AS med FROM x
              |  GROUP BY event_type),
              |wm AS (SELECT x.event_type, v, med FROM x JOIN m USING (event_type)),
              |md AS (SELECT event_type, max(med) AS med,
              |  quantile_cont(abs(v - med), 0.5) AS mad FROM wm GROUP BY event_type),
              |f AS (SELECT wm.event_type, v, md.med, md.mad,
              |  CASE WHEN md.mad > 0
              |    AND abs(0.6745 * (v - md.med) / md.mad) > 3.5
              |    THEN 1 ELSE 0 END AS flag
              |  FROM wm JOIN md USING (event_type))
              |SELECT event_type, count(*) AS n, ${r6("max(med)")} AS med,
              |  ${r6("max(mad)")} AS mad,
              |  CAST(sum(flag) AS BIGINT) AS n_outliers
              |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin)),



    // Winsorized mean per event type: clamp at the [p05, p95] group
    // percentiles, then average — robust location without discarding rows.
    "q190_winsorized_stats" -> Q(
      (s, d) => graft.operators.EventOps.winsorizedStats(
          Tables.events(s, d), "event_type", "value", pLo = 0.05, pHi = 0.95,
          scoreOut = dec6)
        .orderBy("event_type"),
      Some(s"""WITH b AS (SELECT event_type, CAST(value AS DOUBLE) AS v FROM events),
              |q AS (SELECT event_type, quantile_cont(v, 0.05) AS lo,
              |  quantile_cont(v, 0.95) AS hi FROM b GROUP BY event_type)
              |SELECT b.event_type, count(*) AS n,
              |  CAST(sum(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
              |  CAST(sum(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
              |  ${r6("max(lo)")} AS p_lo, ${r6("max(hi)")} AS p_hi,
              |  ${r6("avg(v)")} AS mean_raw,
              |  ${r6("avg(least(greatest(v, lo), hi))")} AS mean_winsorized
              |FROM b JOIN q USING (event_type)
              |GROUP BY b.event_type ORDER BY b.event_type""".stripMargin)),



    // Pairwise correlation matrix across the event-type hourly series
    // (upper triangle, explicit moment formula — which metrics co-move).
    "q192_corr_matrix" -> Q(
      (s, d) => graft.operators.SeasonalOps.seriesCorrMatrix(
          Tables.events(s, d), "event_type", "ts", "value", scoreOut = dec6)
        .orderBy("series_a", "series_b"),
      Some(s"""WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
              |  avg(CAST(value AS DOUBLE)) AS y FROM events GROUP BY 1, 2),
              |j AS (SELECT a.event_type AS series_a, b.event_type AS series_b,
              |  a.y AS ya, b.y AS yb
              |  FROM hourly a JOIN hourly b ON a.h = b.h
              |  WHERE a.event_type < b.event_type),
              |m AS (SELECT series_a, series_b, count(*) AS n,
              |  avg(ya) AS ma, avg(yb) AS mb, avg(ya * yb) AS mab,
              |  avg(ya * ya) AS maa, avg(yb * yb) AS mbb
              |  FROM j GROUP BY 1, 2)
              |SELECT series_a, series_b, n AS n_hours,
              |  ${r6("""(mab - ma * mb)
              |    / (sqrt(maa - ma * ma) * sqrt(mbb - mb * mb))""")} AS corr
              |FROM m ORDER BY series_a, series_b""".stripMargin)),



    // Rolling pairwise correlation summary — q192's static number as a
    // stability read: trailing-24h Pearson r per series pair over the
    // shared hourly grid, summarized per pair. Pair-partitioned windows
    // over the panel-bounded hour-keyed self-join.
    "q240_rolling_corr" -> Q(
      (s, d) => graft.operators.SeasonalOps.rollingPairCorr(
          Tables.events(s, d), "event_type", "ts", "value",
          windowHours = 24, scoreOut = dec6)
        .orderBy("series_a", "series_b"),
      Some(s"""WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
              |  avg(CAST(value AS DOUBLE)) AS y FROM events GROUP BY 1, 2),
              |j AS (SELECT a.event_type AS series_a, b.event_type AS series_b,
              |  a.h AS h, a.y AS ya, b.y AS yb
              |  FROM hourly a JOIN hourly b ON a.h = b.h
              |  WHERE a.event_type < b.event_type),
              |w AS (SELECT series_a, series_b,
              |  count(*) OVER f AS c,
              |  avg(ya) OVER f AS ma, avg(yb) OVER f AS mb,
              |  avg(ya * yb) OVER f AS mab,
              |  avg(ya * ya) OVER f AS maa, avg(yb * yb) OVER f AS mbb
              |  FROM j
              |  WINDOW f AS (PARTITION BY series_a, series_b ORDER BY h
              |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
              |r AS (SELECT series_a, series_b,
              |  (mab - ma * mb) / (sqrt(maa - ma * ma) * sqrt(mbb - mb * mb))
              |    AS r
              |  FROM w WHERE c = 24 AND maa - ma * ma > 0
              |    AND mbb - mb * mb > 0)
              |SELECT series_a, series_b, count(*) AS n_windows,
              |  ${r6("avg(r)")} AS mean_r, ${r6("min(r)")} AS min_r,
              |  ${r6("max(r)")} AS max_r
              |FROM r GROUP BY 1, 2 ORDER BY series_a, series_b""".stripMargin)),



    // Per-series quantile normalization: value → (rank − 0.5)/n within its
    // event_type — the rank-uniform feature transform (step one of
    // rank-gauss / quantile mapping). Ranks come from the GROUPED
    // range-partitioned prefix sum (no per-series single-partition sort
    // however large one series is); output thinned to every 100th event id
    // to keep the gate frame bounded.
    "q186_quantile_norm" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), col("event_id"),
            col("value").cast("double").as("v"))
        val n = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
        CorpusOps.orderedPrefixSum(ev,
            Seq(col("v").asc, col("event_id").asc), lit(1L), "rn",
            groupCols = Seq("event_type"))
          .join(n, Seq("event_type"))
          .filter(col("event_id") % 100 === 0)
          .select(col("event_type"), col("event_id"), col("v").as("value"),
            col("rn").cast("long").as("rank"),
            dec6((col("rn") - lit(0.5)) / col("n")).as("q_norm"))
          .orderBy("event_type", "event_id")
      },
      Some(s"""WITH r AS (SELECT event_type, event_id,
              |  CAST(value AS DOUBLE) AS value,
              |  row_number() OVER (PARTITION BY event_type
              |    ORDER BY CAST(value AS DOUBLE), event_id) AS rn,
              |  count(*) OVER (PARTITION BY event_type) AS n
              |  FROM events)
              |SELECT event_type, event_id, value, CAST(rn AS BIGINT) AS "rank",
              |  ${r6("(rn - 0.5) / n")} AS q_norm
              |FROM r WHERE event_id % 100 = 0
              |ORDER BY event_type, event_id""".stripMargin)),



    // Per-(type, day) latency-style quantile report (p50/p90/p99 + count)
    // — the SLA rollup. Exact `percentile` per group at gate scale; the
    // documented 100 TB swap is approx_percentile with the same contract.
    // Groups are day-sized so the per-group sort state is bounded.
    "q259_latency_quantiles" -> Q(
      (s, d) => {
        val qs = array(lit(0.5), lit(0.9), lit(0.99))
        Tables.events(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("__d"))
          .agg(count(lit(1)).as("n"),
            percentile(col("value").cast("double"), qs).as("__q"))
          .select(col("event_type"),
            date_format(col("__d"), "yyyy-MM-dd").as("day"), col("n"),
            dec6(element_at(col("__q"), 1)).as("p50"),
            dec6(element_at(col("__q"), 2)).as("p90"),
            dec6(element_at(col("__q"), 3)).as("p99"))
          .orderBy("event_type", "day")
      },
      Some(s"""SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
              |  count(*) AS n,
              |  ${r6("quantile_cont(value, 0.5)")} AS p50,
              |  ${r6("quantile_cont(value, 0.9)")} AS p90,
              |  ${r6("quantile_cont(value, 0.99)")} AS p99
              |FROM events GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin)),



    // Tukey boxplot fences per type: q1/q3 (exact percentile; rounded on
    // BOTH engines before the fence arithmetic so the comparison boundary
    // is bit-identical), counts beyond q1-1.5*IQR / q3+1.5*IQR — the
    // distribution-free outlier screen beside MAD (q157).
    "q262_tukey_outliers" -> Q(
      (s, d) => graft.operators.StatOps.tukeyFences(
          Tables.events(s, d), "event_type", "value", k = 1.5, scoreOut = dec6)
        .orderBy("series"),
      Some(s"""WITH q AS (SELECT event_type AS series,
              |    ${r6("quantile_cont(value, 0.25)")} AS q1,
              |    ${r6("quantile_cont(value, 0.75)")} AS q3
              |  FROM events GROUP BY 1),
              |f AS (SELECT series, q1, q3, q1 - 1.5 * (q3 - q1) AS lo,
              |    q3 + 1.5 * (q3 - q1) AS hi FROM q)
              |SELECT series, count(*) AS n, q1, q3,
              |  ${r6("lo")} AS lo_fence, ${r6("hi")} AS hi_fence,
              |  count(CASE WHEN value < lo THEN 1 END) AS n_low,
              |  count(CASE WHEN value > hi THEN 1 END) AS n_high
              |FROM events JOIN f ON event_type = series
              |GROUP BY series, q1, q3, lo, hi ORDER BY series""".stripMargin)),



    // Embedding L2-norm outliers per label via the same Tukey fences —
    // the cheap embedding-hygiene screen (degenerate/exploding vectors)
    // before any ANN index build. The norm is the identical sequential
    // fold on both engines.
    "q264_norm_outliers" -> Q(
      (s, d) => graft.operators.StatOps.tukeyFences(
          Tables.embeddings(s, d).select(col("label"),
            graft.operators.SimilarityOps.norm(
              col("embedding").cast("array<double>")).as("nrm")),
          "label", "nrm", k = 1.5, scoreOut = dec6)
        .orderBy("series"),
      Some(s"""WITH e AS (SELECT label AS series,
              |  sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
              |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
              |    (acc, y) -> acc + y)) AS v FROM embeddings),
              |q AS (SELECT series, ${r6("quantile_cont(v, 0.25)")} AS q1,
              |    ${r6("quantile_cont(v, 0.75)")} AS q3
              |  FROM e GROUP BY 1),
              |f AS (SELECT series, q1, q3, q1 - 1.5 * (q3 - q1) AS lo,
              |    q3 + 1.5 * (q3 - q1) AS hi FROM q)
              |SELECT e.series, count(*) AS n, q1, q3,
              |  ${r6("lo")} AS lo_fence, ${r6("hi")} AS hi_fence,
              |  count(CASE WHEN v < lo THEN 1 END) AS n_low,
              |  count(CASE WHEN v > hi THEN 1 END) AS n_high
              |FROM e JOIN f ON e.series = f.series
              |GROUP BY e.series, q1, q3, lo, hi ORDER BY e.series""".stripMargin)),



    // Weekend-lift Welch t-test per type: unequal-variance t on the value
    // mean, weekday arm vs weekend arm, Welch-Satterthwaite df — the
    // continuous-measure companion of the q168 proportion z-test.
    "q267_weekend_welch" -> Q(
      (s, d) => graft.operators.StatOps.welchTTest(
          Tables.events(s, d), "event_type", "value",
          isB = dayofweek(col("ts")).isin(1, 7), scoreOut = dec6)
        .orderBy("series"),
      Some(s"""WITH m AS (SELECT event_type AS series,
              |    CAST(count(CASE WHEN isodow(ts) < 6 THEN 1 END) AS DOUBLE) AS na,
              |    CAST(count(CASE WHEN isodow(ts) >= 6 THEN 1 END) AS DOUBLE) AS nb,
              |    avg(CASE WHEN isodow(ts) < 6 THEN value END) AS ma,
              |    avg(CASE WHEN isodow(ts) >= 6 THEN value END) AS mb,
              |    var_samp(CASE WHEN isodow(ts) < 6 THEN value END) AS va,
              |    var_samp(CASE WHEN isodow(ts) >= 6 THEN value END) AS vb
              |  FROM events GROUP BY 1),
              |x AS (SELECT series, na, nb, ma, mb,
              |    (ma - mb) / sqrt(va / na + vb / nb) AS t,
              |    (va / na + vb / nb) * (va / na + vb / nb) /
              |      ((va / na) * (va / na) / (na - 1)
              |        + (vb / nb) * (vb / nb) / (nb - 1)) AS dof
              |  FROM m)
              |SELECT series, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
              |  ${r6("ma")} AS mean_a, ${r6("mb")} AS mean_b,
              |  ${r6("t")} AS t_stat, ${r6("dof")} AS df,
              |  CAST(abs(t) > 1.96 AS INT) AS significant_95
              |FROM x ORDER BY series""".stripMargin)),



    // Cramér's V between event_type and the props k-decile — the "are
    // these two labels redundant" categorical-association screen (the
    // sibling of q232's kappa for rater agreement). Chi-square over the
    // observed contingency cells + the closed-form zero-cell correction
    // (n - sum of observed expected) — no dense cell cross-join.
    "q268_cramers_v" -> Q(
      (s, d) => graft.operators.StatOps.cramersV(
          Tables.events(s, d).select(col("event_type").as("a"),
            (get_json_object(col("props"), "$.k").cast("int") / lit(10))
              .cast("int").as("b")),
          "a", "b", scoreOut = dec6),
      Some(s"""WITH base AS (SELECT event_type AS a,
              |    CAST(json_extract_string(props, '$$.k') AS INT) // 10 AS b
              |  FROM events WHERE event_type IS NOT NULL
              |    AND json_extract_string(props, '$$.k') IS NOT NULL),
              |cells AS (SELECT a, b, CAST(count(*) AS DOUBLE) AS o
              |  FROM base GROUP BY a, b),
              |ra AS (SELECT a, sum(o) AS rr FROM cells GROUP BY a),
              |cb AS (SELECT b, sum(o) AS cc FROM cells GROUP BY b),
              |tot AS (SELECT sum(o) AS n,
              |    CAST(count(DISTINCT a) AS DOUBLE) AS r,
              |    CAST(count(DISTINCT b) AS DOUBLE) AS c FROM cells),
              |sc AS (SELECT n, r, c, rr * cc / n AS e, o
              |  FROM cells JOIN ra USING (a) JOIN cb USING (b), tot),
              |ag AS (SELECT n, r, c,
              |    sum((o - e) * (o - e) / e) AS chiObs, sum(e) AS eObs
              |  FROM sc GROUP BY n, r, c)
              |SELECT CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS n_rows_cat,
              |  CAST(c AS BIGINT) AS n_cols_cat,
              |  ${r6("chiObs + (n - eObs)")} AS chi2,
              |  ${r6("sqrt((chiObs + (n - eObs)) / (n * least(r - 1, c - 1)))")} AS cramers_v
              |FROM ag""".stripMargin)),


    // Spearman rank-correlation matrix per series pair — the monotone
    // complement of the q192 Pearson matrix: midranks WITHIN each pair's
    // joined sample, over dec6-rounded hourly means (rank-over-rounded),
    // then Pearson on ranks via explicit moments.
    "q273_spearman_matrix" -> Q(
      (s, d) => graft.operators.StatOps.spearmanMatrix(
          Tables.events(s, d), "event_type", "ts", "value", scoreOut = dec6)
        .orderBy("series_a", "series_b"),
      Some(s"""WITH hourly AS (SELECT event_type AS s,
              |    date_trunc('hour', ts) AS h,
              |    ${r6("avg(CAST(value AS DOUBLE))")} AS y
              |  FROM events GROUP BY 1, 2),
              |j AS (SELECT a.s AS sa, b.s AS sb, a.y AS ya, b.y AS yb
              |  FROM hourly a JOIN hourly b ON a.h = b.h AND a.s < b.s),
              |rk AS (SELECT sa, sb,
              |  rank() OVER (PARTITION BY sa, sb ORDER BY ya)
              |    + (count(*) OVER (PARTITION BY sa, sb, ya) - 1) / 2.0 AS ra,
              |  rank() OVER (PARTITION BY sa, sb ORDER BY yb)
              |    + (count(*) OVER (PARTITION BY sa, sb, yb) - 1) / 2.0 AS rb
              |  FROM j),
              |m AS (SELECT sa, sb, count(*) AS n_hours,
              |    avg(ra * rb) AS mab, avg(ra) AS ma, avg(rb) AS mb,
              |    avg(ra * ra) AS maa, avg(rb * rb) AS mbb
              |  FROM rk GROUP BY 1, 2)
              |SELECT sa AS series_a, sb AS series_b, n_hours,
              |  ${r6("(mab - ma * mb) / (sqrt(maa - ma * ma) * sqrt(mbb - mb * mb))")}
              |    AS rho
              |FROM m ORDER BY 1, 2""".stripMargin)),


    // Kruskal-Wallis H across event types (k-group rank ANOVA, the
    // multi-group q171): pooled midranks from the distinct-(value,group)
    // table, tie-corrected H. The nonparametric "do the groups differ"
    // screen run before any parametric per-pair test.
    "q274_kruskal_wallis" -> Q(
      (s, d) => graft.operators.StatOps.kruskalWallis(
          Tables.events(s, d), "event_type", "value", scoreOut = dec6),
      Some(s"""WITH p AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS x
              |  FROM events),
              |bvg AS (SELECT x, g, count(*) AS tg FROM p GROUP BY 1, 2),
              |bv AS (SELECT x, sum(tg) AS t FROM bvg GROUP BY 1),
              |r AS (SELECT x, t,
              |  sum(t) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum
              |  FROM bv),
              |r2 AS (SELECT x, t, (cum * 2 - t + 1) / 2.0 AS midrank FROM r),
              |pg AS (SELECT g, CAST(sum(tg) AS DOUBLE) AS ng,
              |    sum(tg * midrank) AS rg
              |  FROM bvg JOIN r2 USING (x) GROUP BY g),
              |tie AS (SELECT CAST(sum(t * t * t - t) AS DOUBLE) AS tie FROM r2),
              |ag AS (SELECT count(*) AS n_groups, sum(ng) AS nn,
              |    sum(rg * rg / ng) AS sr FROM pg)
              |SELECT n_groups, CAST(nn AS BIGINT) AS n,
              |  ${r6("12.0 / (nn * (nn + 1)) * sr - 3.0 * (nn + 1)")} AS h,
              |  ${r6("(12.0 / (nn * (nn + 1)) * sr - 3.0 * (nn + 1)) / (1.0 - tie / (nn * nn * nn - nn))")}
              |    AS h_corrected,
              |  CAST(n_groups - 1 AS INT) AS df
              |FROM ag, tie""".stripMargin)),


    // Jarque-Bera normality per event type — the screen before trusting
    // any z-score detector. Two-pass centered moments (the q187
    // epoch-centering lesson); S and K rounded before the χ²₂ statistic.
    "q277_jarque_bera" -> Q(
      (s, d) => graft.operators.StatOps.jarqueBera(
          Tables.events(s, d), "event_type", "value", scoreOut = dec6)
        .orderBy("series"),
      Some(s"""WITH x AS (SELECT event_type AS series, CAST(value AS DOUBLE) AS x
              |  FROM events),
              |m AS (SELECT series, avg(x) AS mm FROM x GROUP BY 1),
              |c AS (SELECT x.series AS series, x.x - m.mm AS c
              |  FROM x JOIN m USING (series)),
              |a AS (SELECT series, CAST(count(*) AS DOUBLE) AS n,
              |  avg(c * c) AS m2, avg(c * c * c) AS m3,
              |  avg(c * c * c * c) AS m4 FROM c GROUP BY 1),
              |sk AS (SELECT series, n, ${r6("m3 / pow(m2, 1.5)")} AS skewness,
              |  ${r6("m4 / (m2 * m2) - 3.0")} AS kurtosis_excess FROM a),
              |j AS (SELECT series, CAST(n AS BIGINT) AS n, skewness,
              |  kurtosis_excess,
              |  ${r6("""n / 6.0 * (skewness * skewness
              |    + kurtosis_excess * kurtosis_excess / 4.0)""")} AS jb
              |  FROM sk)
              |SELECT series, n, skewness, kurtosis_excess, jb,
              |  CAST(jb > 5.991 AS INT) AS reject_normal_95
              |FROM j ORDER BY series""".stripMargin)),


    // One-way ANOVA F across event types — the parametric companion of
    // q274 Kruskal-Wallis. Global-mean centering via a scalar crossjoin;
    // mean squares (not raw SS) cross the gate so magnitudes stay in
    // dec6-safe range; F is arithmetic on the rounded mean squares.
    "q278_oneway_anova" -> Q(
      (s, d) => graft.operators.StatOps.onewayAnova(
        Tables.events(s, d), "event_type", "value", scoreOut = dec6),
      Some(s"""WITH x AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS x
              |  FROM events),
              |gm AS (SELECT avg(x) AS gmm FROM x),
              |cx AS (SELECT g, x - gmm AS c FROM x, gm),
              |per AS (SELECT g, CAST(count(*) AS DOUBLE) AS n, avg(c) AS m,
              |  sum(c * c) AS ss FROM cx GROUP BY g),
              |a AS (SELECT count(*) AS k, sum(n) AS nn,
              |  sum(n * m * m) AS ssb, sum(ss - n * m * m) AS ssw FROM per),
              |b AS (SELECT k, CAST(nn AS BIGINT) AS n,
              |  CAST(k - 1 AS INT) AS df1, CAST(nn - k AS BIGINT) AS df2,
              |  ${r6("ssb / (k - 1)")} AS ms_between,
              |  ${r6("ssw / (nn - k)")} AS ms_within,
              |  ${r6("ssb / (ssb + ssw)")} AS eta_sq FROM a)
              |SELECT k, n, df1, df2, ms_between, ms_within, eta_sq,
              |  ${r6("ms_between / ms_within")} AS f
              |FROM b""".stripMargin)),


    // Brown-Forsythe equal-variance test (Levene with the median
    // center): ANOVA on |x − group median|, medians rounded before the
    // deviation. The gate that justifies defaulting to q267 Welch.
    "q279_brown_forsythe" -> Q(
      (s, d) => graft.operators.StatOps.brownForsythe(
        Tables.events(s, d), "event_type", "value", scoreOut = dec6),
      Some(s"""WITH x0 AS (SELECT event_type AS g0, CAST(value AS DOUBLE) AS v
              |  FROM events),
              |md AS (SELECT g0, ${r6("quantile_cont(v, 0.5)")} AS med
              |  FROM x0 GROUP BY 1),
              |x AS (SELECT x0.g0 AS g, abs(x0.v - md.med) AS x
              |  FROM x0 JOIN md USING (g0)),
              |gm AS (SELECT avg(x) AS gmm FROM x),
              |cx AS (SELECT g, x - gmm AS c FROM x, gm),
              |per AS (SELECT g, CAST(count(*) AS DOUBLE) AS n, avg(c) AS m,
              |  sum(c * c) AS ss FROM cx GROUP BY g),
              |a AS (SELECT count(*) AS k, sum(n) AS nn,
              |  sum(n * m * m) AS ssb, sum(ss - n * m * m) AS ssw FROM per),
              |b AS (SELECT k, CAST(nn AS BIGINT) AS n,
              |  CAST(k - 1 AS INT) AS df1, CAST(nn - k AS BIGINT) AS df2,
              |  ${r6("ssb / (k - 1)")} AS ms_between,
              |  ${r6("ssw / (nn - k)")} AS ms_within,
              |  ${r6("ssb / (ssb + ssw)")} AS eta_sq FROM a)
              |SELECT k, n, df1, df2, ms_between, ms_within, eta_sq,
              |  ${r6("ms_between / ms_within")} AS f
              |FROM b""".stripMargin)),


    // Wasserstein-1 drift between the two month halves — the MAGNITUDE
    // companion of q170 KS: the area between the ECDFs, in the measure's
    // own units; the retraining-trigger threshold quantity.
    "q289_wasserstein_drift" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val cut = lit("2024-01-16").cast("timestamp")
        graft.operators.StatOps.wasserstein1(
          ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
          "value", scoreOut = dec6)
      },
      Some(s"""WITH ra AS (SELECT CAST(value AS DOUBLE) AS x FROM events
              |  WHERE ts < TIMESTAMP '2024-01-16'),
              |rb AS (SELECT CAST(value AS DOUBLE) AS x FROM events
              |  WHERE ts >= TIMESTAMP '2024-01-16'),
              |ca AS (SELECT x, count(*) AS c FROM ra GROUP BY x),
              |cb AS (SELECT x, count(*) AS c FROM rb GROUP BY x),
              |ea AS (SELECT x, CAST(sum(c) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
              |    AS DOUBLE) / (SELECT sum(c) FROM ca) AS f,
              |  (SELECT sum(c) FROM ca) AS n_ref FROM ca),
              |eb AS (SELECT x, CAST(sum(c) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
              |    AS DOUBLE) / (SELECT sum(c) FROM cb) AS f,
              |  (SELECT sum(c) FROM cb) AS n_cur FROM cb),
              |j AS (SELECT coalesce(ea.x, eb.x) AS x, ea.f AS f_ref, eb.f AS f_cur,
              |  ea.n_ref, eb.n_cur FROM ea FULL OUTER JOIN eb ON ea.x = eb.x),
              |ff AS (SELECT x,
              |  coalesce(last_value(f_ref IGNORE NULLS)
              |    OVER (ORDER BY x ROWS UNBOUNDED PRECEDING), 0.0) AS fr,
              |  coalesce(last_value(f_cur IGNORE NULLS)
              |    OVER (ORDER BY x ROWS UNBOUNDED PRECEDING), 0.0) AS fc,
              |  lead(x) OVER (ORDER BY x) AS xn,
              |  n_ref, n_cur FROM j)
              |SELECT CAST(max(n_ref) AS BIGINT) AS n_ref,
              |  CAST(max(n_cur) AS BIGINT) AS n_cur,
              |  ${r6("""sum(CASE WHEN xn IS NOT NULL
              |    THEN abs(fr - fc) * (xn - x) END)""")} AS w1
              |FROM ff""".stripMargin)),


    // t-digest quantile rollup — the unbounded-range twin of q141: per-day
    // digests (δ=100) probed at p50/p90/p99, plus the corpus row merged
    // FROM THE DAILY DIGEST ROWS in-plan (graft_tdigest_merge — the
    // stored-sketch-table workflow, no raw rescan). Rows-only: digest
    // bytes are merge-order-specific; TDigestSpec pins the rank-error
    // bounds, rollup accuracy, and repartition invariance of the bound.
    "q285_tdigest_quantiles" -> Q(
      (s, d) => graft.operators.EventOps.tdigestQuantileRollup(
          Tables.events(s, d), "ts", "value", delta = 100, scoreOut = dec6)
        .orderBy("day"),
      None),


    // Cliff's delta ordinal effect size for every event-type pair — the
    // magnitude beside q171's Mann-Whitney p-value, from midranks (never
    // the O(n*m) pairwise matrix), with the Romano et al. bands.
    "q317_cliffs_delta" -> Q(
      (s, d) => graft.operators.StatOps.cliffsDelta(
          Tables.events(s, d), "event_type", "value", scoreOut = dec6)
        .orderBy("series_a", "series_b"),
      Some {
        val delta = """2.0 * (r1 - n_a * (n_a + 1.0) / 2.0)
          |  / (CAST(n_a AS DOUBLE) * n_b) - 1.0""".stripMargin
        s"""WITH base AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
           |  FROM events WHERE value IS NOT NULL),
           |pairs AS (SELECT a.g AS ga, b.g AS gb
           |  FROM (SELECT DISTINCT g FROM base) a,
           |       (SELECT DISTINCT g FROM base) b WHERE a.g < b.g),
           |tagged AS (SELECT ga, gb, g, v FROM base
           |  JOIN pairs ON g = ga OR g = gb),
           |ranked AS (SELECT ga, gb, g,
           |    CAST(rank() OVER (PARTITION BY ga, gb ORDER BY v) AS DOUBLE)
           |      + (CAST(count(*) OVER (PARTITION BY ga, gb, v) AS DOUBLE)
           |         - 1.0) / 2.0 AS mid
           |  FROM tagged),
           |agg AS (SELECT ga, gb,
           |    CAST(sum(CASE WHEN g = ga THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           |    CAST(sum(CASE WHEN g = gb THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           |    sum(CASE WHEN g = ga THEN mid END) AS r1
           |  FROM ranked GROUP BY 1, 2)
           |SELECT ga AS series_a, gb AS series_b, n_a, n_b,
           |  ${r6(delta)} AS cliffs_delta,
           |  CASE WHEN abs(${r6(delta)}) < 0.147 THEN 'negligible'
           |    WHEN abs(${r6(delta)}) < 0.33 THEN 'small'
           |    WHEN abs(${r6(delta)}) < 0.474 THEN 'medium'
           |    ELSE 'large' END AS magnitude
           |FROM agg ORDER BY series_a, series_b""".stripMargin
      }),


    // HBOS unsupervised outlier score over (value, hour-of-day): per
    // feature an equal-width histogram on rounded [min, max]; score =
    // sum of log10(maxcount/count) — the O(n) density scorer beside the
    // model-based detectors (q36/q157/q231). Top-20 by rounded score.
    "q333_hbos" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val melted = ev.select(col("event_id").as("id"), lit("value").as("f"),
            col("value").cast("double").as("x"))
          .unionAll(ev.select(col("event_id").as("id"), lit("hour").as("f"),
            hour(col("ts")).cast("double").as("x")))
        graft.operators.StatOps.hbos(melted, "id", "f", "x",
            nBins = 20, k = 20, scoreOut = dec6)
      },
      Some(s"""WITH melted AS (
              |  SELECT event_id AS id, 'value' AS f,
              |    CAST(value AS DOUBLE) AS x FROM events
              |  UNION ALL
              |  SELECT event_id, 'hour', CAST(hour(ts) AS DOUBLE)
              |  FROM events),
              |span AS (SELECT f, ${r6("min(x)")} AS mn, ${r6("max(x)")} AS mx
              |  FROM melted GROUP BY 1),
              |-- width test on the ROUNDED span (the Spark side's filter)
              |sp2 AS (SELECT f, mn, (mx - mn) / 20.0 AS w FROM span
              |  WHERE mx > mn),
              |binned AS (SELECT id, melted.f AS f,
              |    greatest(0, least(19, CAST(floor((x - mn) / w) AS BIGINT)))
              |      AS b
              |  FROM melted JOIN sp2 ON melted.f = sp2.f),
              |hist AS (SELECT f, b, count(*) AS c FROM binned GROUP BY 1, 2),
              |hm AS (SELECT f, b, c, max(c) OVER (PARTITION BY f) AS maxc
              |  FROM hist)
              |SELECT id, CAST(count(*) AS BIGINT) AS n_features,
              |  ${r6("""sum(ln(CAST(maxc AS DOUBLE) / c) / ln(10.0))""")}
              |    AS hbos
              |FROM binned JOIN hm USING (f, b)
              |GROUP BY id
              |ORDER BY hbos DESC, id LIMIT 20""".stripMargin)),
  )
}
