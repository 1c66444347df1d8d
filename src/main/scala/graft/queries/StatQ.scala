package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.CorpusOps
import Q.{dec4, dec6, r4, r6}
import scala.collection.immutable.ListMap

/** Statistical-inference gate entries split out of ExtrasQ (round-9
  * hygiene; the experiment-design/causal entries moved on to
  * [[ExperimentQ]] in round 10): hypothesis tests (Welch, KS,
  * Mann-Whitney, ANOVA, Kruskal-Wallis), robust statistics (MAD, Tukey,
  * winsorized, Theil-Sen), distribution fits (Gumbel, Weibull, Benford,
  * Hill), spectral/temporal (ACF, periodogram, Allan variance,
  * burstiness), correlation (matrix, rolling, Spearman), and the
  * quantile machinery. Same Q/oracle discipline as every other suite. */
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


    // Autocorrelation function: the lag scan with X = Y — lag 0 must be
    // exactly 1, the rest profile the series' memory.
    "q174_acf" -> Q(
      (s, d) => graft.operators.EventOps.xcorrLagScan(
          Tables.events(s, d), "event_type", "ts", "value",
          seriesX = "click", seriesY = "click", maxLag = 12, scoreOut = dec6)
        .orderBy("lag"),
      Some(s"""WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
              |  avg(CAST(value AS DOUBLE)) AS y FROM events GROUP BY event_type, h),
              |x AS (SELECT h, y AS xv FROM hourly WHERE event_type = 'click'),
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


    // Kaplan-Meier survival of time-to-first-purchase after signup,
    // right-censored at the observation horizon — S(t) folds as
    // exp(Σ ln(1 − d/n)) over the identical day order in both engines.
    "q158_kaplan_meier" -> Q(
      (s, d) => graft.operators.StatOps.kaplanMeier(
          Tables.events(s, d), "user_id", "ts", "event_type",
          startType = "signup", targetType = "purchase", scoreOut = dec6)
        .orderBy("t_days"),
      Some(s"""WITH pu AS (SELECT user_id,
              |  min(CASE WHEN event_type = 'signup' THEN CAST(ts AS DATE) END) AS d0,
              |  min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END) AS d1,
              |  max(CAST(ts AS DATE)) AS dmax
              |  FROM events GROUP BY user_id),
              |pu2 AS (SELECT * FROM pu WHERE d0 IS NOT NULL),
              |hz AS (SELECT max(dmax) AS dend FROM pu2),
              |dur AS (SELECT CASE WHEN d1 IS NOT NULL AND d1 >= d0
              |    THEN CAST(d1 - d0 AS INT) ELSE CAST(dend - d0 AS INT) END AS t,
              |  CAST(d1 IS NOT NULL AND d1 >= d0 AS INT) AS observed
              |  FROM pu2, hz),
              |tot AS (SELECT count(*) AS n_total FROM dur),
              |bd AS (SELECT t, sum(observed) AS d, count(*) AS c FROM dur GROUP BY t),
              |ar AS (SELECT t, d,
              |  n_total - coalesce(sum(c) OVER (ORDER BY t
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_at_risk
              |  FROM bd, tot),
              |ev AS (SELECT t, d, n_at_risk,
              |  1.0 - CAST(d AS DOUBLE) / n_at_risk AS factor
              |  FROM ar WHERE d > 0),
              |sv AS (SELECT t, n_at_risk, d,
              |  CASE WHEN max(CASE WHEN factor <= 0 THEN 1 ELSE 0 END)
              |      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) = 1 THEN 0.0
              |    ELSE exp(sum(ln(factor))
              |      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)) END AS srv FROM ev)
              |SELECT t AS t_days, CAST(n_at_risk AS BIGINT) AS n_at_risk,
              |  CAST(d AS BIGINT) AS n_events, ${r6("srv")} AS survival
              |FROM sv ORDER BY t_days""".stripMargin)),


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


    // OLS trend per series with R² from explicit moment formulas — the
    // least-squares twin of q182 (one aggregate, no pair table), plus the
    // fit diagnostic Theil-Sen can't give.
    "q187_ols_trend" -> Q(
      (s, d) => graft.operators.SeasonalOps.olsTrend(
          Tables.events(s, d), "event_type", "ts", "value", scoreOut = dec6)
        .orderBy("event_type"),
      Some(s"""WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
              |  avg(CAST(value AS DOUBLE)) AS y FROM events GROUP BY 1, 2),
              |b AS (SELECT event_type, y,
              |  CAST((epoch_us(h) - min(epoch_us(h)) OVER (PARTITION BY event_type))
              |    / 3600000000 AS DOUBLE) AS t FROM hourly),
              |m AS (SELECT event_type, count(*) AS n,
              |  avg(t) AS mt, avg(y) AS my, avg(t * t) AS mtt,
              |  avg(t * y) AS mty, avg(y * y) AS myy FROM b GROUP BY event_type)
              |SELECT event_type, n AS n_points,
              |  ${r6("(mty - mt * my) / (mtt - mt * mt)")} AS slope_per_hour,
              |  ${r6("my - (mty - mt * my) / (mtt - mt * mt) * mt")} AS intercept,
              |  ${r6("""CASE WHEN myy - my * my > 0
              |    THEN (mty - mt * my) * (mty - mt * my)
              |      / ((mtt - mt * mt) * (myy - my * my)) ELSE 0.0 END""")} AS r2
              |FROM m ORDER BY event_type""".stripMargin)),


    // Theil-Sen robust trend per series: median pairwise slope over the
    // hourly grid (grid-metadata pair table, not events) with the
    // median-residual intercept.
    "q182_theil_sen" -> Q(
      (s, d) => graft.operators.SeasonalOps.theilSenTrend(
          Tables.events(s, d), "event_type", "ts", "value", scoreOut = dec6)
        .orderBy("event_type"),
      Some(s"""WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
              |  avg(CAST(value AS DOUBLE)) AS y FROM events GROUP BY 1, 2),
              |b AS (SELECT event_type, y,
              |  CAST(epoch_us(h) / 3600000000 AS DOUBLE) AS t FROM hourly),
              |sl AS (SELECT a.event_type,
              |  (b2.y - a.y) / (b2.t - a.t) AS slope
              |  FROM b a JOIN b b2 USING (event_type) WHERE b2.t > a.t),
              |ms AS (SELECT event_type, count(*) AS n_pairs,
              |  quantile_cont(slope, 0.5) AS m_slope FROM sl GROUP BY event_type),
              |ic AS (SELECT b.event_type, ms.n_pairs, ms.m_slope,
              |  count(*) AS n_points,
              |  quantile_cont(b.y - ms.m_slope * b.t, 0.5) AS m_icept
              |  FROM b JOIN ms USING (event_type)
              |  GROUP BY b.event_type, ms.n_pairs, ms.m_slope)
              |SELECT event_type, n_points, n_pairs,
              |  ${r6("m_slope")} AS slope_per_hour, ${r6("m_icept")} AS intercept
              |FROM ic ORDER BY event_type""".stripMargin)),


    // Allan variance ladder (IEEE 1139 sensor stability): sigma^2(tau) =
    // 1/2 E[(mean_{i+1} - mean_i)^2] over ADJACENT non-overlapping
    // tau-wide buckets, tau in {1, 4, 24} h. Buckets index off the
    // hour-truncated epoch so sub-second ts precision can't move a row
    // across a boundary cross-engine; gaps contribute no phantom pair.
    "q249_allan_variance" -> Q(
      (s, d) => graft.operators.StatOps.allanVariance(
          Tables.events(s, d), "event_type", "ts", "value",
          tausHours = Seq(1, 4, 24), scoreOut = dec6)
        .orderBy("series", "tau_hours"),
      Some(Seq(1, 4, 24).map { tau =>
        s"""SELECT series, $tau AS tau_hours, n_buckets, n_pairs,
           |  ${r6("av")} AS allan_var, ${r6("sqrt(av)")} AS allan_dev
           |FROM (SELECT series, count(*) AS n_buckets, count(dm) AS n_pairs,
           |    0.5 * avg(dm * dm) AS av
           |  FROM (SELECT series, b, m,
           |      CASE WHEN lead(b) OVER w = b + 1
           |        THEN lead(m) OVER w - m END AS dm
           |    FROM (SELECT event_type AS series,
           |        floor(epoch(date_trunc('hour', ts)) / ${3600 * tau}) AS b,
           |        avg(value) AS m
           |      FROM events GROUP BY 1, 2)
           |    WINDOW w AS (PARTITION BY series ORDER BY b))
           |  GROUP BY series)""".stripMargin
      }.mkString("", " UNION ALL ", " ORDER BY series, tau_hours"))),


    // Gumbel (EVT-I) return levels from daily block maxima, method of
    // moments: beta = s*sqrt(6)/pi, mu = m - gamma*beta, x_T = mu -
    // beta*ln(-ln(1-1/T)) — the principled "threshold exceeded once per T
    // days" that Gaussian z-scores get wrong in the tail. Two hash aggs,
    // no window.
    "q251_gumbel_return" -> Q(
      (s, d) => graft.operators.StatOps.gumbelReturnLevels(
          Tables.events(s, d), "event_type", "ts", "value",
          horizonsDays = Seq(30, 365), scoreOut = dec6)
        .orderBy("series"),
      Some {
        val c = math.sqrt(6.0) / math.Pi
        val g = 0.5772156649015329
        def lv(t: Int) =
          r6(s"(m - $g * (s * $c)) - (s * $c) * ${math.log(-math.log(1.0 - 1.0 / t))}")
        s"""WITH dm AS (SELECT event_type AS series, CAST(ts AS DATE) AS d,
           |    max(value) AS mx FROM events GROUP BY 1, 2),
           |mom AS (SELECT series, count(*) AS n_blocks, avg(mx) AS m,
           |    stddev_samp(mx) AS s FROM dm GROUP BY series)
           |SELECT series, n_blocks,
           |  ${r6(s"m - $g * (s * $c)")} AS gumbel_mu,
           |  ${r6(s"s * $c")} AS gumbel_beta,
           |  ${lv(30)} AS level_30d, ${lv(365)} AS level_365d
           |FROM mom ORDER BY series""".stripMargin
      }),


    // Schuster periodogram power at candidate periods {24, 12, 168} h:
    // harmonic amplitude + fraction of variance explained per (series,
    // period). One hourly collapse, then ONE map-side agg of six sums per
    // period — the trig argument is built from the integer hour index mod
    // P, identical cross-engine.
    "q252_periodogram" -> Q(
      (s, d) => graft.operators.SeasonalOps.harmonicPower(
          Tables.events(s, d), "event_type", "ts", "value",
          periodsHours = Seq(12, 24, 168), scoreOut = dec6)
        .orderBy("series", "period_hours"),
      Some(Seq(12, 24, 168).map { p =>
        val w = 2.0 * math.Pi / p
        s"""SELECT series, $p AS period_hours, CAST(n AS BIGINT) AS n_hours,
           |  ${r6("2.0 / n * sqrt(cc * cc + ssn * ssn)")} AS amplitude,
           |  ${r6("CASE WHEN sse > 0 THEN 2.0 * (cc * cc + ssn * ssn) / (n * sse) END")} AS var_frac
           |FROM (SELECT series, n, sxc - sx / n * sc AS cc,
           |    sxs - sx / n * ss AS ssn, sxx - sx * sx / n AS sse
           |  FROM (SELECT series, CAST(count(*) AS DOUBLE) AS n, sum(y) AS sx,
           |      sum(y * y) AS sxx, sum(c) AS sc, sum(sn) AS ss,
           |      sum(y * c) AS sxc, sum(y * sn) AS sxs
           |    FROM (SELECT series, y, cos($w * (h % $p)) AS c,
           |        sin($w * (h % $p)) AS sn
           |      FROM (SELECT event_type AS series,
           |          floor(epoch(date_trunc('hour', ts)) / 3600) AS h,
           |          avg(value) AS y FROM events GROUP BY 1, 2))
           |    GROUP BY series))""".stripMargin
      }.mkString("", " UNION ALL ", " ORDER BY series, period_hours"))),


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


    // Weibull inter-arrival fit per type (closed-form log-moment Menon
    // estimator: k = (pi/sqrt 6)/std(ln g), lambda = exp(mean(ln g) +
    // gamma/k)) — shape < 1 = bursty, ~1 = Poisson-like, > 1 = regular;
    // the parametric companion of the q177-family burstiness coefficient
    // with a usable survival function for timeout tuning.
    "q261_weibull_gaps" -> Q(
      (s, d) => graft.operators.StatOps.weibullInterarrival(
          Tables.events(s, d), "event_type", "ts", "event_id", scoreOut = dec6)
        .orderBy("series"),
      Some {
        val c = math.Pi / math.sqrt(6.0)
        val g = 0.5772156649015329
        s"""WITH gp AS (SELECT event_type AS series,
           |    (epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY event_type
           |      ORDER BY ts, event_id))) / 1000000.0 AS gg
           |  FROM events),
           |ag AS (SELECT series,
           |    count(CASE WHEN gg > 0 THEN 1 END) AS n_gaps,
           |    count(CASE WHEN gg = 0 THEN 1 END) AS n_zero_gaps,
           |    avg(CASE WHEN gg > 0 THEN ln(gg) END) AS m,
           |    stddev_samp(CASE WHEN gg > 0 THEN ln(gg) END) AS sd,
           |    avg(CASE WHEN gg > 0 THEN gg END) AS mg
           |  FROM gp WHERE gg IS NOT NULL GROUP BY series)
           |SELECT series, n_gaps, n_zero_gaps,
           |  ${r6(s"$c / sd")} AS shape_k,
           |  ${r6(s"exp(m + $g / ($c / sd))")} AS scale_s,
           |  ${r6("mg")} AS mean_gap_s
           |FROM ag ORDER BY series""".stripMargin
      }),


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

    // Mann-Kendall monotone trend per series (the significance test
    // paired with q182 Theil-Sen's slope estimate): S over the daily-mean
    // pair table, tie-aware variance, continuity-corrected z, tau-a.
    // Signs are taken on dec6-ROUNDED daily means so every pairwise
    // comparison is engine-identical.
    "q275_mann_kendall" -> Q(
      (s, d) => graft.operators.StatOps.mannKendall(
          Tables.events(s, d), "event_type", "ts", "value", scoreOut = dec6)
        .orderBy("series"),
      Some(s"""WITH daily AS (SELECT event_type AS series, CAST(ts AS DATE) AS d,
              |    ${r6("avg(CAST(value AS DOUBLE))")} AS y
              |  FROM events GROUP BY 1, 2),
              |p AS (SELECT a.series, CAST(sum(sign(b.y - a.y)) AS DOUBLE) AS s
              |  FROM daily a JOIN daily b ON a.series = b.series AND a.d < b.d
              |  GROUP BY 1),
              |t AS (SELECT series, CAST(sum(t) AS DOUBLE) AS n,
              |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS DOUBLE) AS tsum
              |  FROM (SELECT series, y, count(*) AS t FROM daily GROUP BY 1, 2)
              |  GROUP BY 1),
              |v AS (SELECT p.series, n, s,
              |    (n * (n - 1) * (2 * n + 5) - tsum) / 18.0 AS vr
              |  FROM p JOIN t ON p.series = t.series),
              |z AS (SELECT series, n, s, vr,
              |    CASE WHEN s > 0 THEN (s - 1) / sqrt(vr)
              |         WHEN s < 0 THEN (s + 1) / sqrt(vr)
              |         ELSE 0.0 END AS zz
              |  FROM v)
              |SELECT series, CAST(n AS BIGINT) AS n_days, CAST(s AS BIGINT) AS s,
              |  ${r6("vr")} AS var_s, ${r6("zz")} AS z,
              |  ${r6("s / (n * (n - 1) / 2.0)")} AS tau,
              |  CAST(zz > 1.96 AS INT) - CAST(zz < -1.96 AS INT) AS trend
              |FROM z ORDER BY series""".stripMargin)),

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

    // Yule-Walker AR(2) per series — the q174 lag scan turned into a
    // forecasting model: φ from dec6-rounded biased autocorrelations,
    // innovation-variance ratio, and the stationarity-triangle flag.
    // Lags are equi-joins on integer hour index (gap-robust, q164).
    "q280_yule_walker_ar2" -> Q(
      (s, d) => graft.operators.StatOps.yuleWalkerAr2(
          Tables.events(s, d), "event_type", "ts", "value", scoreOut = dec6)
        .orderBy("series"),
      Some(s"""WITH hourly AS (SELECT event_type AS series,
              |  CAST(floor(epoch(date_trunc('hour', ts)) / 3600) AS BIGINT)
              |    AS idx,
              |  avg(CAST(value AS DOUBLE)) AS y FROM events GROUP BY 1, 2),
              |m AS (SELECT series, avg(y) AS mm FROM hourly GROUP BY 1),
              |c AS (SELECT h.series AS series, idx, y - mm AS c
              |  FROM hourly h JOIN m USING (series)),
              |c0 AS (SELECT series, count(*) AS n_hours, sum(c * c) AS c0
              |  FROM c GROUP BY 1),
              |l1 AS (SELECT a.series, sum(a.c * b.c) AS c1 FROM c a
              |  JOIN c b ON a.series = b.series AND a.idx = b.idx + 1
              |  GROUP BY 1),
              |l2 AS (SELECT a.series, sum(a.c * b.c) AS c2 FROM c a
              |  JOIN c b ON a.series = b.series AND a.idx = b.idx + 2
              |  GROUP BY 1),
              |r AS (SELECT series, n_hours, ${r6("c1 / c0")} AS r1,
              |  ${r6("c2 / c0")} AS r2
              |  FROM c0 JOIN l1 USING (series) JOIN l2 USING (series)),
              |p AS (SELECT series, n_hours, r1, r2,
              |  ${r6("r1 * (1.0 - r2) / (1.0 - r1 * r1)")} AS phi1,
              |  ${r6("(r2 - r1 * r1) / (1.0 - r1 * r1)")} AS phi2 FROM r)
              |SELECT series, n_hours, r1, r2, phi1, phi2,
              |  ${r6("1.0 - phi1 * r1 - phi2 * r2")} AS innovation_ratio,
              |  CAST(abs(phi2) < 1 AND phi1 + phi2 < 1
              |    AND phi2 - phi1 < 1 AS INT) AS stationary
              |FROM p ORDER BY series""".stripMargin)),

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

    // AR(2) one-step backtest — Hyndman's rule applied to q280: the
    // Yule-Walker fit must beat the naive x_{t-1} carry-forward or it
    // hasn't earned its state. Gap-robust lag joins, rounded phi/mean.
    "q291_ar2_backtest" -> Q(
      (s, d) => graft.operators.StatOps.ar2Backtest(
          Tables.events(s, d), "event_type", "ts", "value", scoreOut = dec6)
        .orderBy("series"),
      Some(s"""WITH hourly AS (SELECT event_type AS series,
              |  CAST(floor(epoch(date_trunc('hour', ts)) / 3600) AS BIGINT)
              |    AS idx,
              |  avg(CAST(value AS DOUBLE)) AS y FROM events GROUP BY 1, 2),
              |m AS (SELECT series, avg(y) AS mm FROM hourly GROUP BY 1),
              |c AS (SELECT h.series AS series, idx, y - mm AS c
              |  FROM hourly h JOIN m USING (series)),
              |c0 AS (SELECT series, sum(c * c) AS c0 FROM c GROUP BY 1),
              |l1 AS (SELECT a.series, sum(a.c * b.c) AS c1 FROM c a
              |  JOIN c b ON a.series = b.series AND a.idx = b.idx + 1
              |  GROUP BY 1),
              |l2 AS (SELECT a.series, sum(a.c * b.c) AS c2 FROM c a
              |  JOIN c b ON a.series = b.series AND a.idx = b.idx + 2
              |  GROUP BY 1),
              |r AS (SELECT series, ${r6("c1 / c0")} AS r1,
              |  ${r6("c2 / c0")} AS r2
              |  FROM c0 JOIN l1 USING (series) JOIN l2 USING (series)),
              |p AS (SELECT series,
              |  ${r6("r1 * (1.0 - r2) / (1.0 - r1 * r1)")} AS phi1,
              |  ${r6("(r2 - r1 * r1) / (1.0 - r1 * r1)")} AS phi2 FROM r),
              |mr AS (SELECT series, ${r6("avg(y)")} AS m FROM hourly
              |  GROUP BY 1),
              |bt AS (SELECT h.series AS series, h.y, a.y AS x1, b.y AS x2
              |  FROM hourly h
              |  JOIN hourly a ON h.series = a.series AND a.idx = h.idx - 1
              |  JOIN hourly b ON h.series = b.series AND b.idx = h.idx - 2),
              |f AS (SELECT bt.series AS series, y, x1, x2, mr.m, p.phi1,
              |    p.phi2
              |  FROM bt JOIN mr USING (series) JOIN p USING (series)),
              |ag AS (SELECT series, count(*) AS n,
              |    avg(abs(y - (m + phi1 * (x1 - m) + phi2 * (x2 - m)))) AS ma,
              |    avg(abs(y - x1)) AS mn
              |  FROM f GROUP BY 1)
              |SELECT series, n, ${r6("ma")} AS mae_ar2,
              |  ${r6("mn")} AS mae_naive, ${r6("1.0 - ma / mn")} AS skill
              |FROM ag ORDER BY series""".stripMargin)),

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

    // Ljung-Box portmanteau (h=6, χ²₆ 95% = 12.5916) per event type over
    // the hourly means — the residual-diagnostics gate after any fit:
    // leftover autocorrelation means the model left signal behind. Each
    // ρ̂_k rides the gap-robust q174/q280 lag equi-join and is rounded
    // before the Q sum.
    "q304_ljung_box" -> Q(
      (s, d) => graft.operators.StatOps.ljungBox(
          Tables.events(s, d), "event_type", "ts", "value",
          maxLag = 6, crit = 12.5916, scoreOut = dec6)
        .orderBy("series"),
      Some {
        val rks = (1 to 6).map(k =>
          s"""c$k AS (SELECT a.series AS series, sum(a.c * b.c) AS ck
             |  FROM c a JOIN c b ON a.series = b.series
             |    AND b.idx = a.idx + $k GROUP BY 1)""".stripMargin).mkString(",\n")
        val joins = (1 to 6).map(k => s"JOIN c$k USING (series)").mkString(" ")
        val qsum = (1 to 6).map(k =>
          s"${r6(s"c$k.ck / c0.ss")} * ${r6(s"c$k.ck / c0.ss")} / (n - $k.0)")
          .mkString(" + ")
        s"""WITH hourly AS (SELECT event_type AS series,
           |    CAST(floor(epoch(date_trunc('hour', ts)) / 3600) AS BIGINT) AS idx,
           |    avg(CAST(value AS DOUBLE)) AS y
           |  FROM events GROUP BY 1, 2),
           |m AS (SELECT series, avg(y) AS m FROM hourly GROUP BY 1),
           |c AS (SELECT h.series AS series, idx, y - m.m AS c
           |  FROM hourly h JOIN m USING (series)),
           |c0 AS (SELECT series, CAST(count(*) AS BIGINT) AS n_hours,
           |    sum(c * c) AS ss FROM c GROUP BY 1),
           |$rks,
           |q AS (SELECT c0.series AS series, c0.n_hours,
           |    CAST(c0.n_hours AS DOUBLE) AS n, c0.ss, ${(1 to 6).map(k => s"c$k.ck AS ck$k").mkString(", ")}
           |  FROM c0 $joins),
           |f AS (SELECT series, n_hours,
           |    ${r6(s"(${(1 to 6).map(k => s"${r6(s"ck$k / ss")} * ${r6(s"ck$k / ss")} / (n - $k.0)").mkString(" + ")}) * n * (n + 2.0)")} AS q_lb
           |  FROM q)
           |SELECT series, n_hours, q_lb, 6 AS df,
           |  CAST(q_lb <= 12.5916 AS INT) AS white_noise
           |FROM f ORDER BY series""".stripMargin
      }),

    // Durbin-Watson first-order residual autocorrelation per event type:
    // DW over the residuals of the per-series OLS hourly trend (slope and
    // intercept rounded BEFORE the residuals — identical arithmetic both
    // engines); adjacent pairs via the idx+1 equi-join, so a gap hour
    // drops the pair instead of differencing across it.
    "q305_durbin_watson" -> Q(
      (s, d) => graft.operators.StatOps.durbinWatson(
          Tables.events(s, d), "event_type", "ts", "value", scoreOut = dec6)
        .orderBy("series"),
      Some(s"""WITH hourly AS (SELECT event_type AS series,
              |    CAST(floor(epoch(date_trunc('hour', ts)) / 3600) AS BIGINT) AS idx,
              |    avg(CAST(value AS DOUBLE)) AS y
              |  FROM events GROUP BY 1, 2),
              |fit AS (SELECT series, CAST(count(*) AS BIGINT) AS n_hours,
              |    avg(idx) AS mi, ${r6("avg(y)")} AS b0,
              |    ${r6("""(avg(idx * y) - avg(idx) * avg(y))
              |      / (avg(CAST(idx AS DOUBLE) * idx) - avg(idx) * avg(idx))""")} AS b1
              |  FROM hourly GROUP BY 1),
              |e AS (SELECT h.series AS series, idx, n_hours,
              |    y - (b0 + b1 * (idx - mi)) AS e
              |  FROM hourly h JOIN fit USING (series)),
              |den AS (SELECT series, any_value(n_hours) AS n_hours,
              |    sum(e * e) AS ss FROM e GROUP BY 1),
              |num AS (SELECT a.series AS series, CAST(count(*) AS BIGINT) AS n_pairs,
              |    sum((b.e - a.e) * (b.e - a.e)) AS sd
              |  FROM e a JOIN e b ON a.series = b.series AND b.idx = a.idx + 1
              |  GROUP BY 1)
              |SELECT den.series AS series, n_hours, n_pairs,
              |  ${r6("sd / ss")} AS dw, ${r6("1.0 - sd / ss / 2.0")} AS rho1,
              |  CAST(sd / ss < 1.5 AS INT) AS positive_autocorr
              |FROM den JOIN num USING (series) ORDER BY series""".stripMargin)),

    // Wald-Wolfowitz runs test on the SIGNS of hourly diffs per event
    // type — sign-level randomness beside q305's magnitude-level rho1.
    // Zero diffs drop (classical reduction); runs = 1 + sign changes.
    "q315_runs_test" -> Q(
      (s, d) => graft.operators.StatOps.runsTest(
          Tables.events(s, d), "event_type", "ts", "value", scoreOut = dec6)
        .orderBy("series"),
      Some {
        val z = """(runs - (2.0 * n_plus * n_minus / (n_plus + n_minus + 0.0)
          |    + 1.0))
          |  / sqrt((2.0 * n_plus * n_minus
          |      * (2.0 * n_plus * n_minus - (n_plus + n_minus)))
          |    / ((n_plus + n_minus + 0.0) * (n_plus + n_minus)
          |      * (n_plus + n_minus - 1.0)))""".stripMargin
        s"""WITH hourly AS (SELECT event_type AS series,
           |    date_trunc('hour', ts) AS h, avg(CAST(value AS DOUBLE)) AS y
           |  FROM events GROUP BY 1, 2),
           |d AS (SELECT series, h,
           |    y - lag(y) OVER (PARTITION BY series ORDER BY h) AS dd
           |  FROM hourly),
           |sg AS (SELECT series, h, CASE WHEN dd > 0 THEN 1 ELSE -1 END AS s
           |  FROM d WHERE dd <> 0),
           |c AS (SELECT series, s, CASE WHEN
           |    s <> lag(s) OVER (PARTITION BY series ORDER BY h) THEN 1 END
           |    AS chg FROM sg),
           |a AS (SELECT series,
           |    CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_plus,
           |    CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_minus,
           |    CAST(coalesce(sum(chg), 0) + 1 AS BIGINT) AS runs
           |  FROM c GROUP BY 1)
           |SELECT series, n_plus, n_minus, runs, ${r6(z)} AS z_runs,
           |  CAST(abs(${r6(z)}) <= 1.96 AS INT) AS random
           |FROM a
           |WHERE n_plus >= 1 AND n_minus >= 1 AND n_plus + n_minus > 2
           |ORDER BY series""".stripMargin
      }),

    // Anderson-Darling exponentiality of inter-arrival gaps per event
    // type ("are arrivals Poisson?") — the order-statistic identity
    // folds the n+1-i pairing away, so one per-series rank pass + one
    // aggregate; no self-join. Gap mean rounded before F; F clamped
    // inside (0,1) on both engines.
    "q316_ad_exponentiality" -> Q(
      (s, d) => graft.operators.StatOps.adExponentiality(
          Tables.events(s, d), "event_type", "ts", scoreOut = dec6)
        .orderBy("series"),
      Some(s"""WITH g AS (SELECT event_type AS series, ts,
              |    epoch(ts) - epoch(lag(ts) OVER (
              |      PARTITION BY event_type ORDER BY ts)) AS gap
              |  FROM events),
              |g2 AS (SELECT series, ts, CAST(gap AS DOUBLE) AS gap
              |  FROM g WHERE gap > 0),
              |m AS (SELECT series, CAST(count(*) AS BIGINT) AS n_gaps,
              |    ${r6("avg(gap)")} AS mg FROM g2 GROUP BY 1),
              |r AS (SELECT series, n_gaps, mg,
              |    CAST(row_number() OVER (PARTITION BY series
              |      ORDER BY gap, ts) AS DOUBLE) AS i,
              |    least(1.0 - 1e-15, 1.0 - exp(-gap / mg)) AS z
              |  FROM g2 JOIN m USING (series)),
              |a AS (SELECT series, any_value(n_gaps) AS n_gaps,
              |    any_value(mg) AS mean_gap_s,
              |    (-CAST(any_value(n_gaps) AS DOUBLE))
              |      - sum((2.0 * i - 1.0) * ln(z)
              |          + (2.0 * (n_gaps - i) + 1.0) * ln(1.0 - z))
              |        / any_value(n_gaps) AS a2r
              |  FROM r GROUP BY 1)
              |SELECT series, n_gaps, mean_gap_s, ${r6("a2r")} AS a2,
              |  ${r6("a2r * (1.0 + 0.6 / n_gaps)")} AS a2_mod,
              |  CAST(${r6("a2r * (1.0 + 0.6 / n_gaps)")} > 1.341 AS INT)
              |    AS reject_exponential
              |FROM a ORDER BY series""".stripMargin)),

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

    // Augmented Dickey-Fuller unit-root test (1 augmentation lag,
    // constant) per event type — the stationarity gate before trusting
    // q187's trend or q280's AR fit. Consecutive hour triples via idx
    // equi-joins; regressors centered by ROUNDED means (intercept drops
    // from the solve); Cramer 2x2 on one moment aggregate.
    "q318_adf_test" -> Q(
      (s, d) => graft.operators.RegressionOps.adfTest(
          Tables.events(s, d), "event_type", "ts", "value", scoreOut = dec6)
        .orderBy("series"),
      Some(s"""WITH hourly AS (SELECT event_type AS series,
              |    CAST(floor(epoch(date_trunc('hour', ts)) / 3600) AS BIGINT)
              |      AS idx,
              |    avg(CAST(value AS DOUBLE)) AS y
              |  FROM events GROUP BY 1, 2),
              |rws AS (SELECT t0.series AS series, (t0.y - t1.y) AS dy,
              |    t1.y AS x1, (t1.y - t2.y) AS x2
              |  FROM hourly t0
              |  JOIN hourly t1 ON t1.series = t0.series AND t1.idx = t0.idx - 1
              |  JOIN hourly t2 ON t2.series = t0.series AND t2.idx = t0.idx - 2),
              |m AS (SELECT series, ${r6("avg(dy)")} AS mdy,
              |    ${r6("avg(x1)")} AS mx1, ${r6("avg(x2)")} AS mx2
              |  FROM rws GROUP BY 1),
              |c AS (SELECT rws.series AS series, dy - mdy AS cy, x1 - mx1 AS c1,
              |    x2 - mx2 AS c2 FROM rws JOIN m USING (series)),
              |sm AS (SELECT series, CAST(count(*) AS BIGINT) AS n_obs,
              |    sum(c1 * c1) AS s11, sum(c1 * c2) AS s12,
              |    sum(c2 * c2) AS s22, sum(c1 * cy) AS s1y,
              |    sum(c2 * cy) AS s2y, sum(cy * cy) AS syy
              |  FROM c GROUP BY 1),
              |b AS (SELECT *,
              |    ${r6("(s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12)")}
              |      AS phi,
              |    ${r6("(s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12)")}
              |      AS psi
              |  FROM sm),
              |f AS (SELECT series, n_obs, phi, psi,
              |    ${r6("""phi / sqrt((syy - 2.0 * (phi * s1y + psi * s2y)
              |      + phi * phi * s11 + 2.0 * phi * psi * s12
              |      + psi * psi * s22) / (n_obs - 3.0)
              |      * s22 / (s11 * s22 - s12 * s12))""")} AS t_adf
              |  FROM b WHERE n_obs > 3 AND s11 * s22 - s12 * s12 <> 0)
              |SELECT series, n_obs, phi, psi, t_adf,
              |  CAST(t_adf < -2.86 AS INT) AS unit_root_rejected
              |FROM f ORDER BY series""".stripMargin)),

    // Hurst exponent by rescaled-range analysis over power-of-two blocks
    // (16..128 hours) per event type: H > 0.5 trending, < 0.5 mean-
    // reverting — the long-memory complement of q174's short-lag ACF.
    // Block moments rounded before the deviations; the log-log x-axis is
    // the exact integer log2(m).
    "q319_hurst_rs" -> Q(
      (s, d) => graft.operators.RegressionOps.hurstRS(
          Tables.events(s, d), "event_type", "ts", "value",
          blockSizes = Seq(16, 32, 64, 128), scoreOut = dec6)
        .orderBy("series"),
      Some(s"""WITH hourly AS (SELECT event_type AS series,
              |    CAST(floor(epoch(date_trunc('hour', ts)) / 3600) AS BIGINT)
              |      AS idx,
              |    avg(CAST(value AS DOUBLE)) AS y
              |  FROM events GROUP BY 1, 2),
              |rk AS (SELECT series, idx, y,
              |    row_number() OVER (PARTITION BY series ORDER BY idx) AS r
              |  FROM hourly),
              |b AS (SELECT series, m, log2m, ((r - 1) // m) AS blk, r, y
              |  FROM rk CROSS JOIN (SELECT unnest([16, 32, 64, 128]) AS m,
              |    unnest([4.0, 5.0, 6.0, 7.0]) AS log2m)),
              |c AS (SELECT *, count(*) OVER (PARTITION BY series, m, blk)
              |    AS cnt FROM b),
              |st AS (SELECT series, m, log2m, blk, r, y,
              |    ${r6("avg(y) OVER (PARTITION BY series, m, blk)")} AS bm,
              |    ${r6("avg(y * y) OVER (PARTITION BY series, m, blk)")} AS m2
              |  FROM c WHERE cnt = m),
              |cm AS (SELECT series, m, log2m, blk, bm, m2,
              |    sum(y - bm) OVER (PARTITION BY series, m, blk ORDER BY r
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cu
              |  FROM st),
              |pb AS (SELECT series, m, log2m, blk,
              |    max(cu) - min(cu) AS rr,
              |    any_value(sqrt(greatest(0.0, m2 - bm * bm))) AS ss
              |  FROM cm GROUP BY 1, 2, 3, 4),
              |pm AS (SELECT series, m, log2m,
              |    ${r6("avg(ln(rr / ss) / ln(2.0))")} AS mlrs
              |  FROM pb WHERE ss > 0 AND rr > 0 GROUP BY 1, 2, 3),
              |fit AS (SELECT series, CAST(count(*) AS BIGINT) AS n_points,
              |    avg(log2m) AS mx, avg(mlrs) AS my,
              |    avg(log2m * mlrs) AS mxy, avg(log2m * log2m) AS mxx
              |  FROM pm GROUP BY 1)
              |SELECT series, n_points,
              |  ${r6("(mxy - mx * my) / (mxx - mx * mx)")} AS hurst,
              |  ${r6("my - (mxy - mx * my) / (mxx - mx * mx) * mx")}
              |    AS intercept_log2
              |FROM fit WHERE n_points >= 2 ORDER BY series""".stripMargin)),

    // PACF lags 1..6 by Durbin-Levinson per event type — AR order
    // selection (PACF cuts off at the true order). Gap-robust lag
    // covariances (the q304 joins), then the recursion unrolled as
    // column arithmetic with every phi ROUNDED per level; the oracle
    // unrolls the identical recursion over the same rounded rho, so the
    // match is bit-exact by construction.
    "q320_pacf" -> Q(
      (s, d) => graft.operators.RegressionOps.pacfDL(
          Tables.events(s, d), "event_type", "ts", "value",
          maxLag = 6, scoreOut = dec6)
        .orderBy("series"),
      Some {
        val maxLag = 6
        val cks = (1 to maxLag).map(k =>
          s"""ck$k AS (SELECT a.series AS series, sum(a.c * b.c) AS ck
             |  FROM c a JOIN c b ON a.series = b.series
             |    AND b.idx = a.idx + $k GROUP BY 1)""".stripMargin)
          .mkString(",\n")
        val joins = (1 to maxLag).map(k => s"JOIN ck$k USING (series)").mkString(" ")
        val rhos = (1 to maxLag).map(k =>
          s"${r6(s"ck$k.ck / c0.ss")} AS rho$k").mkString(", ")
        // Durbin-Levinson as one CTE per level, mirroring RegressionOps
        // .pacfDL: phi_k_k from the rounded level-(k-1) row, then the
        // phi_k_j updates — identical left-fold sum order as the Column
        // reduce(_ + _)
        val levels = (2 to maxLag).flatMap { k =>
          val num = (1 until k).map(j => s"phi_${k - 1}_$j * rho${k - j}")
            .mkString(" + ")
          val den = (1 until k).map(j => s"phi_${k - 1}_$j * rho$j")
            .mkString(" + ")
          val kk =
            s"""p${k}a AS (SELECT *,
               |  ${r6(s"(rho$k - ($num)) / (1.0 - ($den))")} AS phi_${k}_$k
               |  FROM p${k - 1})""".stripMargin
          val js = (1 until k).map(j =>
            s"${r6(s"phi_${k - 1}_$j - phi_${k}_$k * phi_${k - 1}_${k - j}")} AS phi_${k}_$j")
            .mkString(", ")
          Seq(kk, s"p$k AS (SELECT *, $js FROM p${k}a)")
        }.mkString(",\n")
        s"""WITH hourly AS (SELECT event_type AS series,
           |    CAST(floor(epoch(date_trunc('hour', ts)) / 3600) AS BIGINT)
           |      AS idx,
           |    avg(CAST(value AS DOUBLE)) AS y
           |  FROM events GROUP BY 1, 2),
           |m AS (SELECT series, avg(y) AS mu FROM hourly GROUP BY 1),
           |c AS (SELECT h.series AS series, idx, y - mu AS c
           |  FROM hourly h JOIN m USING (series)),
           |c0 AS (SELECT series, CAST(count(*) AS BIGINT) AS n_hours,
           |    sum(c * c) AS ss FROM c GROUP BY 1),
           |$cks,
           |r AS (SELECT c0.series AS series, n_hours, $rhos
           |  FROM c0 $joins),
           |p1 AS (SELECT *, rho1 AS phi_1_1 FROM r),
           |$levels
           |SELECT series, n_hours,
           |  ${(1 to maxLag).map(k => s"phi_${k}_$k AS pacf_$k").mkString(", ")}
           |FROM p$maxLag ORDER BY series""".stripMargin
      }),

    // Ridge regression (lambda = 100) of extended price on quantity and
    // retail price per return flag — the sufficient-statistics estimator:
    // one means pass (rounded), one Gram pass, Cramer 2x2 inside the
    // plan. The shuffle carries O(groups x p^2) numbers at any row count.
    "q321_ridge_price" -> Q(
      (s, d) => graft.operators.RegressionOps.ridge2(
          Tables.lineitem(s, d)
            .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
            .select(col("l_returnflag"), col("l_extendedprice"),
              col("l_quantity"), col("p_retailprice")),
          "l_returnflag", "l_extendedprice", "l_quantity", "p_retailprice",
          lambda = 100.0, scoreOut = dec6)
        .orderBy("l_returnflag"),
      Some(s"""WITH base AS (SELECT l_returnflag AS g,
              |    CAST(l_extendedprice AS DOUBLE) AS y,
              |    CAST(l_quantity AS DOUBLE) AS x1,
              |    CAST(p_retailprice AS DOUBLE) AS x2
              |  FROM lineitem JOIN part ON l_partkey = p_partkey
              |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
              |    AND p_retailprice IS NOT NULL),
              |m AS (SELECT g, ${r6("avg(y)")} AS my, ${r6("avg(x1)")} AS m1,
              |    ${r6("avg(x2)")} AS m2 FROM base GROUP BY 1),
              |c AS (SELECT base.g AS g, my, m1, m2, y - my AS cy,
              |    x1 - m1 AS c1, x2 - m2 AS c2 FROM base JOIN m USING (g)),
              |sm AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
              |    any_value(my) AS my, any_value(m1) AS m1,
              |    any_value(m2) AS m2,
              |    sum(c1 * c1) AS s11, sum(c1 * c2) AS s12,
              |    sum(c2 * c2) AS s22, sum(c1 * cy) AS s1y,
              |    sum(c2 * cy) AS s2y, sum(cy * cy) AS syy
              |  FROM c GROUP BY 1),
              |b AS (SELECT *,
              |    ${r6("""((s22 + 100.0) * s1y - s12 * s2y)
              |      / ((s11 + 100.0) * (s22 + 100.0) - s12 * s12)""")} AS b1,
              |    ${r6("""((s11 + 100.0) * s2y - s12 * s1y)
              |      / ((s11 + 100.0) * (s22 + 100.0) - s12 * s12)""")} AS b2
              |  FROM sm)
              |SELECT g AS l_returnflag, n, ${r6("my - b1 * m1 - b2 * m2")}
              |    AS b0, b1, b2,
              |  ${r6("""1.0 - (syy - 2.0 * (b1 * s1y + b2 * s2y)
              |    + b1 * b1 * s11 + 2.0 * b1 * b2 * s12 + b2 * b2 * s22)
              |    / syy""")} AS r2
              |FROM b ORDER BY l_returnflag""".stripMargin)),

    // Logistic regression (return-flag ~ quantity + discount, per line
    // status) by 4 Newton steps, each ONE sufficient-stats aggregate +
    // a Cramer 3x3 inside the plan; beta ROUNDED per step so the
    // oracle's unrolled replay is bit-identical. The distributed-ML
    // pattern at 100 TB: K scans, 10 doubles of shuffle per group.
    "q325_logistic_returns" -> Q(
      (s, d) => graft.operators.RegressionOps.logisticNewton(
          Tables.lineitem(s, d), "l_linestatus",
          labelCol = (col("l_returnflag") === "R").cast("int"),
          "l_quantity", "l_discount", iters = 4, scoreOut = dec6)
        .orderBy("l_linestatus"),
      Some {
        val iters = 4
        s"""WITH base AS (SELECT l_linestatus AS g,
           |    CAST(CAST(l_returnflag = 'R' AS INT) AS DOUBLE) AS y,
           |    CAST(l_quantity AS DOUBLE) AS x1,
           |    CAST(l_discount AS DOUBLE) AS x2
           |  FROM lineitem),
           |${NewtonSql.steps(iters)},
           |jf AS (SELECT g, y, x1, x2, b0, b1, b2, ${NewtonSql.pExpr} AS p
           |  FROM base JOIN bt$iters USING (g))
           |SELECT g AS l_linestatus, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(y) AS BIGINT) AS n_pos,
           |  any_value(b0) AS b0, any_value(b1) AS b1, any_value(b2) AS b2,
           |  ${r6("sum(y * ln(p) + (1.0 - y) * ln(1.0 - p))")} AS log_lik,
           |  ${r6("avg(CAST((p >= 0.5) = (y = 1.0) AS DOUBLE))")} AS accuracy
           |FROM jf GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // Negative-binomial overdispersion of daily event counts per type:
    // dispersion index, method-of-moments NB size, and the
    // Wilson-Hilferty z of the chi-square dispersion test — the "is
    // Poisson even plausible" gate before any count model.
    "q328_negbin_overdispersion" -> Q(
      (s, d) => graft.operators.StatOps.negbinOverdispersion(
          Tables.events(s, d), "event_type", "ts", scoreOut = dec6)
        .orderBy("series"),
      Some {
        val z = """sqrt(2.0 * ((n_days - 1.0)
          |    * ((n_days + 0.0) / (n_days - 1.0) * var_daily)
          |    / mean_daily))
          |  - sqrt(2.0 * (n_days - 1.0) - 1.0)""".stripMargin
        s"""WITH daily AS (SELECT event_type AS series, CAST(ts AS DATE) AS day,
           |    CAST(count(*) AS DOUBLE) AS c FROM events GROUP BY 1, 2),
           |m AS (SELECT series, CAST(count(*) AS BIGINT) AS n_days,
           |    ${r6("avg(c)")} AS mean_daily, ${r6("avg(c * c)")} AS m2
           |  FROM daily GROUP BY 1),
           |f AS (SELECT series, n_days, mean_daily,
           |    ${r6("m2 - mean_daily * mean_daily")} AS var_daily
           |  FROM m WHERE n_days >= 3 AND mean_daily > 0)
           |SELECT series, n_days, mean_daily, var_daily,
           |  ${r6("var_daily / mean_daily")} AS dispersion,
           |  CASE WHEN var_daily > mean_daily THEN
           |    ${r6("mean_daily * mean_daily / (var_daily - mean_daily)")}
           |    END AS k_hat,
           |  ${r6(z)} AS z_disp,
           |  CAST(${r6(z)} > 1.96 AS INT) AS overdispersed
           |FROM f ORDER BY series""".stripMargin
      }),

    // Binned mutual information between hourly profiles of every series
    // pair (quartile levels): the dependence q192's Pearson and q273's
    // Spearman cannot see (non-monotone coupling). Hourly means ROUNDED
    // before they become ntile sort keys (cross-engine order stability).
    "q329_mutual_info" -> Q(
      (s, d) => graft.operators.StatOps.mutualInfoMatrix(
          Tables.events(s, d), "event_type", "ts", "value",
          bins = 4, scoreOut = dec6)
        .orderBy("series_a", "series_b"),
      Some(s"""WITH hourly AS (SELECT event_type AS s,
              |    date_trunc('hour', ts) AS h,
              |    ${r6("avg(CAST(value AS DOUBLE))")} AS y
              |  FROM events GROUP BY 1, 2),
              |lev AS (SELECT s, h,
              |    ntile(4) OVER (PARTITION BY s ORDER BY y, h) AS q
              |  FROM hourly),
              |joint AS (SELECT a.s AS sa, b.s AS sb, a.q AS qa, b.q AS qb,
              |    CAST(count(*) AS DOUBLE) AS nab
              |  FROM lev a JOIN lev b ON a.h = b.h AND a.s < b.s
              |  GROUP BY 1, 2, 3, 4),
              |tot AS (SELECT sa, sb, sum(nab) AS nt FROM joint GROUP BY 1, 2),
              |ma AS (SELECT sa, sb, qa, sum(nab) AS na FROM joint
              |  GROUP BY 1, 2, 3),
              |mb AS (SELECT sa, sb, qb, sum(nab) AS nb FROM joint
              |  GROUP BY 1, 2, 3)
              |SELECT sa AS series_a, sb AS series_b,
              |  CAST(max(nt) AS BIGINT) AS n_hours,
              |  ${r6("sum((nab / nt) * ln(nab * nt / (na * nb)) / ln(2.0))")}
              |    AS mi_bits,
              |  ${r6("""sum((nab / nt) * ln(nab * nt / (na * nb)) / ln(2.0))
              |    / (ln(4.0) / ln(2.0))""")} AS nmi
              |FROM joint JOIN tot USING (sa, sb) JOIN ma USING (sa, sb, qa)
              |JOIN mb USING (sa, sb, qb)
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Log-rank test: do the even/odd user cohorts (the q168 split-arm
    // convention — an A/A null by construction; the spec plants real
    // signal) share the time-to-first-purchase curve? Duration = days
    // from a user's first event to their first purchase; the panel has
    // no never-buyers, so every subject is an event (no censoring — the
    // test handles both). The hypothesis test q158's Kaplan-Meier plot
    // only eyeballs.
    "q332_logrank" -> Q(
      (s, d) => {
        val subj = Tables.events(s, d).groupBy("user_id")
          .agg(min("ts").as("__f"),
            min(when(col("event_type") === "purchase", col("ts"))).as("__p"))
          .filter(col("__p").isNotNull)
          .select(
            when(col("user_id") % 2 === 0, "even").otherwise("odd")
              .as("cohort"),
            datediff(to_date(col("__p")), to_date(col("__f")))
              .cast("double").as("dur_days"),
            lit(1).as("converted"))
        graft.operators.StatOps.logRankTest(subj, "cohort", "dur_days",
          "converted", scoreOut = dec6)
      },
      Some(s"""WITH subj AS (SELECT
              |    CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS g,
              |    CAST(date_diff('day', CAST(min(ts) AS DATE),
              |      CAST(min(CASE WHEN event_type = 'purchase' THEN ts END)
              |        AS DATE)) AS DOUBLE) AS t,
              |    1 AS e
              |  FROM events GROUP BY user_id
              |  HAVING min(CASE WHEN event_type = 'purchase' THEN ts END)
              |    IS NOT NULL),
              |times AS (SELECT DISTINCT t AS et FROM subj WHERE e = 1),
              |ar AS (SELECT et,
              |    sum(CASE WHEN g = 'even' THEN 1 ELSE 0 END) AS n_a_t,
              |    count(*) AS n_t,
              |    sum(CASE WHEN g = 'even' AND e = 1 AND t = et
              |      THEN 1 ELSE 0 END) AS d_a_t,
              |    sum(CASE WHEN e = 1 AND t = et THEN 1 ELSE 0 END) AS d_t
              |  FROM subj JOIN times ON t >= et GROUP BY et),
              |tm AS (SELECT CAST(sum(d_a_t) AS DOUBLE) AS o_a,
              |    sum(CAST(d_t AS DOUBLE) * n_a_t / n_t) AS e_a,
              |    sum(CAST(d_t AS DOUBLE)
              |      * (CAST(n_a_t AS DOUBLE) / n_t)
              |      * (1.0 - CAST(n_a_t AS DOUBLE) / n_t)
              |      * (n_t - CAST(d_t AS DOUBLE)) / (n_t - 1.0)) AS v_lr
              |  FROM ar WHERE n_t > 1),
              |ct AS (SELECT 'even' AS group_a, 'odd' AS group_b,
              |    CAST(sum(CASE WHEN g = 'even' THEN 1 ELSE 0 END)
              |      AS BIGINT) AS n_a,
              |    CAST(sum(CASE WHEN g = 'odd' THEN 1 ELSE 0 END)
              |      AS BIGINT) AS n_b
              |  FROM subj)
              |SELECT group_a, group_b, n_a, n_b,
              |  CAST(o_a AS BIGINT) AS o_a, ${r6("e_a")} AS e_a,
              |  ${r6("v_lr")} AS v_lr,
              |  ${r6("(o_a - e_a) / sqrt(v_lr)")} AS z_logrank,
              |  CAST(abs(${r6("(o_a - e_a) / sqrt(v_lr)")}) > 1.96 AS INT)
              |    AS curves_differ
              |FROM ct, tm WHERE v_lr > 0""".stripMargin)),

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

    // Huber robust regression (extended price ~ quantity + retail price
    // per return flag, delta = 25000 ~ the median |OLS residual|) by 3 IRLS steps — q321's ridge with
    // outlier resistance: heavy-residual rows reweight to delta/|r|.
    // Step 1 is plain OLS (all weights 1); each step one weighted-
    // moments aggregate + Cramer 2x2 on the weighted-centered Gram,
    // betas rounded per step so the oracle's unrolled replay is
    // bit-identical (the q325 contract).
    "q334_huber_price" -> Q(
      (s, d) => graft.operators.RegressionOps.huber2(
          Tables.lineitem(s, d)
            .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
            .select(col("l_returnflag"), col("l_extendedprice"),
              col("l_quantity"), col("p_retailprice")),
          "l_returnflag", "l_extendedprice", "l_quantity", "p_retailprice",
          delta = 25000.0, iters = 3, scoreOut = dec6)
        .orderBy("l_returnflag"),
      Some {
        val iters = 3
        val det = "(s11 * s22 - s12 * s12)"
        val steps = (1 to iters).map { i =>
          val wSrc =
            if (i == 1) "SELECT g, y, x1, x2, 1.0 AS w FROM base"
            else s"""SELECT g, y, x1, x2,
               |    CASE WHEN abs(y - (b0 + b1 * x1 + b2 * x2)) <= 25000.0
               |      THEN 1.0
               |      ELSE 25000.0 / abs(y - (b0 + b1 * x1 + b2 * x2)) END AS w
               |  FROM base JOIN bt${i - 1} USING (g)""".stripMargin
          s"""w$i AS ($wSrc),
             |s$i AS (SELECT g, sum(w) AS sw, sum(w * y) AS swy,
             |    sum(w * x1) AS sw1, sum(w * x2) AS sw2,
             |    sum(w * x1 * x1) AS s11r, sum(w * x1 * x2) AS s12r,
             |    sum(w * x2 * x2) AS s22r, sum(w * x1 * y) AS s1yr,
             |    sum(w * x2 * y) AS s2yr
             |  FROM w$i GROUP BY 1),
             |m$i AS (SELECT *, ${r6("swy / sw")} AS my,
             |    ${r6("sw1 / sw")} AS m1, ${r6("sw2 / sw")} AS m2 FROM s$i),
             |c$i AS (SELECT *,
             |    s11r - m1 * sw1 - m1 * sw1 + m1 * m1 * sw AS s11,
             |    s12r - m1 * sw2 - m2 * sw1 + m1 * m2 * sw AS s12,
             |    s22r - m2 * sw2 - m2 * sw2 + m2 * m2 * sw AS s22,
             |    s1yr - m1 * swy - my * sw1 + m1 * my * sw AS s1y,
             |    s2yr - m2 * swy - my * sw2 + m2 * my * sw AS s2y
             |  FROM m$i),
             |bt${i}a AS (SELECT g, my, m1, m2,
             |    ${r6(s"(s22 * s1y - s12 * s2y) / $det")} AS b1,
             |    ${r6(s"(s11 * s2y - s12 * s1y) / $det")} AS b2 FROM c$i),
             |bt$i AS (SELECT g, b1, b2,
             |    ${r6("my - b1 * m1 - b2 * m2")} AS b0 FROM bt${i}a)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH base AS (SELECT l_returnflag AS g,
           |    CAST(l_extendedprice AS DOUBLE) AS y,
           |    CAST(l_quantity AS DOUBLE) AS x1,
           |    CAST(p_retailprice AS DOUBLE) AS x2
           |  FROM lineitem JOIN part ON l_partkey = p_partkey),
           |$steps,
           |fin AS (SELECT base.g AS g,
           |    y - (b0 + b1 * x1 + b2 * x2) AS r, b0, b1, b2
           |  FROM base JOIN bt$iters USING (g))
           |SELECT g AS l_returnflag, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(CASE WHEN abs(r) > 25000.0 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_downweighted,
           |  any_value(b0) AS b0, any_value(b1) AS b1, any_value(b2) AS b2
           |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // Cox proportional-hazards regression (Breslow ties) on
    // time-to-first-purchase with log-activity as the covariate — the
    // survival-REGRESSION step after q158's Kaplan-Meier curve and
    // q332's two-group log-rank: does higher engagement accelerate the
    // hazard, with an effect size (hazard ratio), a Wald z, and the
    // partial log-likelihood. The cohort is the 3-day ACTIVATION WINDOW:
    // converted = first purchase within 3 days of first touch, everyone
    // else CENSORED at day 3 (every panel user eventually purchases, so
    // administrative right-censoring at a fixed horizon is the honest
    // censoring mechanism — ~10% of users at sf0.01, both classes at
    // sf0.001 probed) — the gate now exercises the e = 0 risk-set path,
    // not just the operator spec. 3 Newton steps, per-step-rounded β,
    // each step one per-duration collapse + the q332 cumulative at-risk
    // window + a scalar aggregate; the oracle unrolls the identical
    // trajectory including the censored rows.
    "q340_cox_ph" -> Q(
      (s, d) => {
        val pd = datediff(to_date(col("__p")), to_date(col("__f")))
        val conv = col("__p").isNotNull && pd <= 3
        val subj = Tables.events(s, d).groupBy("user_id")
          .agg(min("ts").as("__f"),
            min(when(col("event_type") === "purchase", col("ts"))).as("__p"),
            count(lit(1)).as("__c"))
          .select(
            when(conv, pd.cast("double")).otherwise(lit(3.0)).as("dur_days"),
            when(conv, lit(1)).otherwise(lit(0)).as("converted"),
            dec6(log(col("__c").cast("double"))).as("log_activity"))
        graft.operators.StatOps.coxPh(subj, "dur_days", "converted",
          "log_activity", iters = 3, scoreOut = dec6)
      },
      Some {
        def step(i: Int) =
          s"""pd$i AS (SELECT t, any_value(b) AS b,
             |    sum(exp(b * x)) AS c0, sum(x * exp(b * x)) AS c1,
             |    sum(x * x * exp(b * x)) AS c2,
             |    CAST(sum(e) AS DOUBLE) AS d,
             |    sum(CASE WHEN e = 1 THEN x ELSE 0.0 END) AS dx
             |  FROM subj, bt${i - 1} GROUP BY t),
             |cw$i AS (SELECT t, b, d, dx,
             |    sum(c0) OVER w AS s0, sum(c1) OVER w AS s1,
             |    sum(c2) OVER w AS s2
             |  FROM pd$i WINDOW w AS (ORDER BY t DESC
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"""
            .stripMargin
        val steps = (1 to 3).map { i =>
          step(i) + ",\n" +
            s"""bt$i AS (SELECT ${r6("""CASE WHEN
               |  sum(d * (s2 / s0 - (s1 / s0) * (s1 / s0))) > 0
               |  THEN any_value(b) + sum(dx - d * s1 / s0)
               |    / sum(d * (s2 / s0 - (s1 / s0) * (s1 / s0)))
               |  ELSE any_value(b) END""")} AS b
               |  FROM cw$i WHERE d > 0)""".stripMargin
        }.mkString(",\n")
        s"""WITH raw AS (SELECT
           |    date_diff('day', CAST(min(ts) AS DATE),
           |      CAST(min(CASE WHEN event_type = 'purchase' THEN ts END)
           |        AS DATE)) AS pd,
           |    ${r6("ln(CAST(count(*) AS DOUBLE))")} AS x
           |  FROM events GROUP BY user_id),
           |subj AS (SELECT
           |    CASE WHEN pd IS NOT NULL AND pd <= 3
           |      THEN CAST(pd AS DOUBLE) ELSE 3.0 END AS t,
           |    CASE WHEN pd IS NOT NULL AND pd <= 3 THEN 1 ELSE 0 END AS e,
           |    x FROM raw),
           |bt0 AS (SELECT 0.0 AS b),
           |$steps,
           |${step(4)},
           |fin AS (SELECT any_value(b) AS b,
           |    sum(d * (s2 / s0 - (s1 / s0) * (s1 / s0))) AS inf,
           |    sum(dx) AS sdx, sum(d * ln(s0)) AS dls0
           |  FROM cw4 WHERE d > 0),
           |cnt AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(e) AS BIGINT) AS n_events FROM subj)
           |SELECT n, n_events, b AS beta, ${r6("exp(b)")} AS hazard_ratio,
           |  CASE WHEN inf > 0 THEN ${r6("1.0 / sqrt(inf)")} END AS se_beta,
           |  CASE WHEN inf > 0 THEN ${r6("b * sqrt(inf)")} END AS z_wald,
           |  ${r6("b * sdx - dls0")} AS log_lik
           |FROM cnt, fin""".stripMargin
      }),
  )
}
