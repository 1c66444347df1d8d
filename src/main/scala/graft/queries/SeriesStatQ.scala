package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.CorpusOps
import Q.{dec4, dec6, r4, r6}
import scala.collection.immutable.ListMap

/** Series-diagnostic, survival and regression gate entries split out of
  * StatQ (round-12 file hygiene, the CorpusQ→TokenizerQ precedent — a
  * verbatim move, zero behavior change): temporal diagnostics (ACF,
  * PACF, periodogram, Ljung-Box, Durbin-Watson, runs, Mann-Kendall,
  * ADF, Hurst, Allan variance), interarrival/extreme-value fits
  * (Weibull, Gumbel, NB overdispersion, AD exponentiality), the
  * regression estimators (OLS trend, Theil-Sen, ridge, Newton logistic,
  * Huber IRLS) and the survival trio (Kaplan-Meier, log-rank, Cox PH).
  * StatQ keeps the distribution-shaped tests. Same Q/oracle discipline
  * as every other suite. */
object SeriesStatQ {

  val queries: ListMap[String, Q] = ListMap(



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
