package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import Q.{dec6, r6}
import scala.collection.immutable.ListMap

/** Experiment-design / causal-inference gate entries, split out of
  * StatQ (round-10 hygiene, twin of the ExperimentOps/StatOps split):
  * randomized-split testing (q168 two-proportion z, q169 bootstrap CI),
  * multiple-testing control (q284 BH-FDR), variance reduction (q290
  * CUPED), survey sampling (q295 Neyman, q296 Horvitz-Thompson),
  * sequential always-valid monitoring (q297 mSPRT), attribution (q298
  * Shapley) and causal estimation (q299 diff-in-diff A/A placebo).
  * Same Q/oracle discipline as every other suite. */
object ExperimentQ {

  val queries: ListMap[String, Q] = ListMap(

    // Two-proportion z-test between md5-split experiment arms: conversion
    // = any purchase with value > 100; the z statistic is pure arithmetic
    // over two aggregate rows, |z| > 1.96 flags 95% significance.
    "q168_ab_test" -> Q(
      (s, d) => graft.operators.ExperimentOps.abTest(
        Tables.events(s, d), "user_id",
        successCond = col("event_type") === "purchase" && col("value") > 100,
        scoreOut = dec6),
      Some(s"""WITH pu AS (SELECT user_id,
              |  max(CASE WHEN event_type = 'purchase' AND value > 100
              |    THEN 1 ELSE 0 END) AS conv
              |  FROM events GROUP BY user_id),
              |arm AS (SELECT conv,
              |  CASE WHEN strpos('0123456789abcdef',
              |    substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1 < 8
              |  THEN 'a' ELSE 'b' END AS arm FROM pu),
              |ag AS (SELECT arm, count(*) AS n, sum(conv) AS c FROM arm GROUP BY arm),
              |x AS (SELECT
              |  (SELECT n FROM ag WHERE arm = 'a') AS n_a,
              |  (SELECT c FROM ag WHERE arm = 'a') AS conv_a,
              |  (SELECT n FROM ag WHERE arm = 'b') AS n_b,
              |  (SELECT c FROM ag WHERE arm = 'b') AS conv_b),
              |y AS (SELECT n_a, n_b, conv_a, conv_b,
              |  CAST(conv_a AS DOUBLE) / n_a AS p_a,
              |  CAST(conv_b AS DOUBLE) / n_b AS p_b,
              |  CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b) AS pp FROM x),
              |z AS (SELECT *, (p_a - p_b)
              |  / sqrt(pp * (1.0 - pp) * (1.0 / n_a + 1.0 / n_b)) AS zz FROM y)
              |SELECT n_a, n_b, CAST(conv_a AS BIGINT) AS conv_a,
              |  CAST(conv_b AS BIGINT) AS conv_b,
              |  ${r6("p_a")} AS p_a, ${r6("p_b")} AS p_b, ${r6("zz")} AS z,
              |  CAST(abs(zz) > 1.96 AS INT) AS significant_95
              |FROM z""".stripMargin)),

    // Deterministic Poisson-bootstrap 95% CI for the mean event value:
    // 32 hash-drawn replicates (p = 1 - 1/e), percentile bounds over the
    // replicate means — reproducible across runs and engines.
    "q169_bootstrap_ci" -> Q(
      (s, d) => graft.operators.ExperimentOps.bootstrapMeanCi(
        Tables.events(s, d), "value", b = 32, level = 0.95,
        idCol = "event_id", scoreOut = dec6),
      Some(s"""WITH hp AS (SELECT CAST(value AS DOUBLE) AS v,
              |  md5(CAST(event_id AS VARCHAR) || '_1')
              |    || md5(CAST(event_id AS VARCHAR) || '_2') AS h FROM events),
              |reps AS (SELECT u.r, v
              |  FROM hp, LATERAL (SELECT unnest(generate_series(1, 32)) AS r) u
              |  WHERE (strpos('0123456789abcdef', substring(h, 2 * u.r - 1, 1)) - 1)
              |      * 16
              |    + strpos('0123456789abcdef', substring(h, 2 * u.r, 1)) - 1
              |    < 162),
              |means AS (SELECT r, avg(v) AS m FROM reps GROUP BY r),
              |ci AS (SELECT quantile_cont(m, 0.025) AS lo,
              |  quantile_cont(m, 0.975) AS hi FROM means),
              |base AS (SELECT count(*) AS n, avg(CAST(value AS DOUBLE)) AS mean
              |  FROM events)
              |SELECT n, ${r6("mean")} AS mean, ${r6("lo")} AS boot_lo,
              |  ${r6("hi")} AS boot_hi FROM base, ci""".stripMargin)),

    // Benjamini-Hochberg FDR control over the q275 Mann-Kendall family —
    // at 10k series, per-test α=0.05 hands you 500 false trend alarms;
    // BH caps the false-discovery RATE instead. p-values via the shared
    // Zelen-Severo Φ polynomial (engine-identical arithmetic, no native
    // erf needed on either side).
    "q284_bh_fdr" -> Q(
      (s, d) => graft.operators.ExperimentOps.bhFdr(
          graft.operators.StatOps.mannKendall(
              Tables.events(s, d), "event_type", "ts", "value",
              scoreOut = dec6)
            .select("series", "z"),
          "series", "z", alpha = 0.05, scoreOut = dec6)
        .orderBy("rank"),
      Some(s"""WITH $sqlMkFamilyP,
              |rk AS (SELECT test_key, z, p,
              |    CAST(row_number() OVER (ORDER BY p, test_key) AS BIGINT)
              |      AS rank,
              |    count(*) OVER () AS m FROM pp),
              |ct AS (SELECT test_key, z, p, rank,
              |    ${r6("rank * 0.05 / m")} AS bh_cutoff FROM rk),
              |km AS (SELECT max(CASE WHEN p <= bh_cutoff THEN rank END) AS k
              |  FROM ct)
              |SELECT test_key, z, p, rank, bh_cutoff,
              |  CAST(rank <= coalesce(k, 0) AS INT) AS reject
              |FROM ct, km ORDER BY rank""".stripMargin)),

    // CUPED variance reduction on the md5-split arms (Deng '13): the
    // pre-period covariate (first-half per-user mean) strips between-user
    // variance from the post-period metric before the z-test — the
    // adjustment every mature experimentation platform applies.
    "q290_cuped" -> Q(
      (s, d) => graft.operators.ExperimentOps.cuped(
        Tables.events(s, d), "user_id", "ts", "value",
        cutTs = "2024-01-16", scoreOut = dec6),
      Some(s"""WITH per AS (SELECT user_id AS u,
              |    avg(CASE WHEN ts < TIMESTAMP '2024-01-16'
              |      THEN CAST(value AS DOUBLE) END) AS x,
              |    avg(CASE WHEN ts >= TIMESTAMP '2024-01-16'
              |      THEN CAST(value AS DOUBLE) END) AS y
              |  FROM events GROUP BY 1),
              |el AS (SELECT u, x, y,
              |    CASE WHEN strpos('0123456789abcdef',
              |      substring(md5(CAST(u AS VARCHAR)), 1, 1)) - 1 < 8
              |      THEN 'a' ELSE 'b' END AS arm
              |  FROM per WHERE x IS NOT NULL AND y IS NOT NULL),
              |gm AS (SELECT avg(x) AS mx, avg(y) AS my FROM el),
              |cen AS (SELECT arm, y, x - mx AS cx FROM el, gm),
              |th AS (SELECT ${r6("sum(cx * cy) / sum(cx * cx)")} AS theta
              |  FROM (SELECT cx, y - (SELECT my FROM gm) AS cy FROM cen)),
              |ad AS (SELECT arm, y, y - theta * cx AS adj, theta
              |  FROM cen, th),
              |ar AS (SELECT arm, CAST(count(*) AS DOUBLE) AS n, avg(y) AS my,
              |    avg(adj) AS madj, var_samp(y) AS vy, var_samp(adj) AS vadj,
              |    max(theta) AS theta
              |  FROM ad GROUP BY arm),
              |p AS (SELECT
              |  max(CASE WHEN arm = 'a' THEN n END) AS na,
              |  max(CASE WHEN arm = 'b' THEN n END) AS nb,
              |  max(theta) AS theta,
              |  max(CASE WHEN arm = 'a' THEN my END) AS mya,
              |  max(CASE WHEN arm = 'b' THEN my END) AS myb,
              |  max(CASE WHEN arm = 'a' THEN madj END) AS mja,
              |  max(CASE WHEN arm = 'b' THEN madj END) AS mjb,
              |  max(CASE WHEN arm = 'a' THEN vy END) AS vya,
              |  max(CASE WHEN arm = 'b' THEN vy END) AS vyb,
              |  max(CASE WHEN arm = 'a' THEN vadj END) AS vja,
              |  max(CASE WHEN arm = 'b' THEN vadj END) AS vjb
              |  FROM ar)
              |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
              |  theta,
              |  ${r6("mya - myb")} AS diff_raw,
              |  ${r6("mja - mjb")} AS diff_adj,
              |  ${r6("sqrt(vja / na + vjb / nb)")} AS se_adj,
              |  ${r6("(mja - mjb) / sqrt(vja / na + vjb / nb)")} AS z_adj,
              |  ${r6("""1.0 - (vja * (na - 1) + vjb * (nb - 1))
              |    / (vya * (na - 1) + vyb * (nb - 1))""")} AS var_reduction
              |FROM p""".stripMargin)),

    // Neyman optimal sampling allocation across event types: n_h ∝ N_h·σ_h
    // — how a labeling/eval budget should actually be spent (vs the
    // proportional share also reported). Stratum-sized output.
    "q295_neyman_allocation" -> Q(
      (s, d) => graft.operators.ExperimentOps.neymanAllocation(
          Tables.events(s, d), "event_type", "value", budget = 1000,
          scoreOut = dec6)
        .orderBy("stratum"),
      Some(s"""WITH per AS (SELECT event_type AS stratum, count(*) AS n_rows,
              |    ${r6("stddev_pop(CAST(value AS DOUBLE))")} AS sigma
              |  FROM events GROUP BY 1),
              |t AS (SELECT sum(n_rows * sigma) AS ns, sum(n_rows) AS nn
              |  FROM per),
              |sh AS (SELECT stratum, n_rows, sigma,
              |    ${r6("n_rows * sigma / ns")} AS neyman_share,
              |    ${r6("n_rows / CAST(nn AS DOUBLE)")} AS prop_share
              |  FROM per, t)
              |SELECT stratum, n_rows, sigma, neyman_share, prop_share,
              |  CAST(floor(neyman_share * 1000 + 0.5) AS BIGINT) AS n_sample
              |FROM sh ORDER BY stratum""".stripMargin)),

    // Horvitz-Thompson total estimator under deterministic PPS Poisson
    // sampling (Knuth-hash uniforms, the q132 convention): the
    // unbiasedness identity every weighted sample rides, measured with
    // its realized relative error. One scan, two scalar aggregates.
    "q296_horvitz_thompson" -> Q(
      (s, d) => graft.operators.ExperimentOps.horvitzThompson(
        Tables.documents(s, d), "doc_id", "n_chars", budget = 100,
        scoreOut = dec6),
      Some(s"""WITH base AS (SELECT doc_id AS id, CAST(n_chars AS DOUBLE) AS x
              |  FROM documents WHERE n_chars > 0),
              |t AS (SELECT sum(x) AS tx, count(*) AS n FROM base),
              |w AS (SELECT id, x, tx, n,
              |  ${r6("""((((id % 2147483648) * 2654435761) % 2147483647)
              |    + 1.0) / 2147483648.0""")} AS u,
              |  ${r6("least(1.0, 100.0 * x / tx)")} AS pi
              |  FROM base, t),
              |ag AS (SELECT CAST(max(n) AS BIGINT) AS n_total,
              |  CAST(sum(CASE WHEN u < pi THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n_sampled,
              |  ${r6("max(tx)")} AS true_total,
              |  ${r6("sum(CASE WHEN u < pi THEN x / pi ELSE 0.0 END)")}
              |    AS ht_estimate
              |  FROM w)
              |SELECT n_total, n_sampled, true_total, ht_estimate,
              |  ${r6("abs(ht_estimate - true_total) / true_total")} AS rel_err
              |FROM ag""".stripMargin)),

    // Always-valid A/B monitoring (mixture SPRT, tau=1): the peeking-safe
    // p-value trajectory over cumulative md5-split arms — stop the first
    // day p < 0.05 without inflating the false-positive rate; the
    // sequential completion of the q168/q290 experimentation family.
    "q297_msprt" -> Q(
      (s, d) => graft.operators.ExperimentOps.msprt(
          Tables.events(s, d), "user_id", "ts", "value",
          tau = 1.0, alpha = 0.05, scoreOut = dec6)
        .orderBy("day"),
      Some(s"""WITH daily AS (SELECT CAST(ts AS DATE) AS d,
              |    CASE WHEN strpos('0123456789abcdef',
              |      substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1 < 8
              |      THEN 'a' ELSE 'b' END AS arm,
              |    CAST(count(*) AS DOUBLE) AS n,
              |    sum(CAST(value AS DOUBLE)) AS s,
              |    sum(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)) AS q
              |  FROM events GROUP BY 1, 2),
              |grid AS (SELECT d, arm
              |  FROM (SELECT DISTINCT d FROM daily)
              |  CROSS JOIN (VALUES ('a'), ('b')) arms(arm)),
              |cum AS (SELECT grid.d, grid.arm,
              |    sum(n) OVER w AS cn, sum(s) OVER w AS cs,
              |    sum(q) OVER w AS cq
              |  FROM grid LEFT JOIN daily
              |    ON daily.d = grid.d AND daily.arm = grid.arm
              |  WINDOW w AS (PARTITION BY grid.arm ORDER BY grid.d
              |    ROWS UNBOUNDED PRECEDING)),
              |byday AS (SELECT d,
              |    max(CASE WHEN arm = 'a' THEN cn END) AS na,
              |    max(CASE WHEN arm = 'b' THEN cn END) AS nb,
              |    max(CASE WHEN arm = 'a' THEN cs END) AS sa,
              |    max(CASE WHEN arm = 'b' THEN cs END) AS sb,
              |    max(CASE WHEN arm = 'a' THEN cq END) AS qa,
              |    max(CASE WHEN arm = 'b' THEN cq END) AS qb
              |  FROM cum GROUP BY d),
              |g AS (SELECT d, na, nb, sa / na AS ma, sb / nb AS mb, qa, qb
              |  FROM byday WHERE na >= 2 AND nb >= 2),
              |g2 AS (SELECT d, na, nb, ${r6("ma - mb")} AS diff,
              |    ${r6("""(qa / na - ma * ma) / na
              |      + (qb / nb - mb * mb) / nb""")} AS se2
              |  FROM g),
              |l AS (SELECT d, na, nb, diff, se2,
              |    ${r6("""sqrt(se2 / (se2 + 1.0))
              |      * exp(diff * diff / (2.0 * se2 * (se2 + 1.0)))""")}
              |      AS lambda
              |  FROM g2),
              |p AS (SELECT d, na, nb, diff, se2, lambda,
              |    ${r6("""least(1.0, 1.0 / max(lambda)
              |      OVER (ORDER BY d ROWS UNBOUNDED PRECEDING))""")}
              |      AS p_always_valid
              |  FROM l)
              |SELECT strftime(d, '%Y-%m-%d') AS day,
              |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
              |  diff, se2, lambda, p_always_valid,
              |  CAST(p_always_valid < 0.05 AS INT) AS reject
              |FROM p ORDER BY day""".stripMargin)),

    // Shapley-value attribution over the four non-purchase channels —
    // the order-free completion of the q216/q229/q241 attribution
    // family: each channel's average marginal lift of the conversion
    // rate across all coalition orders; v(S) from exact touch-set
    // conversion rates, unobserved sets at 0 (simplified estimator).
    "q298_shapley_attribution" -> Q(
      (s, d) => graft.operators.EventOps.shapleyAttribution(
          Tables.events(s, d), "user_id", "event_type",
          channels = Seq("click", "view", "signup", "error"),
          conversionType = "purchase", scoreOut = dec6)
        .orderBy("channel"),
      Some(s"""WITH pu AS (SELECT user_id,
              |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c0,
              |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c1,
              |    max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS c2,
              |    max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS c3,
              |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              |      AS conv
              |  FROM events GROUP BY 1),
              |v AS (SELECT c0 + 2 * c1 + 4 * c2 + 8 * c3 AS mask,
              |    count(*) AS n_users, sum(conv) AS n_conv,
              |    ${r6("avg(conv)")} AS v
              |  FROM pu GROUP BY 1),
              |chan(channel, bitval) AS (VALUES ('click', 1), ('view', 2),
              |  ('signup', 4), ('error', 8)),
              |masks AS (SELECT unnest(generate_series(0, 15)) AS s),
              |pairs AS (SELECT channel, s, s + bitval AS s_with,
              |    CASE bit_count(s)
              |      WHEN 0 THEN CAST(6 AS DOUBLE) / 24
              |      WHEN 1 THEN CAST(2 AS DOUBLE) / 24
              |      WHEN 2 THEN CAST(2 AS DOUBLE) / 24
              |      ELSE CAST(6 AS DOUBLE) / 24 END AS w
              |  FROM chan, masks WHERE (s & bitval) = 0),
              |phi AS (SELECT channel,
              |    ${r6("""sum(w * (coalesce(vi.v, 0.0)
              |      - coalesce(vs.v, 0.0)))""")} AS phi
              |  FROM pairs
              |  LEFT JOIN v vs ON vs.mask = pairs.s
              |  LEFT JOIN v vi ON vi.mask = pairs.s_with
              |  GROUP BY channel),
              |cov AS (SELECT ${r6("""CAST(sum(CASE WHEN mask <> 0
              |    THEN n_conv END) AS DOUBLE) / sum(n_conv)""")} AS c
              |  FROM v)
              |SELECT channel, phi, c AS touched_conv_share
              |FROM phi, cov ORDER BY channel""".stripMargin)),

    // Difference-in-differences A/A placebo (md5 arms x month halves):
    // the causal workhorse run as a standing split-health check — the
    // estimate should be ~0 when the split is clean.
    "q299_diff_in_diff" -> Q(
      (s, d) => graft.operators.ExperimentOps.diffInDiff(
        Tables.events(s, d), "user_id", "ts", "value",
        cutTs = "2024-01-16", scoreOut = dec6),
      Some(s"""WITH cells AS (SELECT
              |    CASE WHEN strpos('0123456789abcdef',
              |      substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1 < 8
              |      THEN 'a' ELSE 'b' END AS arm,
              |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'pre'
              |      ELSE 'post' END AS period,
              |    CAST(count(*) AS DOUBLE) AS n,
              |    avg(CAST(value AS DOUBLE)) AS m,
              |    var_samp(CAST(value AS DOUBLE)) AS s2
              |  FROM events GROUP BY 1, 2),
              |p AS (SELECT
              |  max(CASE WHEN arm = 'a' AND period = 'pre' THEN n END) AS nap,
              |  max(CASE WHEN arm = 'a' AND period = 'post' THEN n END) AS naq,
              |  max(CASE WHEN arm = 'b' AND period = 'pre' THEN n END) AS nbp,
              |  max(CASE WHEN arm = 'b' AND period = 'post' THEN n END) AS nbq,
              |  max(CASE WHEN arm = 'a' AND period = 'pre' THEN m END) AS map,
              |  max(CASE WHEN arm = 'a' AND period = 'post' THEN m END) AS maq,
              |  max(CASE WHEN arm = 'b' AND period = 'pre' THEN m END) AS mbp,
              |  max(CASE WHEN arm = 'b' AND period = 'post' THEN m END) AS mbq,
              |  max(CASE WHEN arm = 'a' AND period = 'pre' THEN s2 END) AS sap,
              |  max(CASE WHEN arm = 'a' AND period = 'post' THEN s2 END) AS saq,
              |  max(CASE WHEN arm = 'b' AND period = 'pre' THEN s2 END) AS sbp,
              |  max(CASE WHEN arm = 'b' AND period = 'post' THEN s2 END) AS sbq
              |  FROM cells)
              |SELECT CAST(nap AS BIGINT) AS n_a_pre,
              |  CAST(naq AS BIGINT) AS n_a_post,
              |  CAST(nbp AS BIGINT) AS n_b_pre,
              |  CAST(nbq AS BIGINT) AS n_b_post,
              |  ${r6("(maq - map) - (mbq - mbp)")} AS did,
              |  ${r6("sqrt(saq / naq + sap / nap + sbq / nbq + sbp / nbp)")}
              |    AS se,
              |  ${r6("""((maq - map) - (mbq - mbp))
              |    / sqrt(saq / naq + sap / nap + sbq / nbq + sbp / nbp)""")}
              |    AS z,
              |  CAST(abs(((maq - map) - (mbq - mbp))
              |    / sqrt(saq / naq + sap / nap + sbq / nbq + sbp / nbp))
              |    > 1.96 AS INT) AS significant_95
              |FROM p""".stripMargin)),

    // Holm-Bonferroni step-down over the same q275 Mann-Kendall family —
    // FWER control beside q284's FDR: use Holm when ONE false positive
    // is unacceptable (launch gates), BH for screening. Adjusted p is
    // the running max of (m - rank + 1) * p, capped at 1.
    // IPW (Hajek) average treatment effect of heavy error exposure on
    // purchase revenue — the OBSERVATIONAL estimator beside q168's
    // randomized test: treatment (above-mean error count) is confounded
    // with activity, the exact confounders (log event count, active
    // days) feed the q325 Newton propensity, and the clipped
    // inverse-propensity weights reweight the naive (confounded)
    // difference toward the adjusted effect. Both numbers reported.
    "q335_ipw_ate" -> Q(
      (s, d) => {
        val users = Tables.events(s, d).groupBy("user_id").agg(
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("__err"),
          count(lit(1)).as("__n"),
          countDistinct(to_date(col("ts"))).as("__days"),
          sum(when(col("event_type") === "purchase",
            col("value").cast("double")).otherwise(0.0)).as("__y"))
        val thr = users.agg(dec6(avg("__err")).as("__thr"))
        val units = users.crossJoin(broadcast(thr)).select(
          (col("__err") > col("__thr")).cast("int").as("t"),
          col("__y").as("y"),
          log(lit(1.0) + col("__n")).as("x1"),
          col("__days").cast("double").as("x2"))
        graft.operators.ExperimentOps.ipwAte(units, "t", "y", "x1", "x2",
          iters = 4, clip = 0.05, scoreOut = dec6)
      },
      Some(s"""WITH u AS (SELECT user_id,
              |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              |      AS err,
              |    count(*) AS nevt,
              |    count(DISTINCT CAST(ts AS DATE)) AS days,
              |    sum(CASE WHEN event_type = 'purchase'
              |      THEN CAST(value AS DOUBLE) ELSE 0.0 END) AS yy
              |  FROM events GROUP BY 1),
              |thr AS (SELECT ${r6("avg(err)")} AS thr FROM u),
              |-- the Newton chain's label column is named y = TREATMENT;
              |-- the outcome rides along as yy
              |base AS (SELECT 'all' AS g,
              |    CAST(CAST(err > thr AS INT) AS DOUBLE) AS y, yy,
              |    ln(1.0 + nevt) AS x1, CAST(days AS DOUBLE) AS x2
              |  FROM u, thr),
              |${NewtonSql.steps(4)},
              |sc AS (SELECT g, y AS t, yy, b0, b1, b2,
              |    least(1.0 - 0.05, greatest(0.05, ${NewtonSql.pExpr})) AS e
              |  FROM base JOIN bt4 USING (g))
              |SELECT CAST(count(*) AS BIGINT) AS n,
              |  CAST(sum(t) AS BIGINT) AS n_treated,
              |  any_value(b0) AS b0, any_value(b1) AS b1, any_value(b2) AS b2,
              |  ${r6("sum(t * yy / e) / sum(t / e)")} AS mu_treated,
              |  ${r6("""sum((1.0 - t) * yy / (1.0 - e))
              |    / sum((1.0 - t) / (1.0 - e))""")} AS mu_control,
              |  ${r6("""sum(t * yy / e) / sum(t / e)
              |    - sum((1.0 - t) * yy / (1.0 - e))
              |      / sum((1.0 - t) / (1.0 - e))""")} AS ate_ipw,
              |  ${r6("""sum(t * yy) / sum(t)
              |    - sum((1.0 - t) * yy) / sum(1.0 - t)""")} AS naive_diff
              |FROM sc""".stripMargin)),

    "q331_holm" -> Q(
      (s, d) => graft.operators.ExperimentOps.holm(
          graft.operators.StatOps.mannKendall(
              Tables.events(s, d), "event_type", "ts", "value",
              scoreOut = dec6)
            .select("series", "z"),
          "series", "z", alpha = 0.05, scoreOut = dec6)
        .orderBy("rank"),
      Some(s"""WITH $sqlMkFamilyP,
              |rk AS (SELECT test_key, z, p,
              |    CAST(row_number() OVER (ORDER BY p, test_key) AS BIGINT)
              |      AS rank,
              |    count(*) OVER () AS m FROM pp),
              |h AS (SELECT test_key, z, p, rank,
              |    ${r6("""least(1.0, max(CAST(m - rank + 1 AS DOUBLE) * p)
              |      OVER (ORDER BY rank
              |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))""")}
              |      AS p_holm
              |  FROM rk)
              |SELECT test_key, z, p, rank, p_holm,
              |  CAST(p_holm <= 0.05 AS INT) AS reject
              |FROM h ORDER BY rank""".stripMargin)),
  )

  /** Shared oracle prefix for the multiple-testing entries (q284, q331):
    * the q275 Mann-Kendall z family plus the Zelen-Severo Φ polynomial,
    * ending at `pp(test_key, z, p)`. (A def — `queries` above
    * initializes first and would read a val as null.) */
  private def sqlMkFamilyP: String =
    s"""daily AS (SELECT event_type AS series, CAST(ts AS DATE) AS d,
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
       |zz AS (SELECT series AS test_key,
       |    ${r6("""CASE WHEN s > 0 THEN (s - 1) / sqrt(vr)
       |      WHEN s < 0 THEN (s + 1) / sqrt(vr) ELSE 0.0 END""")} AS z
       |  FROM v),
       |pv AS (SELECT test_key, z,
       |    1.0 / (1.0 + 0.2316419 * abs(z)) AS tt FROM zz),
       |pp AS (SELECT test_key, z,
       |    ${r6("""2.0 * exp(-z * z / 2.0) / sqrt(2.0 * pi())
       |      * (tt * (0.319381530 + tt * (-0.356563782
       |        + tt * (1.781477937 + tt * (-1.821255978
       |        + tt * 1.330274429)))))""")} AS p
       |  FROM pv)""".stripMargin
}
