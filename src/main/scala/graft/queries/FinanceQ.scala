package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.FinanceOps
import Q.{dec4, dec6, r6}
import scala.collection.immutable.ListMap

/** Price-style indicator suite over the forward-filled hourly grid
  * (WindowQ.series): running-peak drawdown, Cutler's RSI, MACD — the
  * standard monitoring indicators layered on the same per-series window
  * discipline as WindowQ (partitionBy(event_type), never a global sort).
  */
object FinanceQ {

  import WindowQ.{series, sqlSeries}

  val queries: ListMap[String, Q] = ListMap(

    // Maximum drawdown from the running peak, per series: one
    // unbounded-preceding window pass, argmax on the ROUNDED absolute
    // drawdown with the earliest-ts tiebreak (the q282 rounded-argmax
    // discipline), relative drawdown NULL while the peak is <= 0.
    "q312_max_drawdown" -> Q(
      (s, d) => FinanceOps.maxDrawdown(
          series(s, d), "event_type", "ts", "v", scoreOut = dec6)
        .orderBy("event_type"),
      Some(s"""WITH $sqlSeries,
              |g AS (SELECT ts, event_type, CAST(v AS DOUBLE) AS v
              |  FROM series WHERE v IS NOT NULL),
              |dd AS (SELECT event_type, ts, v,
              |    max(v) OVER (PARTITION BY event_type ORDER BY ts
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
              |  FROM g),
              |r AS (SELECT event_type, ts, v, peak,
              |    ${r6("peak - v")} AS ddabs,
              |    row_number() OVER (PARTITION BY event_type
              |      ORDER BY ${r6("peak - v")} DESC, ts) AS rk,
              |    count(*) OVER (PARTITION BY event_type) AS n
              |  FROM dd)
              |SELECT event_type, n, ${r6("peak")} AS peak_value,
              |  ${r6("v")} AS trough_value, ts AS trough_ts,
              |  ddabs AS max_dd_abs,
              |  CASE WHEN peak > 0 THEN ${r6("(peak - v) / peak")} END
              |    AS max_dd_rel
              |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin)),

    // Cutler's RSI-14 (SMA of gains/losses over the last 14 one-step
    // diffs), emitted only on full windows (min_periods, the W5
    // contract); the all-gain degenerate case pins to 100.
    "q313_rsi" -> Q(
      (s, d) => FinanceOps.rsiCutler(
          series(s, d), "event_type", "ts", "v", n = 14, scoreOut = dec6)
        .orderBy("ts", "event_type"),
      Some(s"""WITH $sqlSeries,
              |g AS (SELECT ts, event_type, CAST(v AS DOUBLE) AS v
              |  FROM series WHERE v IS NOT NULL),
              |d AS (SELECT ts, event_type, v,
              |    v - lag(v) OVER (PARTITION BY event_type ORDER BY ts) AS dd
              |  FROM g),
              |f AS (SELECT ts, event_type, v,
              |    count(dd) OVER w AS cnt,
              |    avg(CASE WHEN dd > 0 THEN dd
              |        WHEN dd IS NOT NULL THEN 0.0 END) OVER w AS ag,
              |    avg(CASE WHEN dd < 0 THEN -dd
              |        WHEN dd IS NOT NULL THEN 0.0 END) OVER w AS al
              |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY ts
              |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
              |SELECT ts, event_type, v,
              |  ${r6("CASE WHEN al > 0 THEN 100.0 - 100.0 / (1.0 + ag / al) ELSE 100.0 END")}
              |    AS rsi
              |FROM f WHERE cnt = 14 ORDER BY ts, event_type""".stripMargin)),

    // MACD(12, 26, 9): three coupled EMA recursions folded in one linear
    // pass per series; the oracle's recursive CTE carries (e_f, e_s, sig)
    // and replays the identical fixed-order IEEE arithmetic, so values
    // match bit-for-bit before the output rounding (the q214/q286
    // recursive-oracle discipline). Seeds: e = x_1, so macd_1 = 0 exactly
    // and the signal line seeds at 0.
    "q314_macd" -> Q(
      (s, d) => FinanceOps.macd(
          series(s, d), "event_type", "ts", "v",
          fast = 12, slow = 26, signalSpan = 9, scoreOut = dec6)
        .select(col("ts"), col("event_type"), col("macd"), col("signal"),
          col("histogram"))
        .orderBy("ts", "event_type"),
      Some(s"""WITH RECURSIVE $sqlSeries,
              |g AS (SELECT ts, event_type, CAST(v AS DOUBLE) AS v,
              |  CAST(row_number() OVER (PARTITION BY event_type ORDER BY ts)
              |    AS INT) AS r
              |  FROM series WHERE v IS NOT NULL),
              |rec(event_type, r, ts, ef, es, sig) AS (
              |  SELECT event_type, r, ts, v, v, CAST(0.0 AS DOUBLE)
              |  FROM g WHERE r = 1
              |  UNION ALL
              |  SELECT g.event_type, g.r, g.ts,
              |    (1.0 - 2.0/13.0) * rec.ef + (2.0/13.0) * g.v,
              |    (1.0 - 2.0/27.0) * rec.es + (2.0/27.0) * g.v,
              |    (1.0 - 2.0/10.0) * rec.sig + (2.0/10.0)
              |      * (((1.0 - 2.0/13.0) * rec.ef + (2.0/13.0) * g.v)
              |       - ((1.0 - 2.0/27.0) * rec.es + (2.0/27.0) * g.v))
              |  FROM rec JOIN g ON g.event_type = rec.event_type
              |    AND g.r = rec.r + 1)
              |SELECT ts, event_type, ${r6("ef - es")} AS macd,
              |  ${r6("sig")} AS signal,
              |  ${r6("(ef - es) - sig")} AS histogram
              |FROM rec ORDER BY ts, event_type""".stripMargin)),

    // GARCH(1,1) volatility filter (Bollerslev '86; fixed RiskMetrics-
    // style parameters ω=5, α=0.05, β=0.9) on first-difference
    // innovations of the hourly grid: conditional σ_t and standardized
    // z_t — the volatility-regime lens beside q214's EWMA level and
    // q36's fixed-window z-score. One mapPartitions fold per series
    // (the MACD justified-recursion precedent); the oracle replays the
    // identical recursion as a recursive CTE (+,*,/ only → bit-equal).
    "q341_garch_vol" -> Q(
      (s, d) => FinanceOps.garchFilter(
          series(s, d), "event_type", "ts", "v",
          omega = 5.0, alphaP = 0.05, betaP = 0.9, scoreOut = dec6)
        .select(col("ts"), col("event_type"), col("ret"), col("sigma"),
          col("z"))
        .orderBy("ts", "event_type"),
      Some(s"""WITH RECURSIVE $sqlSeries,
              |g AS (SELECT ts, event_type, CAST(v AS DOUBLE) AS v,
              |  CAST(row_number() OVER (PARTITION BY event_type ORDER BY ts)
              |    AS INT) AS r
              |  FROM series WHERE v IS NOT NULL),
              |d AS (SELECT b.event_type, b.ts, b.r - 1 AS i,
              |  b.v - a.v AS ret
              |  FROM g a JOIN g b ON b.event_type = a.event_type
              |    AND b.r = a.r + 1),
              |rec(event_type, i, ts, ret, h) AS (
              |  SELECT event_type, i, ts, ret,
              |    5.0 / (CAST(1.0 AS DOUBLE) - 0.05 - 0.9)
              |  FROM d WHERE i = 1
              |  UNION ALL
              |  SELECT d.event_type, d.i, d.ts, d.ret,
              |    5.0 + 0.05 * rec.ret * rec.ret + 0.9 * rec.h
              |  FROM rec JOIN d ON d.event_type = rec.event_type
              |    AND d.i = rec.i + 1)
              |SELECT ts, event_type, ${r6("ret")} AS ret,
              |  ${r6("sqrt(h)")} AS sigma, ${r6("ret / sqrt(h)")} AS z
              |FROM rec ORDER BY ts, event_type""".stripMargin)),

    // GARCH(1,1) variance-targeting FIT (q341's follow-on): per-series
    // fitted (ω, α, β) by closed-form method of moments — σ̂² targets the
    // sample variance, persistence φ̂ = ρ₂/ρ₁ from the ACF of squared
    // innovations (geometric decay from lag 1, Bollerslev '86 §4), α̂
    // the positive root of the exact lag-1 ACF relation, β̂ = φ̂ − α̂ —
    // then the same bit-replayable filter recursion under the fitted
    // params. Every derived moment/param is dec6-rounded in sequence
    // (the rounded-state contract), so the oracle's aggregate + CASE
    // chain + recursive CTE replays the identical trajectory; degenerate
    // moments fall back to the constant-variance filter, never an
    // explosive regime.
    "q346_garch_fit" -> Q(
      (s, d) => FinanceOps.garchFitVt(
          series(s, d), "event_type", "ts", "v", scoreOut = dec6)
        .select(col("ts"), col("event_type"), col("ret"), col("sigma"),
          col("z"), col("alpha"), col("beta"), col("omega"))
        .orderBy("ts", "event_type"),
      Some(s"""WITH RECURSIVE $sqlSeries,
              |g AS (SELECT ts, event_type, CAST(v AS DOUBLE) AS v,
              |  CAST(row_number() OVER (PARTITION BY event_type ORDER BY ts)
              |    AS INT) AS r
              |  FROM series WHERE v IS NOT NULL),
              |d AS (SELECT b.event_type, b.ts, b.r - 1 AS i,
              |  b.v - a.v AS ret
              |  FROM g a JOIN g b ON b.event_type = a.event_type
              |    AND b.r = a.r + 1),
              |aa AS (SELECT event_type, ts, i, ret, ret * ret AS a FROM d),
              |la AS (SELECT event_type, i, ret, a,
              |  lag(a, 1) OVER w AS al1, lag(a, 2) OVER w AS al2
              |  FROM aa WINDOW w AS (PARTITION BY event_type ORDER BY i)),
              |mo AS (SELECT event_type,
              |  avg(ret) AS mr, avg(a) AS ma, avg(a * a) AS maa,
              |  sum(CASE WHEN al1 IS NOT NULL THEN a * al1 END) AS s1x,
              |  sum(CASE WHEN al1 IS NOT NULL THEN a END) AS s1a,
              |  sum(al1) AS s1l, CAST(count(al1) AS DOUBLE) AS n1,
              |  sum(CASE WHEN al2 IS NOT NULL THEN a * al2 END) AS s2x,
              |  sum(CASE WHEN al2 IS NOT NULL THEN a END) AS s2a,
              |  sum(al2) AS s2l, CAST(count(al2) AS DOUBLE) AS n2
              |  FROM la GROUP BY 1),
              |p0 AS (SELECT event_type,
              |  ${r6("ma - mr * mr")} AS s2,
              |  ${r6("""CASE WHEN maa - ma * ma > 0 AND n1 > 0
              |    THEN (s1x - ma * s1a - ma * s1l + n1 * ma * ma) / n1
              |      / (maa - ma * ma) ELSE 0.0 END""")} AS rho1,
              |  ${r6("""CASE WHEN maa - ma * ma > 0 AND n2 > 0
              |    THEN (s2x - ma * s2a - ma * s2l + n2 * ma * ma) / n2
              |      / (maa - ma * ma) ELSE 0.0 END""")} AS rho2
              |  FROM mo),
              |p1 AS (SELECT *, ${r6("""CASE WHEN rho1 > 0 AND rho2 > 0
              |  THEN least(0.98, greatest(0.0, rho2 / rho1))
              |  ELSE 0.0 END""")} AS phi FROM p0),
              |p2 AS (SELECT event_type, s2, rho1, phi,
              |  ${r6("""least(phi, greatest(0.0, CASE
              |    WHEN phi <= 0 OR rho1 <= 0 THEN 0.0
              |    WHEN abs(phi - rho1) < 1e-9 THEN rho1
              |    WHEN (1.0 - phi * phi) * (1.0 - phi * phi)
              |      + 4.0 * (phi - rho1) * rho1 * (1.0 - phi * phi) < 0
              |      THEN rho1
              |    ELSE (-(1.0 - phi * phi) + sqrt(
              |      (1.0 - phi * phi) * (1.0 - phi * phi)
              |      + 4.0 * (phi - rho1) * rho1 * (1.0 - phi * phi)))
              |      / (2.0 * (phi - rho1)) END))""")} AS alpha
              |  FROM p1),
              |p3 AS (SELECT *, ${r6("phi - alpha")} AS beta FROM p2),
              |pp AS (SELECT event_type, s2, alpha, beta,
              |  ${r6("s2 * (1.0 - alpha - beta)")} AS omega FROM p3),
              |rec(event_type, i, ts, ret, h) AS (
              |  SELECT d.event_type, d.i, d.ts, d.ret,
              |    pp.omega / (CAST(1.0 AS DOUBLE) - pp.alpha - pp.beta)
              |  FROM d JOIN pp USING (event_type) WHERE d.i = 1
              |  UNION ALL
              |  SELECT d.event_type, d.i, d.ts, d.ret,
              |    pp.omega + pp.alpha * rec.ret * rec.ret + pp.beta * rec.h
              |  FROM rec JOIN d ON d.event_type = rec.event_type
              |    AND d.i = rec.i + 1
              |  JOIN pp ON pp.event_type = rec.event_type)
              |SELECT rec.ts, rec.event_type, ${r6("ret")} AS ret,
              |  ${r6("CASE WHEN h > 0 THEN sqrt(h) ELSE 0.0 END")} AS sigma,
              |  CASE WHEN h > 0 THEN ${r6("ret / sqrt(h)")} END AS z,
              |  pp.alpha, pp.beta, pp.omega
              |FROM rec JOIN pp USING (event_type)
              |ORDER BY rec.ts, rec.event_type""".stripMargin))
  )
}
