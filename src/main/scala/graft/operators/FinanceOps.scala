package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Price-style series diagnostics: running-peak drawdown, Cutler's RSI,
  * and MACD. The reference's feature stages stop at z-scores and drift
  * (`feature_engineering.py`); these are the standard next indicators a
  * monitoring pipeline layers on the same forward-filled grid, expressed
  * the same way as [[WindowOps]] — per-series `partitionBy` windows (the
  * long-layout scale contract: one series per partition group, never a
  * global sort) plus, for MACD's coupled recursions, the linear
  * collected-grid fold of [[SeasonalOps.ewma]].
  */
object FinanceOps {

  /** Per-series maximum drawdown from the running peak: for each row the
    * peak is `max(v)` over the unbounded-preceding frame; the drawdown is
    * `peak − v` (absolute — always defined) and `(peak − v)/peak`
    * (relative — NULL while the running peak is ≤ 0, where the ratio has
    * no meaning). The reported trough is the EARLIEST row attaining the
    * maximum ROUNDED absolute drawdown, so the argmax is deterministic
    * cross-engine (the q282 rounded-argmax discipline).
    *
    * One window pass + one series-keyed aggregate — no self-joins, no
    * global sort. Returns (series, n, peak_value, trough_value,
    * trough_ts, max_dd_abs, max_dd_rel). */
  def maxDrawdown(grid: DataFrame, seriesCol: String, tsCol: String,
                  valueCol: String, scoreOut: Column => Column): DataFrame = {
    val w = Window.partitionBy(seriesCol).orderBy(tsCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dd = grid
      .select(col(seriesCol), col(tsCol), col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .withColumn("__peak", max("__v").over(w))
      .withColumn("__dd", scoreOut(col("__peak") - col("__v")))
    val pick = Window.partitionBy(seriesCol)
      .orderBy(col("__dd").desc, col(tsCol).asc)
    dd.withColumn("__rk", row_number().over(pick))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(seriesCol)))
      .filter(col("__rk") === 1)
      .select(col(seriesCol), col("__n").as("n"),
        scoreOut(col("__peak")).as("peak_value"),
        scoreOut(col("__v")).as("trough_value"),
        col(tsCol).as("trough_ts"),
        col("__dd").as("max_dd_abs"),
        scoreOut(when(col("__peak") > 0,
          (col("__peak") - col("__v")) / col("__peak"))).as("max_dd_rel"))
  }

  /** Cutler's RSI (simple-moving-average form — the window-expressible
    * variant; Wilder's original is an α=1/n EWMA, available by feeding
    * the gain/loss columns through [[SeasonalOps.ewma]]): over the last
    * `n` one-step diffs, RSI = 100 − 100/(1 + avgGain/avgLoss), with the
    * all-gain degenerate case pinned to 100. Rows are emitted only once
    * the diff window is FULL (`min_periods = n`, the W5 contract).
    *
    * Returns (series, ts, v, rsi). */
  def rsiCutler(grid: DataFrame, seriesCol: String, tsCol: String,
                valueCol: String, n: Int,
                scoreOut: Column => Column): DataFrame = {
    require(n >= 2, s"rsi window must be >= 2, got $n")
    val ws = Window.partitionBy(seriesCol).orderBy(tsCol)
    val wf = ws.rowsBetween(-(n - 1), 0)
    grid
      .select(col(seriesCol), col(tsCol), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("__d", col("v") - lag("v", 1).over(ws))
      .withColumn("__g", greatest(col("__d"), lit(0.0)))
      .withColumn("__l", greatest(-col("__d"), lit(0.0)))
      .withColumn("__cnt", count("__d").over(wf))
      .withColumn("__ag", avg("__g").over(wf))
      .withColumn("__al", avg("__l").over(wf))
      .filter(col("__cnt") === n)
      .select(col(seriesCol), col(tsCol), col("v"),
        scoreOut(when(col("__al") > 0,
            lit(100.0) - lit(100.0) / (lit(1.0) + col("__ag") / col("__al")))
          .otherwise(lit(100.0))).as("rsi"))
  }

  /** MACD(fast, slow, signal): three COUPLED exponential recursions —
    * e_f and e_s over the values, the signal line over their difference —
    * folded in ONE linear pass over each series' collected grid (the
    * [[SeasonalOps.ewma]] scale contract: grid-bounded state per series,
    * no partition-less window, no driver collect; a per-recursion
    * `ewma()` call would collect the grid three times). α = 2/(span+1),
    * seeds: e = x₁, signal = macd₁. Each step is fixed-order IEEE
    * arithmetic, so a DuckDB recursive CTE carrying (e_f, e_s, sig)
    * replays it bit-for-bit.
    *
    * Returns (series, ts, x, macd, signal, histogram). */
  def macd(grid: DataFrame, seriesCol: String, tsCol: String,
           valueCol: String, fast: Int = 12, slow: Int = 26,
           signalSpan: Int = 9, scoreOut: Column => Column): DataFrame = {
    require(fast < slow, s"fast span must be < slow, got $fast/$slow")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, DoubleType, StructField, StructType}
    val aF = 2.0 / (fast + 1); val aS = 2.0 / (slow + 1)
    val aG = 2.0 / (signalSpan + 1)
    val collected = grid
      .select(col(seriesCol), col(tsCol).as("__t"),
        col(valueCol).cast("double").as("__x"))
      .filter(col("__x").isNotNull)
      .groupBy(seriesCol)
      .agg(sort_array(collect_list(struct(col("__t"), col("__x")))).as("arr"))
    val outSchema = StructType(collected.schema.fields ++ Seq(
      StructField("__m", ArrayType(DoubleType), nullable = true),
      StructField("__s", ArrayType(DoubleType), nullable = true)))
    val withYs = collected.mapPartitions { it =>
      it.map { r =>
        val arr = r.getSeq[Row](1)
        val xs = arr.map(_.getDouble(1))
        val m = new Array[Double](xs.length)
        val sg = new Array[Double](xs.length)
        var eF = 0.0; var eS = 0.0
        var i = 0
        while (i < xs.length) {
          val x = xs(i)
          if (i == 0) { eF = x; eS = x } else {
            eF = (1.0 - aF) * eF + aF * x
            eS = (1.0 - aS) * eS + aS * x
          }
          m(i) = eF - eS
          sg(i) = if (i == 0) m(0) else (1.0 - aG) * sg(i - 1) + aG * m(i)
          i += 1
        }
        Row(r.get(0), arr, m, sg)
      }
    }(Encoders.row(outSchema))
    withYs
      .select(col(seriesCol),
        explode(arrays_zip(col("arr"), col("__m"), col("__s"))).as("__z"))
      .select(col(seriesCol), col("__z.arr.__t").as(tsCol),
        col("__z.arr.__x").as("x"),
        scoreOut(col("__z.__m")).as("macd"),
        scoreOut(col("__z.__s")).as("signal"),
        scoreOut(col("__z.__m") - col("__z.__s")).as("histogram"))
  }

  /** GARCH(1,1) conditional-volatility FILTER (Bollerslev '86) with
    * caller-fixed parameters — the RiskMetrics-style recursion
    * h_t = ω + α·r²_{t-1} + β·h_{t-1} over first-difference innovations
    * r_t = x_t − x_{t-1}, initialized at the unconditional variance
    * ω/(1−α−β). A filter, not a fit: the parameters are inputs (an MLE
    * fit is a non-convex 3-parameter search — out of scope beside the
    * in-plan sufficient-statistics solvers), but the filtered σ_t and
    * the standardized innovation z_t = r_t/σ_t are the volatility-
    * regime / anomaly signals a risk pipeline actually consumes.
    *
    * The coupled recursion is not window-expressible (the MACD
    * precedent): per series ONE linear `mapPartitions` fold over the
    * collected grid — grid-bounded rows per task, series-partitioned,
    * no shuffle beyond the collapse. The recursion is +,*,/ only, so a
    * replaying engine (the recursive-CTE oracle) matches bit-for-bit;
    * outputs rounded via `scoreOut`.
    *
    * Returns (series, ts, ret, sigma, z) — one row per innovation
    * (grid rows 2..n); series shorter than 2 points emit nothing. */
  /** GARCH(1,1) with variance-targeting moment estimation (Engle &
    * Mezrich '96 flavor) — [[garchFilter]]'s fixed RiskMetrics knobs
    * replaced by per-series FITTED (ω, α, β), still closed-form, no MLE
    * machinery: squared innovations follow an ARMA(1,1) whose ACF decays
    * at rate α+β from lag 1 (Bollerslev '86 §4), so persistence is
    * estimated as φ̂ = ρ₂/ρ₁ (clamped to [0, 0.98]), α̂ solves the exact
    * lag-1 relation ρ₁ = α(1−αβ−β²)/(1−2αβ−β²) — a quadratic in α given
    * φ, taken at its positive root and clamped to [0, φ̂] — β̂ = φ̂ − α̂,
    * and ω̂ = σ̂²(1−φ̂) targets the sample variance. Degenerate moments
    * (ρ₁ ≤ 0, ρ₂ ≤ 0, negative discriminant) fall back to α = β = 0:
    * the filter degrades to the constant sample variance, never to an
    * explosive or negative regime.
    *
    * Scale/parity shape: moments are ONE window-lag pass + one map-side
    * combinable aggregate per series (no collect); every derived
    * quantity (σ̂², ρ₁, ρ₂, φ̂, α̂, β̂, ω̂) is dec6-ROUNDED in sequence so
    * a replaying engine walks the identical closed-form chain (aggregate
    * ulp noise absorbed by the BIAS, the q325 rounded-state contract);
    * the filter itself is the [[garchFilter]] per-series linear fold
    * with the fitted params riding the collapsed row (+,*,/ only →
    * bit-equal in a recursive-CTE replay). Output: one row per
    * innovation with (ret, sigma, z) plus the fitted (alpha, beta,
    * omega) repeated per series. */
  def garchFitVt(grid: DataFrame, seriesCol: String, tsCol: String,
                 valueCol: String, scoreOut: Column => Column): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, DoubleType, StructField, StructType}
    def d6(c: Column): Column =
      floor(c * lit(1000000.0) + lit(graft.queries.Q.BIAS)) / lit(1000000.0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(seriesCol).orderBy("__t")
    val rets = grid
      .select(col(seriesCol), col(tsCol).as("__t"),
        col(valueCol).cast("double").as("__x"))
      .filter(col("__x").isNotNull)
      .withColumn("__ret", col("__x") - lag("__x", 1).over(w))
      .filter(col("__ret").isNotNull)
      .withColumn("__a", col("__ret") * col("__ret"))
      .withColumn("__al1", lag("__a", 1).over(w))
      .withColumn("__al2", lag("__a", 2).over(w))
    val mo = rets.groupBy(seriesCol).agg(
      avg("__ret").as("mr"), avg("__a").as("ma"),
      avg(col("__a") * col("__a")).as("maa"),
      sum(when(col("__al1").isNotNull, col("__a") * col("__al1"))).as("s1x"),
      sum(when(col("__al1").isNotNull, col("__a"))).as("s1a"),
      sum("__al1").as("s1l"), count("__al1").cast("double").as("n1"),
      sum(when(col("__al2").isNotNull, col("__a") * col("__al2"))).as("s2x"),
      sum(when(col("__al2").isNotNull, col("__a"))).as("s2a"),
      sum("__al2").as("s2l"), count("__al2").cast("double").as("n2"))
    // γ0 (population) and the pair-restricted centered autocovariances —
    // the estimator DEFINITION is part of the contract; the oracle
    // mirrors these formulas textually
    val g0 = col("maa") - col("ma") * col("ma")
    def gk(sx: String, sa: String, sl: String, nk: String): Column =
      (col(sx) - col("ma") * col(sa) - col("ma") * col(sl) +
        col(nk) * col("ma") * col("ma")) / col(nk) / g0
    val p0 = mo.select(col(seriesCol),
      d6(col("ma") - col("mr") * col("mr")).as("s2"),
      d6(when(g0 > 0 && col("n1") > 0, gk("s1x", "s1a", "s1l", "n1"))
        .otherwise(lit(0.0))).as("rho1"),
      d6(when(g0 > 0 && col("n2") > 0, gk("s2x", "s2a", "s2l", "n2"))
        .otherwise(lit(0.0))).as("rho2"))
    val p1 = p0.withColumn("phi",
      d6(when(col("rho1") > 0 && col("rho2") > 0,
        least(lit(0.98), greatest(lit(0.0), col("rho2") / col("rho1"))))
        .otherwise(lit(0.0))))
    // ρ₁ = α(1−βφ)/(1+β²−2βφ) with β = φ−α reduces to
    // (φ−ρ₁)α² + (1−φ²)α − ρ₁(1−φ²) = 0 — positive root, clamped
    val qA = col("phi") - col("rho1")
    val qB = lit(1.0) - col("phi") * col("phi")
    val disc = qB * qB + lit(4.0) * qA * col("rho1") * qB
    val alphaRaw = when(col("phi") <= 0 || col("rho1") <= 0, lit(0.0))
      .when(abs(qA) < lit(1e-9), col("rho1"))
      .when(disc < 0, col("rho1"))
      .otherwise((-qB + sqrt(disc)) / (lit(2.0) * qA))
    val params = p1
      .withColumn("alpha", d6(least(col("phi"), greatest(lit(0.0), alphaRaw))))
      .withColumn("beta", d6(col("phi") - col("alpha")))
      .withColumn("omega",
        d6(col("s2") * (lit(1.0) - col("alpha") - col("beta"))))
      .select(col(seriesCol), col("s2"), col("alpha"), col("beta"),
        col("omega"))
    val collected = grid
      .select(col(seriesCol), col(tsCol).as("__t"),
        col(valueCol).cast("double").as("__x"))
      .filter(col("__x").isNotNull)
      .groupBy(seriesCol)
      .agg(sort_array(collect_list(struct(col("__t"), col("__x")))).as("arr"))
      .join(params, Seq(seriesCol))
    val outSchema = StructType(collected.schema.fields ++ Seq(
      StructField("__r", ArrayType(DoubleType), nullable = true),
      StructField("__h", ArrayType(DoubleType), nullable = true)))
    val folded = collected.mapPartitions { it =>
      it.map { r =>
        val arr = r.getSeq[Row](1)
        val alphaP = r.getDouble(3); val betaP = r.getDouble(4)
        val omega = r.getDouble(5)
        val xs = arr.map(_.getDouble(1))
        val n = math.max(xs.length - 1, 0)
        val rs = new Array[Double](n)
        val hs = new Array[Double](n)
        var j = 0
        while (j < n) {
          rs(j) = xs(j + 1) - xs(j)
          hs(j) =
            if (j == 0) omega / (1.0 - alphaP - betaP)
            else omega + alphaP * rs(j - 1) * rs(j - 1) + betaP * hs(j - 1)
          j += 1
        }
        Row(r.get(0), arr.drop(1), r.get(2), alphaP, betaP, omega, rs, hs)
      }
    }(Encoders.row(outSchema))
    folded
      .select(col(seriesCol), col("alpha"), col("beta"), col("omega"),
        explode(arrays_zip(col("arr"), col("__r"), col("__h"))).as("__z"))
      .select(col(seriesCol), col("__z.arr.__t").as(tsCol),
        scoreOut(col("__z.__r")).as("ret"),
        scoreOut(when(col("__z.__h") > 0, sqrt(col("__z.__h")))
          .otherwise(lit(0.0))).as("sigma"),
        scoreOut(when(col("__z.__h") > 0,
          col("__z.__r") / sqrt(col("__z.__h")))).as("z"),
        col("alpha"), col("beta"), col("omega"))
  }

  def garchFilter(grid: DataFrame, seriesCol: String, tsCol: String,
                  valueCol: String, omega: Double, alphaP: Double,
                  betaP: Double, scoreOut: Column => Column): DataFrame = {
    require(omega > 0, s"omega must be > 0, got $omega")
    require(alphaP >= 0 && betaP >= 0 && alphaP + betaP < 1,
      s"need alpha, beta >= 0 and alpha + beta < 1, got $alphaP/$betaP")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, DoubleType, StructField, StructType}
    val h0 = omega / (1.0 - alphaP - betaP)
    val collected = grid
      .select(col(seriesCol), col(tsCol).as("__t"),
        col(valueCol).cast("double").as("__x"))
      .filter(col("__x").isNotNull)
      .groupBy(seriesCol)
      .agg(sort_array(collect_list(struct(col("__t"), col("__x")))).as("arr"))
    val outSchema = StructType(collected.schema.fields ++ Seq(
      StructField("__r", ArrayType(DoubleType), nullable = true),
      StructField("__h", ArrayType(DoubleType), nullable = true)))
    val folded = collected.mapPartitions { it =>
      it.map { r =>
        val arr = r.getSeq[Row](1)
        val xs = arr.map(_.getDouble(1))
        val n = math.max(xs.length - 1, 0)
        val rets = new Array[Double](n)
        val hs = new Array[Double](n)
        var j = 0
        while (j < n) {
          rets(j) = xs(j + 1) - xs(j)
          hs(j) =
            if (j == 0) h0
            else omega + alphaP * rets(j - 1) * rets(j - 1) + betaP * hs(j - 1)
          j += 1
        }
        Row(r.get(0), arr.drop(1), rets, hs)
      }
    }(Encoders.row(outSchema))
    folded
      .select(col(seriesCol),
        explode(arrays_zip(col("arr"), col("__r"), col("__h"))).as("__z"))
      .select(col(seriesCol), col("__z.arr.__t").as(tsCol),
        scoreOut(col("__z.__r")).as("ret"),
        scoreOut(sqrt(col("__z.__h"))).as("sigma"),
        scoreOut(col("__z.__r") / sqrt(col("__z.__h"))).as("z"))
  }
}
