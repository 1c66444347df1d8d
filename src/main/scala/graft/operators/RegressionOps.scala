package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regression-flavored diagnostics built on SUFFICIENT STATISTICS: every
  * estimator here reduces the data to a handful of per-group moments in
  * ONE hash aggregate, then finishes with closed-form scalar arithmetic
  * inside the plan (no driver solve, no collect, no UDF) — the only
  * pattern that survives 100 TB, because the shuffle carries O(groups·p²)
  * numbers regardless of row count. Extends the q187 single-regressor OLS
  * to two regressors (Cramer 2×2 on the CENTERED system), the unit-root
  * and long-memory diagnostics (ADF, Hurst R/S), and the Durbin–Levinson
  * PACF with per-level rounding so a SQL oracle replays it bit-for-bit.
  */
object RegressionOps {

  /** Hourly mean collapse shared by the series diagnostics (the
    * q304/q305 machinery): (series, idx = epoch-hour, y). */
  private def hourlyIdx(events: DataFrame, seriesCol: String, tsCol: String,
                        valueCol: String): DataFrame =
    events
      .select(col(seriesCol).as("series"),
        floor(unix_timestamp(date_trunc("hour", col(tsCol))) / 3600L).as("idx"),
        col(valueCol).cast("double").as("v"))
      .groupBy("series", "idx").agg(avg("v").as("y"))

  /** Ridge regression with TWO regressors via centered normal equations:
    * y − ȳ = β₁(x₁ − x̄₁) + β₂(x₂ − x̄₂), β = (G + λI)⁻¹ g with the 2×2
    * Gram solved by Cramer inside the plan. The intercept is recovered
    * unpenalized as ȳ − β₁x̄₁ − β₂x̄₂ (the standard don't-penalize-the-
    * intercept convention, which centering implements for free).
    *
    * Two aggregates total: means (ROUNDED, so the centered rows are
    * identical doubles in any replaying engine), then the five Gram sums
    * + syy in one pass. β and R² are pure arithmetic on those sums; β is
    * rounded before R² so the fit diagnostics replay exactly. λ = 0
    * gives plain OLS. Centering is not optional at scale: raw-moment
    * normal equations cancel catastrophically when regressors carry a
    * large offset (the q187/q305 epoch lesson).
    *
    * Returns one row per group: (group, n, b0, b1, b2, r2). */
  def ridge2(df: DataFrame, groupCol: String, yCol: String,
             x1Col: String, x2Col: String, lambda: Double,
             scoreOut: Column => Column): DataFrame = {
    require(lambda >= 0, s"ridge penalty must be >= 0, got $lambda")
    val base = df.select(col(groupCol).as("g"),
        col(yCol).cast("double").as("y"),
        col(x1Col).cast("double").as("x1"),
        col(x2Col).cast("double").as("x2"))
      .filter(col("y").isNotNull && col("x1").isNotNull && col("x2").isNotNull)
      .persist()
    val means = base.groupBy("g").agg(
      scoreOut(avg("y")).as("__my"),
      scoreOut(avg("x1")).as("__m1"),
      scoreOut(avg("x2")).as("__m2"))
    val cent = base.join(means, "g")
      .select(col("g"), col("__my"), col("__m1"), col("__m2"),
        (col("y") - col("__my")).as("cy"),
        (col("x1") - col("__m1")).as("c1"),
        (col("x2") - col("__m2")).as("c2"))
    val sums = cent.groupBy("g").agg(
      count(lit(1)).cast("long").as("n"),
      first("__my").as("__my"), first("__m1").as("__m1"),
      first("__m2").as("__m2"),
      sum(col("c1") * col("c1")).as("s11"),
      sum(col("c1") * col("c2")).as("s12"),
      sum(col("c2") * col("c2")).as("s22"),
      sum(col("c1") * col("cy")).as("s1y"),
      sum(col("c2") * col("cy")).as("s2y"),
      sum(col("cy") * col("cy")).as("syy"))
    val l = lit(lambda)
    val det = (col("s11") + l) * (col("s22") + l) - col("s12") * col("s12")
    val b1 = scoreOut(((col("s22") + l) * col("s1y") - col("s12") * col("s2y")) / det)
    val b2 = scoreOut(((col("s11") + l) * col("s2y") - col("s12") * col("s1y")) / det)
    val fit = sums
      .withColumn("b1", b1).withColumn("b2", b2)
      .withColumn("b0", scoreOut(col("__my") -
        col("b1") * col("__m1") - col("b2") * col("__m2")))
    val rss = col("syy") -
      lit(2.0) * (col("b1") * col("s1y") + col("b2") * col("s2y")) +
      col("b1") * col("b1") * col("s11") +
      lit(2.0) * col("b1") * col("b2") * col("s12") +
      col("b2") * col("b2") * col("s22")
    fit.select(col("g").as(groupCol), col("n"), col("b0"), col("b1"),
      col("b2"), scoreOut(lit(1.0) - rss / col("syy")).as("r2"))
  }

  /** Augmented Dickey–Fuller unit-root test (one augmentation lag,
    * constant included) per series on the hourly collapse:
    * Δy_t = c + φ·y_{t−1} + ψ·Δy_{t−1} + ε, reject a unit root when
    * t(φ) < −2.86 (the 5% constant-only asymptotic point). The
    * stationarity gate a forecasting pipeline runs BEFORE trusting q187's
    * trend or q280's AR fit — both assume it.
    *
    * Consecutive (t−2, t−1, t) triples come from two idx equi-joins on
    * the grid-sized hourly table (a gap hour drops the triple, the q304
    * discipline). Regressors and response are centered by their ROUNDED
    * means, which removes the intercept from the solve: φ, ψ fall out of
    * the same Cramer 2×2 as [[ridge2]], and t(φ) = φ/√(σ̂²·s22/det) with
    * σ̂² = RSS/(n−3). One moment aggregate carries the whole test.
    *
    * Returns (series, n_obs, phi, psi, t_adf, unit_root_rejected). */
  def adfTest(events: DataFrame, seriesCol: String, tsCol: String,
              valueCol: String, scoreOut: Column => Column): DataFrame = {
    val h = hourlyIdx(events, seriesCol, tsCol, valueCol).persist()
    val rows = h.as("t0")
      .join(h.select(col("series"), (col("idx") + 1).as("idx"),
        col("y").as("y1")), Seq("series", "idx"))
      .join(h.select(col("series"), (col("idx") + 2).as("idx"),
        col("y").as("y2")), Seq("series", "idx"))
      .select(col("series"),
        (col("y") - col("y1")).as("dy"),     // Δy_t
        col("y1").as("x1"),                  // y_{t−1}
        (col("y1") - col("y2")).as("x2"))    // Δy_{t−1}
    val means = rows.groupBy("series").agg(
      scoreOut(avg("dy")).as("__mdy"),
      scoreOut(avg("x1")).as("__mx1"),
      scoreOut(avg("x2")).as("__mx2"))
    val cent = rows.join(means, "series")
      .select(col("series"),
        (col("dy") - col("__mdy")).as("cy"),
        (col("x1") - col("__mx1")).as("c1"),
        (col("x2") - col("__mx2")).as("c2"))
    val sums = cent.groupBy("series").agg(
      count(lit(1)).cast("long").as("n_obs"),
      sum(col("c1") * col("c1")).as("s11"),
      sum(col("c1") * col("c2")).as("s12"),
      sum(col("c2") * col("c2")).as("s22"),
      sum(col("c1") * col("cy")).as("s1y"),
      sum(col("c2") * col("cy")).as("s2y"),
      sum(col("cy") * col("cy")).as("syy"))
    val det = col("s11") * col("s22") - col("s12") * col("s12")
    val phi = scoreOut((col("s22") * col("s1y") - col("s12") * col("s2y")) / det)
    val psi = scoreOut((col("s11") * col("s2y") - col("s12") * col("s1y")) / det)
    val withB = sums.withColumn("phi", phi).withColumn("psi", psi)
    val rss = col("syy") -
      lit(2.0) * (col("phi") * col("s1y") + col("psi") * col("s2y")) +
      col("phi") * col("phi") * col("s11") +
      lit(2.0) * col("phi") * col("psi") * col("s12") +
      col("psi") * col("psi") * col("s22")
    val sigma2 = rss / (col("n_obs").cast("double") - lit(3.0))
    val tAdf = scoreOut(col("phi") / sqrt(sigma2 * col("s22") / det))
    withB.filter(col("n_obs") > 3 && det =!= 0.0)
      .select(col("series"), col("n_obs"), col("phi"), col("psi"),
        tAdf.as("t_adf"),
        (tAdf < -2.86).cast("int").as("unit_root_rejected"))
  }

  /** Hurst exponent by rescaled-range (R/S) analysis over power-of-two
    * block sizes: for each m, split the per-series hourly sequence into
    * complete m-blocks; per block R = range of the cumulative
    * mean-deviation and S = population σ; H is the slope of mean
    * log₂(R/S) against log₂(m) (= the exact integer k for m = 2^k).
    * H ≈ 0.5 random walk, > 0.5 persistent/trending, < 0.5 mean-
    * reverting — the long-memory complement of q174's short-lag ACF.
    *
    * The sequence position is the per-series ROW RANK of the hourly
    * grid, so gaps compress rather than stretch blocks. Block means and
    * moments are ROUNDED before the deviations so replaying engines
    * agree; the log-log fit runs over ≤ |blockSizes| rounded points.
    * Scale: block keys are (series, m, blk) — every window is
    * block-local; the blow-up is |blockSizes|× the grid, never the raw
    * stream. Returns (series, n_points, hurst, intercept_log2). */
  def hurstRS(events: DataFrame, seriesCol: String, tsCol: String,
              valueCol: String, blockSizes: Seq[Int],
              scoreOut: Column => Column): DataFrame = {
    require(blockSizes.nonEmpty && blockSizes.forall(m =>
      m >= 4 && (m & (m - 1)) == 0), s"power-of-two blocks >= 4: $blockSizes")
    val spark = events.sparkSession
    import spark.implicits._
    val ms = blockSizes.map(m =>
      (m, (31 - Integer.numberOfLeadingZeros(m)).toDouble))
      .toDF("m", "log2m")
    val h = hourlyIdx(events, seriesCol, tsCol, valueCol)
      .withColumn("r", row_number().over(
        Window.partitionBy("series").orderBy("idx")))
    val blocks = h.crossJoin(broadcast(ms))
      .withColumn("blk", ((col("r") - 1) / col("m")).cast("long"))
    val wb = Window.partitionBy("series", "m", "blk")
    val stats = blocks
      .withColumn("__cnt", count(lit(1)).over(wb))
      .filter(col("__cnt") === col("m"))
      .withColumn("__bm", scoreOut(avg("y").over(wb)))
      .withColumn("__m2", scoreOut(avg(col("y") * col("y")).over(wb)))
      .withColumn("__cum", sum(col("y") - col("__bm")).over(
        wb.orderBy("r").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perBlock = stats.groupBy("series", "m", "log2m", "blk")
      .agg((max("__cum") - min("__cum")).as("__R"),
        // the ROUNDED moments can land m2 − bm² a hair NEGATIVE on a
        // near-constant block; clamp before the root (Spark would yield
        // NaN and drop it at S > 0, but DuckDB hard-errors on sqrt of a
        // negative — the oracle mirrors this clamp)
        first(sqrt(greatest(lit(0.0),
          col("__m2") - col("__bm") * col("__bm")))).as("__S"))
      .filter(col("__S") > 0 && col("__R") > 0)
      .select(col("series"), col("m"), col("log2m"),
        (log(col("__R") / col("__S")) / log(lit(2.0))).as("__lrs"))
    val perM = perBlock.groupBy("series", "m", "log2m")
      .agg(scoreOut(avg("__lrs")).as("mlrs"))
    perM.groupBy("series").agg(
        count(lit(1)).cast("long").as("n_points"),
        avg("log2m").as("__mx"), avg("mlrs").as("__my"),
        avg(col("log2m") * col("mlrs")).as("__mxy"),
        avg(col("log2m") * col("log2m")).as("__mxx"))
      .filter(col("n_points") >= 2)
      .select(col("series"), col("n_points"),
        scoreOut((col("__mxy") - col("__mx") * col("__my")) /
          (col("__mxx") - col("__mx") * col("__mx"))).as("hurst"),
        scoreOut(col("__my") - (col("__mxy") - col("__mx") * col("__my")) /
          (col("__mxx") - col("__mx") * col("__mx")) * col("__mx"))
          .as("intercept_log2"))
  }

  /** Partial autocorrelation function by Durbin–Levinson, lags 1..maxLag,
    * per series — the AR-order-selection diagnostic (PACF cuts off at the
    * true order; ACF merely decays). The lag covariances are the q304
    * gap-robust idx equi-joins; the recursion then runs INSIDE the plan
    * as unrolled column arithmetic (O(maxLag²) scalar expressions on the
    * groups-sized aggregate — no collect, no UDF), with every φ_{k,·}
    * ROUNDED per level, so a SQL oracle unrolling the same recursion on
    * the same rounded ρ replays it bit-for-bit (left-fold sum order).
    *
    * Returns (series, n_hours, pacf_1 .. pacf_maxLag). */
  def pacfDL(events: DataFrame, seriesCol: String, tsCol: String,
             valueCol: String, maxLag: Int,
             scoreOut: Column => Column): DataFrame = {
    require(maxLag >= 1 && maxLag <= 12, s"1 <= maxLag <= 12, got $maxLag")
    val hourly = hourlyIdx(events, seriesCol, tsCol, valueCol).persist()
    val means = hourly.groupBy("series").agg(avg("y").as("__m"))
    val c = hourly.join(means, "series")
      .select(col("series"), col("idx"), (col("y") - col("__m")).as("c"))
      .persist()
    val c0 = c.groupBy("series")
      .agg(count(lit(1)).cast("long").as("n_hours"),
        sum(col("c") * col("c")).as("__ss"))
    def ck(k: Int) = c
      .join(c.select(col("series"), (col("idx") + k).as("idx"),
        col("c").as("cl")), Seq("series", "idx"))
      .groupBy("series").agg(sum(col("c") * col("cl")).as(s"__ck$k"))
    val withC = (1 to maxLag).foldLeft(c0)((acc, k) => acc.join(ck(k), "series"))
    val withRho = (1 to maxLag).foldLeft(withC)((acc, k) =>
      acc.withColumn(s"rho$k", scoreOut(col(s"__ck$k") / col("__ss"))))
    // Durbin–Levinson, every phi rounded per level (phi_k_j column names)
    var acc = withRho.withColumn("phi_1_1", col("rho1"))
    for (k <- 2 to maxLag) {
      val num = (1 until k).map(j =>
        col(s"phi_${k - 1}_$j") * col(s"rho${k - j}")).reduce(_ + _)
      val den = (1 until k).map(j =>
        col(s"phi_${k - 1}_$j") * col(s"rho$j")).reduce(_ + _)
      acc = acc.withColumn(s"phi_${k}_$k",
        scoreOut((col(s"rho$k") - num) / (lit(1.0) - den)))
      for (j <- 1 until k)
        acc = acc.withColumn(s"phi_${k}_$j",
          scoreOut(col(s"phi_${k - 1}_$j") -
            col(s"phi_${k}_$k") * col(s"phi_${k - 1}_${k - j}")))
    }
    acc.select(col("series") +: col("n_hours") +:
      (1 to maxLag).map(k => col(s"phi_${k}_$k").as(s"pacf_$k")): _*)
  }

  /** Huber robust regression (two features + intercept) by `iters` IRLS
    * steps — the outlier-resistant sibling of [[ridge2]]: rows whose
    * absolute residual exceeds `delta` get weight δ/|r| instead of 1
    * (Huber '64), so a fat-fingered price cannot drag the fit the way it
    * drags OLS. Each step is ONE weighted-moments aggregate: weighted
    * means (ROUNDED — they center the step's normal equations), the five
    * weighted Gram sums, a Cramer 2×2, and the intercept recovered from
    * the weighted means. β is ROUNDED per step (the logisticNewton
    * replay contract). Step 1 runs with all weights 1 — plain OLS — so
    * the recursion needs no separate seed.
    *
    * Returns (group, n, n_downweighted, b0, b1, b2). */
  def huber2(df: DataFrame, groupCol: String, yCol: String,
             x1Col: String, x2Col: String, delta: Double, iters: Int,
             scoreOut: Column => Column): DataFrame = {
    require(delta > 0 && iters >= 1 && iters <= 16,
      s"delta > 0, 1 <= iters <= 16: got $delta, $iters")
    val base = df.select(col(groupCol).as("g"),
        col(yCol).cast("double").as("y"),
        col(x1Col).cast("double").as("x1"),
        col(x2Col).cast("double").as("x2"))
      .filter(col("y").isNotNull && col("x1").isNotNull && col("x2").isNotNull)
      .persist()
    var beta: Option[DataFrame] = None
    var joined: DataFrame = null
    for (_ <- 1 to iters) {
      joined = beta match {
        case None => base.withColumn("w", lit(1.0))
        case Some(b) => base.join(b, "g")
          .withColumn("__r",
            col("y") - (col("b0") + col("b1") * col("x1") +
              col("b2") * col("x2")))
          .withColumn("w", when(abs(col("__r")) <= delta, lit(1.0))
            .otherwise(lit(delta) / abs(col("__r"))))
      }
      val sums = joined.groupBy("g").agg(
        sum("w").as("sw"),
        sum(col("w") * col("y")).as("swy"),
        sum(col("w") * col("x1")).as("sw1"),
        sum(col("w") * col("x2")).as("sw2"),
        sum(col("w") * col("x1") * col("x1")).as("s11r"),
        sum(col("w") * col("x1") * col("x2")).as("s12r"),
        sum(col("w") * col("x2") * col("x2")).as("s22r"),
        sum(col("w") * col("x1") * col("y")).as("s1yr"),
        sum(col("w") * col("x2") * col("y")).as("s2yr"))
      val my = scoreOut(col("swy") / col("sw"))
      val m1 = scoreOut(col("sw1") / col("sw"))
      val m2 = scoreOut(col("sw2") / col("sw"))
      val withM = sums.withColumn("my", my).withColumn("m1", m1)
        .withColumn("m2", m2)
      // centered weighted Gram from the raw sums (König-Huygens), written
      // exactly as Σw·ab − ma·Σw·b − mb·Σw·a + ma·mb·Σw so the oracle can
      // mirror the operation order
      def cen(sab: Column, sa: Column, sb: Column, ma: Column, mb: Column) =
        sab - ma * sb - mb * sa + ma * mb * col("sw")
      val s11 = cen(col("s11r"), col("sw1"), col("sw1"), col("m1"), col("m1"))
      val s12 = cen(col("s12r"), col("sw1"), col("sw2"), col("m1"), col("m2"))
      val s22 = cen(col("s22r"), col("sw2"), col("sw2"), col("m2"), col("m2"))
      val s1y = cen(col("s1yr"), col("sw1"), col("swy"), col("m1"), col("my"))
      val s2y = cen(col("s2yr"), col("sw2"), col("swy"), col("m2"), col("my"))
      val solved = withM
        .withColumn("s11", s11).withColumn("s12", s12).withColumn("s22", s22)
        .withColumn("s1y", s1y).withColumn("s2y", s2y)
      // b0 from the same weighted means and the ROUNDED b1/b2
      beta = Some(solved.select(col("g"), col("my"), col("m1"), col("m2"),
          col("s11"), col("s12"), col("s22"), col("s1y"), col("s2y"))
        .withColumn("b1", scoreOut(
          (col("s22") * col("s1y") - col("s12") * col("s2y")) /
            (col("s11") * col("s22") - col("s12") * col("s12"))))
        .withColumn("b2", scoreOut(
          (col("s11") * col("s2y") - col("s12") * col("s1y")) /
            (col("s11") * col("s22") - col("s12") * col("s12"))))
        .withColumn("b0", scoreOut(col("my") -
          col("b1") * col("m1") - col("b2") * col("m2")))
        .select("g", "b0", "b1", "b2"))
    }
    val fin = base.join(beta.get, "g")
      .withColumn("__r",
        col("y") - (col("b0") + col("b1") * col("x1") +
          col("b2") * col("x2")))
    fin.groupBy("g").agg(
        count(lit(1)).cast("long").as("n"),
        sum((abs(col("__r")) > delta).cast("long")).as("n_downweighted"),
        first("b0").as("b0"), first("b1").as("b1"), first("b2").as("b2"))
      .select(col("g").as(groupCol), col("n"), col("n_downweighted"),
        col("b0"), col("b1"), col("b2"))
  }

  /** Logistic regression (two features + intercept) by `iters` Newton
    * steps, each step ONE aggregate: per group, the gradient g = Xᵀ(y−p)
    * and Hessian H = XᵀWX reduce to nine weighted sums; the 3×3 solve is
    * Cramer inside the plan; β is ROUNDED per step so a replaying engine
    * (the SQL oracle unrolling the same K steps) stays bit-identical —
    * step-level rounding is what stops ulp drift compounding across
    * iterations. β starts at 0 (p = ½ everywhere — the standard Newton
    * seed; the first step is then weighted least squares). The logit is
    * clamped to ±30 before exp on BOTH paths (past that p is 1 within
    * double precision and W underflows to exactly 0 anyway).
    *
    * Scale contract: the data is scanned `iters`+1 times (K aggregates
    * + one final diagnostics pass), each a map-side-combined hash
    * aggregate carrying 10 doubles per group; β lives in a groups-sized
    * frame that AQE broadcasts into each join. No collect, no UDF, no
    * driver solve.
    *
    * Returns (group, n, n_pos, b0, b1, b2, log_lik, accuracy). */
  def logisticNewton(df: DataFrame, groupCol: String, labelCol: Column,
                     x1Col: String, x2Col: String, iters: Int,
                     scoreOut: Column => Column): DataFrame = {
    require(iters >= 1 && iters <= 16, s"1 <= iters <= 16, got $iters")
    // EAGER materialization (localCheckpoint, not lazy persist): the
    // solver reads this frame iters+2 times — once per Newton moment
    // aggregate plus the init and final passes — and profiling q338
    // showed every consumer re-running the upstream featurize aggregate
    // (24.7 MB re-read ×6 at sf0.1) under the lazy persist. Checkpoint
    // also truncates the per-step plan: beta_i no longer nests the whole
    // featurize pipeline of every earlier step.
    val base = df.select(col(groupCol).as("g"),
        labelCol.cast("double").as("y"),
        col(x1Col).cast("double").as("x1"),
        col(x2Col).cast("double").as("x2"))
      .filter(col("y").isNotNull && col("x1").isNotNull && col("x2").isNotNull)
      .localCheckpoint()
    var beta = base.groupBy("g").agg(
      lit(0.0).as("b0"), lit(0.0).as("b1"), lit(0.0).as("b2"))
    def zOf = {
      val raw = col("b0") + col("b1") * col("x1") + col("b2") * col("x2")
      least(lit(30.0), greatest(lit(-30.0), raw))
    }
    for (_ <- 1 to iters) {
      val p = lit(1.0) / (lit(1.0) + exp(-zOf))
      // beta is a group-count-sized coefficient frame (one row per g) —
      // post-aggregate its stats are unknown and the join would plan as
      // a SortMergeJoin; broadcast is the honest shape at any scale
      val joined = base.join(broadcast(beta), "g")
        .withColumn("__p", p)
        .withColumn("__w", col("__p") * (lit(1.0) - col("__p")))
        .withColumn("__r", col("y") - col("__p"))
      val s = joined.groupBy("g").agg(
        first("b0").as("pb0"), first("b1").as("pb1"), first("b2").as("pb2"),
        sum(col("__r")).as("g0"),
        sum(col("__r") * col("x1")).as("g1"),
        sum(col("__r") * col("x2")).as("g2"),
        sum(col("__w")).as("h00"),
        sum(col("__w") * col("x1")).as("h01"),
        sum(col("__w") * col("x2")).as("h02"),
        sum(col("__w") * col("x1") * col("x1")).as("h11"),
        sum(col("__w") * col("x1") * col("x2")).as("h12"),
        sum(col("__w") * col("x2") * col("x2")).as("h22"))
      // Cramer on the symmetric 3×3 — cofactor expansion along row 0,
      // identical term order in the SQL oracle
      val det = col("h00") * (col("h11") * col("h22") - col("h12") * col("h12")) -
        col("h01") * (col("h01") * col("h22") - col("h12") * col("h02")) +
        col("h02") * (col("h01") * col("h12") - col("h11") * col("h02"))
      val d0 = col("g0") * (col("h11") * col("h22") - col("h12") * col("h12")) -
        col("h01") * (col("g1") * col("h22") - col("h12") * col("g2")) +
        col("h02") * (col("g1") * col("h12") - col("h11") * col("g2"))
      val d1 = col("h00") * (col("g1") * col("h22") - col("g2") * col("h12")) -
        col("g0") * (col("h01") * col("h22") - col("h12") * col("h02")) +
        col("h02") * (col("h01") * col("g2") - col("g1") * col("h02"))
      val d2 = col("h00") * (col("h11") * col("g2") - col("h12") * col("g1")) -
        col("h01") * (col("h01") * col("g2") - col("g1") * col("h02")) +
        col("g0") * (col("h01") * col("h12") - col("h11") * col("h02"))
      beta = s.select(col("g"),
        scoreOut(col("pb0") + d0 / det).as("b0"),
        scoreOut(col("pb1") + d1 / det).as("b1"),
        scoreOut(col("pb2") + d2 / det).as("b2"))
    }
    val p = lit(1.0) / (lit(1.0) + exp(-zOf))
    base.join(broadcast(beta), "g")
      .withColumn("__p", p)
      .groupBy("g")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("y")).cast("long").as("n_pos"),
        first("b0").as("b0"), first("b1").as("b1"), first("b2").as("b2"),
        sum(col("y") * log(col("__p")) +
          (lit(1.0) - col("y")) * log(lit(1.0) - col("__p"))).as("__ll"),
        avg(((col("__p") >= 0.5) === (col("y") === 1.0)).cast("double"))
          .as("__acc"))
      .select(col("g").as(groupCol), col("n"), col("n_pos"),
        col("b0"), col("b1"), col("b2"),
        scoreOut(col("__ll")).as("log_lik"),
        scoreOut(col("__acc")).as("accuracy"))
  }
}
