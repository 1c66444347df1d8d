package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experiment-design / causal-inference operators, split out of
  * [[StatOps]] (round-10 hygiene; no behavior change): randomized-split
  * testing (two-proportion z, bootstrap CI), variance reduction (CUPED),
  * sequential monitoring (mSPRT), multiple-testing control (BH-FDR),
  * survey sampling (Neyman allocation, Horvitz-Thompson), and causal
  * estimation (difference-in-differences). [[StatOps]] keeps the
  * descriptive/test-statistic side (KS, Mann-Whitney, ANOVA, robust
  * statistics, distribution fits); shared numeric kernels like
  * `StatOps.normalUpperTail` stay there and are referenced. */
object ExperimentOps {

  /** Two-proportion z-test between hash-split experiment arms: conversion
    * = fraction of users with any event satisfying `successCond`, arms
    * assigned by the
    * deterministic md5 bucket of the user id (the [[graft.operators.
    * CorpusOps.assignSplit]] trick — reproducible assignment IS the
    * experiment's validity), z = (p̂_a − p̂_b)/√(p̂(1−p̂)(1/n_a + 1/n_b)).
    * The statistic is pure arithmetic over two aggregate rows; |z| > 1.96
    * flags 95% significance without needing an erf implementation.
    *
    * Returns one row: (n_a, n_b, conv_a, conv_b, p_a, p_b, z,
    * significant_95). */
  def abTest(events: DataFrame, userCol: String, successCond: Column,
             scoreOut: Column => Column): DataFrame = {
    val perUser = events.groupBy(col(userCol))
      .agg(max(successCond.cast("int")).as("conv"))
      .withColumn("arm",
        when(conv(substring(md5(col(userCol).cast("string").cast("binary")), 1, 1),
          16, 10).cast("int") < 8, "a").otherwise("b"))
    val agg = perUser.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum("conv").as("c"))
    val a = agg.filter(col("arm") === "a")
      .select(col("n").as("n_a"), col("c").as("conv_a"))
    val b = agg.filter(col("arm") === "b")
      .select(col("n").as("n_b"), col("c").as("conv_b"))
    a.crossJoin(broadcast(b))
      .withColumn("p_a", col("conv_a") / col("n_a"))
      .withColumn("p_b", col("conv_b") / col("n_b"))
      .withColumn("p_pool", (col("conv_a") + col("conv_b")) / (col("n_a") + col("n_b")))
      .withColumn("z", (col("p_a") - col("p_b")) /
        sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
          (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
      .select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
        scoreOut(col("p_a")).as("p_a"), scoreOut(col("p_b")).as("p_b"),
        scoreOut(col("z")).as("z"),
        (abs(col("z")) > 1.96).cast("int").as("significant_95"))
  }

  /** Deterministic bootstrap confidence interval for a group mean: B
    * resamples, each the subset of rows whose per-(row, replicate) hash
    * draw keeps ~63.2% of rows (the asymptotic distinct-row mass of a
    * with-replacement resample — "Poisson bootstrap" with p = 1 − 1/e,
    * the standard scalable approximation since true resampling needs
    * global row multiplicity). One pass: each row explodes into its
    * (bounded) B replicate memberships, replicate means aggregate
    * per-key, and the CI reads percentile bounds over the B means. Fully
    * deterministic — hash draws, no rand() — so the CI is reproducible
    * across runs, engines and retries.
    *
    * Returns one row: (n, mean, boot_lo, boot_hi) at the given level. */
  def bootstrapMeanCi(events: DataFrame, valueCol: String, b: Int,
                      level: Double, idCol: String,
                      scoreOut: Column => Column): DataFrame = {
    require(b >= 8 && b <= 256, s"replicate budget must be bounded, got $b")
    require(level > 0 && level < 1, s"level in (0,1), got $level")
    val v = col(valueCol).cast("double")
    // keep row in replicate r iff the r-th byte of the row's hash pool is
    // < 162 (162/256 ≈ 0.632 = 1 − 1/e). The pool is ⌈b/16⌉ md5 blocks of
    // the row id — each md5 yields 16 independent uniform bytes, so b=32
    // replicates cost 2 md5/row, not b md5/row: the per-(row,replicate)
    // md5 draw measured 1.9 s vs 0.3 s for the identical explode+agg at
    // sf0.1 (~19M hashes), and the block pool cuts that 16× while keeping
    // the draw reproducible in any engine with md5 (the DuckDB oracle
    // indexes the same hex pool). The byte test itself is LEXICOGRAPHIC —
    // a two-hex-char substring is < "a2" iff the byte is < 0xa2 = 162,
    // because lowercase hex digits are ASCII-ordered — which skips the
    // base-16 `conv` parse per (row, replicate): measured 1.96 s → 1.12 s
    // for the explode+filter+agg at sf0.1. (Filtering the replicate array
    // BEFORE the explode is NOT a win: a higher-order-function lambda
    // leaves WholeStageCodegen and measured 2.7 s.)
    val nBlocks = (b + 15) / 16
    val pool = concat((1 to nBlocks).map(k =>
      md5(concat(col(idCol).cast("string"), lit(s"_$k")).cast("binary"))): _*)
    // spread the narrow scan before the md5 pool + b-way explode (the
    // per-row-expensive stage; profiled 1.9 s single-task at sf0.1)
    val reps = Spread.ifNarrow(events.select(col(idCol), v.as("v")))
      .select(col("v"), pool.as("hp"))
      .select(col("v"), col("hp"), explode(sequence(lit(1), lit(b))).as("r"))
      .filter(col("hp").substr(col("r") * 2 - 1, lit(2)) < lit("a2"))
    val means = reps.groupBy("r").agg(avg("v").as("m"))
    val alpha = (1.0 - level) / 2.0
    val base = events.agg(count(lit(1)).as("n"), avg(v).as("mean"))
    base.crossJoin(broadcast(means.agg(
        expr(s"percentile(m, $alpha)").as("lo"),
        expr(s"percentile(m, ${1.0 - alpha})").as("hi"))))
      .select(col("n"), scoreOut(col("mean")).as("mean"),
        scoreOut(col("lo")).as("boot_lo"), scoreOut(col("hi")).as("boot_hi"))
  }

  /** CUPED variance reduction (Deng et al. 2013) for the A/B harness —
    * the adjustment every mature experimentation platform applies before
    * the t-test: ŷ = y − θ(x_pre − E[x_pre]) with θ = cov(x,y)/var(x)
    * from the PRE-period covariate strips the between-user variance the
    * treatment cannot have caused, shrinking confidence intervals at
    * identical sample size.
    *
    * Shape: events collapse to one (user, x_pre, y_post) row map-side;
    * arms split on the md5 hex digit (the q168 convention); global means
    * and θ are scalar-aggregate crossjoins; per-arm moments are one hash
    * agg on the two-arm table. θ is ROUNDED before the adjustment so
    * every ŷ is engine-identical arithmetic. Users lacking either
    * period drop (no covariate → no adjustment — the standard CUPED
    * eligibility rule). */
  def cuped(events: DataFrame, userCol: String, tsCol: String,
            valueCol: String, cutTs: String,
            scoreOut: Column => Column): DataFrame = {
    val v = col(valueCol).cast("double")
    val cut = lit(cutTs).cast("timestamp")
    val per = events
      .groupBy(col(userCol).as("u"))
      .agg(avg(when(col(tsCol) < cut, v)).as("x"),
        avg(when(col(tsCol) >= cut, v)).as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .withColumn("arm",
        when(conv(substring(md5(col("u").cast("string").cast("binary")), 1, 1),
          16, 10).cast("int") < 8, "a").otherwise("b"))
    val gm = per.agg(avg("x").as("__mx"), avg("y").as("__my"))
    val centered = per.crossJoin(gm)
      .select(col("u"), col("arm"), col("y"),
        (col("x") - col("__mx")).as("cx"), (col("y") - col("__my")).as("cy"))
    val theta = centered
      .agg(scoreOut(sum(col("cx") * col("cy")) / sum(col("cx") * col("cx")))
        .as("__theta"))
    val adj = centered.crossJoin(theta)
      .select(col("arm"), col("y"),
        (col("y") - col("__theta") * col("cx")).as("adj"), col("__theta"))
    val arms = adj.groupBy("arm")
      .agg(count(lit(1)).cast("double").as("n"),
        avg("y").as("my"), avg("adj").as("madj"),
        variance("y").as("vy"), variance("adj").as("vadj"),
        max("__theta").as("theta"))
    def a(c: String) = max(when(col("arm") === "a", col(c)))
    def b(c: String) = max(when(col("arm") === "b", col(c)))
    val seAdj = sqrt(a("vadj") / a("n") + b("vadj") / b("n"))
    arms.agg(
        a("n").cast("long").as("n_a"), b("n").cast("long").as("n_b"),
        max("theta").as("theta"),
        scoreOut(a("my") - b("my")).as("diff_raw"),
        scoreOut(a("madj") - b("madj")).as("diff_adj"),
        scoreOut(seAdj).as("se_adj"),
        scoreOut((a("madj") - b("madj")) / seAdj).as("z_adj"),
        scoreOut(lit(1.0) -
          (a("vadj") * (a("n") - 1) + b("vadj") * (b("n") - 1)) /
          (a("vy") * (a("n") - 1) + b("vy") * (b("n") - 1)))
          .as("var_reduction"))
  }

  /** Neyman optimal allocation (Neyman '34) — how to SPEND a sampling
    * budget across strata: n_h ∝ N_h·σ_h beats proportional allocation
    * whenever stratum variances differ (the variance of the stratified
    * mean is minimized). The pipeline use: a labeling/eval budget of B
    * rows allocated across sources/types before drawing the q125-style
    * deterministic samples.
    *
    * One hash aggregate per stratum (N, σ rounded), one scalar
    * normalizer crossjoin; output is stratum-sized: (stratum, n_rows,
    * sigma, neyman_share, prop_share, n_sample). */
  def neymanAllocation(df: DataFrame, stratumCol: String, valueCol: String,
                       budget: Int, scoreOut: Column => Column): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val v = col(valueCol).cast("double")
    val per = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_rows"), scoreOut(stddev_pop(v)).as("sigma"))
    val tot = per.agg(sum(col("n_rows") * col("sigma")).as("__ns"),
      sum("n_rows").as("__n"))
    per.crossJoin(tot)
      .select(col("stratum"), col("n_rows"), col("sigma"),
        scoreOut(col("n_rows") * col("sigma") / col("__ns")).as("neyman_share"),
        scoreOut(col("n_rows") / col("__n").cast("double")).as("prop_share"))
      .withColumn("n_sample",
        floor(col("neyman_share") * budget + lit(0.5)).cast("long"))
  }

  /** Horvitz–Thompson total estimator under deterministic
    * probability-proportional-to-size Poisson sampling: π_i = min(1,
    * c·xᵢ) with c = B/Σx, include row i when its portable Knuth-hash
    * uniform uᵢ < πᵢ, estimate Σx by Σ_{sampled} xᵢ/πᵢ. The unbiasedness
    * identity every weighted-sample downstream consumer relies on,
    * MEASURED (reported with its realized relative error) — companion of
    * the q132 A-Res draw, which samples a fixed k instead.
    *
    * πᵢ and uᵢ are rounded before the inclusion test and the weights, so
    * the draw and the estimate are engine-identical. Scale: one linear
    * scan + two scalar aggregates; the sample never materializes beyond
    * the sum. */
  def horvitzThompson(df: DataFrame, idCol: String, sizeCol: String,
                      budget: Int, scoreOut: Column => Column): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val x = col(sizeCol).cast("double")
    val base = df.select(col(idCol).as("__id"), x.as("x")).filter(col("x") > 0)
    val tot = base.agg(sum("x").as("__tx"), count(lit(1)).as("__n"))
    val h = pmod(pmod(col("__id").cast("long"), lit(2147483648L)) *
      lit(2654435761L), lit(2147483647L))
    val u = scoreOut((h + lit(1.0)) / lit(2147483648.0))
    val pi = scoreOut(least(lit(1.0), lit(budget.toDouble) * col("x") / col("__tx")))
    base.crossJoin(tot)
      .withColumn("__u", u).withColumn("__pi", pi)
      .withColumn("__in", (col("__u") < col("__pi")).cast("int"))
      .agg(max("__n").as("n_total"), sum("__in").as("n_sampled"),
        scoreOut(max("__tx")).as("true_total"),
        scoreOut(sum(when(col("__in") === 1, col("x") / col("__pi"))
          .otherwise(lit(0.0)))).as("ht_estimate"))
      .withColumn("rel_err",
        scoreOut(abs(col("ht_estimate") - col("true_total")) / col("true_total")))
  }

  /** Difference-in-differences — the workhorse causal estimator when
    * treatment wasn't randomized: (ȳ_treat,post − ȳ_treat,pre) −
    * (ȳ_ctrl,post − ȳ_ctrl,pre) cancels both the group level difference
    * and the common time trend (the parallel-trends assumption is the
    * price). Here run as an A/A placebo over the md5 arms and the month
    * halves — the estimate SHOULD be ≈ 0, which is exactly what makes it
    * a standing pipeline health check for the split itself.
    *
    * One (arm, period)-keyed moment aggregate (4 cells), then pure
    * arithmetic on the pivoted cell row; se via the four cell variances
    * (Welch-style, no pooling). */
  def diffInDiff(events: DataFrame, userCol: String, tsCol: String,
                 valueCol: String, cutTs: String,
                 scoreOut: Column => Column): DataFrame = {
    val v = col(valueCol).cast("double")
    val cut = lit(cutTs).cast("timestamp")
    val arm = when(conv(substring(md5(col(userCol).cast("string").cast("binary")), 1, 1),
      16, 10).cast("int") < 8, "a").otherwise("b")
    val cells = events
      .select(arm.as("arm"),
        when(col(tsCol) < cut, "pre").otherwise("post").as("period"), v.as("x"))
      .groupBy("arm", "period")
      .agg(count(lit(1)).cast("double").as("n"), avg("x").as("m"),
        variance("x").as("s2"))
    def cell(a: String, p: String, c: String) =
      max(when(col("arm") === a && col("period") === p, col(c)))
    val did = (cell("a", "post", "m") - cell("a", "pre", "m")) -
      (cell("b", "post", "m") - cell("b", "pre", "m"))
    val se = sqrt(
      cell("a", "post", "s2") / cell("a", "post", "n") +
        cell("a", "pre", "s2") / cell("a", "pre", "n") +
        cell("b", "post", "s2") / cell("b", "post", "n") +
        cell("b", "pre", "s2") / cell("b", "pre", "n"))
    cells.agg(
      cell("a", "pre", "n").cast("long").as("n_a_pre"),
      cell("a", "post", "n").cast("long").as("n_a_post"),
      cell("b", "pre", "n").cast("long").as("n_b_pre"),
      cell("b", "post", "n").cast("long").as("n_b_post"),
      scoreOut(did).as("did"), scoreOut(se).as("se"),
      scoreOut(did / se).as("z"),
      (abs(did / se) > 1.96).cast("int").as("significant_95"))
  }

  /** Always-valid A/B monitoring via the mixture SPRT (Johari, Pekelis &
    * Walsh — the "peeking problem" fix): the day-t statistic
    * Λ_t = √(se²/(se²+τ²)) · exp(d²τ² / (2se²(se²+τ²))) over the
    * CUMULATIVE arm difference d with standard error se, and the
    * always-valid p_t = min(1, 1/max_{k≤t} Λ_k) — monotone by
    * construction, so stopping the experiment the first day p < α keeps
    * the false-positive rate at α no matter how often anyone peeks
    * (fixed-n z-tests like q168 are only valid at their single
    * preplanned look).
    *
    * Shape: events collapse to (day, arm) moment rows map-side; the
    * by-day table is built on the FULL day-calendar × arm grid (distinct
    * days exploded to both arms, daily moments left-joined in) so a day
    * on which one arm happens to record no events still emits a
    * monitoring row — the cumulative sums ignore the grid's nulls,
    * which IS the carry-forward. Cumulative sums are arm-partitioned
    * windows over the calendar-sized table; the running max of Λ is one
    * partition-less window over the same ~#days rows (named lint
    * entry). d, se², Λ are rounded in sequence so the whole trajectory
    * is engine-identical. */
  def msprt(events: DataFrame, userCol: String, tsCol: String,
            valueCol: String, tau: Double, alpha: Double,
            scoreOut: Column => Column): DataFrame = {
    require(tau > 0 && alpha > 0 && alpha < 1, s"bad tau=$tau alpha=$alpha")
    val v = col(valueCol).cast("double")
    val arm = when(conv(substring(md5(col(userCol).cast("string").cast("binary")), 1, 1),
      16, 10).cast("int") < 8, "a").otherwise("b")
    val daily = events
      .select(to_date(col(tsCol)).as("d"), arm.as("arm"), v.as("x"))
      .groupBy("d", "arm")
      .agg(count(lit(1)).cast("double").as("n"), sum("x").as("s"),
        sum(col("x") * col("x")).as("q"))
    // full calendar × arm grid: a generate (no join), 2·#days rows — a
    // one-arm day must not drop out of the p trajectory
    val grid = daily.select("d").distinct()
      .select(col("d"), explode(array(lit("a"), lit("b"))).as("arm"))
    val wCum = Window.partitionBy("arm").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = grid.join(daily, Seq("d", "arm"), "left")
      .withColumn("cn", sum("n").over(wCum))
      .withColumn("cs", sum("s").over(wCum))
      .withColumn("cq", sum("q").over(wCum))
    def a(c: String) = max(when(col("arm") === "a", col(c)))
    def b(c: String) = max(when(col("arm") === "b", col(c)))
    val byDay = cum.groupBy("d")
      .agg(a("cn").as("na"), b("cn").as("nb"),
        a("cs").as("sa"), b("cs").as("sb"),
        a("cq").as("qa"), b("cq").as("qb"))
      .filter(col("na") >= 2 && col("nb") >= 2)
      .withColumn("ma", col("sa") / col("na"))
      .withColumn("mb", col("sb") / col("nb"))
      .withColumn("diff", scoreOut(col("ma") - col("mb")))
      .withColumn("se2", scoreOut(
        (col("qa") / col("na") - col("ma") * col("ma")) / col("na") +
          (col("qb") / col("nb") - col("mb") * col("mb")) / col("nb")))
    val t2 = tau * tau
    val lam = scoreOut(sqrt(col("se2") / (col("se2") + lit(t2))) *
      exp(col("diff") * col("diff") * lit(t2) /
        (lit(2.0) * col("se2") * (col("se2") + lit(t2)))))
    val wMax = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    byDay
      .withColumn("lambda", lam)
      .withColumn("p_always_valid",
        scoreOut(least(lit(1.0), lit(1.0) / max("lambda").over(wMax))))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
        col("diff"), col("se2"), col("lambda"), col("p_always_valid"),
        (col("p_always_valid") < alpha).cast("int").as("reject"))
  }

  /** Benjamini–Hochberg FDR control over a FAMILY of test statistics —
    * the missing discipline once per-series tests run at fleet scale: at
    * 10k series, α=0.05 per test hands you 500 false alarms; BH keeps
    * the FALSE DISCOVERY RATE at α instead. Input is one row per test
    * (key, z); output adds the two-sided p, the BH rank, the rank-scaled
    * cutoff i·α/m, and the reject flag (all tests at rank ≤ the largest
    * qualifying rank).
    *
    * Scale contract: this operates on the test-FAMILY table — one row
    * per completed test, agg-sized by construction (the raw data was
    * reduced by whichever test produced z). The rank is a partition-less
    * window over that family table (named GlobalWindowLint entry); m and
    * the largest qualifying rank are scalar-aggregate crossjoins. p is
    * rounded before ranking, rank ties break on the key. */
  /** Inverse-propensity-weighted (Hájek) average treatment effect for an
    * OBSERVATIONAL treatment — where q168's randomized z-test is not
    * available because nobody randomized (who gets hit by errors, who
    * sees a feature organically). Propensity ê(x) comes from
    * [[RegressionOps.logisticNewton]] (per-step-rounded betas — the
    * whole estimator replays in an external engine); weights are clipped
    * to [clip, 1−clip] (the standard positivity trim: a unit with
    * ê ≈ 0/1 otherwise dominates the estimate); the Hájek ratio form
    * self-normalizes the weights. ATE = Σ(t·y/ê)/Σ(t/ê) −
    * Σ((1−t)·y/(1−ê))/Σ((1−t)/(1−ê)), reported beside the CONFOUNDED
    * naive difference so the adjustment is visible.
    *
    * Scale: the logistic's iters+1 scans plus two more (score, weighted
    * means) — everything map-side-combined aggregates over the unit
    * table. Returns one row: (n, n_treated, b0, b1, b2, mu_treated,
    * mu_control, ate_ipw, naive_diff). */
  def ipwAte(units: DataFrame, treatCol: String, yCol: String,
             x1Col: String, x2Col: String, iters: Int, clip: Double,
             scoreOut: Column => Column): DataFrame = {
    require(clip > 0 && clip < 0.5, s"clip in (0, 0.5), got $clip")
    val base = units.select(lit("all").as("g"),
        col(treatCol).cast("double").as("t"),
        col(yCol).cast("double").as("y"),
        col(x1Col).cast("double").as("x1"),
        col(x2Col).cast("double").as("x2"))
      .filter(col("t").isNotNull && col("y").isNotNull &&
        col("x1").isNotNull && col("x2").isNotNull)
      .persist()
    val betas = RegressionOps.logisticNewton(base, "g", col("t"),
        "x1", "x2", iters, scoreOut)
      .select(col("g"), col("b0"), col("b1"), col("b2"))
    val zRaw = col("b0") + col("b1") * col("x1") + col("b2") * col("x2")
    val p = lit(1.0) / (lit(1.0) +
      exp(-least(lit(30.0), greatest(lit(-30.0), zRaw))))
    val scored = base.join(betas, "g")
      .withColumn("e", least(lit(1.0 - clip), greatest(lit(clip), p)))
    scored.agg(
        count(lit(1)).cast("long").as("n"),
        sum(col("t")).cast("long").as("n_treated"),
        first("b0").as("b0"), first("b1").as("b1"), first("b2").as("b2"),
        (sum(col("t") * col("y") / col("e")) /
          sum(col("t") / col("e"))).as("__mu1"),
        (sum((lit(1.0) - col("t")) * col("y") / (lit(1.0) - col("e"))) /
          sum((lit(1.0) - col("t")) / (lit(1.0) - col("e")))).as("__mu0"),
        (sum(col("t") * col("y")) / sum(col("t")) -
          sum((lit(1.0) - col("t")) * col("y")) / sum(lit(1.0) - col("t")))
          .as("__naive"))
      .select(col("n"), col("n_treated"), col("b0"), col("b1"), col("b2"),
        scoreOut(col("__mu1")).as("mu_treated"),
        scoreOut(col("__mu0")).as("mu_control"),
        scoreOut(col("__mu1") - col("__mu0")).as("ate_ipw"),
        scoreOut(col("__naive")).as("naive_diff"))
  }

  /** Holm–Bonferroni step-down correction over a family of z-tests —
    * the FWER-controlling sibling of [[bhFdr]] (which controls FDR): use
    * Holm when ONE false positive is unacceptable (launch gates), BH
    * when a bounded false-discovery fraction is fine (screening).
    * Adjusted p = running max over the p-ascending order of
    * (m − rank + 1)·p, capped at 1 (the standard monotonization; reject
    * adj ≤ α is exactly the sequential step-down rule). Same p-value
    * construction, bounded-family global window, and rounding contract
    * as [[bhFdr]]. Returns (test_key, z, p, rank, p_holm, reject). */
  def holm(tests: DataFrame, keyCol: String, zCol: String, alpha: Double,
           scoreOut: Column => Column): DataFrame = {
    val base = tests
      .select(col(keyCol).as("test_key"), col(zCol).cast("double").as("z"))
      .withColumn("p",
        scoreOut(lit(2.0) * StatOps.normalUpperTail(abs(col("z")))))
    val m = base.agg(count(lit(1)).as("__m"))
    val ranked = base.crossJoin(m)
      .withColumn("rank",
        row_number().over(Window.orderBy("p", "test_key")).cast("long"))
      .withColumn("__raw",
        (col("__m") - col("rank") + lit(1L)).cast("double") * col("p"))
    ranked
      .withColumn("p_holm", scoreOut(least(lit(1.0),
        max("__raw").over(Window.orderBy("rank")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))))
      .select(col("test_key"), scoreOut(col("z")).as("z"), col("p"),
        col("rank"), col("p_holm"),
        (col("p_holm") <= alpha).cast("int").as("reject"))
  }

  def bhFdr(tests: DataFrame, keyCol: String, zCol: String, alpha: Double,
            scoreOut: Column => Column): DataFrame = {
    val base = tests
      .select(col(keyCol).as("test_key"), col(zCol).cast("double").as("z"))
      .withColumn("p",
        scoreOut(lit(2.0) * StatOps.normalUpperTail(abs(col("z")))))
    val m = base.agg(count(lit(1)).as("__m"))
    val ranked = base.crossJoin(m)
      .withColumn("rank",
        row_number().over(Window.orderBy("p", "test_key")).cast("long"))
      .withColumn("bh_cutoff",
        scoreOut(col("rank") * lit(alpha) / col("__m")))
    val kmax = ranked
      .agg(max(when(col("p") <= col("bh_cutoff"), col("rank"))).as("__k"))
    ranked.crossJoin(kmax)
      .select(col("test_key"), scoreOut(col("z")).as("z"), col("p"),
        col("rank"), col("bh_cutoff"),
        (col("rank") <= coalesce(col("__k"), lit(0L))).cast("int")
          .as("reject"))
  }
}
