package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The statistical-test harness over event measures — drift (PSI, exact
  * and binned KS), rank tests (Mann-Whitney, exact and binned), CUSUM
  * change detection, robust outliers (MAD), concentration (Gini),
  * first-digit conformance (Benford), survival (Kaplan-Meier), A/B
  * z-tests and the deterministic Poisson-bootstrap CI. Split out of
  * EventOps (round 8) purely for file hygiene - same operators, same
  * specs (StatOpsSpec, SketchBinnedSpec, crosscheck_stats.py).
  *
  * Scale shape: every test reduces the raw stream with ONE map-side
  * combinable aggregate (per distinct value, per bin, per unit, or per
  * replicate) before any window; the continuous-measure scale paths are
  * the binned variants whose support is bins-sized by construction. */
object StatOps {

  /** Population Stability Index between a reference and a current snapshot
    * of a measure — the standard production drift monitor for a model
    * input or scored feature: PSI = Σ_bins (p_cur − p_ref)·ln(p_cur/p_ref)
    * over fixed equal-width bins (industry rule of thumb: < 0.1 stable,
    * 0.1–0.25 drifting, > 0.25 shifted). Proportions are Laplace-smoothed
    * ((n + 0.5)/(N + bins/2)) so an empty bin on one side contributes a
    * finite, engine-identical term instead of ±∞.
    *
    * Each snapshot collapses to `bins + 2` counter rows map-side (under/
    * overflow are bins of their own — drift OUT of the declared range must
    * register, not vanish); the join is bin-keyed over those few rows. The
    * complement of [[graft.operators.CorpusOps.jsDivergence]]: numeric
    * feature space, not token space.
    *
    * Returns one row per bin: (bin, n_ref, n_cur, p_ref, p_cur,
    * psi_contrib); Σ psi_contrib is the PSI. */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
          bins: Int, lo: Double, hi: Double,
          scoreOut: Column => Column): DataFrame = {
    require(bins >= 1, s"bins must be positive, got $bins")
    def binned(df: DataFrame, n: String): DataFrame = {
      val v = col(valueCol).cast("double")
      val b = when(v < lo, lit(-1))
        .when(v >= hi, lit(bins))
        .otherwise(least(floor((v - lo) / ((hi - lo) / bins)).cast("int"),
          lit(bins - 1)))
      df.select(b.as("bin")).groupBy("bin").agg(count(lit(1)).as(n))
    }
    val a = binned(ref, "n_ref")
    val b = binned(cur, "n_cur")
    val j = a.join(b, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = j.agg(sum("n_ref").as("tr"), sum("n_cur").as("tc"))
    val half = lit(bins / 2.0)
    j.crossJoin(broadcast(tot))
      .withColumn("pr", (col("n_ref") + lit(0.5)) / (col("tr") + half))
      .withColumn("pc", (col("n_cur") + lit(0.5)) / (col("tc") + half))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        scoreOut(col("pr")).as("p_ref"), scoreOut(col("pc")).as("p_cur"),
        scoreOut((col("pc") - col("pr")) * log(col("pc") / col("pr")))
          .as("psi_contrib"))
  }

  /** One-sided CUSUM changepoint detection per series (Page 1954): the
    * classic upward-shift alarm C_t = max(0, C_{t−1} + x_t − k), alarmed
    * when C_t > h. The recursion LOOKS sequential, but the standard
    * identity C_t = S_t − min(0, min_{j≤t} S_j) over the drift-adjusted
    * prefix sum S_t = Σ(x_i − k) turns it into two plain running windows
    * (sum + min) — fully distributed, no recursive state, no arrays, no
    * UDAF. Window order is (ts, tiebreak) so the fold order — and hence
    * the float sum — is engine-identical.
    *
    * Returns per series: (series, n, max_cusum, n_alarms). */
  def cusum(events: DataFrame, seriesCol: String, tsCol: String,
            tiebreakCol: String, valueCol: String, k: Double, h: Double,
            scoreOut: Column => Column): DataFrame = {
    val w = Window.partitionBy(seriesCol).orderBy(col(tsCol), col(tiebreakCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col(seriesCol), col(tsCol), col(tiebreakCol),
        col(valueCol).cast("double").as("v"))
      .withColumn("s", sum(col("v") - lit(k)).over(w))
      .withColumn("c", col("s") - least(min("s").over(w), lit(0.0)))
      .groupBy(seriesCol)
      .agg(count(lit(1)).as("n"),
        scoreOut(max("c")).as("max_cusum"),
        sum((col("c") > h).cast("long")).as("n_alarms"))
  }

  /** Robust outlier scoring by median absolute deviation: modified
    * z-score 0.6745·(x − median)/MAD — the robust twin of the σ-based
    * detectors (W10, seasonalProfile), immune to the outliers it hunts
    * (one wild value shifts a mean/σ threshold but not a median/MAD one).
    * Exact per-group medians via `percentile` — at gate scale a sort of
    * each group's values; at 100 TB swap in `approx_percentile` (same
    * call shape, sketch-backed) and document the error. Two aggregates on
    * the SAME group key (medians, then MAD of residuals) and a final
    * flag-count pass — three scans, all group-keyed, no global sort.
    *
    * Returns (series, n, med, mad, n_outliers) with |modified z| > zCut
    * flagged. */
  def madOutliers(events: DataFrame, seriesCol: String, valueCol: String,
                  zCut: Double, scoreOut: Column => Column): DataFrame = {
    val v = col(valueCol).cast("double")
    val med = events.groupBy(seriesCol)
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val withMed = events.select(col(seriesCol), v.as("v"))
      .join(med, Seq(seriesCol))
    val mad = withMed
      .withColumn("absdev", abs(col("v") - col("med")))
      .groupBy(seriesCol)
      .agg(max("med").as("med"), expr("percentile(absdev, 0.5)").as("mad"))
    withMed.drop("med").join(mad, Seq(seriesCol))
      .withColumn("flag",
        (col("mad") > 0 &&
          abs(lit(0.6745) * (col("v") - col("med")) / col("mad")) > zCut)
          .cast("long"))
      .groupBy(seriesCol)
      .agg(count(lit(1)).as("n"),
        scoreOut(max("med")).as("med"),
        scoreOut(max("mad")).as("mad"),
        sum("flag").as("n_outliers"))
  }

  /** Kaplan–Meier survival estimate for time-to-first-`targetType` per
    * user, right-censored at the observation end: S(t) = Π_{tᵢ≤t}
    * (1 − dᵢ/nᵢ) over distinct event days — "how long until a signup
    * converts", the duration analytics the reference's accretion-event
    * DURATION_DAYS column gestures at, done properly with censoring. The
    * product folds as exp(Σ ln(1 − dᵢ/nᵢ)) over an ORDERED running window
    * (both engines sum the same terms in the same day order, ln noise
    * absorbed by rounding). Per-user durations are one user-keyed
    * aggregate; the curve itself lives on a days-sized table.
    *
    * Returns per event-day: (t_days, n_at_risk, n_events, survival). */
  def kaplanMeier(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, startType: String, targetType: String,
                  scoreOut: Column => Column): DataFrame = {
    val perUser = events.groupBy(col(userCol))
      .agg(
        min(when(col(typeCol) === startType, to_date(col(tsCol)))).as("d0"),
        min(when(col(typeCol) === targetType, to_date(col(tsCol)))).as("d1"),
        max(to_date(col(tsCol))).as("dmax"))
      .filter(col("d0").isNotNull)
    val horizon = perUser.agg(max("dmax").as("dend"))
    val durations = perUser.crossJoin(broadcast(horizon))
      .select(
        when(col("d1").isNotNull && col("d1") >= col("d0"),
          datediff(col("d1"), col("d0")))
          .otherwise(datediff(col("dend"), col("d0"))).as("t"),
        (col("d1").isNotNull && col("d1") >= col("d0")).cast("int").as("observed"))
    val total = durations.agg(count(lit(1)).as("n_total"))
    val byDay = durations.groupBy("t")
      .agg(sum("observed").as("d"), count(lit(1)).as("c"))
    val w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    val wInc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    byDay.crossJoin(broadcast(total))
      .withColumn("n_at_risk", col("n_total") - coalesce(sum("c").over(w), lit(0L)))
      .filter(col("d") > 0)
      .withColumn("factor", lit(1.0) - col("d").cast("double") / col("n_at_risk"))
      // exact-zero factor (everyone at risk converts): S hits 0 and STAYS 0
      // — Spark's log(0) is null, so the exp-sum-log fold needs the guard
      .withColumn("zeroed",
        max((col("factor") <= 0).cast("int")).over(wInc))
      .withColumn("survival", scoreOut(when(col("zeroed") === 1, lit(0.0))
        .otherwise(exp(sum(log(col("factor"))).over(wInc)))))
      .select(col("t").as("t_days"), col("n_at_risk"), col("d").as("n_events"),
        col("survival"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) test between two samples: U from
    * the rank sum over the POOLED ordering with midranks for ties, and
    * the normal-approximation z with the tie-correction term — the
    * rank-based "did the distribution shift" test that, unlike the
    * t-test, needs no normality and, unlike KS, targets location shifts.
    * Ranks come from one window over the pooled (value, count) table —
    * distinct-value-sized, not row-sized, because midranks are a pure
    * function of the cumulative counts.
    *
    * Returns one row: (n_a, n_b, u, mu, sigma, z, significant_95). */
  def mannWhitneyU(a: DataFrame, b: DataFrame, valueCol: String,
                   scoreOut: Column => Column): DataFrame = {
    val v = col(valueCol).cast("double")
    val pooled = a.select(v.as("x")).withColumn("s", lit("a"))
      .unionByName(b.select(v.as("x")).withColumn("s", lit("b")))
    val byV = pooled.groupBy("x")
      .agg(count(lit(1)).as("t"),
        sum(when(col("s") === "a", 1L).otherwise(0L)).as("ta"))
    val w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    val ranked = byV
      .withColumn("cum", sum("t").over(w))
      // midrank of a tie group spanning ranks (cum−t, cum]:
      // (cum − t + 1 + cum)/2
      .withColumn("midrank", (col("cum") * 2 - col("t") + 1) / lit(2.0))
    val agg = ranked.agg(
      sum("ta").cast("double").as("na"),
      sum(col("t") - col("ta")).cast("double").as("nb"),
      sum(col("ta") * col("midrank")).as("ra"),
      // tie correction Σ (t³ − t)
      sum(col("t") * col("t") * col("t") - col("t")).cast("double").as("tie"))
    agg.select(
        col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
        (col("ra") - col("na") * (col("na") + 1) / 2).as("u"),
        (col("na") * col("nb") / 2.0).as("mu"),
        sqrt(col("na") * col("nb") / 12.0 *
          ((col("na") + col("nb") + 1) -
            col("tie") / ((col("na") + col("nb")) * (col("na") + col("nb") - 1))))
          .as("sigma"))
      .select(col("n_a"), col("n_b"),
        scoreOut(col("u")).as("u"), scoreOut(col("mu")).as("mu"),
        scoreOut(col("sigma")).as("sigma"),
        scoreOut((col("u") - col("mu")) / col("sigma")).as("z"),
        (abs((col("u") - col("mu")) / col("sigma")) > 1.96).cast("int")
          .as("significant_95"))
  }

  /** Gini coefficient of a nonnegative measure's concentration across
    * units (how unequally activity/tokens/spend distribute): the sorted-
    * cumulative formula G = (2·Σ i·xᵢ)/(n·Σx) − (n+1)/n over values
    * ranked ascending with an id tiebreak. Units are users/documents —
    * hundreds of millions of rows at 100 TB — so the rank is NOT a global
    * `row_number` window (one partition's sort): it is the range-
    * partitioned two-phase prefix sum of 1 ([[CorpusOps.orderedPrefixSum]],
    * the same machinery as token-budget selection), whose only global
    * window runs over the ≤-#partitions offset table. The (x, id) order is
    * total, so ranks are dense, deterministic, and tie-free — exactly
    * `row_number` — and Σ i·xᵢ folds in one aggregate.
    * 0 = perfectly equal, → 1 = one unit holds everything.
    *
    * Returns one row: (n_units, total, gini). */
  def giniConcentration(perUnit: DataFrame, idCol: String, valueCol: String,
                        scoreOut: Column => Column): DataFrame = {
    val v = col(valueCol).cast("double")
    CorpusOps.orderedPrefixSum(
        perUnit.select(col(idCol), v.as("x")),
        Seq(col("x").asc, col(idCol).asc), lit(1L), "i")
      .agg(count(lit(1)).cast("double").as("n"), sum("x").as("tot"),
        sum(col("i") * col("x")).as("ix"))
      .select(col("n").cast("long").as("n_units"),
        scoreOut(col("tot")).as("total"),
        scoreOut(lit(2.0) * col("ix") / (col("n") * col("tot")) -
          (col("n") + 1) / col("n")).as("gini"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between a reference and a
    * current snapshot: D = max |F_ref(x) − F_cur(x)| over the pooled
    * support — the nonparametric drift test beside [[psi]] (PSI needs a
    * binning; KS sees any distributional change). Exact ECDFs from one
    * full-outer join of per-value cumulative counts; at gate scale the
    * support is the distinct-value set, and at 100 TB the same algebra
    * runs over quantile-sketch bins (documented approximation). The
    * significance line D_crit = c(α)·√((n+m)/(n·m)) with c(0.05) = 1.358
    * is pure arithmetic.
    *
    * Returns one row: (n_ref, n_cur, ks_d, d_crit_95, drifted). */
  def ksTest(ref: DataFrame, cur: DataFrame, valueCol: String,
             scoreOut: Column => Column): DataFrame = {
    val v = col(valueCol).cast("double")
    def ecdf(df: DataFrame, n: String, f: String): DataFrame = {
      val byV = df.select(v.as("x")).groupBy("x").agg(count(lit(1)).as("c"))
      val w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
      byV.withColumn("cum", sum("c").over(w))
        .crossJoin(broadcast(byV.agg(sum("c").as(n))))
        .select(col("x"), (col("cum") / col(n)).as(f), col(n))
    }
    val a = ecdf(ref, "n_ref", "f_ref")
    val b = ecdf(cur, "n_cur", "f_cur")
    val joined = a.join(b, Seq("x"), "full_outer")
    // at support points absent from one side, that side's ECDF is the
    // LAST defined value at or below x — forward-fill over the pooled,
    // ordered support (0 before the first point)
    val w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    joined
      .withColumn("fr", coalesce(last("f_ref", ignoreNulls = true).over(w), lit(0.0)))
      .withColumn("fc", coalesce(last("f_cur", ignoreNulls = true).over(w), lit(0.0)))
      .agg(max("n_ref").as("n_ref"), max("n_cur").as("n_cur"),
        max(abs(col("fr") - col("fc"))).as("d"))
      .select(col("n_ref"), col("n_cur"),
        scoreOut(col("d")).as("ks_d"),
        scoreOut(lit(1.358) * sqrt((col("n_ref") + col("n_cur")).cast("double") /
          (col("n_ref") * col("n_cur")))).as("d_crit_95"),
        (col("d") > lit(1.358) * sqrt((col("n_ref") + col("n_cur")).cast("double") /
          (col("n_ref") * col("n_cur")))).cast("int").as("drifted"))
  }

  /** Wasserstein-1 (earth-mover) distance between two samples — the
    * MAGNITUDE companion of [[ksTest]]: KS answers "did it drift" with
    * the worst single ECDF gap; W₁ = ∫|F_ref − F_cur| dx answers "by how
    * much, in the measure's own units" (it is the area between the
    * ECDFs), which is what a retraining-trigger threshold wants.
    *
    * Same scale contract as [[ksTest]]: ECDFs on the DISTINCT-value
    * support (named GlobalWindowLint entry); for continuous measures the
    * documented swap is pooled-quantile binning on bin MIDPOINTS (the
    * q178 pattern — W₁ then carries one-bin-width resolution). */
  def wasserstein1(ref: DataFrame, cur: DataFrame, valueCol: String,
                   scoreOut: Column => Column): DataFrame = {
    val v = col(valueCol).cast("double")
    def ecdf(df: DataFrame, n: String, f: String): DataFrame = {
      val byV = df.select(v.as("x")).groupBy("x").agg(count(lit(1)).as("c"))
      val w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
      byV.withColumn("cum", sum("c").over(w))
        .crossJoin(broadcast(byV.agg(sum("c").as(n))))
        .select(col("x"), (col("cum") / col(n)).as(f), col(n))
    }
    val a = ecdf(ref, "n_ref", "f_ref")
    val b = ecdf(cur, "n_cur", "f_cur")
    val joined = a.join(b, Seq("x"), "full_outer")
    val w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    val wl = Window.orderBy("x")
    joined
      .withColumn("fr", coalesce(last("f_ref", ignoreNulls = true).over(w), lit(0.0)))
      .withColumn("fc", coalesce(last("f_cur", ignoreNulls = true).over(w), lit(0.0)))
      .withColumn("xn", lead("x", 1).over(wl))
      .agg(max("n_ref").as("n_ref"), max("n_cur").as("n_cur"),
        sum(when(col("xn").isNotNull,
          abs(col("fr") - col("fc")) * (col("xn") - col("x")))).as("__w1"))
      .select(col("n_ref"), col("n_cur"), scoreOut(col("__w1")).as("w1"))
  }

  /** Hill tail-index estimator per group — "how heavy is the tail"
    * quantified: for the top-k order statistics, α̂ = k / Σᵢ(ln xᵢ −
    * ln x₍ₖ₊₁₎) (Hill '75). α ≲ 2 means infinite variance (means and
    * σ-based monitors stop converging — the signal to switch to the
    * robust/quantile machinery); document-length and session-depth
    * columns are the classic cases.
    *
    * Shape: one group-partitioned rank window (payload (group, value,
    * id)), the k+1 head rows aggregate per group — output is
    * group-sized. Ranks break ties on `idCol` so the order statistics
    * are engine-deterministic. Groups with ≤ k+1 positive rows are
    * dropped (the estimator needs the full head). */
  def hillTailIndex(df: DataFrame, groupCol: String, valueCol: String,
                    idCol: String, k: Int,
                    scoreOut: Column => Column): DataFrame = {
    require(k >= 5 && k <= 10000, s"k in [5, 10000], got $k")
    val v = col(valueCol).cast("double")
    val ranked = df.select(col(groupCol).as("grp"), v.as("x"), col(idCol).as("__id"))
      .filter(col("x") > 0)
      .withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy(col("x").desc, col("__id"))))
      .filter(col("rn") <= k + 1)
    ranked.groupBy("grp")
      .agg(count(lit(1)).as("__cnt"),
        sum(when(col("rn") <= k, log(col("x")))).as("__slog"),
        max(when(col("rn") === k + 1, col("x"))).as("__xk1"))
      .filter(col("__cnt") === k + 1)
      .select(col("grp").as(groupCol), lit(k).as("k"),
        scoreOut(col("__xk1")).as("x_threshold"),
        scoreOut(lit(k.toDouble) /
          (col("__slog") - lit(k.toDouble) * log(col("__xk1")))).as("alpha"))
  }

  /** Bin both samples by POOLED approximate-quantile boundaries — the
    * scale substitution [[ksTest]]/[[mannWhitneyU]] document for
    * continuous measures, where "distinct values" ≈ N and the exact
    * per-value table would feed an effectively row-sized global window.
    * The boundary fit is `approxQuantile` (Greenwald–Khanna, one
    * distributed pass, mergeable partials); the ≤`bins`−1 boundaries come
    * back as bounded driver metadata and are baked into the bin
    * assignment as ONE literal array (the IVF-centroid contract), so the
    * bin map is a pure broadcast-free column expression:
    * bin = #{boundaries < x}. Returns the two frames reduced to a
    * `__bin` int column. */
  private def binByPooledQuantiles(a: DataFrame, b: DataFrame,
                                   valueCol: String, bins: Int,
                                   relErr: Double): (DataFrame, DataFrame) = {
    require(bins >= 8 && bins <= 4096, s"bin budget must be bounded, got $bins")
    val v = col(valueCol).cast("double")
    val pooled = a.select(v.as("x")).unionByName(b.select(v.as("x")))
      .filter(col("x").isNotNull)
    val probs = (1 until bins).map(_.toDouble / bins).toArray
    val bounds = pooled.stat.approxQuantile("x", probs, relErr).distinct.sorted
    val bLit = lit(bounds)
    def binned(df: DataFrame): DataFrame = df
      .filter(v.isNotNull)
      .select(size(filter(bLit, bd => bd < v)).as("__bin"))
    (binned(a), binned(b))
  }

  /** Sketch-binned two-sample KS: [[ksTest]]'s exact algebra applied to
    * the pooled-quantile bin index instead of the raw value, evaluating
    * both ECDFs on the ≤`bins` shared boundaries. The support table — and
    * therefore the one ordered window — is now bins-sized BY CONSTRUCTION
    * whatever the measure's cardinality. One-sided error: the binned D is
    * a max over a subset of the support, so ksBinned ≤ ksExact, and the
    * gap is bounded by the largest per-bin probability mass (≈1/bins for
    * quantile bins, plus sketch error) — SketchBinnedSpec pins the bound
    * empirically. Output schema matches [[ksTest]]. */
  def ksTestBinned(ref: DataFrame, cur: DataFrame, valueCol: String,
                   bins: Int, scoreOut: Column => Column,
                   relErr: Double = 0.001): DataFrame = {
    val (r, c) = binByPooledQuantiles(ref, cur, valueCol, bins, relErr)
    ksTest(r, c, "__bin", scoreOut)
  }

  /** Sketch-binned Mann–Whitney U: [[mannWhitneyU]]'s midrank algebra on
    * the pooled-quantile bin index — every row in a bin becomes one tie
    * group at the bin's midrank, capping the rank table at `bins` rows.
    * Rank distortion is within-bin only (≤ the bin's count), which the
    * tie-corrected normal approximation absorbs; z converges to the exact
    * statistic as bins grow (SketchBinnedSpec pins the tolerance).
    * Output schema matches [[mannWhitneyU]]. */
  def mannWhitneyUBinned(a: DataFrame, b: DataFrame, valueCol: String,
                         bins: Int, scoreOut: Column => Column,
                         relErr: Double = 0.001): DataFrame = {
    val (ba, bb) = binByPooledQuantiles(a, b, valueCol, bins, relErr)
    mannWhitneyU(ba, bb, "__bin", scoreOut)
  }

  /** Benford first-digit analysis: observed vs expected (log10(1 + 1/d))
    * leading-significant-digit distribution of a measure, with the χ²
    * statistic — the classic forensic test for fabricated or synthetic
    * numeric columns (organic multi-scale measures follow Benford;
    * uniform generators and hand-entered numbers don't). The first digit
    * falls out of pure column algebra (normalize into [1, 10) via
    * log10-floor — no string formatting), and the whole result is one
    * 9-key map-side aggregate plus a broadcast total.
    *
    * Returns per digit 1-9: (digit, n, p_obs, p_benford, chi2_term);
    * Σ chi2_term vs χ²₈ critical values answers "is this column
    * organic". Zero/negative/null values are excluded (no first digit). */
  def benfordDigits(events: DataFrame, valueCol: String,
                    scoreOut: Column => Column): DataFrame = {
    val v = col(valueCol).cast("double")
    val digit = floor(v / pow(lit(10.0), floor(log10(v)))).cast("int")
    val counts = events.filter(v > 0)
      .select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum("n").as("nt"))
    counts.crossJoin(broadcast(tot))
      .withColumn("p_obs", col("n") / col("nt"))
      .withColumn("p_benford", log10(lit(1.0) + lit(1.0) / col("digit")))
      .select(col("digit"), col("n"),
        scoreOut(col("p_obs")).as("p_obs"),
        scoreOut(col("p_benford")).as("p_benford"),
        scoreOut(col("nt") * (col("p_obs") - col("p_benford")) *
          (col("p_obs") - col("p_benford")) / col("p_benford")).as("chi2_term"))
  }

  /** Precision/recall sweep of a continuous score against a binary label —
    * the classifier-calibration harness behind "where do we cut the
    * quality score": one row per threshold with precision, recall and F1
    * of `score >= threshold` as the positive prediction. The threshold
    * axis explodes from a literal array (bounded, ≤ 1024), so the cost is
    * one scan + a thresholds-keyed map-side-combinable aggregate; no
    * per-threshold rescan, no sort.
    *
    * Returns (threshold, n, n_pos, n_pred_pos, tp, precision, recall, f1);
    * precision is null when nothing is predicted positive. */
  def prCurve(scored: DataFrame, scoreCol: String, labelCol: String,
              thresholds: Seq[Double],
              scoreOut: Column => Column): DataFrame = {
    require(thresholds.nonEmpty && thresholds.size <= 1024,
      s"threshold sweep must be bounded, got ${thresholds.size}")
    val base = scored.select(col(scoreCol).cast("double").as("__s"),
      col(labelCol).cast("long").as("__y"))
    val agged = base
      .select(col("__s"), col("__y"),
        explode(array(thresholds.map(lit): _*)).as("threshold"))
      .groupBy("threshold")
      .agg(count(lit(1)).as("n"), sum("__y").as("n_pos"),
        sum((col("__s") >= col("threshold")).cast("long")).as("n_pred_pos"),
        sum(((col("__s") >= col("threshold")).cast("long") * col("__y")))
          .as("tp"))
    val p = col("tp").cast("double") / col("n_pred_pos")
    val r = col("tp").cast("double") / col("n_pos")
    agged.select(col("threshold"), col("n"), col("n_pos"), col("n_pred_pos"),
      col("tp"),
      scoreOut(when(col("n_pred_pos") > 0, p)).as("precision"),
      scoreOut(when(col("n_pos") > 0, r)).as("recall"),
      scoreOut(when(col("n_pred_pos") > 0 && col("n_pos") > 0 && (p + r) > 0,
        lit(2.0) * p * r / (p + r))).as("f1"))
  }

  /** 2-D Pareto frontier (skyline) per group: the rows not dominated on
    * the (maximize x, maximize y) plane — "the best documents at every
    * length budget", the multi-objective selection primitive behind
    * quality-vs-cost curation cuts. A row is dominated iff another row in
    * its group is ≥ on both axes and > on at least one; with two
    * objectives that reduces to two windows, both partitioned by the
    * group: max(y) over STRICTLY larger x (a range frame, so x must be
    * integral), and max(y) within the same-x tie group. Two window passes
    * over one group-keyed exchange — never the O(n²) dominance self-join.
    * Duplicate points dominate neither (strictness), so both survive.
    *
    * Returns the input rows (all columns) that sit on the frontier. */
  def paretoFrontier(df: DataFrame, groupCol: String, xCol: String,
                     yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("double")
    val wHigher = Window.partitionBy(groupCol).orderBy(x)
      .rangeBetween(1L, Window.unboundedFollowing)
    val wSameX = Window.partitionBy(col(groupCol), x)
    df.withColumn("__m1", max(y).over(wHigher))
      .withColumn("__m2", max(y).over(wSameX))
      .filter((col("__m1").isNull || y > col("__m1")) && y === col("__m2"))
      .drop("__m1", "__m2")
  }

  /** ROC AUC of a continuous score against a binary label, by the
    * rank-statistic identity AUC = (R₊ − n₊(n₊+1)/2)/(n₊·n₋) with
    * midranks for ties (so a tie contributes ½, the probabilistic
    * definition P(s₊ > s₋) + ½P(s₊ = s₋)) — the threshold-free companion
    * of [[prCurve]]: one number for "does the score order the corpus at
    * all". Same scale shape as [[mannWhitneyU]]: the corpus collapses
    * map-side to the distinct-score table (score, n, n_pos); the single
    * rank window runs over THAT, never over rows. Callers must pass an
    * already-rounded score (rank-over-rounded) so tie groups — and with
    * them the midranks — are engine-identical.
    *
    * Returns one row: (n_pos, n_neg, n_scores, auc). */
  def rocAuc(scored: DataFrame, scoreCol: String, labelCol: String,
             scoreOut: Column => Column): DataFrame = {
    val byS = scored
      .groupBy(col(scoreCol).cast("double").as("__s"))
      .agg(count(lit(1)).as("t"), sum(col(labelCol).cast("long")).as("tp"))
    val w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, 0)
    val ranked = byS
      .withColumn("cum", sum("t").over(w))
      .withColumn("midrank", (col("cum") * 2 - col("t") + 1) / lit(2.0))
    ranked.agg(
        sum("tp").cast("double").as("__np"),
        sum(col("t") - col("tp")).cast("double").as("__nn"),
        count(lit(1)).as("n_scores"),
        sum(col("tp") * col("midrank")).as("__rp"))
      .select(
        col("__np").cast("long").as("n_pos"),
        col("__nn").cast("long").as("n_neg"),
        col("n_scores"),
        scoreOut(when(col("__np") > 0 && col("__nn") > 0,
          (col("__rp") - col("__np") * (col("__np") + 1) / 2) /
            (col("__np") * col("__nn")))).as("auc"))
  }

  /** Cohen's kappa between two binary labelers — chance-corrected
    * agreement, the number that decides whether two cheap quality
    * heuristics are independent signals or the same signal twice (two
    * filters with κ ≈ 1 are redundant; κ ≈ 0 means composing them
    * actually tightens the corpus). po = observed agreement, pe = chance
    * agreement from the marginals, κ = (po − pe)/(1 − pe). ONE map-side
    * combinable aggregate over the labeled frame — four counters — so the
    * operator costs exactly one scan at any corpus size.
    *
    * Returns one row: (n, p_a, p_b, po, pe, kappa). */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String,
                  scoreOut: Column => Column): DataFrame = {
    val a = col(aCol).cast("double")
    val b = col(bCol).cast("double")
    val agg = df.agg(
      count(lit(1)).as("n"),
      avg(a).as("__pa"),
      avg(b).as("__pb"),
      avg((a === b).cast("double")).as("__po"))
    val pe = col("__pa") * col("__pb") +
      (lit(1.0) - col("__pa")) * (lit(1.0) - col("__pb"))
    agg.select(col("n"),
      scoreOut(col("__pa")).as("p_a"),
      scoreOut(col("__pb")).as("p_b"),
      scoreOut(col("__po")).as("po"),
      scoreOut(pe).as("pe"),
      scoreOut(when(pe < 1.0, (col("__po") - pe) / (lit(1.0) - pe)))
        .as("kappa"))
  }

  /** Allan variance per series at a ladder of averaging times τ — the
    * sensor-stability metric (oscillator/gyroscope drift, IEEE 1139):
    * σ²(τ) = ½·E[(ȳ_{i+1} − ȳ_i)²] over means of ADJACENT non-overlapping
    * τ-wide buckets. The slope of log σ vs log τ identifies the noise
    * regime (white −½, flicker 0, random-walk +½), which a plain rolling
    * σ cannot separate.
    *
    * One hash aggregate collapses the stream to bucket means per (series,
    * τ) — the window that pairs adjacent buckets runs on that agg-sized
    * frame, series-partitioned. Buckets are indexed off the HOUR-truncated
    * epoch (τ must be whole hours) so sub-second timestamp precision can
    * never move a row across a bucket boundary cross-engine. Gap
    * discipline: only pairs of consecutive bucket indexes (i+1 == i') are
    * averaged; a data outage contributes no phantom pair.
    *
    * Returns (series, tau_hours, n_buckets, n_pairs, allan_var,
    * allan_dev). */
  def allanVariance(df: DataFrame, seriesCol: String, tsCol: String,
                    valueCol: String, tausHours: Seq[Int],
                    scoreOut: Column => Column): DataFrame = {
    require(tausHours.nonEmpty && tausHours.forall(_ >= 1), "taus: whole hours >= 1")
    val perTau = tausHours.map { tau =>
      val bucket = floor(unix_timestamp(date_trunc("hour", col(tsCol))) /
        lit(3600L * tau)).as("__b")
      val means = df
        .groupBy(col(seriesCol).as("series"), bucket)
        .agg(avg(col(valueCol).cast("double")).as("__m"))
      val w = Window.partitionBy("series").orderBy("__b")
      means
        .withColumn("__dm",
          when(lead(col("__b"), 1).over(w) === col("__b") + 1,
            lead(col("__m"), 1).over(w) - col("__m")))
        .groupBy("series")
        .agg(count(lit(1)).as("n_buckets"),
          count(col("__dm")).as("n_pairs"),
          (lit(0.5) * avg(col("__dm") * col("__dm"))).as("__av"))
        .select(col("series"), lit(tau).as("tau_hours"),
          col("n_buckets"), col("n_pairs"),
          scoreOut(col("__av")).as("allan_var"),
          scoreOut(sqrt(col("__av"))).as("allan_dev"))
    }
    perTau.reduce(_ unionAll _)
  }

  /** Gumbel (EVT type-I) return levels per series from daily block maxima,
    * fit by the method of moments (Gumbel '58 / NIST-ish): with m, s the
    * mean and sample std of the daily maxima,
    *
    *   β = s·√6/π,   μ = m − γ·β   (γ = Euler–Mascheroni),
    *   x_T = μ − β·ln(−ln(1 − 1/T))
    *
    * — the level exceeded once per T blocks in expectation, the principled
    * extreme-value answer to "what alert threshold fires ~once a year"
    * that a z-score threshold (which assumes Gaussian tails) gets wrong.
    *
    * Scale shape: one (series, day) hash aggregate collapses the stream to
    * block maxima, one series-keyed moment aggregate follows — both
    * map-side combinable, no window anywhere. At 100 TB the block table is
    * series×days-sized, i.e. tiny.
    *
    * Returns (series, n_blocks, gumbel_mu, gumbel_beta, level_{T}d per
    * horizon). */
  def gumbelReturnLevels(df: DataFrame, seriesCol: String, tsCol: String,
                         valueCol: String, horizonsDays: Seq[Int],
                         scoreOut: Column => Column): DataFrame = {
    require(horizonsDays.nonEmpty && horizonsDays.forall(_ >= 2), "horizons: days >= 2")
    val gamma = 0.5772156649015329
    val blocks = df
      .groupBy(col(seriesCol).as("series"), to_date(col(tsCol)).as("__d"))
      .agg(max(col(valueCol).cast("double")).as("__mx"))
    val mom = blocks.groupBy("series")
      .agg(count(lit(1)).as("n_blocks"),
        avg("__mx").as("__m"), stddev_samp("__mx").as("__s"))
    val beta = col("__s") * lit(math.sqrt(6.0) / math.Pi)
    val mu = col("__m") - lit(gamma) * beta
    val levels = horizonsDays.map { t =>
      scoreOut(mu - beta * lit(math.log(-math.log(1.0 - 1.0 / t))))
        .as(s"level_${t}d")
    }
    mom.select(Seq(col("series"), col("n_blocks"),
      scoreOut(mu).as("gumbel_mu"), scoreOut(beta).as("gumbel_beta")) ++ levels: _*)
  }

  /** Welch's unequal-variance t-test per series between two row classes
    * (e.g. weekend vs weekday): t = (m₁−m₂)/√(s₁²/n₁+s₂²/n₂) with the
    * Welch–Satterthwaite df. The mean-shift companion of [[abTest]]
    * (which tests proportions) — use this when the measure is continuous
    * and the variances genuinely differ. One hash aggregate computes all
    * six moments per (series, class); the df formula and the |t| > 1.96
    * flag (normal approximation at the df sizes a 100 TB scan produces)
    * are pure arithmetic on that agg-sized frame.
    *
    * Returns (series, n_a, n_b, mean_a, mean_b, t_stat, df,
    * significant_95). */
  def welchTTest(df: DataFrame, seriesCol: String, valueCol: String,
                 isB: Column, scoreOut: Column => Column): DataFrame = {
    val v = col(valueCol).cast("double")
    val agg = df
      .groupBy(col(seriesCol).as("series"))
      .agg(
        count(when(!isB, 1)).cast("double").as("__na"),
        count(when(isB, 1)).cast("double").as("__nb"),
        avg(when(!isB, v)).as("__ma"), avg(when(isB, v)).as("__mb"),
        variance(when(!isB, v)).as("__va"), variance(when(isB, v)).as("__vb"))
    val sea = col("__va") / col("__na")
    val seb = col("__vb") / col("__nb")
    val t = (col("__ma") - col("__mb")) / sqrt(sea + seb)
    val dof = (sea + seb) * (sea + seb) /
      (sea * sea / (col("__na") - 1) + seb * seb / (col("__nb") - 1))
    agg.select(col("series"),
      col("__na").cast("long").as("n_a"), col("__nb").cast("long").as("n_b"),
      scoreOut(col("__ma")).as("mean_a"), scoreOut(col("__mb")).as("mean_b"),
      scoreOut(t).as("t_stat"), scoreOut(dof).as("df"),
      (abs(t) > 1.96).cast("int").as("significant_95"))
  }

  /** Cramér's V association between two categorical columns: the
    * contingency table is ONE hash aggregate, expected counts come from
    * agg-sized margin joins, χ² = Σ(o−e)²/e over observed cells plus the
    * zero-observed correction term (margins whose product the observed
    * sum misses: χ² gains Σe over EMPTY cells, computed as
    * n − Σ_observed e — no dense cell cross-join is ever materialized),
    * and V = √(χ²/(n·min(r−1,c−1))). The "are these two labels
    * redundant" screen before paying for both at 100 TB (the categorical
    * sibling of the q232 kappa check).
    *
    * Returns one row: (n, n_rows_cat, n_cols_cat, chi2, cramers_v). */
  def cramersV(df: DataFrame, aCol: String, bCol: String,
               scoreOut: Column => Column): DataFrame = {
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).cast("double").as("__o"))
      .persist()
    val ra = cells.groupBy("__a").agg(sum("__o").as("__ra"))
    val cb = cells.groupBy("__b").agg(sum("__o").as("__cb"))
    val tot = cells.agg(sum("__o").as("__n"),
      count_distinct(col("__a")).cast("double").as("__r"),
      count_distinct(col("__b")).cast("double").as("__c"))
    val scored = cells.join(ra, "__a").join(cb, "__b")
      .crossJoin(broadcast(tot))
      .select(col("__n"), col("__r"), col("__c"),
        (col("__ra") * col("__cb") / col("__n")).as("__e"), col("__o"))
    scored
      .groupBy("__n", "__r", "__c")
      .agg(sum((col("__o") - col("__e")) * (col("__o") - col("__e")) /
        col("__e")).as("__chiObs"),
        sum("__e").as("__eObs"))
      .select(col("__n").cast("long").as("n"),
        col("__r").cast("long").as("n_rows_cat"),
        col("__c").cast("long").as("n_cols_cat"),
        scoreOut(col("__chiObs") + (col("__n") - col("__eObs"))).as("chi2"),
        scoreOut(sqrt((col("__chiObs") + (col("__n") - col("__eObs"))) /
          (col("__n") * least(col("__r") - 1, col("__c") - 1))))
          .as("cramers_v"))
  }

  /** Tukey boxplot fences per group: q1/q3 by exact percentile (the
    * documented 100 TB swap is approx_percentile, same contract), fences
    * at q1 − k·IQR and q3 + k·IQR, and the count of rows beyond each —
    * the distribution-free outlier screen that complements [[madOutliers]]
    * (MAD assumes a symmetric center; the IQR fences don't). Quartiles
    * are `scoreOut`-rounded on BOTH engines before the fence arithmetic,
    * so the comparison boundary is bit-identical cross-engine.
    *
    * Scale shape: one group-keyed percentile aggregate, the group-sized
    * fence table broadcast back, one counting aggregate — no window.
    *
    * Returns (series, n, q1, q3, lo_fence, hi_fence, n_low, n_high). */
  def tukeyFences(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double, scoreOut: Column => Column): DataFrame = {
    val rows = df.select(col(groupCol).as("series"),
      col(valueCol).cast("double").as("__v"))
    val fences = rows.groupBy("series")
      .agg(percentile(col("__v"), array(lit(0.25), lit(0.75))).as("__q"))
      .select(col("series"), scoreOut(element_at(col("__q"), 1)).as("q1"),
        scoreOut(element_at(col("__q"), 2)).as("q3"))
      .select(col("series"), col("q1"), col("q3"),
        (col("q1") - lit(k) * (col("q3") - col("q1"))).as("lo_fence"),
        (col("q3") + lit(k) * (col("q3") - col("q1"))).as("hi_fence"))
    rows.join(broadcast(fences), "series")
      .groupBy("series", "q1", "q3", "lo_fence", "hi_fence")
      .agg(count(lit(1)).as("n"),
        count(when(col("__v") < col("lo_fence"), 1)).as("n_low"),
        count(when(col("__v") > col("hi_fence"), 1)).as("n_high"))
      .select(col("series"), col("n"), col("q1"), col("q3"),
        scoreOut(col("lo_fence")).as("lo_fence"),
        scoreOut(col("hi_fence")).as("hi_fence"),
        col("n_low"), col("n_high"))
  }

  /** Weibull fit of the inter-arrival gaps per series via the closed-form
    * log-moment (Menon '63) estimator: with ln-gap mean m and sample std
    * s,
    *
    *   shape k = (π/√6)/s,   scale λ = exp(m + γ/k)
    *
    * (γ = Euler–Mascheroni; ln of a Weibull is Gumbel-of-minima with
    * std π/(k√6) and mean ln λ − γ/k). Shape < 1 means bursty
    * (clustered arrivals, heavy tail), ≈ 1 Poisson-like, > 1 regular —
    * the parametric companion of [[graft.operators.EventOps.burstiness]]
    * that also yields a usable survival function for timeout tuning.
    * The MLE needs iteration; the log-moment form is one aggregate and
    * deterministic cross-engine.
    *
    * Scale shape: gaps are one series-partitioned lag window over the
    * (series-sorted) stream, the fit is one hash aggregate. Zero gaps
    * (same-timestamp events) are excluded from the log moments by
    * construction and reported in n_zero_gaps.
    *
    * Returns (series, n_gaps, n_zero_gaps, shape_k, scale_s,
    * mean_gap_s). */
  def weibullInterarrival(df: DataFrame, seriesCol: String, tsCol: String,
                          tiebreakCol: String,
                          scoreOut: Column => Column): DataFrame = {
    val gamma = 0.5772156649015329
    val w = Window.partitionBy(seriesCol).orderBy(col(tsCol), col(tiebreakCol))
    val gaps = df
      .withColumn("__g",
        (unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(w)))
          .cast("double") / lit(1e6))
      .filter(col("__g").isNotNull)
    gaps
      .groupBy(col(seriesCol).as("series"))
      .agg(count(when(col("__g") > 0, 1)).as("n_gaps"),
        count(when(col("__g") === 0, 1)).as("n_zero_gaps"),
        avg(when(col("__g") > 0, log(col("__g")))).as("__m"),
        stddev_samp(when(col("__g") > 0, log(col("__g")))).as("__s"),
        avg(when(col("__g") > 0, col("__g"))).as("__mg"))
      .select(col("series"), col("n_gaps"), col("n_zero_gaps"),
        scoreOut(lit(math.Pi / math.sqrt(6.0)) / col("__s")).as("shape_k"),
        scoreOut(exp(col("__m") +
          lit(gamma) / (lit(math.Pi / math.sqrt(6.0)) / col("__s"))))
          .as("scale_s"),
        scoreOut(col("__mg")).as("mean_gap_s"))
  }

  /** Isotonic calibration by Pool-Adjacent-Violators (PAVA; Barlow '72,
    * the fitter behind sklearn's IsotonicRegression) — the principled
    * completion of the calibration family: q228's fixed deciles report
    * the gap, this FITS the monotone map score → P(label) that closes
    * it. Scale shape: rows collapse map-side to the distinct ROUNDED
    * score support (the q237 bound — dec6 scores in [0,1] cap it at
    * 10⁶+1 rows regardless of corpus size), PAVA runs as one linear
    * stack pass over that support's collected array (a bounded single
    * row, same contract as the IVF centroid literals; past the bound,
    * swap in pooled-quantile binning first), and the fit explodes back
    * to support-sized output.
    *
    * Returns (score, n, obs_rate, iso_rate) with iso_rate monotone
    * non-decreasing in score and Σ n·iso_rate = Σ labels (the PAVA
    * mass-conservation invariant; IsotonicSpec pins both). */
  def isotonicCalibration(scored: DataFrame, scoreCol: String,
                          labelCol: String,
                          scoreOut: Column => Column): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, DoubleType, StructField, StructType}
    val byScore = scored
      .select(scoreOut(col(scoreCol).cast("double")).as("x"),
        col(labelCol).cast("double").as("y"))
      .groupBy("x").agg(count(lit(1)).as("n"), sum("y").as("s"))
    val collected = byScore
      .agg(sort_array(collect_list(struct(col("x"), col("n"), col("s"))))
        .as("arr"))
    val outSchema = StructType(Seq(
      StructField("arr", collected.schema("arr").dataType),
      StructField("fit", ArrayType(DoubleType))))
    val fitted = collected.mapPartitions { it =>
      it.map { r =>
        val arr = r.getSeq[Row](0)
        val m = arr.length
        // PAVA stack: (weight, sum, run-length) blocks; merge while the
        // previous block's mean exceeds the current's
        val w = new Array[Double](m); val v = new Array[Double](m)
        val runs = new Array[Int](m)
        var top = -1
        var i = 0
        while (i < m) {
          top += 1
          w(top) = arr(i).getLong(1).toDouble
          v(top) = arr(i).getDouble(2)
          runs(top) = 1
          while (top > 0 && v(top - 1) / w(top - 1) > v(top) / w(top)) {
            w(top - 1) += w(top); v(top - 1) += v(top)
            runs(top - 1) += runs(top); top -= 1
          }
          i += 1
        }
        val fit = new Array[Double](m)
        var j = 0; var b = 0
        while (b <= top) {
          val mean = v(b) / w(b)
          var k = 0
          while (k < runs(b)) { fit(j) = mean; j += 1; k += 1 }
          b += 1
        }
        Row(arr, fit)
      }
    }(Encoders.row(outSchema))
    fitted
      .select(explode(arrays_zip(col("arr"), col("fit"))).as("z"))
      .select(col("z.arr.x").as("score"), col("z.arr.n").as("n"),
        scoreOut(col("z.arr.s") / col("z.arr.n")).as("obs_rate"),
        scoreOut(col("z.fit")).as("iso_rate"))
  }

  /** Kruskal–Wallis H — the k-group extension of [[mannWhitneyU]] (one-way
    * ANOVA on ranks, no normality assumption): pooled midranks with ties,
    * H = 12/(N(N+1))·Σ R_g²/n_g − 3(N+1), tie-corrected by
    * 1 − Σ(t³−t)/(N³−N). Same scale shape as Mann-Whitney: midranks are a
    * pure function of cumulative counts over the DISTINCT-(value, group)
    * table, so the only partition-less window runs on the distinct-value
    * support, never on rows (the q171 allowlist bound; the continuous-
    * measure swap is pooled-quantile binning, q178/q179).
    *
    * Returns one row: (n_groups, n, h, h_corrected, df). */
  def kruskalWallis(df: DataFrame, groupCol: String, valueCol: String,
                    scoreOut: Column => Column): DataFrame = {
    val v = col(valueCol).cast("double")
    val byVG = df.select(col(groupCol).as("g"), v.as("x"))
      .groupBy("x", "g").agg(count(lit(1)).as("tg"))
    val byV = byVG.groupBy("x").agg(sum("tg").as("t"))
    val w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    val ranked = byV
      .withColumn("cum", sum("t").over(w))
      .withColumn("midrank", (col("cum") * 2 - col("t") + 1) / lit(2.0))
    val perG = byVG.join(ranked.select("x", "midrank"), "x")
      .groupBy("g")
      .agg(sum("tg").cast("double").as("ng"),
        sum(col("tg") * col("midrank")).as("rg"))
    val ties = ranked.agg(
      sum(col("t") * col("t") * col("t") - col("t")).cast("double").as("tie"))
    perG
      .agg(count(lit(1)).as("n_groups"),
        sum("ng").as("nn"),
        sum(col("rg") * col("rg") / col("ng")).as("sr"))
      .crossJoin(broadcast(ties))
      .select(col("n_groups"), col("nn").cast("long").as("n"),
        (lit(12.0) / (col("nn") * (col("nn") + 1)) * col("sr") -
          lit(3.0) * (col("nn") + 1)).as("__h"),
        (lit(1.0) - col("tie") /
          (col("nn") * col("nn") * col("nn") - col("nn"))).as("__c"),
        (col("n_groups") - 1).cast("int").as("df"))
      .select(col("n_groups"), col("n"), scoreOut(col("__h")).as("h"),
        scoreOut(col("__h") / col("__c")).as("h_corrected"), col("df"))
  }

  /** Spearman rank correlation per series PAIR over the shared hourly
    * grid — the monotone-association complement of the Pearson matrix
    * (q192): midranks are taken WITHIN each pair's joined sample (the
    * textbook-exact form when series have unequal coverage), over the
    * dec6-ROUNDED hourly means (rank-over-rounded: a last-ulp cross-
    * engine difference in an hourly avg cannot flip a rank), then
    * Pearson on the midranks via explicit moments — ranks are small
    * integers/halves, so the moment formula has no cancellation hazard.
    * Scale shape: the hour-keyed self-join is panel-bounded (pairs ×
    * hours); both rank windows partition by the PAIR.
    *
    * Returns (series_a, series_b, n_hours, rho). */
  def spearmanMatrix(events: DataFrame, seriesCol: String, tsCol: String,
                     valueCol: String, scoreOut: Column => Column): DataFrame = {
    val hourly = events
      .select(col(seriesCol), date_trunc("hour", col(tsCol)).as("h"),
        col(valueCol).cast("double").as("v"))
      .groupBy(seriesCol, "h").agg(scoreOut(avg("v")).as("y"))
    val a = hourly.select(col(seriesCol).as("series_a"), col("h"), col("y").as("ya"))
    val b = hourly.select(col(seriesCol).as("series_b"), col("h"), col("y").as("yb"))
    val joined = a.join(b, Seq("h")).filter(col("series_a") < col("series_b"))
    def midrank(c: Column): Column = {
      val wP = Window.partitionBy("series_a", "series_b").orderBy(c)
      val wT = Window.partitionBy(col("series_a"), col("series_b"), c)
      rank().over(wP) + (count(lit(1)).over(wT) - 1) / lit(2.0)
    }
    joined
      .select(col("series_a"), col("series_b"),
        midrank(col("ya")).as("ra"), midrank(col("yb")).as("rb"))
      .groupBy("series_a", "series_b")
      .agg(count(lit(1)).as("n_hours"),
        avg(col("ra") * col("rb")).as("mab"),
        avg("ra").as("ma"), avg("rb").as("mb"),
        avg(col("ra") * col("ra")).as("maa"),
        avg(col("rb") * col("rb")).as("mbb"))
      .select(col("series_a"), col("series_b"), col("n_hours"),
        scoreOut((col("mab") - col("ma") * col("mb")) /
          (sqrt(col("maa") - col("ma") * col("ma")) *
            sqrt(col("mbb") - col("mb") * col("mb")))).as("rho"))
  }

  /** Mann–Kendall monotone-trend test per series (the nonparametric
    * trend detector paired with Theil–Sen's slope, q182): over the DAILY
    * mean series (rounded dec6 so the cross-engine sign of every
    * difference is identical), S = Σ_{i<j} sign(x_j − x_i), tie-aware
    * variance Var(S) = [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18, and the
    * continuity-corrected z. τ-a = S / (n(n−1)/2). Scale shape: the pair
    * table is DAILY-GRID-bounded per series (days², grid metadata, never
    * events — the Theil–Sen contract), built by one self-join on the
    * series key.
    *
    * Returns (series, n_days, s, var_s, z, tau, trend ∈ {-1,0,1} at 95%). */
  def mannKendall(events: DataFrame, seriesCol: String, tsCol: String,
                  valueCol: String, scoreOut: Column => Column): DataFrame = {
    val daily = events
      .select(col(seriesCol).as("series"), to_date(col(tsCol)).as("d"),
        col(valueCol).cast("double").as("v"))
      .groupBy("series", "d").agg(scoreOut(avg("v")).as("y"))
      .persist()
    val pairs = daily.select(col("series"), col("d").as("d1"), col("y").as("y1"))
      .join(daily.select(col("series"), col("d").as("d2"), col("y").as("y2")),
        Seq("series"))
      .filter(col("d1") < col("d2"))
      .groupBy("series")
      .agg(sum(signum(col("y2") - col("y1"))).cast("double").as("s"))
    val ties = daily.groupBy("series", "y").agg(count(lit(1)).as("t"))
      .groupBy("series")
      .agg(sum("t").cast("double").as("n"),
        sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5))
          .cast("double").as("tsum"))
    pairs.join(ties, "series")
      .select(col("series"), col("n").cast("long").as("n_days"), col("s"),
        ((col("n") * (col("n") - 1) * (col("n") * 2 + 5) - col("tsum")) /
          lit(18.0)).as("__var"))
      .select(col("series"), col("n_days"), col("s").cast("long").as("s"),
        scoreOut(col("__var")).as("var_s"),
        scoreOut(
          when(col("s") > 0, (col("s") - 1) / sqrt(col("__var")))
            .when(col("s") < 0, (col("s") + 1) / sqrt(col("__var")))
            .otherwise(lit(0.0))).as("z"),
        scoreOut(col("s") / (col("n_days") * (col("n_days") - 1) / lit(2.0)))
          .as("tau"),
        (when(col("s") > 0, (col("s") - 1) / sqrt(col("__var")))
          .when(col("s") < 0, (col("s") + 1) / sqrt(col("__var")))
          .otherwise(lit(0.0)) > 1.96).cast("int")
          .minus((when(col("s") > 0, (col("s") - 1) / sqrt(col("__var")))
            .when(col("s") < 0, (col("s") + 1) / sqrt(col("__var")))
            .otherwise(lit(0.0)) < -1.96).cast("int")).as("trend"))
  }

  /** Jarque–Bera normality test per group: JB = n/6·(S² + K²/4) with S
    * the skewness and K the EXCESS kurtosis, χ²₂ under H₀ (95% cut
    * 5.991). The screen run before trusting any z-score detector — a
    * heavy-tailed measure makes q36-style flags fire constantly.
    *
    * Two-pass centered moments (group mean joined back before the
    * power sums): raw E[x⁴]-style expansion cancels ~8 leading digits
    * at value≈500 and crosses dec6 boundaries cross-engine (the q187
    * epoch-centering lesson). The mean table is group-sized, so AQE
    * broadcasts the join; S and K are ROUNDED before JB so the derived
    * statistic is pure arithmetic on rounded values (engine-identical).
    * Scale: two linear scans + one group-sized join — no window. */
  def jarqueBera(df: DataFrame, groupCol: String, valueCol: String,
                 scoreOut: Column => Column): DataFrame = {
    val v = col(valueCol).cast("double")
    val x = df.select(col(groupCol).as("series"), v.as("x"))
    val means = x.groupBy("series").agg(avg("x").as("__m"))
    val xc = x.join(means, "series").select(col("series"),
      (col("x") - col("__m")).as("c"))
    val agg = xc.groupBy("series").agg(
      count(lit(1)).cast("double").as("__n"),
      avg(col("c") * col("c")).as("__m2"),
      avg(col("c") * col("c") * col("c")).as("__m3"),
      avg(col("c") * col("c") * col("c") * col("c")).as("__m4"))
    val skew = scoreOut(col("__m3") / pow(col("__m2"), 1.5))
    val kurt = scoreOut(col("__m4") / (col("__m2") * col("__m2")) - 3.0)
    agg.select(col("series"), col("__n").cast("long").as("n"),
        skew.as("skewness"), kurt.as("kurtosis_excess"))
      .withColumn("jb", scoreOut(col("n") / lit(6.0) *
        (col("skewness") * col("skewness") +
          col("kurtosis_excess") * col("kurtosis_excess") / lit(4.0))))
      .withColumn("reject_normal_95", (col("jb") > 5.991).cast("int"))
  }

  /** One-way ANOVA F across groups — the parametric companion of
    * [[kruskalWallis]] (means instead of ranks): F = (SSB/(k−1)) /
    * (SSW/(N−k)), with η² = SSB/SST as the effect size.
    *
    * Values are centered by the GLOBAL mean first (a scalar-aggregate
    * crossjoin — translation-invariant algebra, kills the E[x²]−E[x]²
    * cancellation), then one hash aggregate per group (n, mean, Σc²)
    * and one aggregate over the group-sized table. Outputs are the MEAN
    * squares, not raw SSB/SSW: an O(10⁸) sum carries enough float-order
    * ulp noise to cross a dec6 boundary cross-engine, while MS (variance
    * scale) and the O(1) ratios are rounding-safe; F is arithmetic on
    * the ROUNDED mean squares. One row: (k, n, df1, df2, ms_between,
    * ms_within, f, eta_sq). */
  def onewayAnova(df: DataFrame, groupCol: String, valueCol: String,
                  scoreOut: Column => Column): DataFrame = {
    val v = col(valueCol).cast("double")
    val x = df.select(col(groupCol).as("g"), v.as("x"))
    val gm = x.agg(avg("x").as("__gm"))
    val per = x.crossJoin(gm)
      .select(col("g"), (col("x") - col("__gm")).as("c"))
      .groupBy("g").agg(count(lit(1)).cast("double").as("n"),
        avg("c").as("m"), sum(col("c") * col("c")).as("ss"))
    per.agg(count(lit(1)).as("k"), sum("n").as("nn"),
        sum(col("n") * col("m") * col("m")).as("__ssb"),
        sum(col("ss") - col("n") * col("m") * col("m")).as("__ssw"))
      .select(col("k"), col("nn").cast("long").as("n"),
        (col("k") - 1).cast("int").as("df1"),
        (col("nn") - col("k")).cast("long").as("df2"),
        scoreOut(col("__ssb") / (col("k") - 1)).as("ms_between"),
        scoreOut(col("__ssw") / (col("nn") - col("k"))).as("ms_within"),
        scoreOut(col("__ssb") / (col("__ssb") + col("__ssw"))).as("eta_sq"))
      .withColumn("f", scoreOut(col("ms_between") / col("ms_within")))
  }

  /** Brown–Forsythe equal-variance test: one-way ANOVA on the absolute
    * deviations from each group's MEDIAN (Levene's test with the robust
    * center — the recommended form when tails are unknown). The gate
    * run before pooling variances in a classic t-test; its failure is
    * what makes [[welchTTest]] the default.
    *
    * The per-group median is an exact interpolated percentile on a
    * group-sized table, ROUNDED before the deviation so every |x−med|
    * is engine-identical; the rest rides [[onewayAnova]]'s centered
    * machinery. Scale: medians are the documented approx_percentile
    * swap at 100 TB (q253 precedent). */
  def brownForsythe(df: DataFrame, groupCol: String, valueCol: String,
                    scoreOut: Column => Column): DataFrame = {
    val v = col(valueCol).cast("double")
    val x = df.select(col(groupCol).as("g"), v.as("x"))
    val med = x.groupBy("g")
      .agg(scoreOut(expr("percentile(x, 0.5)")).as("__med"))
    val z = x.join(med, "g").select(col("g"),
      abs(col("x") - col("__med")).as("z"))
    onewayAnova(z, "g", "z", scoreOut)
  }

  /** Upper-tail standard-normal probability P(X > x) for x ≥ 0, via the
    * Zelen–Severo polynomial (Abramowitz–Stegun 26.2.17, |ε| < 7.5e-8 —
    * well inside dec6 rounding). A plain column formula, so BOTH engines
    * can evaluate the IDENTICAL arithmetic — the trick that makes
    * p-values oracle-checkable without a native erf on the DuckDB side. */
  def normalUpperTail(x: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * x)
    val poly = t * (lit(0.319381530) + t * (lit(-0.356563782) +
      t * (lit(1.781477937) + t * (lit(-1.821255978) +
        t * lit(1.330274429)))))
    exp(-x * x / lit(2.0)) / lit(math.sqrt(2.0 * math.Pi)) * poly
  }

  /** Yule–Walker AR(2) fit per series over the hourly grid — the
    * lag-scan (q174 ACF) turned into a forecasting model: φ₁ =
    * r₁(1−r₂)/(1−r₁²), φ₂ = (r₂−r₁²)/(1−r₁²) from the biased
    * autocorrelations, plus the innovation-variance ratio
    * σ²/c₀ = 1 − φ₁r₁ − φ₂r₂ and the AR(2) stationarity-triangle flag.
    *
    * Grid discipline: events collapse to hourly means once (persisted);
    * centering joins the series-sized mean table back; each lag is an
    * equi-join on integer hour index (gap-robust — a missing hour
    * yields no phantom pair, the q164 lesson). r₁/r₂ are rounded before
    * the φ algebra so coefficients are arithmetic on rounded values.
    * All joins after the collapse touch grid metadata, never events. */
  /** One-step-ahead backtest of the [[yuleWalkerAr2]] fit vs the naive
    * x_{t−1} carry-forward — Hyndman's rule again (the q225 discipline):
    * never report a model without its naive skill. x̂_t = m + φ₁(x_{t−1}
    * −m) + φ₂(x_{t−2}−m) with the per-series mean and the φ's ROUNDED
    * before the forecast arithmetic; lags are the same gap-robust
    * integer-hour equi-joins the fit used, so a missing hour produces no
    * forecast instead of a silently misaligned one. Output is
    * series-sized: (series, n, mae_ar2, mae_naive, skill). */
  def ar2Backtest(events: DataFrame, seriesCol: String, tsCol: String,
                  valueCol: String, scoreOut: Column => Column): DataFrame = {
    val fit = yuleWalkerAr2(events, seriesCol, tsCol, valueCol, scoreOut)
      .select(col("series"), col("phi1"), col("phi2"))
    val hourly = events
      .select(col(seriesCol).as("series"),
        floor(unix_timestamp(date_trunc("hour", col(tsCol))) / 3600L).as("idx"),
        col(valueCol).cast("double").as("v"))
      .groupBy("series", "idx").agg(avg("v").as("y"))
      .persist()
    val means = hourly.groupBy("series").agg(scoreOut(avg("y")).as("m"))
    val l1 = hourly.select(col("series"), (col("idx") + 1).as("idx"),
      col("y").as("x1"))
    val l2 = hourly.select(col("series"), (col("idx") + 2).as("idx"),
      col("y").as("x2"))
    val xhat = col("m") + col("phi1") * (col("x1") - col("m")) +
      col("phi2") * (col("x2") - col("m"))
    hourly.join(l1, Seq("series", "idx")).join(l2, Seq("series", "idx"))
      .join(means, "series").join(fit, "series")
      .groupBy("series")
      .agg(count(lit(1)).as("n"),
        avg(abs(col("y") - xhat)).as("__ma"),
        avg(abs(col("y") - col("x1"))).as("__mn"))
      .select(col("series"), col("n"), scoreOut(col("__ma")).as("mae_ar2"),
        scoreOut(col("__mn")).as("mae_naive"),
        scoreOut(lit(1.0) - col("__ma") / col("__mn")).as("skill"))
  }

  def yuleWalkerAr2(events: DataFrame, seriesCol: String, tsCol: String,
                    valueCol: String, scoreOut: Column => Column): DataFrame = {
    val hourly = events
      .select(col(seriesCol).as("series"),
        floor(unix_timestamp(date_trunc("hour", col(tsCol))) / 3600L).as("idx"),
        col(valueCol).cast("double").as("v"))
      .groupBy("series", "idx").agg(avg("v").as("y"))
      .persist()
    val means = hourly.groupBy("series").agg(avg("y").as("__m"))
    val c = hourly.join(means, "series")
      .select(col("series"), col("idx"), (col("y") - col("__m")).as("c"))
      .persist()
    val c0 = c.groupBy("series")
      .agg(count(lit(1)).cast("long").as("n_hours"),
        sum(col("c") * col("c")).as("__c0"))
    def lagCov(l: Int) = c
      .join(c.select(col("series"), (col("idx") + l).as("idx"),
          col("c").as("cl")),
        Seq("series", "idx"))
      .groupBy("series").agg(sum(col("c") * col("cl")).as(s"__c$l"))
    val withR = c0.join(lagCov(1), "series").join(lagCov(2), "series")
      .select(col("series"), col("n_hours"),
        scoreOut(col("__c1") / col("__c0")).as("r1"),
        scoreOut(col("__c2") / col("__c0")).as("r2"))
    val den = lit(1.0) - col("r1") * col("r1")
    withR
      .withColumn("phi1", scoreOut(col("r1") * (lit(1.0) - col("r2")) / den))
      .withColumn("phi2", scoreOut((col("r2") - col("r1") * col("r1")) / den))
      .withColumn("innovation_ratio", scoreOut(lit(1.0) -
        col("phi1") * col("r1") - col("phi2") * col("r2")))
      .withColumn("stationary",
        (abs(col("phi2")) < 1 && col("phi1") + col("phi2") < 1 &&
          col("phi2") - col("phi1") < 1).cast("int"))
  }

  /** Ljung–Box portmanteau test per series: Q = n(n+2)·Σ_{k=1..h} ρ̂²_k/(n−k)
    * over the hourly-mean collapse, χ²_h under the white-noise H₀ — the
    * residual-diagnostics gate run AFTER any fit (q280 AR(2), q215
    * Holt-Winters): leftover autocorrelation means the model left signal
    * on the table. Box-Pierce without the (n+2)/(n−k) correction is
    * anti-conservative at these n; Ljung's correction is the standard.
    *
    * Each ρ̂_k is the gap-robust lag-k autocovariance via an integer-hour
    * equi-join on the persisted hourly collapse (the q174/q280 machinery —
    * a missing hour drops the pair instead of pairing wrong neighbors),
    * normalized by the global Σc² and ROUNDED before the Q sum so the
    * derived statistic is pure arithmetic on rounded values. Scale: one
    * hourly hash agg + h agg-sized self-joins on (series, idx) — the
    * hourly table is grid-sized, never the raw event stream. */
  def ljungBox(events: DataFrame, seriesCol: String, tsCol: String,
               valueCol: String, maxLag: Int, crit: Double,
               scoreOut: Column => Column): DataFrame = {
    require(maxLag >= 1, s"need at least one lag, got $maxLag")
    val hourly = events
      .select(col(seriesCol).as("series"),
        floor(unix_timestamp(date_trunc("hour", col(tsCol))) / 3600L).as("idx"),
        col(valueCol).cast("double").as("v"))
      .groupBy("series", "idx").agg(avg("v").as("y"))
      .persist()
    val means = hourly.groupBy("series").agg(avg("y").as("__m"))
    val c = hourly.join(means, "series")
      .select(col("series"), col("idx"), (col("y") - col("__m")).as("c"))
      .persist()
    val c0 = c.groupBy("series")
      .agg(count(lit(1)).cast("long").as("n_hours"),
        sum(col("c") * col("c")).as("__c0"))
    def rho(k: Int) = c
      .join(c.select(col("series"), (col("idx") + k).as("idx"),
          col("c").as("cl")),
        Seq("series", "idx"))
      .groupBy("series").agg(sum(col("c") * col("cl")).as(s"__ck$k"))
    val withR = (1 to maxLag).foldLeft(c0)((acc, k) => acc.join(rho(k), "series"))
    val rks = (1 to maxLag).map(k => scoreOut(col(s"__ck$k") / col("__c0")))
    val n = col("n_hours").cast("double")
    val qStat = rks.zipWithIndex.map { case (r, i) =>
      r * r / (n - lit((i + 1).toDouble))
    }.reduce(_ + _) * n * (n + lit(2.0))
    withR.select(col("series"), col("n_hours"),
      scoreOut(qStat).as("q_lb"), lit(maxLag).as("df"),
      (scoreOut(qStat) <= crit).cast("int").as("white_noise"))
  }

  /** Durbin–Watson first-order residual autocorrelation per series:
    * DW = Σ(e_t − e_{t−1})² / Σe_t² over the residuals of the per-series
    * OLS time trend (the q187 fit) on the hourly-mean collapse — DW ≈
    * 2(1−ρ₁), so < 1.5 flags positive autocorrelation (trend-fit standard
    * errors are lies) and > 2.5 negative. The regression-residual
    * complement of [[ljungBox]]'s raw-series portmanteau.
    *
    * The trend is fit on the CENTERED hour index (the q187
    * epoch-cancellation lesson) and (slope, mean) are ROUNDED before the
    * residuals, so e_t is identical arithmetic on identical doubles in
    * both engines. Adjacent pairs come from the idx+1 equi-join — a gap
    * hour drops the pair rather than differencing across it. Scale: one
    * hourly hash agg, one moment agg, one agg-sized self-join. */
  def durbinWatson(events: DataFrame, seriesCol: String, tsCol: String,
                   valueCol: String, scoreOut: Column => Column): DataFrame = {
    val hourly = events
      .select(col(seriesCol).as("series"),
        floor(unix_timestamp(date_trunc("hour", col(tsCol))) / 3600L).as("idx"),
        col(valueCol).cast("double").as("v"))
      .groupBy("series", "idx").agg(avg("v").as("y"))
      .persist()
    val fit = hourly.groupBy("series")
      .agg(count(lit(1)).cast("long").as("n_hours"),
        avg("idx").as("__mi"), avg("y").as("__my"),
        avg(col("idx") * col("y")).as("__mxy"),
        avg(col("idx") * col("idx")).as("__mxx"))
      .select(col("series"), col("n_hours"),
        col("__mi"), scoreOut(col("__my")).as("__b0"),
        scoreOut((col("__mxy") - col("__mi") * col("__my")) /
          (col("__mxx") - col("__mi") * col("__mi"))).as("__b1"))
    val resid = hourly.join(fit, "series")
      .select(col("series"), col("idx"), col("n_hours"),
        (col("y") - (col("__b0") + col("__b1") * (col("idx") - col("__mi"))))
          .as("e"))
      .persist()
    val den = resid.groupBy("series")
      .agg(first("n_hours").as("n_hours"), sum(col("e") * col("e")).as("__ss"))
    val num = resid
      .join(resid.select(col("series"), (col("idx") + 1).as("idx"),
          col("e").as("ep")),
        Seq("series", "idx"))
      .groupBy("series")
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum((col("e") - col("ep")) * (col("e") - col("ep"))).as("__sd"))
    den.join(num, "series")
      .select(col("series"), col("n_hours"), col("n_pairs"),
        scoreOut(col("__sd") / col("__ss")).as("dw"),
        scoreOut(lit(1.0) - col("__sd") / col("__ss") / lit(2.0)).as("rho1"),
        (col("__sd") / col("__ss") < 1.5).cast("int").as("positive_autocorr"))
  }

  /** Wald–Wolfowitz runs test per series on the SIGNS of the one-step
    * hourly diffs: randomness of up/down moves, the sign-level complement
    * of [[durbinWatson]]'s magnitude-level ρ₁. Zero diffs are dropped
    * (the classical reduction), then R = 1 + #sign-changes over the
    * remaining sequence; under H₀, R ~ N(μ, σ²) with
    * μ = 2·n₊·n₋/(n₊+n₋) + 1 and the standard variance. Too few runs ⇒
    * trending; too many ⇒ mean-reverting.
    *
    * Scale: one hourly hash agg, two per-series window passes (diff,
    * then adjacent-sign change over the zero-filtered sequence), one
    * series-keyed aggregate. Returns (series, n_plus, n_minus, runs,
    * z_runs, random at |z| ≤ 1.96). */
  def runsTest(events: DataFrame, seriesCol: String, tsCol: String,
               valueCol: String, scoreOut: Column => Column): DataFrame = {
    val hourly = events
      .select(col(seriesCol).as("series"),
        date_trunc("hour", col(tsCol)).as("h"),
        col(valueCol).cast("double").as("v"))
      .groupBy("series", "h").agg(avg("v").as("y"))
    val ws = Window.partitionBy("series").orderBy("h")
    val signs = hourly
      .withColumn("__d", col("y") - lag("y", 1).over(ws))
      .filter(col("__d") =!= 0.0) // drops nulls (first row) and ties
      .withColumn("__s", when(col("__d") > 0, 1).otherwise(-1))
      .withColumn("__chg",
        (col("__s") =!= lag("__s", 1).over(ws)).cast("int"))
    val agg = signs.groupBy("series").agg(
      sum(when(col("__s") === 1, 1L).otherwise(0L)).as("n_plus"),
      sum(when(col("__s") === -1, 1L).otherwise(0L)).as("n_minus"),
      (coalesce(sum("__chg"), lit(0L)) + lit(1L)).as("runs"))
    val n1 = col("n_plus").cast("double"); val n2 = col("n_minus").cast("double")
    val nn = n1 + n2
    val mu = lit(2.0) * n1 * n2 / nn + lit(1.0)
    val v2 = (lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - nn)) /
      (nn * nn * (nn - lit(1.0)))
    val z = (col("runs").cast("double") - mu) / sqrt(v2)
    // nn > 2 also excludes the (1, 1) degenerate where the variance is
    // exactly 0 (z would be Inf on Spark, NULL in a replaying engine)
    agg.filter(col("n_plus") >= 1 && col("n_minus") >= 1 && nn > 2)
      .select(col("series"), col("n_plus"), col("n_minus"), col("runs"),
        scoreOut(z).as("z_runs"),
        (abs(scoreOut(z)) <= 1.96).cast("int").as("random"))
  }

  /** Anderson–Darling test for EXPONENTIALITY of inter-arrival gaps per
    * series — "are arrivals Poisson?", the distribution-shape upgrade of
    * q261's Weibull moment fit. With F(x) = 1 − e^{−x/mean} and the
    * one-sided identity A² = −n − (1/n)·Σᵢ[(2i−1)·ln F(xᵢ) +
    * (2(n−i)+1)·ln(1−F(xᵢ))] over the ASCENDING order statistics, the
    * n+1−i pairing folds away, so one rank pass + one aggregate suffices
    * (no self-join). The Stephens small-sample correction for the
    * estimated-mean case scales by (1 + 0.6/n); reject at the 5% point
    * 1.341 (d'Agostino & Stephens table 4.14).
    *
    * Zero gaps (duplicate timestamps) are dropped — F(0) = 0 would send
    * ln F to −∞. The gap mean is ROUNDED before F so both engines
    * exponentiate identical doubles. Scale: per-series window diff +
    * rank, then one aggregate; the rank is per-series (long-layout, no
    * global sort). */
  def adExponentiality(events: DataFrame, seriesCol: String, tsCol: String,
                       scoreOut: Column => Column): DataFrame = {
    val ws = Window.partitionBy("series").orderBy("ts")
    val gaps = events
      .select(col(seriesCol).as("series"), col(tsCol).as("ts"))
      // timestamp→double keeps sub-second precision (micros/1e6), the
      // same value DuckDB's epoch() reports — unix_timestamp would floor
      // to whole seconds and disagree on sub-second arrivals
      .withColumn("__gap",
        col("ts").cast("double") - lag("ts", 1).over(ws).cast("double"))
      .filter(col("__gap") > 0)
    val withMean = gaps
      .join(gaps.groupBy("series").agg(
          count(lit(1)).cast("long").as("n_gaps"),
          avg("__gap").as("__mg")), "series")
      .withColumn("__m", scoreOut(col("__mg")))
    val wr = Window.partitionBy("series").orderBy("__gap", "ts")
    val ranked = withMean
      .withColumn("__i", row_number().over(wr).cast("double"))
      // clamp: a gap hundreds of means out underflows exp to 0 and sends
      // ln(1−F) to −∞; pin F strictly inside (0,1) — mirrored in oracles
      .withColumn("__z", least(lit(1.0) - lit(1e-15),
        lit(1.0) - exp(-col("__gap") / col("__m"))))
    val n = col("n_gaps").cast("double")
    val term = (lit(2.0) * col("__i") - lit(1.0)) * log(col("__z")) +
      (lit(2.0) * (n - col("__i")) + lit(1.0)) * log(lit(1.0) - col("__z"))
    ranked.groupBy("series")
      .agg(first("n_gaps").as("n_gaps"), first("__m").as("mean_gap_s"),
        (-first(n) - sum(term) / first(n)).as("__a2"))
      .select(col("series"), col("n_gaps"), col("mean_gap_s"),
        scoreOut(col("__a2")).as("a2"),
        scoreOut(col("__a2") * (lit(1.0) + lit(0.6) / col("n_gaps"))).as("a2_mod"),
        (scoreOut(col("__a2") * (lit(1.0) + lit(0.6) / col("n_gaps"))) >
          1.341).cast("int").as("reject_exponential"))
  }

  /** Cliff's delta effect size for every series pair: δ = P(a > b) −
    * P(a < b), the scale-free ordinal effect the Mann-Whitney p-value
    * (q171) doesn't report — at gate/production n, EVERYTHING is
    * "significant"; δ says whether anyone should care. Computed from
    * midranks, never the O(n·m) pairwise matrix: with R₁ the rank-sum of
    * group a in the combined ordering, U₁ = R₁ − n₁(n₁+1)/2 counts
    * a-over-b pairs (ties half) and δ = 2U₁/(n₁n₂) − 1. |δ| bands:
    * negligible < 0.147 ≤ small < 0.33 ≤ medium < 0.474 ≤ large
    * (Romano et al. 2006).
    *
    * One midrank pass per pair member via a shared rank table: rank the
    * POOLED column once (rank partitioned by nothing would be a global
    * sort — instead ranks are per-PAIR over the pair's union, built from
    * a pair-exploded table keyed (pair, group), so the sort is
    * per-partition-group). Pairs are the k² series combinations of a
    * BOUNDED series universe (event types — dozens, not data-sized).
    *
    * Scale note: each (pair) window group still holds BOTH member
    * series' rows in one task — fine while a series pair fits an
    * executor, the same contract as q171. Past that, compute U from the
    * POOLED-QUANTILE-BINNED midranks instead (the q179 machinery —
    * bins-sized rank table) and transform: δ = 2U/(n₁n₂) − 1 holds
    * unchanged on binned midranks, at binning resolution. */
  def cliffsDelta(events: DataFrame, seriesCol: String, valueCol: String,
                  scoreOut: Column => Column): DataFrame = {
    val base = events.select(col(seriesCol).as("g"),
      col(valueCol).cast("double").as("v")).filter(col("v").isNotNull)
    val pairs = base.select(col("g").as("ga")).distinct()
      .crossJoin(base.select(col("g").as("gb")).distinct())
      .filter(col("ga") < col("gb"))
    // explode each row into every pair its group participates in:
    // row volume = n_rows × (k−1), the same blow-up the pairwise rank
    // tests (q178/q179) accept for a bounded k
    val tagged = base.join(pairs, col("g") === col("ga") || col("g") === col("gb"))
      .select(col("ga"), col("gb"), col("g"), col("v"))
    val wr = Window.partitionBy("ga", "gb").orderBy("v")
    val ranked = tagged
      .withColumn("__rk", rank().over(wr).cast("double"))
      .withColumn("__cnt", count(lit(1)).over(
        Window.partitionBy("ga", "gb", "v")).cast("double"))
      .withColumn("__mid", col("__rk") + (col("__cnt") - lit(1.0)) / lit(2.0))
    ranked.groupBy("ga", "gb")
      .agg(
        sum(when(col("g") === col("ga"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("g") === col("gb"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("g") === col("ga"), col("__mid"))).as("__r1"))
      .select(col("ga").as("series_a"), col("gb").as("series_b"),
        col("n_a"), col("n_b"), {
          val n1 = col("n_a").cast("double"); val n2 = col("n_b").cast("double")
          val u1 = col("__r1") - n1 * (n1 + lit(1.0)) / lit(2.0)
          val delta = lit(2.0) * u1 / (n1 * n2) - lit(1.0)
          scoreOut(delta).as("cliffs_delta")
        })
      .withColumn("magnitude",
        when(abs(col("cliffs_delta")) < 0.147, "negligible")
          .when(abs(col("cliffs_delta")) < 0.33, "small")
          .when(abs(col("cliffs_delta")) < 0.474, "medium")
          .otherwise("large"))
  }

  /** Negative-binomial overdispersion diagnostic for daily event counts
    * per series: a Poisson model (q332's naive assumption everywhere
    * counts are modeled) demands variance ≈ mean; real event streams are
    * overdispersed (bursts, weekly cycles). Reports the dispersion index
    * v/m, the method-of-moments NB size k̂ = m²/(v − m) (NULL when the
    * data is UNDER-dispersed — no NB exists there), and the
    * Wilson-Hilferty normal approximation of the χ² dispersion test:
    * z = √(2χ²) − √(2·df − 1) with χ² = (n−1)·v_samp/m. The flag is
    * ONE-SIDED (z > 1.96): an under-dispersed series also rejects
    * equidispersion, but it is not NB territory.
    *
    * One calendar collapse + one moment aggregate; moments are ROUNDED
    * before the derived statistics (the ljungBox discipline).
    * Returns (series, n_days, mean_daily, var_daily, dispersion, k_hat,
    * z_disp, overdispersed). */
  def negbinOverdispersion(events: DataFrame, seriesCol: String,
                           tsCol: String,
                           scoreOut: Column => Column): DataFrame = {
    val daily = events
      .select(col(seriesCol).as("series"), to_date(col(tsCol)).as("day"))
      .groupBy("series", "day").agg(count(lit(1)).cast("double").as("c"))
    val m = daily.groupBy("series").agg(
      count(lit(1)).cast("long").as("n_days"),
      scoreOut(avg("c")).as("mean_daily"),
      scoreOut(avg(col("c") * col("c"))).as("__m2"))
    val v = scoreOut(col("__m2") - col("mean_daily") * col("mean_daily"))
    val n = col("n_days").cast("double")
    // sample variance from the population moments: v_samp = n/(n−1) · v_pop
    val chi2 = (n - lit(1.0)) * (n / (n - lit(1.0)) * v) / col("mean_daily")
    val z = sqrt(lit(2.0) * chi2) - sqrt(lit(2.0) * (n - lit(1.0)) - lit(1.0))
    m.filter(col("n_days") >= 3 && col("mean_daily") > 0)
      .withColumn("var_daily", v)
      .select(col("series"), col("n_days"), col("mean_daily"),
        col("var_daily"),
        scoreOut(col("var_daily") / col("mean_daily")).as("dispersion"),
        scoreOut(when(col("var_daily") > col("mean_daily"),
          col("mean_daily") * col("mean_daily") /
            (col("var_daily") - col("mean_daily")))).as("k_hat"),
        scoreOut(z).as("z_disp"),
        (scoreOut(z) > 1.96).cast("int").as("overdispersed"))
  }

  /** Log-rank test between two survival cohorts (Mantel '66) — "do the
    * curves differ", the hypothesis test q158's Kaplan-Meier plot only
    * eyeballs. Input is subject-level (group, duration, event∈{0,1});
    * at each distinct EVENT time t: nᵍ(t) subjects still at risk,
    * dᵍ(t) events; O_a = Σd_a, E_a = Σ d·n_a/n, V = Σ d·(n_a/n)·
    * (1−n_a/n)·(n−d)/(n−1) (hypergeometric), z = (O_a − E_a)/√V.
    * Cohort "a" is the lexicographically smaller group label.
    *
    * The at-risk table is built WITHOUT any non-equi join: one
    * per-duration aggregate collapses subjects to (t, c_a, c_all, d_a,
    * d_t) — distinct-duration-sized, calendar-bounded because durations
    * arrive pre-rounded to days/hours by the caller — then a
    * from-the-right cumulative window (sum over t' ≥ t, descending
    * order) recovers the at-risk counts n_a(t), n(t). Subjects are
    * scanned twice (once for the collapse, once for the group counts)
    * and never pairwise: O(n) scan + a #durations-sized global window,
    * vs the previous subjects × event-times broadcast join whose
    * intermediate was O(n·T). Returns one row:
    * (group_a, group_b, n_a, n_b, o_a, e_a, v_lr, z_logrank, curves_differ). */
  def logRankTest(subjects: DataFrame, groupCol: String, durationCol: String,
                  eventCol: String, scoreOut: Column => Column): DataFrame = {
    val base = subjects.select(col(groupCol).as("g"),
        col(durationCol).cast("double").as("t"),
        col(eventCol).cast("int").as("e"))
      .filter(col("t").isNotNull)
      .persist()
    val ga = base.select("g").distinct()
      .agg(min("g").as("ga"), max("g").as("gb"))
    // rows outside {ga, gb} (a 3rd group) are excluded, never silently
    // pooled into the at-risk sets
    val ab = base.crossJoin(broadcast(ga))
      .filter(col("g") === col("ga") || col("g") === col("gb"))
      .persist()
    val perT = ab.groupBy("t").agg(
      sum(when(col("g") === col("ga"), 1L).otherwise(0L)).as("c_a"),
      count(lit(1)).as("c_all"),
      sum(when(col("g") === col("ga") && col("e") === 1, 1L)
        .otherwise(0L)).as("d_a_t"),
      sum(when(col("e") === 1, 1L).otherwise(0L)).as("d_t"))
    // n(t) = #subjects with duration >= t: cumulative sum over the
    // duration-DESCENDING order of the distinct-duration table (global
    // window, but its input is the calendar-bounded collapse, not rows)
    val wGe = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val atRisk = perT
      .withColumn("n_a_t", sum("c_a").over(wGe))
      .withColumn("n_t", sum("c_all").over(wGe))
      .filter(col("d_t") > 0 && col("n_t") > 1)
      .select(col("t").as("et"), col("n_a_t"), col("n_t"),
        col("d_a_t"), col("d_t"))
    val na = col("n_a_t").cast("double"); val nt = col("n_t").cast("double")
    val dt = col("d_t").cast("double")
    val terms = atRisk.agg(
      sum(col("d_a_t")).cast("double").as("o_a"),
      sum(dt * na / nt).as("e_a"),
      sum(dt * (na / nt) * (lit(1.0) - na / nt) *
        (nt - dt) / (nt - lit(1.0))).as("v_lr"))
    val counts = ab.agg(
      first("ga").as("group_a"), first("gb").as("group_b"),
      sum(when(col("g") === col("ga"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("g") === col("gb"), 1L).otherwise(0L)).as("n_b"))
    val z = (col("o_a") - col("e_a")) / sqrt(col("v_lr"))
    counts.crossJoin(terms)
      .filter(col("v_lr") > 0)
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        col("o_a").cast("long").as("o_a"), scoreOut(col("e_a")).as("e_a"),
        scoreOut(col("v_lr")).as("v_lr"), scoreOut(z).as("z_logrank"),
        (abs(scoreOut(z)) > 1.96).cast("int").as("curves_differ"))
  }

  /** Cox proportional-hazards regression, single covariate, Breslow tie
    * convention (Cox '72; Breslow '74): Newton-Raphson on the partial
    * likelihood. Per iteration the risk-set sums S_k(t) = Σ_{t_j ≥ t}
    * x_j^k·exp(βx_j) (k = 0, 1, 2) come from ONE per-duration collapse
    * followed by the q332 from-the-right cumulative window — O(n) scan +
    * a #durations-sized global window per step, never a subjects×times
    * join — then the score U = Σ_events [x̄_t·d_t subtracted] and
    * information I reduce to one scalar aggregate. β is carried between
    * steps as a 1-row frame (scalar-aggregate crossjoin — no driver
    * collect), rounded to 6 decimals per step so any replaying engine
    * walks the identical trajectory (the q325 Newton contract).
    *
    * Returns one row: (n, n_events, beta, hazard_ratio, se_beta,
    * z_wald, log_lik) — log_lik is the Breslow partial log-likelihood
    * at the final β. Durations should arrive pre-rounded (days/hours)
    * so the per-duration collapse is calendar-bounded. */
  def coxPh(subjects: DataFrame, durationCol: String, eventCol: String,
            xCol: String, iters: Int, scoreOut: Column => Column): DataFrame = {
    require(iters >= 1 && iters <= 8, s"1 <= iters <= 8, got $iters")
    val base = subjects.select(
        col(durationCol).cast("double").as("t"),
        col(eventCol).cast("int").as("e"),
        col(xCol).cast("double").as("x"))
      .filter(col("t").isNotNull && col("x").isNotNull)
      .persist()
    val wGe = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def riskSets(beta: DataFrame): DataFrame = {
      val ex = exp(col("b") * col("x"))
      base.crossJoin(broadcast(beta))
        .groupBy("t")
        .agg(first("b").as("b"),
          sum(ex).as("c0"),
          sum(col("x") * ex).as("c1"),
          sum(col("x") * col("x") * ex).as("c2"),
          sum(col("e")).cast("double").as("d"),
          sum(when(col("e") === 1, col("x")).otherwise(lit(0.0))).as("dx"))
        .withColumn("s0", sum("c0").over(wGe))
        .withColumn("s1", sum("c1").over(wGe))
        .withColumn("s2", sum("c2").over(wGe))
        .filter(col("d") > 0)
    }
    // init as a grouping-free AGGREGATE (provably 1 row), not a bare
    // LocalRelation projection — the broadcast-side structural bound
    // every lint (and reader) can see
    var beta = subjects.sparkSession.range(1).agg(min(lit(0.0)).as("b"))
    for (_ <- 1 to iters) {
      // degenerate-information guard (constant covariate, all-tied
      // durations): I = 0 would drive β to NaN — hold β instead
      beta = riskSets(beta).agg(
          first("b").as("pb"),
          sum(col("dx") - col("d") * col("s1") / col("s0")).as("u"),
          sum(col("d") * (col("s2") / col("s0") -
            (col("s1") / col("s0")) * (col("s1") / col("s0")))).as("inf"))
        .select(scoreOut(when(col("inf") > 0,
          col("pb") + col("u") / col("inf")).otherwise(col("pb"))).as("b"))
    }
    val fin = riskSets(beta).agg(
      first("b").as("b"),
      sum(col("d") * (col("s2") / col("s0") -
        (col("s1") / col("s0")) * (col("s1") / col("s0")))).as("inf"),
      sum(col("dx")).as("sdx"),
      sum(col("d") * log(col("s0"))).as("dls0"))
    val counts = base.agg(count(lit(1)).as("n"),
      sum(col("e")).cast("long").as("n_events"))
    counts.crossJoin(broadcast(fin))
      .select(col("n"), col("n_events"),
        col("b").as("beta"),
        scoreOut(exp(col("b"))).as("hazard_ratio"),
        scoreOut(when(col("inf") > 0, lit(1.0) / sqrt(col("inf"))))
          .as("se_beta"),
        scoreOut(when(col("inf") > 0, col("b") * sqrt(col("inf"))))
          .as("z_wald"),
        scoreOut(col("b") * col("sdx") - col("dls0")).as("log_lik"))
  }

  /** HBOS — histogram-based outlier score (Goldstein & Dengel '12): per
    * feature, an equal-width histogram over the [rounded min, rounded
    * max] span; an event's score is Σ_f log₁₀(maxcount_f / count_f(bin))
    * — tall bins score 0, empty tails score high. The O(n) unsupervised
    * scorer beside the model-based detectors (q36 z-score, q157 MAD,
    * q231 grid): no distances, no windows, embarrassingly parallel.
    *
    * Features arrive MELTED (id, feature, x) so the histogram pass is
    * one hash aggregate over features × bins cells; the score join is
    * feature×bins-sized (broadcast) against the melted stream. Bin
    * edges derive from ROUNDED min/max, so binning replays identically
    * in any engine. Constant features (width 0) are skipped. Returns
    * the top-`k` (id, n_features, hbos) by rounded score, id tiebreak. */
  def hbos(melted: DataFrame, idCol: String, featureCol: String,
           valueCol: String, nBins: Int, k: Int,
           scoreOut: Column => Column): DataFrame = {
    require(nBins >= 2 && nBins <= 1000, s"2 <= nBins <= 1000, got $nBins")
    val base = melted.select(col(idCol).as("id"),
        col(featureCol).as("f"), col(valueCol).cast("double").as("x"))
      .filter(col("x").isNotNull)
      .persist()
    val span = base.groupBy("f").agg(
        scoreOut(min("x")).as("mn"), scoreOut(max("x")).as("mx"))
      .filter(col("mx") > col("mn"))
      .withColumn("w", (col("mx") - col("mn")) / lit(nBins.toDouble))
    val binned = base.join(broadcast(span), "f")
      .withColumn("b", greatest(lit(0L), least(lit(nBins - 1L),
        floor((col("x") - col("mn")) / col("w")))))
    val hist = binned.groupBy("f", "b").agg(count(lit(1)).as("c"))
      .withColumn("maxc", max("c").over(Window.partitionBy("f")))
    binned.select(col("id"), col("f"), col("b"))
      .join(broadcast(hist), Seq("f", "b"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_features"),
        sum(log(col("maxc").cast("double") / col("c")) / log(lit(10.0)))
          .as("__s"))
      .select(col("id"), col("n_features"), scoreOut(col("__s")).as("hbos"))
      .orderBy(col("hbos").desc, col("id"))
      .limit(k)
  }

  /** Mutual information between series pairs over their aligned hourly
    * activity, with each series discretized into `bins` equal-frequency
    * levels (quartiles by default): MI = Σ p(a,b)·log₂(p(a,b)/(p(a)p(b)))
    * — the dependence measure that sees what q192's Pearson and q273's
    * Spearman cannot (non-monotone coupling). Discretization via ntile
    * per series (a per-series window — long-layout); the joint table is
    * hours-sized, the MI fold is bins²-sized per pair.
    *
    * Returns (series_a, series_b, n_hours, mi_bits, nmi) with
    * nmi = MI/log₂(bins) ∈ [0,1]. */
  def mutualInfoMatrix(events: DataFrame, seriesCol: String, tsCol: String,
                       valueCol: String, bins: Int,
                       scoreOut: Column => Column): DataFrame = {
    require(bins >= 2 && bins <= 32, s"2 <= bins <= 32, got $bins")
    val hourly = events
      .select(col(seriesCol).as("s"),
        date_trunc("hour", col(tsCol)).as("h"),
        col(valueCol).cast("double").as("v"))
      // the hourly mean is ROUNDED before it becomes a SORT KEY: two
      // near-tied means could otherwise order differently across engines
      // (sum-association ulp) and flip an ntile boundary
      .groupBy("s", "h").agg(scoreOut(avg("v")).as("y"))
    val lev = hourly.withColumn("q",
      ntile(bins).over(Window.partitionBy("s").orderBy("y", "h")))
    val joint = lev.select(col("s").as("sa"), col("h"), col("q").as("qa"))
      .join(lev.select(col("s").as("sb"), col("h"), col("q").as("qb")),
        Seq("h"))
      .filter(col("sa") < col("sb"))
      .groupBy("sa", "sb", "qa", "qb")
      .agg(count(lit(1)).cast("double").as("nab"))
      .persist()
    val tot = joint.groupBy("sa", "sb").agg(sum("nab").as("nt"))
    val ma = joint.groupBy("sa", "sb", "qa").agg(sum("nab").as("na"))
    val mb = joint.groupBy("sa", "sb", "qb").agg(sum("nab").as("nb"))
    joint.join(tot, Seq("sa", "sb"))
      .join(ma, Seq("sa", "sb", "qa"))
      .join(mb, Seq("sa", "sb", "qb"))
      .groupBy(col("sa").as("series_a"), col("sb").as("series_b"))
      .agg(max(col("nt")).cast("long").as("n_hours"),
        sum((col("nab") / col("nt")) *
          log(col("nab") * col("nt") / (col("na") * col("nb"))) /
          log(lit(2.0))).as("__mi"))
      .select(col("series_a"), col("series_b"), col("n_hours"),
        scoreOut(col("__mi")).as("mi_bits"),
        scoreOut(col("__mi") / (log(lit(bins.toDouble)) / log(lit(2.0))))
          .as("nmi"))
  }
}
