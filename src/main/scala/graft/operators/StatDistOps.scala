package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-shaped half of [[StatOps]] (round-12 file hygiene —
  * the object's public surface is unchanged): two-sample and k-sample
  * tests, drift distances, categorical association, robust fences,
  * calibration and ranking metrics. Mix in via `object StatOps`. */
trait StatDistOps {
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
    // spread the narrow scan: both exact-percentile partial aggregates
    // (med, then MAD over absdev) otherwise buffer the full table in ONE
    // task (profiled 2×3.2 s single-task broadcast builds at sf0.1).
    // Exact percentile is a pure function of the value multiset, so the
    // result is partitioning-independent.
    val base = Spread.ifNarrow(events.select(col(seriesCol), v.as("v"))).persist()
    val med = base.groupBy(seriesCol)
      .agg(expr("percentile(v, 0.5)").as("med"))
    val withMed = base.join(med, Seq(seriesCol))
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
}
