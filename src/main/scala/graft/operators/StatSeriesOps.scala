package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Series/survival half of [[StatOps]] (round-12 file hygiene — the
  * object's public surface is unchanged): temporal diagnostics (ACF-
  * family, runs, trend, overdispersion), interarrival/extreme-value
  * fits, and the survival pair (log-rank, Cox PH). Mix in via
  * `object StatOps`. */
trait StatSeriesOps {
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
