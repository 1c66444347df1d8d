package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{FinanceOps, RegressionOps, StatOps}
import graft.queries.Q.dec6

/** Closed-form fixtures for the finance indicators (q312-q314), the
  * nonparametric additions (q315-q317) and the sufficient-statistics
  * regression family (q318-q321): each test replays the published
  * formula by hand on a tiny series and pins the operator to it. */
class FinanceRegressionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = Timestamp.valueOf(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00")

  private def series(vs: Double*) =
    vs.zipWithIndex.map { case (v, i) => ("s", ts(i), v) }.toDF("g", "t", "v")

  test("max drawdown: peak 6 to trough 2 on a hand series, earliest trough wins ties") {
    val r = FinanceOps.maxDrawdown(series(5, 3, 6, 2, 4, 2), "g", "t", "v", dec6).head()
    assert(r.getAs[Long]("n") == 6)
    assert(r.getAs[Double]("peak_value") == 6.0)
    assert(r.getAs[Double]("trough_value") == 2.0)
    assert(r.getAs[Timestamp]("trough_ts") == ts(3), "first of the two dd=4 rows")
    assert(r.getAs[Double]("max_dd_abs") == 4.0)
    assert(math.abs(r.getAs[Double]("max_dd_rel") - 4.0 / 6.0) < 1e-6)
  }

  test("max drawdown: relative dd is NULL while the running peak is <= 0") {
    val r = FinanceOps.maxDrawdown(series(-2, -5), "g", "t", "v", dec6).head()
    assert(r.getAs[Double]("max_dd_abs") == 3.0)
    assert(r.isNullAt(r.fieldIndex("max_dd_rel")))
  }

  test("cutler RSI-3: hand-computed gains/losses; all-gain window pins to 100") {
    val out = FinanceOps.rsiCutler(series(1, 2, 4, 3, 5, 6, 7), "g", "t", "v",
      n = 3, scoreOut = dec6).orderBy("t").collect()
    // diffs: 1,2,-1,2,1,1 → first full window at row 4 (3 diffs)
    assert(out.length == 4)
    assert(math.abs(out(0).getAs[Double]("rsi") - 75.0) < 1e-6) // ag=1, al=1/3
    assert(math.abs(out(1).getAs[Double]("rsi") - 80.0) < 1e-6) // ag=4/3, al=1/3
    assert(out(3).getAs[Double]("rsi") == 100.0)                // diffs 2,1,1: no loss
  }

  test("macd replays the coupled EMA recursion exactly") {
    val vs = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val out = FinanceOps.macd(series(vs: _*), "g", "t", "v",
      fast = 3, slow = 5, signalSpan = 2, scoreOut = identity)
      .orderBy("t").collect()
    val (aF, aS, aG) = (2.0 / 4, 2.0 / 6, 2.0 / 3)
    var eF = 0.0; var eS = 0.0; var sg = 0.0
    vs.zipWithIndex.foreach { case (x, i) =>
      if (i == 0) { eF = x; eS = x } else {
        eF = (1 - aF) * eF + aF * x; eS = (1 - aS) * eS + aS * x
      }
      val m = eF - eS
      sg = if (i == 0) m else (1 - aG) * sg + aG * m
      assert(out(i).getAs[Double]("macd") == m, s"macd row $i")
      assert(out(i).getAs[Double]("signal") == sg, s"signal row $i")
      assert(out(i).getAs[Double]("histogram") == m - sg, s"hist row $i")
    }
  }

  test("runs test: signs + + - + - give R=4, z=(4-3.4)/sqrt(0.84)") {
    // hourly means: place each value in its own hour
    val df = Seq(1.0, 2.0, 3.0, 2.0, 4.0, 3.0).zipWithIndex
      .map { case (v, i) => ("s", Timestamp.valueOf(f"2024-01-01 $i%02d:00:00"), v) }
      .toDF("g", "t", "v")
    val r = StatOps.runsTest(df, "g", "t", "v", dec6).head()
    assert(r.getAs[Long]("n_plus") == 3 && r.getAs[Long]("n_minus") == 2)
    assert(r.getAs[Long]("runs") == 4)
    val want = (4.0 - 3.4) / math.sqrt(0.84)
    assert(math.abs(r.getAs[Double]("z_runs") - want) < 1e-6)
  }

  test("AD exponentiality: exact-exponential quantile gaps accept; constant gaps reject") {
    // constant gaps are maximally NON-exponential (variance 0): A2 blows up
    val const = (0 until 400).map(i => ("s", new Timestamp(i * 60000L)))
      .toDF("g", "t")
    val rc = StatOps.adExponentiality(const, "g", "t", dec6).head()
    assert(rc.getAs[Int]("reject_exponential") == 1,
      s"constant gaps must reject, a2=${rc.getAs[Double]("a2")}")
    // gaps drawn as exponential quantiles (i+0.5)/n reproduce the
    // distribution closely: the test must accept
    val n = 400
    val qs = (0 until n).map(i => -math.log(1.0 - (i + 0.5) / n) * 1000.0)
    val times = qs.scanLeft(0.0)(_ + _).tail
    val expo = times.map(t => ("s", new Timestamp((t * 1000).toLong))).toDF("g", "t")
    val re = StatOps.adExponentiality(expo, "g", "t", dec6).head()
    assert(re.getAs[Int]("reject_exponential") == 0,
      s"exponential quantile gaps must accept, a2_mod=${re.getAs[Double]("a2_mod")}")
  }

  test("cliff's delta from midranks equals the pairwise definition with ties") {
    val df = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++ Seq(2.0, 3.0, 4.0).map(("b", _)))
      .toDF("g", "v")
    val r = StatOps.cliffsDelta(df, "g", "v", dec6).head()
    // pairwise: #(a>b)=1, #(a<b)=6 of 9 → delta = -5/9
    assert(math.abs(r.getAs[Double]("cliffs_delta") - (-5.0 / 9.0)) < 1e-6)
    assert(r.getAs[String]("magnitude") == "large")
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 3)
  }

  test("ridge2 at lambda=0 recovers an exact planted linear model (R2=1)") {
    val rows = for (i <- 1 to 60) yield {
      val x1 = (i % 7).toDouble; val x2 = (i % 11).toDouble
      ("g", 2.0 + 3.0 * x1 - 1.5 * x2, x1, x2)
    }
    val r = RegressionOps.ridge2(rows.toDF("g", "y", "x1", "x2"),
      "g", "y", "x1", "x2", lambda = 0.0, scoreOut = dec6).head()
    assert(math.abs(r.getAs[Double]("b0") - 2.0) < 1e-4, s"b0 ${r.getAs[Double]("b0")}")
    assert(math.abs(r.getAs[Double]("b1") - 3.0) < 1e-4)
    assert(math.abs(r.getAs[Double]("b2") + 1.5) < 1e-4)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-5)
  }

  test("ridge2 penalty shrinks coefficients toward zero monotonically") {
    val rows = for (i <- 1 to 60) yield {
      val x1 = (i % 7).toDouble; val x2 = (i % 11).toDouble
      ("g", 2.0 + 3.0 * x1 - 1.5 * x2 + (i % 3) * 0.1, x1, x2)
    }
    val df = rows.toDF("g", "y", "x1", "x2")
    val b0 = RegressionOps.ridge2(df, "g", "y", "x1", "x2", 0.0, dec6)
      .head().getAs[Double]("b1")
    val b100 = RegressionOps.ridge2(df, "g", "y", "x1", "x2", 100.0, dec6)
      .head().getAs[Double]("b1")
    val b1e4 = RegressionOps.ridge2(df, "g", "y", "x1", "x2", 10000.0, dec6)
      .head().getAs[Double]("b1")
    assert(math.abs(b100) < math.abs(b0) && math.abs(b1e4) < math.abs(b100),
      s"|b1| must shrink with lambda: $b0 -> $b100 -> $b1e4")
  }

  test("ADF rejects a unit root on stationary AR(1), not on a random walk") {
    // deterministic LCG noise so the test is reproducible
    var seed = 42L
    def nxt(): Double = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      (seed >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    val n = 600
    var ar = 0.0; var rw = 0.0
    val rows = (0 until n).map { i =>
      val e = nxt()
      ar = 0.3 * ar + e
      rw = rw + e
      val t = Timestamp.valueOf(f"2024-01-${1 + i / 24}%02d ${i % 24}%02d:00:00")
      (t, ar, rw)
    }
    val df = rows.flatMap { case (t, a, r) => Seq(("ar", t, a), ("rw", t, r)) }
      .toDF("g", "t", "v")
    val out = RegressionOps.adfTest(df, "g", "t", "v", dec6)
      .collect().map(r => r.getAs[String]("series") -> r).toMap
    assert(out("ar").getAs[Int]("unit_root_rejected") == 1,
      s"AR(0.3) must reject: t=${out("ar").getAs[Double]("t_adf")}")
    assert(out("rw").getAs[Int]("unit_root_rejected") == 0,
      s"random walk must not reject: t=${out("rw").getAs[Double]("t_adf")}")
  }

  test("hurst: a monotone ramp is strongly persistent (H near 1)") {
    val rows = (0 until 512).map { i =>
      val t = Timestamp.valueOf(f"2024-01-${1 + i / 24}%02d ${i % 24}%02d:00:00")
      ("ramp", t, i.toDouble)
    }
    val r = RegressionOps.hurstRS(rows.toDF("g", "t", "v"), "g", "t", "v",
      Seq(16, 32, 64, 128), dec6).head()
    assert(r.getAs[Long]("n_points") == 4)
    assert(r.getAs[Double]("hurst") > 0.9, s"ramp H=${r.getAs[Double]("hurst")}")
  }

  test("negbin overdispersion: constant daily counts read underdispersed, bursts overdispersed") {
    // series "flat": 4 events every day for 10 days (var 0);
    // series "burst": alternating 1 and 19 events (var >> mean)
    val rows = (0 until 10).flatMap { d =>
      val day = f"2024-01-${d + 1}%02d"
      (1 to 4).map(i => ("flat", Timestamp.valueOf(s"$day 0$i:00:00"))) ++
        (1 to (if (d % 2 == 0) 1 else 19))
          .map(i => ("burst", Timestamp.valueOf(f"$day ${i % 24}%02d:30:00")))
    }
    val out = StatOps.negbinOverdispersion(rows.toDF("g", "t"), "g", "t", dec6)
      .collect().map(r => r.getAs[String]("series") -> r).toMap
    val flat = out("flat")
    assert(flat.getAs[Double]("dispersion") == 0.0)
    assert(flat.isNullAt(flat.fieldIndex("k_hat")), "no NB exists for var < mean")
    assert(flat.getAs[Int]("overdispersed") == 0)
    val burst = out("burst")
    assert(burst.getAs[Double]("mean_daily") == 10.0)
    // var_pop = 81 → dispersion 8.1, k = 100/71
    assert(math.abs(burst.getAs[Double]("dispersion") - 8.1) < 1e-6)
    assert(math.abs(burst.getAs[Double]("k_hat") - 100.0 / 71.0) < 1e-4)
    assert(burst.getAs[Int]("overdispersed") == 1)
  }

  test("mutual information: a series against its own copy scores log2(bins) bits, nmi=1") {
    val rows = (0 until 96).flatMap { i =>
      val t = Timestamp.valueOf(f"2024-01-${1 + i / 24}%02d ${i % 24}%02d:00:00")
      val v = math.sin(i / 7.0) * 10
      Seq(("a", t, v), ("b", t, v), ("noise", t, ((i * 37) % 17).toDouble))
    }
    val out = StatOps.mutualInfoMatrix(rows.toDF("g", "t", "v"), "g", "t", "v",
      bins = 4, scoreOut = dec6).collect()
      .map(r => (r.getAs[String]("series_a"), r.getAs[String]("series_b")) -> r).toMap
    val ab = out(("a", "b"))
    assert(ab.getAs[Long]("n_hours") == 96)
    assert(math.abs(ab.getAs[Double]("mi_bits") - 2.0) < 1e-6,
      s"identical series carry log2(4)=2 bits, got ${ab.getAs[Double]("mi_bits")}")
    assert(math.abs(ab.getAs[Double]("nmi") - 1.0) < 1e-6)
    // the pseudo-random series shares far less information
    assert(out(("a", "noise")).getAs[Double]("nmi") < 0.5)
  }

  test("huber IRLS shrugs off the outlier that drags OLS") {
    // clean line y = 1 + 2*x1 + 0*x2, one wild row at the end
    val clean = (1 to 60).map { i =>
      val x1 = (i % 7).toDouble; val x2 = (i % 5).toDouble
      ("g", 1.0 + 2.0 * x1, x1, x2)
    }
    val dirty = clean :+ (("g", 10000.0, 3.0, 2.0))
    val df = dirty.toDF("g", "y", "x1", "x2")
    val ols = RegressionOps.ridge2(df, "g", "y", "x1", "x2", 0.0, dec6).head()
    val hub = RegressionOps.huber2(df, "g", "y", "x1", "x2",
      delta = 2.0, iters = 6, scoreOut = dec6).head()
    assert(math.abs(ols.getAs[Double]("b1") - 2.0) > 1.0,
      s"OLS must be visibly dragged: b1=${ols.getAs[Double]("b1")}")
    assert(math.abs(hub.getAs[Double]("b1") - 2.0) < 0.2,
      s"huber must hold the clean slope: b1=${hub.getAs[Double]("b1")}")
    assert(hub.getAs[Long]("n_downweighted") >= 1)
    // with no outliers and a huge delta, huber IS the OLS fit exactly
    val cleanDf = clean.toDF("g", "y", "x1", "x2")
    val h2 = RegressionOps.huber2(cleanDf, "g", "y", "x1", "x2",
      delta = 1e9, iters = 2, scoreOut = dec6).head()
    val o2 = RegressionOps.ridge2(cleanDf, "g", "y", "x1", "x2", 0.0, dec6).head()
    for (c <- Seq("b0", "b1", "b2"))
      assert(math.abs(h2.getAs[Double](c) - o2.getAs[Double](c)) < 1e-5,
        s"$c: huber ${h2.getAs[Double](c)} vs ols ${o2.getAs[Double](c)}")
  }

  test("log-rank: hand-walked 6-subject table; disjoint cohorts reject") {
    // A dies at 1,2,3; B at 4,5,6 — O_a=3, E_a=1.15, V=0.6775
    val subj = Seq(("a", 1.0, 1), ("a", 2.0, 1), ("a", 3.0, 1),
      ("b", 4.0, 1), ("b", 5.0, 1), ("b", 6.0, 1)).toDF("g", "t", "e")
    val r = StatOps.logRankTest(subj, "g", "t", "e", dec6).head()
    assert(r.getAs[String]("group_a") == "a" && r.getAs[Long]("n_a") == 3)
    assert(r.getAs[Long]("o_a") == 3)
    assert(math.abs(r.getAs[Double]("e_a") - 1.15) < 1e-6)
    assert(math.abs(r.getAs[Double]("v_lr") - 0.6775) < 1e-6)
    assert(math.abs(r.getAs[Double]("z_logrank") - 1.85 / math.sqrt(0.6775)) < 1e-4)
    assert(r.getAs[Int]("curves_differ") == 1)
    // censored-only rows contribute at-risk mass but no events
    val cens = subj.union(Seq(("a", 10.0, 0), ("b", 10.0, 0)).toDF("g", "t", "e"))
    val r2 = StatOps.logRankTest(cens, "g", "t", "e", dec6).head()
    assert(r2.getAs[Long]("o_a") == 3 && r2.getAs[Long]("n_a") == 4)
    assert(r2.getAs[Double]("e_a") < r.getAs[Double]("e_a") + 1.0)
  }

  test("cox ph: 4-subject alternating covariate — python-fixed trajectory") {
    // subjects (t, e, x) = (1,1,1),(2,1,0),(3,1,1),(4,1,0); 3 Newton
    // steps with per-step dec6 rounding walk β = 0.923077 → 0.940565 →
    // 0.940614 (independent python partial-likelihood replay; Breslow)
    val subj = Seq((1.0, 1, 1.0), (2.0, 1, 0.0), (3.0, 1, 1.0),
      (4.0, 1, 0.0)).toDF("t", "e", "x")
    val r = StatOps.coxPh(subj, "t", "e", "x", iters = 3, scoreOut = dec6)
      .head()
    assert(r.getAs[Long]("n") == 4 && r.getAs[Long]("n_events") == 4)
    assert(math.abs(r.getAs[Double]("beta") - 0.940614) < 1e-6)
    assert(math.abs(r.getAs[Double]("hazard_ratio") - 2.561554) < 1e-6)
    assert(math.abs(r.getAs[Double]("se_beta") - 1.240258) < 1e-6)
    assert(math.abs(r.getAs[Double]("z_wald") - 0.758402) < 1e-6)
    assert(math.abs(r.getAs[Double]("log_lik") - (-2.869976)) < 1e-6)
  }

  test("cox ph: constant covariate is information-free — β holds at 0") {
    val subj = Seq((1.0, 1, 2.0), (2.0, 1, 2.0), (3.0, 1, 2.0))
      .toDF("t", "e", "x")
    val r = StatOps.coxPh(subj, "t", "e", "x", iters = 3, scoreOut = dec6)
      .head()
    assert(r.getAs[Double]("beta") == 0.0)
    assert(r.getAs[Double]("hazard_ratio") == 1.0)
    assert(r.isNullAt(r.fieldIndex("se_beta")))
    assert(r.isNullAt(r.fieldIndex("z_wald")))
  }

  test("holm step-down: strong test survives, weak family members do not") {
    val tests = Seq(("k1", 4.0), ("k2", 2.0), ("k3", 1.0), ("k4", 0.0))
      .toDF("k", "z")
    val out = graft.operators.ExperimentOps.holm(tests, "k", "z",
      alpha = 0.05, scoreOut = dec6).orderBy("rank").collect()
    assert(out.map(_.getAs[String]("test_key")).toSeq ==
      Seq("k1", "k2", "k3", "k4"), "rank order follows p ascending")
    assert(out.map(_.getAs[Int]("reject")).toSeq == Seq(1, 0, 0, 0))
    val adj = out.map(_.getAs[Double]("p_holm"))
    assert(adj.zip(adj.tail).forall { case (a, b) => a <= b },
      s"adjusted p must be monotone: ${adj.mkString(",")}")
    assert(adj.last == 1.0, "the z=0 test caps at adjusted p = 1")
    // holm is never more permissive than bonferroni's m*p on the smallest p
    val p1 = out.head.getAs[Double]("p")
    assert(math.abs(adj.head - math.min(1.0, 4.0 * p1)) < 1e-9)
  }

  test("hbos: the density outlier tops the ranking; constant features are skipped") {
    val rows = ((1 to 30).map(i => (i.toLong, "x", (i % 10).toDouble)) :+
      (99L, "x", 100.0)) ++
      (1 to 30).map(i => (i.toLong, "const", 5.0)) :+ ((99L, "const", 5.0))
    val out = StatOps.hbos(rows.toDF("id", "f", "v"), "id", "f", "v",
      nBins = 10, k = 5, scoreOut = dec6).collect()
    assert(out.head.getAs[Long]("id") == 99L,
      s"the lone 100.0 must rank first: ${out.mkString(",")}")
    assert(out.forall(_.getAs[Long]("n_features") == 1L),
      "the zero-width feature must be skipped")
    assert(out.head.getAs[Double]("hbos") > out.last.getAs[Double]("hbos"))
  }

  test("pacf replays Durbin-Levinson on the operator's own rounded rho") {
    var seed = 7L
    def nxt(): Double = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      (seed >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    var x = 0.0
    val rows = (0 until 300).map { i =>
      x = 0.6 * x + nxt()
      val t = Timestamp.valueOf(f"2024-01-${1 + i / 24}%02d ${i % 24}%02d:00:00")
      ("s", t, x)
    }
    val df = rows.toDF("g", "t", "v")
    val out = RegressionOps.pacfDL(df, "g", "t", "v", maxLag = 4, dec6).head()
    // replay: gap-free hourly grid → plain lag covariances
    val ys = rows.map(_._3).toArray
    val mu = ys.sum / ys.length
    val c = ys.map(_ - mu)
    val ss = c.map(v => v * v).sum
    def rnd(v: Double) = math.floor(v * 1e6 + graft.queries.Q.BIAS) / 1e6
    val rho = (1 to 4).map(k =>
      rnd((0 until c.length - k).map(i => c(i) * c(i + k)).sum / ss)).toArray
    val phi = Array.ofDim[Double](5, 5)
    phi(1)(1) = rho(0)
    for (k <- 2 to 4) {
      val num = (1 until k).map(j => phi(k - 1)(j) * rho(k - j - 1)).sum
      val den = (1 until k).map(j => phi(k - 1)(j) * rho(j - 1)).sum
      phi(k)(k) = rnd((rho(k - 1) - num) / (1.0 - den))
      for (j <- 1 until k)
        phi(k)(j) = rnd(phi(k - 1)(j) - phi(k)(k) * phi(k - 1)(k - j))
    }
    for (k <- 1 to 4)
      assert(math.abs(out.getAs[Double](s"pacf_$k") - phi(k)(k)) < 1e-9,
        s"pacf_$k: got ${out.getAs[Double](s"pacf_$k")} want ${phi(k)(k)}")
    // an AR(1) signature: pacf_1 large, higher lags near zero
    assert(out.getAs[Double]("pacf_1") > 0.4)
    assert(math.abs(out.getAs[Double]("pacf_3")) < 0.2)
  }
}
