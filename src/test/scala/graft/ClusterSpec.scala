package graft

import org.apache.spark.sql.functions._
import graft.operators.{ClusterOps, RegressionOps}
import graft.queries.Q.dec6

/** Planted fixtures for distributed Lloyd k-means (q326) and the Newton
  * logistic regression (q325). */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("lloyd: two planted blobs converge to their exact means in one step") {
    // blob A around (0, 0, ...), blob B around (10, 10, ...): ids chosen
    // so smallest-id init picks one point from each blob
    val d = 4
    def vec(c: Double, eps: Double) = Seq.tabulate(d)(i => (c + (i % 2) * eps).toFloat)
    val rows = Seq(
      (0L, vec(0.0, 0.5)), (1L, vec(10.0, 0.5)),
      (2L, vec(0.0, -0.5)), (3L, vec(10.0, -0.5)),
      (4L, vec(0.2, 0.0)), (5L, vec(10.2, 0.0)))
    val out = ClusterOps.lloyd(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 2, iters = 3, scoreOut = dec6)
      .orderBy("cluster_id").collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Long]("n_points") == 3L),
      s"balanced blobs: ${out.mkString(",")}")
    // blob A: mean vector ≈ (0.0667, 0.0667+0, ...) — just pin that
    // within-cluster inertia is tiny vs the 10-unit separation
    assert(out.forall(_.getAs[Double]("inertia") < 2.0))
    val norms = out.map(_.getAs[Double]("centroid_norm")).sorted
    assert(norms(0) < 1.0 && norms(1) > 19.0,
      s"centroids must sit at the blob centers: ${norms.mkString(",")}")
  }

  test("lloyd: ties break to the lowest cluster id and empty clusters keep their centroid") {
    // all points identical → every distance ties; argmin must pick
    // cluster 0 and cluster 1 goes (and stays) empty without crashing
    val rows = (0L to 5L).map(i => (i, Seq.fill(3)(1.0f)))
    val out = ClusterOps.lloyd(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 2, iters = 2, scoreOut = dec6).collect()
    assert(out.length == 1 && out.head.getAs[Int]("cluster_id") == 0)
    assert(out.head.getAs[Long]("n_points") == 6L)
    assert(out.head.getAs[Double]("inertia") == 0.0)
  }

  test("logistic newton separates a planted logit and beats the base rate") {
    // y depends on x1 positively, x2 negatively through a crisp threshold
    var seed = 11L
    def nxt(): Double = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      (seed >>> 11).toDouble / (1L << 53).toDouble
    }
    val rows = (1 to 2000).map { _ =>
      val x1 = nxt() * 4 - 2; val x2 = nxt() * 4 - 2
      val p = 1.0 / (1.0 + math.exp(-(0.5 + 2.0 * x1 - 1.5 * x2)))
      ("g", if (nxt() < p) 1 else 0, x1, x2)
    }
    val r = RegressionOps.logisticNewton(rows.toDF("g", "y", "x1", "x2"),
      "g", labelCol = col("y"), "x1", "x2", iters = 6, scoreOut = dec6).head()
    assert(r.getAs[Double]("b1") > 1.0, s"b1 sign/scale: ${r.getAs[Double]("b1")}")
    assert(r.getAs[Double]("b2") < -0.5, s"b2 sign: ${r.getAs[Double]("b2")}")
    val baseRate = math.max(r.getAs[Long]("n_pos").toDouble / r.getAs[Long]("n"),
      1.0 - r.getAs[Long]("n_pos").toDouble / r.getAs[Long]("n"))
    assert(r.getAs[Double]("accuracy") > baseRate + 0.1,
      s"accuracy ${r.getAs[Double]("accuracy")} must beat base rate $baseRate")
    assert(r.getAs[Double]("log_lik") < 0.0)
  }

  test("ipw-ate strips planted confounding the naive difference reports") {
    // no true effect: y = 10 + 5*x1 + noise, but treatment propensity
    // RISES with x1 — the naive treated-vs-control gap is pure
    // confounding; IPW must shrink it hard toward 0
    var seed = 23L
    def nxt(): Double = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      (seed >>> 11).toDouble / (1L << 53).toDouble
    }
    val rows = (1 to 4000).map { _ =>
      val x1 = nxt() * 4 - 2; val x2 = nxt() * 2 - 1
      val e = 1.0 / (1.0 + math.exp(-(1.2 * x1 + 0.3 * x2)))
      val t = if (nxt() < e) 1 else 0
      val y = 10.0 + 5.0 * x1 + (nxt() - 0.5)
      (t, y, x1, x2)
    }
    val r = graft.operators.ExperimentOps.ipwAte(
      rows.toDF("t", "y", "x1", "x2"), "t", "y", "x1", "x2",
      iters = 6, clip = 0.02, scoreOut = dec6).head()
    val naive = r.getAs[Double]("naive_diff")
    val ate = r.getAs[Double]("ate_ipw")
    assert(naive > 2.0, s"the confounded gap must be large: $naive")
    assert(math.abs(ate) < naive / 4,
      s"IPW must strip most of the confounding: ate=$ate naive=$naive")
    assert(r.getAs[Double]("b1") > 0.5, "propensity must load on x1")
    assert(r.getAs[Long]("n") == 4000)
  }

  test("logistic newton: beta stays at the separating optimum under a class flip") {
    // flipping labels must flip every coefficient sign exactly (the
    // symmetry of the likelihood — a cheap closed-form invariant)
    val rows = (1 to 500).map { i =>
      val x1 = (i % 10).toDouble; val x2 = ((i * 7) % 10).toDouble
      ("g", if (x1 - x2 > 0) 1 else 0, x1, x2)
    }
    val df = rows.toDF("g", "y", "x1", "x2")
    val a = RegressionOps.logisticNewton(df, "g", col("y"), "x1", "x2",
      iters = 4, scoreOut = dec6).head()
    val b = RegressionOps.logisticNewton(df, "g", lit(1) - col("y"), "x1", "x2",
      iters = 4, scoreOut = dec6).head()
    for (c <- Seq("b0", "b1", "b2"))
      assert(math.abs(a.getAs[Double](c) + b.getAs[Double](c)) < 1e-4,
        s"$c must flip sign: ${a.getAs[Double](c)} vs ${b.getAs[Double](c)}")
    assert(a.getAs[Double]("accuracy") == b.getAs[Double]("accuracy"))
  }

  test("dbscan: clique core, pendant border, isolate noise") {
    // pairs: complete graph on {1..5} + edge (1,6); minPts 5 ⇒
    // 1..5 core (neighborhood incl. self ≥ 5), 6 border via core
    // neighbor 1, 7 noise; cluster label = component min = 1
    val points = (1L to 7L).toDF("vec_id")
    val pairs = ((for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)) :+
      ((1L, 6L))).toDF("id_a", "id_b")
    val out = ClusterOps.dbscan(points, "vec_id", pairs, minPts = 5)
      .orderBy("vec_id").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("n_neighbors"),
        r.getAs[String]("point_type"),
        Option(r.getAs[java.lang.Long]("cluster")).map(_.toLong)))
    assert(out.toSeq == Seq(
      (1L, 5L, "core", Some(1L)), (2L, 4L, "core", Some(1L)),
      (3L, 4L, "core", Some(1L)), (4L, 4L, "core", Some(1L)),
      (5L, 4L, "core", Some(1L)), (6L, 1L, "border", Some(1L)),
      (7L, 0L, "noise", None)), out.mkString(", "))
  }

  test("dbscan: two components get distinct min-id labels") {
    val points = (1L to 8L).toDF("vec_id")
    // two 4-cliques {1..4} and {5..8}, minPts 4 ⇒ all core, two clusters
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val pairs = (clique(1L to 4L) ++ clique(5L to 8L)).toDF("id_a", "id_b")
    val out = ClusterOps.dbscan(points, "vec_id", pairs, minPts = 4)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster"))
      .toMap
    assert((1L to 4L).forall(out(_) == 1L) && (5L to 8L).forall(out(_) == 5L),
      out.toString)
  }

  test("dbscan dedups a duplicate / symmetric pair feed") {
    // the same edge arriving from several LSH bands — as raw duplicates
    // AND as the reversed orientation — must count as ONE neighbor, or
    // multi-band candidate feeds silently promote border points to core
    val points = (1L to 3L).toDF("vec_id")
    val pairs = Seq((1L, 2L), (1L, 2L), (2L, 1L), (2L, 3L))
      .toDF("id_a", "id_b")
    val out = ClusterOps.dbscan(points, "vec_id", pairs, minPts = 3)
      .orderBy("vec_id").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("n_neighbors"),
        r.getAs[String]("point_type")))
    assert(out.toSeq == Seq((1L, 1L, "border"), (2L, 2L, "core"),
      (3L, 1L, "border")), out.mkString(", "))
  }

  test("banded LSH candidates ≡ exact pairs, and the q344 DBSCAN partition matches") {
    // the q344 contract on the gate fixture: the 12×2-bit band feed
    // recovers EVERY rounded-cosine ≥ 0.4 pair (probed recall 1.0 at
    // seed 13), so the bucketed DBSCAN partition is the exact one
    import graft.operators.SimilarityOps
    val emb = spark.read.parquet(s"$sfTiny/embeddings.parquet")
    val exact = SimilarityOps.exactCosinePairs(
      emb, "vec_id", "embedding", threshold = 0.4, scoreOut = dec6)
    val lsh = SimilarityOps.lshBandedCosinePairs(
      emb, "vec_id", "embedding", threshold = 0.4, nPlanes = 24,
      bandBits = 2, dim = 64, seed = 13L, scoreOut = dec6)
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cos_sim"))).toSet
    val (pe, pl) = (pairSet(exact), pairSet(lsh))
    assert(pe == pl,
      s"banded recall broke: missing=${(pe -- pl).take(5)} extra=${(pl -- pe).take(5)}")
    assert(pe.nonEmpty, "fixture must have qualifying pairs")
    def partition(pairs: org.apache.spark.sql.DataFrame) =
      ClusterOps.dbscan(emb, "vec_id", pairs, minPts = 3)
        .collect().map(r => (r.getAs[Long]("vec_id"),
          r.getAs[Long]("n_neighbors"), r.getAs[String]("point_type"),
          Option(r.getAs[java.lang.Long]("cluster")))).toSet
    assert(partition(exact) == partition(lsh))
  }

  test("garch variance-targeting fit: param bounds, recursion consistency, degenerate fallback") {
    import java.sql.Timestamp
    // volatility-clustered series: calm stretch then a burst — enough
    // structure for non-degenerate moments
    val xs = Seq(10.0, 10.5, 10.2, 10.4, 10.3, 10.5, 18.0, 4.0, 16.0,
      6.0, 14.0, 10.1, 10.3, 10.2, 10.4, 10.3)
    val rows = xs.zipWithIndex.map { case (x, i) =>
      ("s", Timestamp.valueOf(f"2024-01-01 ${i}%02d:00:00"), x)
    }
    val out = graft.operators.FinanceOps.garchFitVt(
        rows.toDF("event_type", "ts", "v"), "event_type", "ts", "v",
        scoreOut = graft.queries.Q.dec6)
      .orderBy("ts").collect()
    assert(out.length == xs.length - 1)
    val (al, be, om) = (out.head.getAs[Double]("alpha"),
      out.head.getAs[Double]("beta"), out.head.getAs[Double]("omega"))
    assert(al >= 0 && be >= 0 && al + be <= 0.98 + 1e-9, s"bounds: $al/$be")
    assert(om > 0, s"omega must stay positive: $om")
    // re-fold the recursion independently from the fitted params and the
    // raw inputs: sigma/z must match the operator's explode within 2e-6
    val r = xs.sliding(2).map { case Seq(a, b) => b - a }.toArray
    val h = new Array[Double](r.length)
    h(0) = om / (1.0 - al - be)
    for (j <- 1 until r.length)
      h(j) = om + al * r(j - 1) * r(j - 1) + be * h(j - 1)
    def rnd6(x: Double) =
      math.floor(x * 1e6 + graft.queries.Q.BIAS) / 1e6
    out.zipWithIndex.foreach { case (row, j) =>
      assert(math.abs(row.getAs[Double]("sigma") - rnd6(math.sqrt(h(j)))) < 2e-6)
      assert(math.abs(row.getAs[Double]("z") - rnd6(r(j) / math.sqrt(h(j)))) < 2e-6)
    }
    // constant series → zero returns, degenerate moments → α = β = ω = 0,
    // σ = 0 and z null (never a division blow-up)
    val flat = (0 to 5).map(i =>
      ("f", Timestamp.valueOf(f"2024-01-01 0$i%01d:00:00"), 7.0))
    val fo = graft.operators.FinanceOps.garchFitVt(
        flat.toDF("event_type", "ts", "v"), "event_type", "ts", "v",
        scoreOut = graft.queries.Q.dec6)
      .collect()
    assert(fo.length == 5)
    assert(fo.forall(x => x.getAs[Double]("alpha") == 0.0 &&
      x.getAs[Double]("beta") == 0.0 && x.getAs[Double]("omega") == 0.0 &&
      x.getAs[Double]("sigma") == 0.0 && x.isNullAt(x.fieldIndex("z"))))
  }

  test("garch filter: hand recursion on a 4-point series") {
    import java.sql.Timestamp
    val ts = (0 to 3).map(h => Timestamp.valueOf(f"2024-01-01 0$h:00:00"))
    val rows = Seq(("s", ts(0), 10.0), ("s", ts(1), 12.0),
      ("s", ts(2), 9.0), ("s", ts(3), 9.5))
    val out = graft.operators.FinanceOps.garchFilter(
        rows.toDF("event_type", "ts", "v"), "event_type", "ts", "v",
        omega = 5.0, alphaP = 0.05, betaP = 0.9,
        scoreOut = graft.queries.Q.dec6)
      .orderBy("ts").collect()
    // h1 = 5/(1-.05-.9) = 100; h2 = 5 + .05·4 + .9·100 = 95.2;
    // h3 = 5 + .05·9 + .9·95.2 = 91.13
    val exp = Seq((2.0, 100.0), (-3.0, 95.2), (0.5, 91.13))
    assert(out.length == 3)
    out.zip(exp).foreach { case (r, (ret, h)) =>
      assert(r.getAs[Double]("ret") == ret)
      assert(math.abs(r.getAs[Double]("sigma") - math.rint(
        math.sqrt(h) * 1e6) / 1e6) < 2e-6, s"sigma ${r}")
      assert(math.abs(r.getAs[Double]("z") - math.rint(
        ret / math.sqrt(h) * 1e6) / 1e6) < 2e-6, s"z ${r}")
    }
  }
}
