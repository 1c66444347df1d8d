package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative graph algorithms as unrolled DataFrame joins. The per-node
  * state (the rank vector) is always node-sized — orders of magnitude
  * smaller than the edge table — so every iteration is one edge⋈rank
  * equi-join on src plus one dst-keyed aggregate, the textbook
  * shuffle-bounded power-iteration shape (Pregel's superstep without the
  * framework). Companion to the star-contraction connected components in
  * [[DedupOps]].
  *
  * Each superstep MATERIALIZES the node-sized rank vector
  * (`localCheckpoint`) and reuses the persisted normalized edge table —
  * the Pregel execution model. A pure lazy plan is NOT an option here:
  * the rank vector feeds three consumers per step (dangling mass,
  * contribution join, next vector), so unmaterialized lineage grows
  * ~3^iters logical nodes and Catalyst analysis time explodes long
  * before execution would. */
object GraphOps {

  /** Weighted PageRank by `iters` unrolled power-iteration steps:
    * r ← (1−d)/N + d·(Pᵀr + dangling/N), where P is the out-weight-
    * normalized transition matrix and `dangling` is the rank mass parked
    * on nodes with no out-edges (redistributed uniformly, the standard
    * stochastic fix — without it the vector no longer sums to 1).
    *
    * Every step costs: one scalar aggregate for the dangling mass (an
    * anti-join against the src set, crossed back as a 1-row literal),
    * one src-keyed equi-join of the normalized edges with the node-sized
    * rank vector, and one dst-keyed sum. Parallel edges are pre-merged
    * so the transition weights are well-defined.
    *
    * Two physical regimes, switched on |nodes| vs `broadcastNodeLimit`:
    *  - FAST PATH (|nodes| ≤ limit): the rank vector lives in ONE
    *    partition and enters every join broadcast — the only shuffle per
    *    superstep is the dst-keyed contribution sum. Right for the
    *    node-sized-state-fits-in-an-executor regime.
    *  - SCALE PATH (|nodes| > limit, the web-graph regime): the vector
    *    stays hash-partitioned by node and the joins shuffle — no
    *    per-iteration broadcast of a multi-GB vector, no one-partition
    *    checkpoint bottleneck. Each superstep's output is already
    *    node-partitioned (the node-keyed join fixes the distribution),
    *    so the checkpoint preserves it and the next step's node-keyed
    *    joins reuse the partitioning without an extra exchange.
    *
    * Regime selection: `broadcastRank = Some(b)` is a CALLER HINT that
    * skips the probe job entirely — the caller usually knows whether the
    * node universe is bounded (a vocabulary-keyed graph) or web-scale.
    * With `None` (default) one node-count aggregate decides, and its
    * collected value doubles as the literal N everywhere, so the rank
    * state drops the __N carry column and rank0 loses its scalar
    * crossjoin — the probe is folded into work the iteration needed
    * anyway, never a count-only extra job.
    *
    * Fault tolerance: `reliableEvery` — see [[Ckpt.step]] (default 0 =
    * every superstep localCheckpoints; set k > 0 plus a
    * `setCheckpointDir` for durable snapshots every k supersteps on
    * long cluster runs).
    *
    * Returns (node, rank) — Σ rank = 1 up to float noise. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               weightCol: String, damping: Double, iters: Int,
               scoreOut: Column => Column,
               broadcastNodeLimit: Long = 1000000L,
               broadcastRank: Option[Boolean] = None,
               reliableEvery: Int = 0): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1,
      s"bad pagerank params: iters=$iters damping=$damping")
    // the merged edge table is the expensive subtree (it may sit on top
    // of an arbitrary join pipeline): persist it, because nodes, out-
    // weights and the transition table all derive from it — unpersisted,
    // the upstream pipeline re-executes once per consumer
    val e = edges
      .groupBy(col(srcCol).as("src"), col(dstCol).as("dst"))
      .agg(sum(col(weightCol).cast("double")).as("w"))
      .persist()
    val outw = e.groupBy("src").agg(sum("w").as("__ow"))
    // the per-step working set: read `iters` times
    val norm = e.join(outw, "src")
      .select(col("src"), col("dst"), (col("w") / col("__ow")).as("p"))
      .persist()
    val nodeTab = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val nTab = nodeTab.agg(count(lit(1)).cast("double").as("__N"))
    // hinted broadcast: zero probe jobs AND zero aggregate branch — the
    // single fast-path partition computes N inside the same task that
    // builds the vector. Hinted scale: N stays in-plan via the 1-row
    // crossjoin. Auto: ONE aggregate job whose value serves both the
    // regime decision and the literal N.
    val (bcastRank, rank0) = broadcastRank match {
      case Some(true) =>
        import org.apache.spark.sql.Row
        import org.apache.spark.sql.catalyst.encoders.RowEncoder
        import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
        val nt = nodeTab.coalesce(1)
        val schema = StructType(nt.schema.fields ++ Seq(
          StructField("r", DoubleType, nullable = false),
          StructField("__N", DoubleType, nullable = false)))
        (true, nt.mapPartitions { it =>
          val rows = it.toArray
          val n = rows.length.toDouble
          rows.iterator.map(row => Row(row.get(0), 1.0 / n, n))
        }(RowEncoder.encoderFor(schema)))
      case Some(false) =>
        (false, nodeTab.crossJoin(nTab)
          .select(col("node"), (lit(1.0) / col("__N")).as("r"), col("__N")))
      case None =>
        val n = nTab.first().getDouble(0)
        (n <= broadcastNodeLimit.toDouble, nodeTab
          .select(col("node"), lit(1.0 / n).as("r"), lit(n).as("__N")))
    }
    var rank: DataFrame = (if (bcastRank) rank0.coalesce(1) else rank0)
      .localCheckpoint()
    val srcSet0 = norm.select(col("src").as("node")).distinct()
    val srcSet = (if (bcastRank) srcSet0.coalesce(1) else srcSet0).persist()
    for (i <- 1 to iters) {
      val nxt = pageRankStep(norm, srcSet, rank, damping, bcastRank)
      // one job per superstep; O(1) lineage. Fast path re-collapses to
      // one partition; scale path keeps the join's node partitioning.
      rank = Ckpt.step(if (bcastRank) nxt.coalesce(1) else nxt,
        i, reliableEvery)
    }
    rank.select(col("node"), scoreOut(col("r")).as("rank"))
  }

  /** One PageRank superstep (pre-checkpoint), exposed so GraphOpsSpec can
    * pin BOTH plan shapes: `bcastRank=true` broadcasts the node-sized
    * vector into the edge join; `bcastRank=false` leaves every node-keyed
    * join to shuffle — no broadcast of the rank vector anywhere (the
    * dangling-mass scalar is the only 1-row crossjoin). */
  private[graft] def pageRankStep(norm: DataFrame, srcSet: DataFrame,
      rank: DataFrame, damping: Double, bcastRank: Boolean): DataFrame = {
    def h(df: DataFrame): DataFrame = if (bcastRank) broadcast(df) else df
    val dangling = rank.join(h(srcSet), Seq("node"), "left_anti")
      .agg(coalesce(sum("r"), lit(0.0)).as("__dm"))
    val contrib = norm
      .join(h(rank.select(col("node"), col("r"))), col("src") === col("node"))
      .groupBy(col("dst").as("node"))
      .agg(sum(col("r") * col("p")).as("__cin"))
    rank.select(col("node"), col("__N"))
      .join(h(contrib), Seq("node"), "left")
      .crossJoin(dangling)
      .select(col("node"),
        (lit(1.0 - damping) / col("__N") + lit(damping) *
          (coalesce(col("__cin"), lit(0.0)) + col("__dm") / col("__N")))
          .as("r"),
        col("__N"))
  }

  /** Frontier BFS: minimum hop distance from a seed set to every node
    * within `maxHops`, over a directed or (default) undirected edge
    * list — the reach/blast-radius primitive (supply-chain exposure,
    * contagion radius, influence neighborhoods).
    *
    * Pregel discipline throughout (the [[pageRank]] lesson): the edge
    * set is persisted once; per superstep the frontier expands through
    * ONE equi-join, new nodes are a LEFT ANTI against the visited set,
    * and both frames are `localCheckpoint`ed so lineage stays O(1)
    * instead of k^hops. The per-step `isEmpty` probe is one scheduling
    * job — the honest Pregel cost — and stops dead subtrees early.
    * State is node-sized (node, hop); the frontier join shuffles on the
    * node key, never broadcasting anything unbounded.
    *
    * Fault tolerance: `reliableEvery` — see [[Ckpt.step]] (default 0 =
    * localCheckpoint every superstep; k > 0 plus a `setCheckpointDir`
    * makes every k-th hop's state durable, bounding replay to k−1
    * supersteps after an executor loss on long cluster runs).
    *
    * Returns (node, hop) with hop = first-visit depth (= min hop, BFS
    * invariant), seeds at hop 0. */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
              seeds: Seq[Long], maxHops: Int,
              directed: Boolean = false, reliableEvery: Int = 0): DataFrame = {
    require(maxHops >= 0 && maxHops <= 50, s"maxHops in [0,50], got $maxHops")
    val spark = edges.sparkSession
    import spark.implicits._
    val e0 = edges.select(col(srcCol).cast("long").as("s"),
      col(dstCol).cast("long").as("d"))
    val e = (if (directed) e0
             else e0.union(e0.select(col("d").as("s"), col("s").as("d"))))
      .distinct().persist()
    var visited = seeds.toDF("node").withColumn("hop", lit(0))
      .localCheckpoint()
    var frontier = visited
    var h = 1
    var done = false
    while (h <= maxHops && !done) {
      val next = Ckpt.step(frontier.join(e, col("node") === col("s"))
        .select(col("d").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("hop", lit(h)), h, reliableEvery)
      if (next.isEmpty) done = true
      else {
        // coalesce: the visited union otherwise accumulates one exchange
        // width of partitions per hop (the louvainSweepW lesson)
        visited = Ckpt.step(
          visited.union(next)
            .coalesce(spark.sparkContext.defaultParallelism),
          h, reliableEvery)
        frontier = next
      }
      h += 1
    }
    e.unpersist()
    visited
  }

  /** Per-node triangle count and local clustering coefficient over an
    * undirected edge list (any orientation, duplicates/self-loops
    * tolerated), via the degree-ordered wedge join (Schank–Wagner /
    * Latapy): orient every canonical edge from its lower-(degree, id)
    * endpoint to the higher, enumerate wedges only at each edge's
    * oriented SOURCE, and close them against the oriented edge set.
    * With this orientation every node's out-degree is O(√m), so the
    * wedge table is O(m^1.5) worst-case instead of Σdeg² — the standard
    * scale fix that makes triangle counting survive skewed degree
    * distributions (a celebrity node of degree 10⁶ contributes ZERO
    * wedges at itself; its triangles are counted at low-degree
    * neighbors). Each triangle {a,b,c} is emitted exactly once (its
    * rank-minimal node is the wedge center), then exploded to all three
    * corners for the per-node tally.
    *
    * Returns (node, degree, n_triangles, clustering) where clustering =
    * 2T / (deg·(deg−1)), defined 0 for degree < 2. */
  def triangleStats(edges: DataFrame, aCol: String, bCol: String,
                    scoreOut: Column => Column,
                    maxDegree: Option[Long] = None): DataFrame = {
    // canonical undirected edge set: u < v, loops dropped. Persisted —
    // degrees, orientation and the closing join all re-read it.
    val eRaw = edges.select(
        least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist()
    // Optional hub cap — the 100 TB knob (the q322 Adamic-Adar
    // precedent): the degree-ordered orientation bounds wedge volume at
    // O(m^1.5) only when SOME corner of each triangle has modest degree;
    // on a uniformly dense graph (every degree ≈ d) wedge volume is
    // Θ(n·d²) and no orientation helps — q246's 3×-density probe
    // honestly measured exponent 2.0. With maxDegree set, nodes whose
    // FULL-graph degree exceeds the cap are dropped and the census runs
    // EXACTLY on the induced non-hub subgraph (degrees, triangles and
    // clustering all recomputed within it; nodes isolated by the cap
    // leave the output): a celebrity's clustering coefficient is ≈ 0 at
    // quadratic cost — near-zero evidence the cap trades away, the same
    // call every production triangle counter ships (cf. also
    // DOULION-style edge sampling, Tsourakakis KDD'09, when hub
    // triangles themselves are the question). The cap is mirrored in
    // the q345 oracle, so the capped semantics — not just the fast
    // path — is what the gate checks.
    val e = maxDegree match {
      case None => eRaw
      case Some(cap) =>
        val fullDeg = eRaw.select(col("u").as("node"))
          .unionAll(eRaw.select(col("v").as("node")))
          .groupBy("node").agg(count(lit(1)).as("deg"))
        val keep = fullDeg.filter(col("deg") <= cap).select("node")
        eRaw
          .join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
          .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
          .select("u", "v")
          .persist()
    }
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .persist()
    // attach endpoint degrees, orient low-(deg,id) → high-(deg,id); carry
    // the target's rank struct so wedge endpoints can be ordered without
    // another degree join
    val oriented = e
      .join(deg.select(col("node").as("u"), col("deg").as("__du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("__dv")), "v")
      .select(
        when(struct(col("__du"), col("u")) < struct(col("__dv"), col("v")),
          struct(col("u").as("s"), col("v").as("t"),
            struct(col("__dv").as("d"), col("v").as("n")).as("trk")))
        .otherwise(
          struct(col("v").as("s"), col("u").as("t"),
            struct(col("__du").as("d"), col("u").as("n")).as("trk")))
        .as("o"))
      .select(col("o.s").as("s"), col("o.t").as("t"), col("o.trk").as("trk"))
      .persist()
    // wedges at the rank-minimal corner; b precedes c in rank order, so
    // the closing edge — if present — is oriented exactly b → c
    val wedges = oriented.select(col("s"), col("t").as("b"), col("trk").as("__rb"))
      .join(oriented.select(col("s"), col("t").as("c"), col("trk").as("__rc")),
        Seq("s"))
      .filter(col("__rb") < col("__rc"))
      .select(col("s").as("a"), col("b"), col("c"))
    // SHUFFLE_HASH on the edge side: the closing join's streamed side is
    // the O(m^1.5) wedge table — a SortMergeJoin SORTS those 5.5M rows
    // (at sf0.1) before probing, while hashing the m-sized edge side per
    // partition skips that sort entirely (guide §3.1: shuffled hash when
    // one side is moderately small per partition; the build side is
    // edges/shuffle-partitions, never wedge-scaled)
    val tri = wedges
      .join(oriented.select(col("s").as("b"), col("t").as("c")).hint("shuffle_hash"),
        Seq("b", "c"))
      .persist()
    val perNode = tri.select(col("a").as("node"))
      .unionAll(tri.select(col("b").as("node")))
      .unionAll(tri.select(col("c").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    deg
      .join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg").as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        scoreOut(when(col("deg") >= 2,
            lit(2.0) * coalesce(col("n_triangles"), lit(0L)) /
              (col("deg").cast("double") * (col("deg") - lit(1))))
          .otherwise(lit(0.0))).as("clustering"))
  }

  /** HITS hubs & authorities (Kleinberg '99) by `iters` unrolled
    * mutual-reinforcement steps over a weighted directed edge list:
    * h(u) ← Σ_{u→v} w·a(v), a(v) ← Σ_{u→v} w·h(u), each vector
    * L1-normalized per step (Kleinberg's convergence to the principal
    * eigenvectors of WWᵀ/WᵀW is norm-independent; L1 keeps both scores a
    * probability-like mass, the PageRank convention here). The
    * directional complement of [[pageRank]]: rank rewards being POINTED
    * AT by rank; HITS separates pointing-well (hub) from being-pointed-at
    * (authority) — on an event-transition graph, "what funnels flow"
    * vs "what flow lands on".
    *
    * Same superstep shape and regimes as [[pageRank]]: parallel edges
    * pre-merged and persisted; each iteration is one src-keyed and one
    * dst-keyed edge⋈vector equi-join plus a scalar normalizer crossjoin
    * (1-row aggregate — AQE broadcasts it); vectors are node-sized and
    * [[Ckpt.step]]-materialized per step (O(1) lineage, `reliableEvery`
    * for durable snapshots). `broadcastVec = Some(true)` is the bounded-
    * vocabulary caller hint (the q233 convention) — the vector enters
    * the edge joins broadcast; `Some(false)`/auto keeps it
    * hash-partitioned for web-scale graphs.
    *
    * Returns (node, hub, authority), each column summing to 1; nodes
    * with no out-edges (resp. in-edges) score 0 on that side. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           weightCol: String, iters: Int, scoreOut: Column => Column,
           broadcastVec: Option[Boolean] = None,
           broadcastNodeLimit: Long = 1000000L,
           reliableEvery: Int = 0): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters in [1,50], got $iters")
    val e = edges
      .groupBy(col(srcCol).as("src"), col(dstCol).as("dst"))
      .agg(sum(col(weightCol).cast("double")).as("w"))
      .persist()
    val nodeTab = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct().persist()
    val bcast = broadcastVec.getOrElse(
      nodeTab.count() <= broadcastNodeLimit)
    def h(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
    def l1norm(raw: DataFrame, c: String): DataFrame = {
      val tot = raw.agg(sum(c).as("__tot"))
      raw.crossJoin(tot).select(col("node"), (col(c) / col("__tot")).as(c))
    }
    val n0 = nodeTab.crossJoin(nodeTab.agg(count(lit(1)).cast("double").as("__N")))
    var auth: DataFrame = (if (bcast) n0.coalesce(1) else n0)
      .select(col("node"), (lit(1.0) / col("__N")).as("a"))
      .localCheckpoint()
    var hub: DataFrame = auth.select(col("node"), col("a").as("h"))
    for (i <- 1 to iters) {
      // materialization discipline: only the FULL-iteration boundary
      // (auth) checkpoints — hub stays a lazy 1-join/1-agg function of
      // the checkpointed auth, so lineage depth is a constant 2 per
      // round while the per-iteration job count halves. The last
      // iteration checkpoints hub too: the final assembly reads both
      // vectors, and an un-materialized hub would re-run its edge join
      // a second time there (same total edge passes, half the jobs).
      val hraw = e.join(h(auth), col("dst") === col("node"))
        .groupBy(col("src").as("node")).agg(sum(col("w") * col("a")).as("h"))
      val hn = { val n = l1norm(hraw, "h"); if (bcast) n.coalesce(1) else n }
      hub = if (i == iters) Ckpt.step(hn, i, reliableEvery) else hn
      val araw = e.join(h(hub), col("src") === col("node"))
        .groupBy(col("dst").as("node")).agg(sum(col("w") * col("h")).as("a"))
      auth = Ckpt.step(
        { val n = l1norm(araw, "a"); if (bcast) n.coalesce(1) else n },
        i, reliableEvery)
    }
    nodeTab
      .join(hub, Seq("node"), "left")
      .join(auth, Seq("node"), "left")
      .select(col("node"),
        scoreOut(coalesce(col("h"), lit(0.0))).as("hub"),
        scoreOut(coalesce(col("a"), lit(0.0))).as("authority"))
  }

  /** Adamic–Adar link prediction over an undirected edge list: for every
    * NON-adjacent pair (u, w) sharing at least one neighbor,
    * AA(u, w) = Σ_{v ∈ N(u)∩N(w)} 1/ln(deg v) — rare shared friends
    * count more (Adamic & Adar '03). A shared neighbor has degree ≥ 2 by
    * construction, so ln(deg) > 0 always.
    *
    * Wedge enumeration at the shared neighbor costs Σ_v deg(v)² — unlike
    * [[triangleStats]] the degree-ordered orientation does NOT apply,
    * because the pair (u, w) must be scored at EVERY common v, not a
    * canonical one. The scale control is `maxDegree`: wedge CENTERS
    * above it are skipped, the standard hub cap — a 10⁶-degree hub would
    * contribute 10¹² wedges of weight 1/ln(10⁶) ≈ 0.07 each, a flood of
    * near-zero evidence. Skipped hubs are still counted in every node's
    * DEGREE (the cap prunes wedge centers, never the graph). The final
    * anti-join removes already-adjacent pairs.
    *
    * Returns (node_a, node_b, n_common, aa_score), node_a < node_b. */
  def adamicAdar(edges: DataFrame, aCol: String, bCol: String,
                 maxDegree: Option[Long],
                 scoreOut: Column => Column): DataFrame = {
    val canon = edges.select(
        least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist()
    val sym = canon.unionAll(canon.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy(col("u").as("node"))
      .agg(count(lit(1)).as("deg"))
    val centers = maxDegree.fold(deg)(cap => deg.filter(col("deg") <= cap))
    // wedges keyed at the center v: (v, u) ⋈ (v, w), u < w — each
    // unordered pair scored once per shared neighbor
    val byCenter = sym.select(col("u").as("ctr"), col("v").as("leaf"))
      .join(centers.select(col("node").as("ctr"),
        (lit(1.0) / log(col("deg").cast("double"))).as("__w")), "ctr")
    val pairs = byCenter.select(col("ctr"), col("leaf").as("na"), col("__w"))
      .join(byCenter.select(col("ctr"), col("leaf").as("nb")), Seq("ctr"))
      .filter(col("na") < col("nb"))
      .groupBy(col("na"), col("nb"))
      .agg(count(lit(1)).as("n_common"), sum("__w").as("__aa"))
    pairs
      .join(canon, col("na") === col("u") && col("nb") === col("v"),
        "left_anti")
      .select(col("na").as("node_a"), col("nb").as("node_b"),
        col("n_common"), scoreOut(col("__aa")).as("aa_score"))
  }

  /** Synchronous label propagation (Raghavan '07) for community
    * detection, made DETERMINISTIC: every node starts labeled with its
    * own id; each superstep relabels every node with its neighbors'
    * modal label, ties broken by the SMALLEST label — the classical
    * random tiebreak replaced by a total order, so the result is a pure
    * function of the graph and an external engine (the unrolled SQL
    * oracle) replays it exactly. Fixed `iters` supersteps (synchronous
    * LPA may oscillate on bipartite structures; a fixed horizon is the
    * standard fix and keeps the oracle finite).
    *
    * Superstep cost: one edge⋈label equi-join + one (node, label) count
    * + one per-node argmax window — all keyed on node ids, state is
    * node-sized, [[Ckpt.step]]-materialized (the Pregel discipline).
    * Returns (node, label) — nodes sharing a label are one community. */
  def labelPropagation(edges: DataFrame, aCol: String, bCol: String,
                       iters: Int, reliableEvery: Int = 0,
                       broadcastNodeLimit: Long = 1000000L): DataFrame = {
    require(iters >= 1 && iters <= 20, s"1 <= iters <= 20, got $iters")
    val canon = edges.select(
        least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val sym = canon.unionAll(canon.select(col("v").as("u"), col("u").as("v")))
      .persist()
    val nodes = sym.select(col("u").as("node")).distinct().persist()
    // broadcast regime (the [[pageRank]] convention): a node-sized label
    // state that fits an executor enters the edge join broadcast — the
    // edge table is never shuffled; above the limit the join shuffles
    val bcast = nodes.count() <= broadcastNodeLimit
    def h(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
    var labels = nodes.withColumn("label", col("node")).localCheckpoint()
    for (i <- 1 to iters) {
      val counted = sym
        .join(h(labels.select(col("node").as("v"), col("label").as("nl"))), "v")
        .groupBy(col("u").as("node"), col("nl"))
        .agg(count(lit(1)).as("c"))
      val pick = Window.partitionBy("node")
        .orderBy(col("c").desc, col("nl").asc)
      labels = Ckpt.step(
        counted.withColumn("__rk", row_number().over(pick))
          .filter(col("__rk") === 1)
          .select(col("node"), col("nl").as("label")),
        i, reliableEvery)
    }
    labels
  }

  /** One-level Louvain modularity communities (Blondel, Guillaume,
    * Lambiotte & Lefebvre '08 §2), SEMI-SYNCHRONOUS deterministic
    * variant: each round the ACTIVE half of the nodes (id parity ==
    * round parity — the two-class coloring of Cordasco & Gargano's
    * semi-synchronous label propagation, '11) evaluates, in parallel,
    * the modularity gain of adopting each neighboring community (plus
    * staying put) — gain(i→C) ∝ k_{i,C} − k_i·Σ_tot(C∖i)/(2m), the
    * Blondel ΔQ with the constant 1/(2m) factored out — and adopts the
    * argmax (gain rounded to 6 decimals before ranking, community-id
    * tiebreak, so the replay is total-ordered). The classical algorithm
    * moves nodes one at a time; the parallel sweep trades that
    * sequential optimum for throughput (the trade every distributed
    * Louvain makes — Que et al. IPDPS'15), and the alternating parity
    * classes break the pairwise swap cycles a FULLY synchronous sweep
    * falls into (two singletons adopting each other forever — the
    * GraphExtraSpec fixture oscillates with period 2 without this).
    * Parity is not a proper coloring — same-parity neighbors still move
    * together — so the fixed round budget remains the hard oscillation
    * bound. Node ids must be numeric (id % 2 is the class). Unlike
    * label propagation (q330) the result carries its own quality
    * number: the returned modularity
    * Q = Σ_C [n_int(C)/m − (Σ_tot(C)/(2m))²].
    *
    * Scale shape: per round one label-keyed Σ_tot aggregate, one
    * edge-shaped neighbor-community count, a full-outer candidate
    * union, and a per-node argmax window — all partitioned by node or
    * label, nothing corpus-global except the scalar edge-count m
    * (a scalar-aggregate crossjoin, no collected metadata). Labels are
    * [[Ckpt.step]]-materialized per round (the Pregel discipline, with
    * the `reliableEvery` durable-checkpoint contract).
    *
    * Returns the `topK` communities by size:
    * (community, n_nodes, n_internal, sigma_tot, modularity) —
    * modularity is the whole-partition Q, repeated per row. */
  def louvainOneLevel(edges: DataFrame, aCol: String, bCol: String,
                      rounds: Int, topK: Int, scoreOut: Column => Column,
                      reliableEvery: Int = 0): DataFrame = {
    require(rounds >= 1 && rounds <= 10, s"1 <= rounds <= 10, got $rounds")
    val canon = canonEdges(edges, aCol, bCol).persist()
    val (labels, bcast) = louvainSweepW(canon.withColumn("w", lit(1.0)),
      rounds, scoreOut, reliableEvery, roundOffset = 0)
    val (comm, qRow) = communitySummary(canon, labels, bcast)
    comm.crossJoin(broadcast(qRow))
      .select(col("label").as("community"), col("n_nodes"),
        col("n_int").cast("long").as("n_internal"),
        col("stot").cast("long").as("sigma_tot"),
        scoreOut(col("__q")).as("modularity"))
      .orderBy(col("n_nodes").desc, col("community"))
      .limit(topK)
  }

  /** Multi-level Louvain (Blondel '08 §2, the aggregation phase): run
    * the one-level semi-synchronous sweep, CONTRACT each community to a
    * super-node (parallel edges merge by weight sum; intra-community
    * edges become self-loops carrying their weight — a self-loop
    * contributes 2w to its super-node's weighted degree and nothing to
    * any neighbor gain), run the SAME weighted sweep on the contracted
    * graph, and compose labels back onto the original nodes. Modularity
    * of a contracted partition equals modularity of the induced
    * partition on the original graph, so both levels' Q are computed
    * where they are defined: on the original edges. The classical
    * sequential algorithm is monotone in Q by construction; a PARALLEL
    * sweep can overshoot, so this operator keeps the BETTER of the two
    * partitions (one 1-row collect per level — the bounded-scalar
    * driver-collect convention), making Q(level 2) ≥ Q(level 1) a
    * guarantee rather than a hope. The contracted graph is
    * community-sized — the level-2 sweep costs a vanishing fraction of
    * level 1 at scale.
    *
    * Returns the `topK` level-2 communities by ORIGINAL-node count:
    * (community, n_nodes, n_internal, sigma_tot, modularity_l1,
    * modularity_l2). */
  def louvainMultiLevel(edges: DataFrame, aCol: String, bCol: String,
                        rounds: Int, topK: Int, scoreOut: Column => Column,
                        reliableEvery: Int = 0,
                        seqLimit: Long = 1000000L): DataFrame = {
    require(rounds >= 1 && rounds <= 10, s"1 <= rounds <= 10, got $rounds")
    val spark = edges.sparkSession
    val canon = canonEdges(edges, aCol, bCol).persist()
    val (l1u, bcast) = louvainSweepW(canon.withColumn("w", lit(1.0)), rounds,
      scoreOut, reliableEvery, roundOffset = 0)
    val l1 = l1u.persist()
    // node-sized label frames ride the edge-shaped joins broadcast in
    // the bounded regime (the sweep's probe decides once)
    def hb(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
    val superE = canon
      .join(hb(l1.select(col("node").as("u"), col("label").as("la"))), "u")
      .join(hb(l1.select(col("node").as("v"), col("label").as("lb"))), "v")
      .select(least(col("la"), col("lb")).as("u"),
        greatest(col("la"), col("lb")).as("v"))
      .groupBy("u", "v").agg(count(lit(1)).cast("double").as("w"))
      .persist()
    // Level-2 regime switch. The parity sweep's simultaneous moves are
    // the right trade on a node-scale graph, but on the CONTRACTED graph
    // they degenerate: community labels concentrate on one id parity and
    // same-parity super-node chains chase each other's stale labels
    // (measured on a contracted path: three super-nodes cycle for every
    // round budget, zero net moves). The contracted graph is community-
    // sized — the entire point of the aggregation phase — so up to
    // `seqLimit` super-edges it is collected and swept with Blondel's
    // SEQUENTIAL local moving (ascending-id node order, dec6-rounded
    // gains, community-id tiebreak, move only on strict improvement →
    // every accepted move raises Q, monotone by construction). Beyond
    // the limit the distributed parity sweep runs with a keep-best
    // guard; either way Q(l2) ≥ Q(l1) is a guarantee, not a hope.
    val nSuper = superE.count()
    val l2 =
      if (nSuper <= seqLimit) {
        val triples = superE.collect().map(r =>
          (r.get(0), r.get(1), r.getDouble(2)))
        val moved = seqLocalMoving(triples, rounds)
        val labType = l1.schema("label").dataType
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node", labType),
          org.apache.spark.sql.types.StructField("label", labType)))
        spark.createDataFrame(
          spark.sparkContext.parallelize(
            moved.toSeq.map { case (a, b) =>
              org.apache.spark.sql.Row(a, b) }, 1),
          schema)
      } else
        louvainSweepW(superE, rounds, scoreOut, reliableEvery,
          roundOffset = rounds)._1
    val composed = l1.select(col("node"), col("label").as("__c1"))
      .join(l2.select(col("node").as("__c1"), col("label")), "__c1")
      .select(col("node"), col("label"))
      .localCheckpoint()
    val (_, q1Row) = communitySummary(canon, l1, bcast)
    val (comm2, q2Row) = communitySummary(canon, composed, bcast)
    val q1 = q1Row.head.getDouble(0)
    val q2 = q2Row.head.getDouble(0)
    // keep-best: a level-2 sweep that overshot (only possible on the
    // distributed branch) is discarded and level 1 IS the final
    // partition (then modularity_l2 = modularity_l1)
    val (commF, qF) =
      if (q2 + 1e-12 >= q1) (comm2, q2)
      else communitySummary(canon, l1, bcast)._1 -> q1
    commF
      .select(col("label").as("community"), col("n_nodes"),
        col("n_int").cast("long").as("n_internal"),
        col("stot").cast("long").as("sigma_tot"),
        scoreOut(lit(q1)).as("modularity_l1"),
        scoreOut(lit(qF)).as("modularity_l2"))
      .orderBy(col("n_nodes").desc, col("community"))
      .limit(topK)
  }

  /** Blondel's sequential local-moving pass over a collected WEIGHTED
    * canonical edge list (u ≤ v, self-loops allowed) — the level-2
    * driver-side sweep of [[louvainMultiLevel]]: nodes visited in
    * ascending id order, each adopting the strictly-best-gain neighbor
    * community (gain rounded to 6 decimals before comparison, smallest
    * community id on ties — the same total order as the distributed
    * sweep), up to `maxPasses` passes with early stop when a pass moves
    * nothing. Every accepted single move raises modularity, so the
    * result is monotone by construction. Node ids must share one
    * runtime type with a total order (the community labels do). */
  private[graft] def seqLocalMoving(triples: Array[(Any, Any, Double)],
                                    maxPasses: Int): Map[Any, Any] = {
    def rnd6(x: Double): Double =
      math.floor(x * 1e6 + graft.queries.Q.BIAS) / 1e6
    implicit val ord: Ordering[Any] = new Ordering[Any] {
      def compare(a: Any, b: Any): Int = (a, b) match {
        case (x: Long, y: Long) => java.lang.Long.compare(x, y)
        case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
        case (x: String, y: String) => x.compareTo(y)
        case (x: Number, y: Number) =>
          java.lang.Double.compare(x.doubleValue(), y.doubleValue())
        case _ => a.toString.compareTo(b.toString)
      }
    }
    val adj = scala.collection.mutable.Map.empty[Any,
      scala.collection.mutable.Map[Any, Double]]
    var selfW = Map.empty[Any, Double].withDefaultValue(0.0)
    var m = 0.0
    triples.foreach { case (u, v, w) =>
      m += w
      if (u == v) selfW += u -> (selfW(u) + w)
      else {
        adj.getOrElseUpdate(u, scala.collection.mutable.Map.empty)
          .updateWith(v)(o => Some(o.getOrElse(0.0) + w))
        adj.getOrElseUpdate(v, scala.collection.mutable.Map.empty)
          .updateWith(u)(o => Some(o.getOrElse(0.0) + w))
      }
    }
    val nodes = (adj.keySet ++ selfW.keySet).toSeq.sorted
    val k = nodes.map(n => n ->
      (adj.get(n).map(_.values.sum).getOrElse(0.0) + 2.0 * selfW(n))).toMap
    val label = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    val stot = scala.collection.mutable.Map(nodes.map(n => n -> k(n)): _*)
    var pass = 0
    var movedAny = true
    while (pass < maxPasses && movedAny) {
      movedAny = false
      nodes.foreach { n =>
        val cur = label(n)
        val kic = scala.collection.mutable.Map.empty[Any, Double]
        adj.getOrElse(n, scala.collection.mutable.Map.empty).foreach {
          case (nb, w) =>
            kic.updateWith(label(nb))(o => Some(o.getOrElse(0.0) + w))
        }
        def gain(c: Any): Double = {
          val adjStot = stot(c) - (if (c == cur) k(n) else 0.0)
          rnd6(kic.getOrElse(c, 0.0) - k(n) * adjStot / (2.0 * m))
        }
        val cands = (kic.keySet + cur).toSeq.sorted
        val best = cands.maxBy(c => (gain(c), c))(
          Ordering.Tuple2(Ordering.Double.TotalOrdering, ord.reverse))
        if (best != cur && gain(best) > gain(cur)) {
          stot(cur) -= k(n)
          stot.updateWith(best)(o => Some(o.getOrElse(0.0) + k(n)))
          label(n) = best
          movedAny = true
        }
      }
      pass += 1
    }
    label.toMap
  }

  /** DOULION global-triangle-count estimate (Tsourakakis, Kang &
    * Faloutsos, KDD'09): keep each canonical edge with probability
    * p = keepPct/100 via a DETERMINISTIC md5-derived coin (cross-engine
    * replayable — the q66 hash convention), count triangles EXACTLY on
    * the sparsified graph with the same degree-ordered census, and
    * correct by p⁻³ (a triangle survives iff its three edges all
    * survive, independently under the hash coin). The estimator is
    * unbiased; the independence approximation puts relative σ at
    * ≈ sqrt((p³)⁻¹ − 1)/sqrt(T), and triangles SHARING edges add
    * positive covariance on top (the paper's §4 caveat — on the dense
    * co-activity gate graph one p = 0.5 draw lands ~29% high against
    * q246's exact 1003, within that inflated band). p is the
    * accuracy/cost knob. Complementary to [[triangleStats]]'s
    * `maxDegree` cap: the cap changes the EXPONENT by excluding hubs
    * exactly; DOULION keeps every node in scope (hub triangles counted
    * in expectation) at a p² constant-factor discount on wedge work.
    * At 100 TB: cap when celebrity coefficients are noise, DOULION when
    * the global count itself is the product.
    *
    * Returns one row: (keep_pct, n_edges_sampled, n_tri_sampled,
    * est_triangles). */
  def triangleCountDoulion(edges: DataFrame, aCol: String, bCol: String,
                           keepPct: Int,
                           scoreOut: Column => Column): DataFrame = {
    require(keepPct >= 1 && keepPct <= 100,
      s"1 <= keepPct <= 100, got $keepPct")
    val canon = canonEdges(edges, aCol, bCol)
    val coin = conv(substring(md5(concat(col("u").cast("string"), lit(":"),
      col("v").cast("string"))), 1, 6), 16, 10).cast("long") % 100
    val kept = canon.filter(coin < keepPct).persist()
    val triCnt = triangleStats(kept, "u", "v", scoreOut = identity)
      .agg((sum("n_triangles") / lit(3)).cast("long").as("n_tri_sampled"))
    val p3 = lit(keepPct / 100.0) * lit(keepPct / 100.0) * lit(keepPct / 100.0)
    kept.agg(count(lit(1)).as("n_edges_sampled"))
      .crossJoin(broadcast(triCnt))
      .select(lit(keepPct).as("keep_pct"),
        col("n_edges_sampled"),
        coalesce(col("n_tri_sampled"), lit(0L)).as("n_tri_sampled"),
        scoreOut(coalesce(col("n_tri_sampled"), lit(0L)).cast("double") / p3)
          .as("est_triangles"))
  }

  /** Canonical undirected edge set: u < v, loops dropped, deduped. */
  private def canonEdges(edges: DataFrame, aCol: String, bCol: String): DataFrame =
    edges.select(
        least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** The semi-synchronous Louvain sweep of [[louvainOneLevel]],
    * generalized to WEIGHTED canonical edges (u ≤ v, self-loops allowed
    * — the contracted-graph shape): edge weight replaces edge count in
    * the degree, Σ_tot and k_{i,C} sums; a self-loop contributes 2w to
    * its node's weighted degree (standard convention — it is both
    * endpoints) and nothing to any neighbor-community gain. With w ≡ 1
    * and no loops this is EXACTLY the one-level sweep (sums of ones are
    * counts, bit-for-bit). `roundOffset` keeps parity classes and
    * checkpoint indices distinct across levels. */
  private[graft] def louvainSweepW(canonW: DataFrame, rounds: Int,
                            scoreOut: Column => Column, reliableEvery: Int,
                            roundOffset: Int,
                            broadcastNodeLimit: Long = 1000000L)
      : (DataFrame, Boolean) = {
    val nonLoop = canonW.filter(col("u") =!= col("v"))
    val loops = canonW.filter(col("u") === col("v"))
      .groupBy(col("u").as("node")).agg(sum("w").as("__wl"))
    val sym = nonLoop.select(col("u"), col("v"), col("w"))
      .unionAll(nonLoop.select(col("v").as("u"), col("u").as("v"), col("w")))
      .persist()
    val nodes = canonW.select(col("u").as("node"))
      .unionAll(canonW.select(col("v").as("node"))).distinct().persist()
    val deg = nodes
      .join(sym.groupBy(col("u").as("node")).agg(sum("w").as("__wd")),
        Seq("node"), "left")
      .join(loops, Seq("node"), "left")
      .select(col("node"), (coalesce(col("__wd"), lit(0.0)) +
        lit(2.0) * coalesce(col("__wl"), lit(0.0))).as("deg"))
    val mRow = canonW.agg(sum("w").as("m"))
    // Broadcast regime (the [[pageRank]] convention): the label state is
    // node-sized; when it fits an executor, shipping it into the edge
    // join broadcast beats shuffling the edge table — one count on the
    // persisted node table decides. Above the limit every node-keyed
    // join shuffles (web-scale regime), exactly as before.
    val bcast = nodes.count() <= broadcastNodeLimit
    def h(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
    // the label state CARRIES the node's static weighted degree: the
    // per-round Σ_tot aggregate and the gain scoring read it off the
    // state instead of re-joining the degree table every round (two
    // node-keyed joins per round removed — post-localCheckpoint the
    // node-sized state has no stats and those joins planned as full
    // SortMergeJoins)
    var labels = nodes.join(deg, "node")
      .select(col("node"), col("node").as("label"), col("deg"))
      .localCheckpoint()
    for (i <- 1 to rounds) {
      val lab = labels
      val active = ((i + roundOffset) % 2).toLong
      val isActive = pmod(col("node").cast("long"), lit(2L)) === active
      val act = lab.filter(isActive)
      val stot = lab.groupBy("label").agg(sum("deg").as("stot"))
      // candidate set = neighbor communities ∪ {current}, built as ONE
      // partial-aggregated sum instead of the former aggregate +
      // full-outer join: the stay row rides the union as a kic=0.0 term
      // (x + 0.0 is exact for every IEEE double, and an empty neighbor
      // sum lands on 0.0 exactly as the former coalesce did)
      val counted = sym
        .filter(pmod(col("u").cast("long"), lit(2L)) === active)
        .join(h(lab.select(col("node").as("v"), col("label").as("nl"))), "v")
        .select(col("u").as("node"), col("nl"), col("w").as("kic"))
        .unionByName(act.select(col("node"), col("label").as("nl"),
          lit(0.0).as("kic")))
        .groupBy("node", "nl").agg(sum("kic").as("kic"))
      val stotAdj = col("stot") -
        when(col("nl") === col("label"), col("deg")).otherwise(lit(0.0))
      val scored = counted
        .join(h(act.select(col("node"), col("label"), col("deg"))), "node")
        .join(h(stot.select(col("label").as("nl"), col("stot"))), "nl")
        .crossJoin(broadcast(mRow))
        .withColumn("__s", scoreOut(
          col("kic") - col("deg") * stotAdj / (lit(2.0) * col("m"))))
      val pick = Window.partitionBy("node").orderBy(col("__s").desc, col("nl").asc)
      val moved = scored.withColumn("__rk", row_number().over(pick))
        .filter(col("__rk") === 1)
        .select(col("node"), col("nl").as("label"), col("deg"))
      // coalesce BEFORE the checkpoint: the union's partition count is
      // moved's (one exchange worth) PLUS the previous checkpoint's —
      // uncoalesced it grows by a full exchange width every round
      // (profiled: 64→96→128→160→192-task stages by round 4 for a
      // node-sized label state, pure scheduling overhead). Narrow merge,
      // no shuffle; the node-sized state re-spreads at the next round's
      // exchange anyway.
      labels = Ckpt.step(
        moved.unionByName(lab.filter(!isActive))
          .coalesce(canonW.sparkSession.sparkContext.defaultParallelism),
        i + roundOffset, reliableEvery)
    }
    (labels.select("node", "label"), bcast)
  }

  /** Per-community (n_nodes, n_int, stot) frame + 1-row modularity of a
    * labeling over the UNWEIGHTED canonical edge set — shared by the
    * one-level and multi-level summaries (level-2 quality is computed
    * where it is defined: on the original edges). */
  private def communitySummary(canon: DataFrame, labels: DataFrame,
                               bcast: Boolean): (DataFrame, DataFrame) = {
    // in the bounded regime the node-sized label frame enters the
    // edge-shaped joins broadcast (post-localCheckpoint it has no stats,
    // so those joins would otherwise plan as full SortMergeJoins)
    def h(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
    val sym = canon.unionAll(canon.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy(col("u").as("node"))
      .agg(count(lit(1)).cast("double").as("deg"))
    val mRow = canon.agg(count(lit(1)).cast("double").as("m"))
    val nNodes = labels.groupBy("label").agg(count(lit(1)).as("n_nodes"))
    val stotF = labels.join(deg, "node")
      .groupBy("label").agg(sum("deg").as("stot"))
    val internal = canon
      .join(h(labels.select(col("node").as("u"), col("label").as("la"))), "u")
      .join(h(labels.select(col("node").as("v"), col("label").as("lb"))), "v")
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("label"))
      .agg(count(lit(1)).cast("double").as("n_int"))
    // persisted: every caller reads comm twice (the 1-row modularity
    // aggregate AND the final community frame) — unpersisted, the three
    // label joins re-execute per consumer. Community-sized, so the
    // cache is trivially small.
    val comm = nNodes.join(stotF, "label")
      .join(internal, Seq("label"), "left")
      .select(col("label"), col("n_nodes"),
        coalesce(col("n_int"), lit(0.0)).as("n_int"), col("stot"))
      .persist()
    val qRow = comm.crossJoin(broadcast(mRow))
      .agg(sum(col("n_int") / col("m") -
        (col("stot") / (lit(2.0) * col("m"))) *
          (col("stot") / (lit(2.0) * col("m")))).as("__q"))
    (comm, qRow)
  }

  /** k-core of an undirected graph: the maximal subgraph where every
    * node keeps degree ≥ k, by the standard iterative peel — drop
    * sub-k nodes, recompute degrees on the induced subgraph, repeat to
    * fixpoint (Seidman '83; convergence ≤ #nodes rounds, in practice a
    * handful). Each round is one degree aggregate + two semi-joins, all
    * keyed on node ids; surviving-edge state is [[Ckpt.step]]-
    * materialized per round (the Pregel discipline — and the same
    * `reliableEvery` fault contract). The per-round `count()` on the
    * node-sized degree table is the fixpoint test — one scalar job per
    * round, the honest cost of a data-dependent loop.
    *
    * Returns the surviving (node, degree) — degree within the core. */
  def kCore(edges: DataFrame, aCol: String, bCol: String, k: Int,
            maxRounds: Int = 50, reliableEvery: Int = 0,
            broadcastNodeLimit: Long = 1000000L): DataFrame = {
    require(k >= 1, s"k >= 1, got $k")
    var e = edges.select(
        least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var keepCount = -1L
    var round = 1
    var deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    var done = false
    while (round <= maxRounds && !done) {
      val keep = deg.filter(col("degree") >= k).persist()
      val n = keep.count()
      if (n == keepCount || n == 0) done = true
      else {
        keepCount = n
        // the fixpoint count doubles as the broadcast-regime probe (the
        // [[pageRank]] convention, zero extra jobs): a keep-set that fits
        // an executor rides both semi-joins broadcast, so the surviving
        // edge table is filtered in place instead of shuffled twice per
        // peel round; above the limit the semi-joins shuffle as before
        def h(df: DataFrame): DataFrame =
          if (n <= broadcastNodeLimit) broadcast(df) else df
        e = Ckpt.step(
          e.join(h(keep.select(col("node").as("u"))), Seq("u"), "left_semi")
            .join(h(keep.select(col("node").as("v"))), Seq("v"), "left_semi"),
          round, reliableEvery)
        deg = e.select(col("u").as("node"))
          .unionAll(e.select(col("v").as("node")))
          .groupBy("node").agg(count(lit(1)).as("degree"))
      }
      // the eager checkpoint above (or the fixpoint decision) has consumed
      // this round's keep-set — release it, or a long peel accumulates one
      // node-sized cache per round for the life of the job
      keep.unpersist()
      round += 1
    }
    deg.filter(col("degree") >= k)
  }
}
