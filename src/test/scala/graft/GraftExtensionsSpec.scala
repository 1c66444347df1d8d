package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions path: a session configured with
  * `spark.sql.extensions=graft.GraftExtensions` can call the custom
  * functions from plain SQL with no registration call. */
class GraftExtensionsSpec extends AnyFunSuite {
  test("graft_dot and graft_l2norm resolve through spark.sql.extensions") {
    // the suite JVM may hold a default session without extensions; force a
    // fresh session (same SparkContext) so the builder applies them
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // spark.sql.extensions is a STATIC conf (read from the SparkContext at
    // creation) — in a shared-context JVM use the builder hook, which is the
    // same injection path the conf triggers on a fresh cluster
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val row = spark.sql(
        "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "graft_l2norm(array(3.0D, 4.0D)) AS n").collect().head
      assert(row.getDouble(0) == 11.0)
      assert(row.getDouble(1) == 5.0)
      // regression: float/int arrays must be coerced, not misread as doubles
      val f = spark.sql(
        "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS d, " +
        "graft_dot(array(1, 2), array(3, 4)) AS di").collect().head
      assert(f.getDouble(0) == 14.0)
      assert(f.getDouble(1) == 11.0)
      // sorted-merge intersect count: overlap, disjoint, empty
      val s = spark.sql(
        "SELECT graft_isect_sorted(array(1L, 3L, 5L, 9L), array(3L, 4L, 5L, 10L)) AS a, " +
        "graft_isect_sorted(array(1L, 2L), array(3L, 4L)) AS b, " +
        "graft_isect_sorted(array(), array(1L)) AS c").collect().head
      assert(s.getLong(0) == 2L && s.getLong(1) == 0L && s.getLong(2) == 0L)
      // optimizer rule: size(array_intersect) over non-null long arrays is
      // rewritten to intersectcount (no intersection array materialized).
      // spark.range input: literal arrays would constant-fold to a
      // LocalRelation before the plan assertion could see the rewrite
      val df = spark.range(2)
        .selectExpr("array(id, id + 1, 3L) AS a", "array(id + 1, 9L) AS b")
        .selectExpr("size(array_intersect(a, b)) AS n")
      assert(df.queryExecution.optimizedPlan.toString.toLowerCase.contains("intersectcount"),
        "rule did not fire:\n" + df.queryExecution.optimizedPlan)
      assert(df.orderBy("n").collect().map(_.getInt(0)).toSeq == Seq(1, 1))
      // the minhash aggregate resolves from SQL and matches the library path:
      // min per lane over both groups == lanes of the merged group
      val mh = spark.sql(
        "SELECT graft_minhash(h, 4) AS s FROM VALUES (1L), (2L), (3L) AS t(h)")
        .collect().head.getSeq[Long](0)
      val parts = spark.sql(
        "SELECT graft_minhash(h, 4) AS s FROM VALUES (1L), (2L) AS t(h) " +
        "UNION ALL SELECT graft_minhash(h, 4) FROM VALUES (3L) AS t(h)")
        .collect().map(_.getSeq[Long](0))
      val merged = parts(0).zip(parts(1)).map { case (a, b) => math.min(a, b) }
      assert(mh == merged)
      // the planner strategy injects too: a raw AsOfJoin logical node plans
      // and executes WITHOUT JoinOps' programmatic extraStrategies
      // registration (this fresh session never called asofJoinNative)
      import spark.implicits._
      val l = Seq((1L, 10L), (1L, 20L)).toDF("k", "ts")
      val r = Seq((1L, 5L, 100.0), (1L, 15L, 200.0)).toDF("k", "ts", "v")
      val lp = l.queryExecution.analyzed
      val rp = r.queryExecution.analyzed
      def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
        p.output.find(_.name == n).get
      val asof = org.apache.spark.sql.GraftSqlShim.ofRows(spark,
        graft.plans.AsOfJoin(lp, rp, Seq(attr(lp, "k")), Seq(attr(rp, "k")),
          attr(lp, "ts"), attr(rp, "ts"), Seq(attr(rp, "v")), Nil))
      assert(asof.orderBy("ts").collect().map(row => row.getDouble(2)).toSeq ==
        Seq(100.0, 200.0))
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
