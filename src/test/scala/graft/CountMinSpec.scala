package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusOps
import graft.sources.Tables

/** Count-Min sketch guarantees, cross-validated against exact counts:
  * point estimates never undershoot, the overshoot respects the ε·N bound,
  * and the sketch itself is byte-identical under repartitioning (merge is
  * exact elementwise addition — no approximation compounding). */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Tables.documents(spark, sfTiny)

  private def exactCounts(terms: Seq[String]): Map[(String, String), Long] =
    docs
      .select(col("source"), explode(graft.operators.TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok").isInCollection(terms))
      .groupBy("source", "tok").count()
      .as[(String, String, Long)].collect()
      .map { case (s, t, c) => (s, t) -> c }.toMap

  test("estimate >= exact for every probed (source, term); wide sketch is exact") {
    val terms = Seq("the", "data", "kiln", "sensor", "quality", "zzz_absent")
    val exact = exactCounts(terms)
    val est = CorpusOps.cmsTokenEstimates(docs, "source", "text", terms,
        depth = 4, width = 1 << 16)
      .as[(String, String, Long)].collect()
    assert(est.nonEmpty)
    est.foreach { case (src, term, e) =>
      val truth = exact.getOrElse((src, term), 0L)
      assert(e >= truth, s"($src,$term): estimate $e < exact $truth")
      // 65k buckets vs a few thousand distinct tokens: collisions across
      // all 4 rows are effectively impossible -> the min is exact
      assert(e == truth, s"($src,$term): wide sketch should be exact, got $e vs $truth")
    }
  }

  test("narrow sketch respects the e/width * N error bound") {
    val terms = Seq("the", "data", "kiln", "sensor", "quality")
    val exact = exactCounts(terms)
    val n = docs
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("t"))
      .filter(col("t") =!= "").count()
    val width = 256
    val eps = math.E / width
    val est = CorpusOps.cmsTokenEstimates(docs, "source", "text", terms,
        depth = 4, width = width)
      .as[(String, String, Long)].collect()
    est.foreach { case (src, term, e) =>
      val truth = exact.getOrElse((src, term), 0L)
      assert(e >= truth, s"($src,$term): estimate $e < exact $truth")
      assert(e - truth <= (eps * n).toLong,
        s"($src,$term): overshoot ${e - truth} above eps*N = ${(eps * n).toLong}")
    }
  }

  test("sketch bytes are identical under different partitionings") {
    graft.functions.VectorFunctions.register(spark)
    def sketchOf(parts: Int): Array[Byte] = docs.repartition(parts)
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .agg(call_function("graft_cms_agg", xxhash64(col("tok")),
        lit(4), lit(1024)).as("s"))
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(sketchOf(3), sketchOf(11)),
      "elementwise-add merge must make the sketch partitioning-invariant")
  }
}
