package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusOps
import graft.queries.Q.dec6

/** HLL overlap-estimate guarantees (the q156 gate is rows-only): the
  * inclusion-exclusion estimates track exact distinct counts within the
  * sketch error, amplified for the derived intersection. */
class CorpusOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("estimates track exact distinct counts; jaccard within tolerance") {
    val docs = graft.sources.Tables.documents(spark, sfTiny)
    val a = docs.filter(col("lang") === "en")
    val b = docs.filter(col("lang") =!= "en")
    def exactSet(df: org.apache.spark.sql.DataFrame): Set[String] = df
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("t"))
      .filter(col("t") =!= "").select("t").as[String].collect().toSet
    val (sa, sb) = (exactSet(a), exactSet(b))
    val exactJ = (sa intersect sb).size.toDouble / (sa union sb).size
    val row = CorpusOps.hllOverlap(a, b, "text", lgK = 12, scoreOut = dec6).head()
    // lgK=12 → ~1.6% relative standard error per estimate; allow 5% on
    // the direct cardinalities and a looser bound on the subtracted
    // intersection-derived jaccard
    assert(math.abs(row.getLong(0) - sa.size) <= sa.size * 0.05,
      s"card_a ${row.getLong(0)} vs exact ${sa.size}")
    assert(math.abs(row.getLong(1) - sb.size) <= sb.size * 0.05)
    assert(math.abs(row.getLong(2) - (sa union sb).size) <= (sa union sb).size * 0.05)
    assert(math.abs(row.getDouble(4) - exactJ) <= 0.1,
      s"jaccard est ${row.getDouble(4)} vs exact $exactJ")
  }

  test("disjoint corpora estimate ~zero overlap; identical corpora ~full") {
    val a = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val b = Seq((2L, "epsilon zeta eta theta")).toDF("doc_id", "text")
    val disj = CorpusOps.hllOverlap(a, b, "text", lgK = 12, scoreOut = dec6).head()
    assert(math.abs(disj.getLong(3)) <= 1, s"disjoint inter_est ${disj.getLong(3)}")
    val same = CorpusOps.hllOverlap(a, a, "text", lgK = 12, scoreOut = dec6).head()
    assert(same.getDouble(4) > 0.95, s"identical jaccard ${same.getDouble(4)}")
  }
}
