package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** The winnowing guarantees (Schleimer et al., SIGMOD'03) hold on the
  * engine's implementation: determinism, the shared-run guarantee, sketch
  * density, and the short-document convention. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val k = 3
  private val w = 4

  private def sketch(texts: String*): Map[Int, Seq[Long]] = {
    texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
      .withColumn("t", TextOps.tokens(col("text")))
      .withColumn("g", TextOps.gramHashes(col("t"), k))
      .select(col("id"), TextOps.winnowMins(col("g"), w).as("fp"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
  }

  test("identical docs have identical sketches; disjoint docs share nothing") {
    val s = sketch(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "one two three four five six seven eight nine ten")
    assert(s(0) == s(1))
    assert(s(0).toSet.intersect(s(2).toSet).isEmpty)
  }

  test("docs sharing a run of >= w+k-1 tokens share at least one fingerprint") {
    // shared run of w+k-1 = 6 tokens embedded in different contexts
    val run = "red orange yellow green blue indigo"
    val s = sketch(
      s"prefix words here $run and a tail of junk",
      s"completely different start $run unrelated ending tokens now")
    assert(s(0).toSet.intersect(s(1).toSet).nonEmpty,
      "winnowing guarantee violated: shared 6-token run selected no common fingerprint")
  }

  test("sketch is much smaller than the gram count on long docs") {
    val long = (1 to 500).map(i => s"tok$i").mkString(" ")
    val s = sketch(long)
    val nGrams = 500 - k + 1
    assert(s(0).size < nGrams / 2, s"sketch ${s(0).size} of $nGrams grams")
    assert(s(0).nonEmpty)
  }

  test("short docs: fewer grams than the window still yield one fingerprint") {
    val s = sketch("just four tokens here") // 2 grams < w
    assert(s(0).size == 1)
    assert(sketch("ab")(0).isEmpty) // below k tokens: no grams, empty sketch
  }
}
