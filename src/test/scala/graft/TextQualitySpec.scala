package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Edge semantics of the repetition quality signals (q69 oracle-checks the
  * corpus paths; these pin the degenerate inputs). */
class TextQualitySpec extends SparkSpec {
  import spark.implicits._

  private def fracs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
      .withColumn("t", TextOps.tokens(col("text")))
      .select(col("id"),
        TextOps.topTokenFrac(col("t")).as("tf"),
        TextOps.dupBigramFrac(col("t")).as("df"))
      .collect()
      .map(r => r.getInt(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap

  test("degenerate repetition maxes out; diverse text scores low; single token has no bigrams") {
    val f = fracs(
      "spam spam spam spam",        // tf = 1.0, all bigrams identical -> df = (3-1)/3
      "one two three four five",    // tf = 1/5, df = 0
      "solo")                       // tf = 1.0, df undefined (no bigrams)
    assert(f(0)._1.contains(1.0))
    assert(f(0)._2.contains((3.0 - 1.0) / 3.0))
    assert(f(1)._1.contains(1.0 / 5.0) && f(1)._2.contains(0.0))
    assert(f(2)._1.contains(1.0) && f(2)._2.isEmpty)
  }
}
