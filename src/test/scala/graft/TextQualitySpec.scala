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

  test("readability: hand counts and degenerate floors") {
    val df = Seq((1, "the cat sat. it ran fast! what a day?"), (2, "xyz"))
      .toDF("id", "text")
      .select(col("id"), TextOps.readability(col("text")).as("r"))
      .select(col("id"), col("r.n_sentences"), col("r.n_words"),
        col("r.n_syllables"), col("r.flesch"), col("r.fk_grade"))
    val out = df.collect().map(r => r.getInt(0) -> r).toMap
    val a = out(1)
    // 3 sentence runs, 9 words, 9 vowel-group "syllables" (day -> one
    // 'ay' run)
    assert(a.getLong(1) == 3L && a.getLong(2) == 9L && a.getLong(3) == 9L)
    assert(math.abs(a.getDouble(4) - 119.19) < 1e-9)        // 206.835-3.045-84.6
    assert(math.abs(a.getDouble(5) - (-2.62)) < 1e-9)       // 1.17+11.8-15.59
    // no terminal punctuation / only-consonant-adjacent 'y': floors at 1
    val b = out(2)
    assert(b.getLong(1) == 1L && b.getLong(2) == 1L && b.getLong(3) == 1L)
  }
}
