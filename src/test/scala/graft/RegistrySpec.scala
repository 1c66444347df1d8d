package graft

import graft.queries.Registry

/** Contract checks for the driver surface: every query runs at sf0.001 and
  * the oracle map stays aligned with the query map. */
class RegistrySpec extends SparkSpec {

  test("oracle keys are a subset of query keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every query executes at sf0.001 with a non-degenerate schema") {
    Registry.all.foreach { case (name, q) =>
      val df = q.fn(spark, sfTiny)
      assert(df.columns.nonEmpty, s"$name has no columns")
      val n = df.count()
      assert(n >= 0, s"$name failed to execute")
      withClue(s"$name should generally be non-empty: ") {
        // hash/threshold based pair queries may legitimately be empty at tiny sf
        if (!Set("q56_minhash_lsh", "q57_simhash_pairs", "q55_ngram_jaccard",
                 "q60_cosine_pairs", "q06_anti_join").contains(name)) {
          assert(n > 0)
        }
      }
    }
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
