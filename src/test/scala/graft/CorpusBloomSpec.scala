package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusOps
import graft.sources.Tables

/** Bloom-filtered decontamination (q113) against the exact join (q80):
  * the bloom prefilter must never miss a contaminated document (inclusion
  * property — a gram that was inserted always probes true), and its false
  * positives must stay near the configured rate, or the "prefilter"
  * wouldn't prune anything. Also pins determinism: two independent builds
  * of the filter produce identical per-doc hit counts (seed-fixed
  * insertion hashes + order-independent OR-merge). */
class CorpusBloomSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def sides = {
    val docs = Tables.documents(spark, dir)
    (docs.filter(col("doc_id") % 37 =!= 0), docs.filter(col("doc_id") % 37 === 0))
  }

  test("bloom hits dominate exact hits per doc; flags have no false negatives") {
    val (train, eval) = sides
    val exact = CorpusOps.contamination(train, eval, "doc_id", "text", n = 5)
    val bloom = CorpusOps.bloomContamination(train, eval, "doc_id", "text", n = 5,
      expectedItems = 100000L, fpp = 1e-4)
    val joined = exact.join(bloom, "doc_id")
    assert(joined.filter(col("n_bloom_hits") < col("n_shared")).isEmpty,
      "bloom prefilter MISSED grams the exact join found — inclusion violated")
    assert(joined.filter(col("contaminated") === 1 && col("flagged") === 0).isEmpty,
      "a contaminated doc escaped the bloom flag — false negative")
  }

  test("false-positive docs stay rare enough to prune") {
    val (train, eval) = sides
    val exact = CorpusOps.contamination(train, eval, "doc_id", "text", n = 5)
    val bloom = CorpusOps.bloomContamination(train, eval, "doc_id", "text", n = 5,
      expectedItems = 100000L, fpp = 1e-4)
    val joined = exact.join(bloom, "doc_id")
    val clean = joined.filter(col("contaminated") === 0)
    val falseFlagged = clean.filter(col("flagged") === 1).count()
    val total = clean.count()
    assert(total > 0)
    // ~190 grams/doc at fpp 1e-4 => expected false-flag rate ~2%; the
    // filter is overprovisioned (100k capacity vs ~2.5k grams) so the
    // realized rate is lower still — 10% is a generous stability bound
    assert(falseFlagged.toDouble / total <= 0.10,
      s"$falseFlagged of $total clean docs false-flagged — prefilter prunes nothing")
  }

  test("filter build is deterministic: independent builds agree per doc") {
    val (train, eval) = sides
    def build() = CorpusOps.bloomContamination(train, eval, "doc_id", "text",
      n = 5, expectedItems = 100000L, fpp = 1e-4)
    val a = build(); val b = build()
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "two builds of the bloom filter disagree — determinism broken")
  }
}
