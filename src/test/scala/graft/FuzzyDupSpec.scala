package graft

import graft.operators.DedupOps

/** Blocked edit-distance dedup: confirmed typo-copies, threshold
  * rejection, and the documented length-bucket-straddle caveat. */
class FuzzyDupSpec extends SparkSpec {
  import spark.implicits._

  test("finds typo-copies within a block; rejects past the threshold") {
    val base = "the quick brown fox jumps over the lazy dog and keeps going" * 2
    val docs = Seq(
      (1L, "en", base),
      (2L, "en", base.replace("quick", "quvck")),          // 1 edit
      (3L, "en", base.take(40) + base.drop(40).reverse),   // garbled: far
      (4L, "de", base)                                     // other block
    ).toDF("doc_id", "lang", "text")
    val out = DedupOps.fuzzyDupPairs(docs, "doc_id", "text",
      blockCols = Seq("lang"), lenBucket = 32, maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out.contains((1L, 2L)), s"typo copy missed: $out")
    assert(out((1L, 2L)) == 2, s"dist ${out((1L, 2L))}") // quick -> quvck: 1 sub x2 occurrences
    assert(!out.exists { case ((a, b), _) => a == 3L || b == 3L },
      "garbled doc must fail the threshold")
    assert(!out.exists { case ((a, b), _) => a == 4L || b == 4L },
      "cross-language pair must never be a candidate")
  }

  test("documented caveat: pairs straddling a length bucket are not candidates") {
    val t = "x" * 63
    val docs = Seq((1L, "en", t), (2L, "en", t + "yy")).toDF("doc_id", "lang", "text")
    // lengths 63 and 65 fall in buckets 1 and 2 of lenBucket=32
    val out = DedupOps.fuzzyDupPairs(docs, "doc_id", "text",
      blockCols = Seq("lang"), lenBucket = 32, maxDist = 5).collect()
    assert(out.isEmpty, "straddling pair should be (documented) blocked apart")
    // widening the bucket recovers it
    val wide = DedupOps.fuzzyDupPairs(docs, "doc_id", "text",
      blockCols = Seq("lang"), lenBucket = 256, maxDist = 5).collect()
    assert(wide.length == 1 && wide.head.getInt(2) == 2)
  }
}
