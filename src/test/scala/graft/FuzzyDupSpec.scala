package graft

import graft.operators.DedupOps

/** Blocked edit-distance dedup: confirmed typo-copies, threshold
  * rejection, and full recall across length-bucket boundaries. */
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

  test("pairs straddling a length-bucket boundary within maxDist are found") {
    val t = "x" * 63
    // lengths 63 and 65 fall in buckets 1 and 2 of lenBucket=32; the
    // SMALLER id is in the HIGHER bucket, pinning that cross-bucket pairs
    // survive the pair-dedup predicate regardless of which side holds the
    // lower bucket (round-7's same-bucket join lost exactly this pair).
    val docs = Seq((1L, "en", t + "yy"), (2L, "en", t)).toDF("doc_id", "lang", "text")
    val out = DedupOps.fuzzyDupPairs(docs, "doc_id", "text",
      blockCols = Seq("lang"), lenBucket = 32, maxDist = 5).collect()
    assert(out.length == 1, s"straddling pair must be a candidate, got ${out.toSeq}")
    assert((out.head.getLong(0), out.head.getLong(1)) == (1L, 2L),
      "output ids must be canonicalized id_a < id_b")
    assert(out.head.getInt(2) == 2)
  }

  test("same-bucket pairs are emitted exactly once (no explode double-count)") {
    val t = "y" * 40 // both length 40-41 -> same bucket of 32
    val docs = Seq((1L, "en", t), (2L, "en", t + "z")).toDF("doc_id", "lang", "text")
    val out = DedupOps.fuzzyDupPairs(docs, "doc_id", "text",
      blockCols = Seq("lang"), lenBucket = 32, maxDist = 5).collect()
    assert(out.length == 1 && out.head.getInt(2) == 1, s"got ${out.toSeq}")
  }

  test("full recall when lenBucket > maxDist: blocked == unblocked confirm set") {
    // lengths spread across several buckets with pairs sitting right on
    // boundaries; brute-force confirm (single block key) is the truth
    val base = "the quick brown fox jumps over the lazy dog"
    val docs = (0 until 12).map { i =>
      (i.toLong, "en", base + ("!" * i * 3)) // lengths 44..77, bucket=16 edges
    }.toDF("doc_id", "lang", "text")
    def pairs(lenBucket: Int) = DedupOps.fuzzyDupPairs(docs, "doc_id", "text",
        blockCols = Seq("lang"), lenBucket = lenBucket, maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val blocked = pairs(lenBucket = 16)           // 16 > maxDist 5
    val exhaustive = pairs(lenBucket = 1000000)   // one bucket = all pairs
    assert(blocked == exhaustive, s"recall gap: ${exhaustive -- blocked}")
    assert(exhaustive.nonEmpty, "fixture must produce confirmable pairs")
  }
}
