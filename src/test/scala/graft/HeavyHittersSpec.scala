package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

/** Misra–Gries guarantees, cross-validated against exact counts under
  * different partitionings (the merge path must not weaken the bounds):
  *   1. every item with true frequency > N/(k+1) appears in the summary;
  *   2. every reported count is a lower bound on the true frequency;
  *   3. no reported count undershoots by more than N/(k+1). */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // 5 heavy items over a long tail of singletons
  private val heavy = Seq("alpha" -> 2000, "beta" -> 1200, "gamma" -> 700,
    "delta" -> 500, "epsilon" -> 350)
  private def corpus = {
    val h = heavy.flatMap { case (w, n) => Seq.fill(n)(w) }
    val tail = (0 until 8000).map(i => s"t$i")
    // deterministic interleave so heavy items spread across partitions
    val all = (h ++ tail).zipWithIndex.sortBy { case (w, i) =>
      graft.functions.MinHash.mix(i.toLong) }.map(_._1)
    all.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
  }

  private def check(nPartitions: Int, capacity: Int): Unit = {
    val docs = corpus.repartition(nPartitions)
    val n = heavy.map(_._2).sum + 8000
    val bound = n.toDouble / (capacity + 1)
    val got = CorpusOps.heavyHitterVocab(docs, "text", capacity)
      .as[(String, Long)].collect().toMap
    assert(got.size <= capacity)
    val exact = heavy.toMap
    heavy.foreach { case (w, f) =>
      if (f > bound)
        assert(got.contains(w), s"guaranteed heavy item $w (freq $f > $bound) missing")
    }
    got.foreach { case (w, c) =>
      val t = exact.getOrElse(w, 1).toLong
      assert(c <= t, s"$w: reported $c exceeds true $t — not a lower bound")
      assert(t - c <= bound + 1e-9, s"$w: undershoot ${t - c} exceeds N/(k+1)=$bound")
    }
  }

  test("guarantees hold single-partition (pure update path)") {
    check(nPartitions = 1, capacity = 32)
  }

  test("guarantees hold across 8 partitions (merge path)") {
    check(nPartitions = 8, capacity = 32)
  }

  test("capacity 1 degenerates to the majority-candidate (Boyer-Moore) shape") {
    val docs = Seq((1L, "x x x x x y z")).toDF("id", "text")
    val got = CorpusOps.heavyHitterVocab(docs, "text", 1)
      .as[(String, Long)].collect()
    // x has strict majority (5 of 7 > N/2) — the k=1 guarantee REQUIRES it
    // to be the surviving candidate with a positive lower bound
    assert(got.length === 1)
    assert(got.head._1 === "x" && got.head._2 >= 1L)
  }
}
