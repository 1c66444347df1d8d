package graft

import graft.operators.BpeOps
import org.apache.spark.sql.functions._

/** BPE training contracts, pinned against the hand-worked example from
  * Sennrich, Haddow & Birch (ACL'16, §3.2 / fig. 1): the vocabulary
  * {low×5, lower×2, newest×6, widest×3} must learn exactly
  * es → est → est</w> → lo → low under count-desc / lexicographic
  * tie-break, and encoding an UNSEEN word ("lowest") with those merges
  * must produce the classic [low, est</w>] segmentation. Greedy
  * left-to-right merge semantics are pinned on the overlapping-pair
  * corpus ("aaaa": three (a,a) positions but only two non-overlapping
  * fuses). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(words: (String, Int)*) =
    words.flatMap { case (w, n) => Seq.fill(n)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")

  test("Sennrich example: merge sequence es, est, est</w>, lo, low") {
    val docs = corpus("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
    val out = BpeOps.bpeTrain(docs, "doc_id", "text", merges = 5)
      .orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "est", "</w>", "est</w>", 9L),
      (4, "l", "o", "lo", 7L),
      (5, "lo", "w", "low", 7L)), out.mkString(", "))
  }

  test("greedy left-to-right: overlapping pairs fuse non-overlapping") {
    // "aaaa" has THREE (a,a) adjacencies (count 3) but a greedy pass
    // produces [aa, aa, </w>], and the next round fuses (aa, </w>)
    // before (aa, aa) on the lexicographic r tie ("</w>" < "aa")
    val out = BpeOps.bpeTrain(corpus("aaaa" -> 1), "doc_id", "text",
        merges = 3)
      .orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("a", "a", 3L), ("aa", "</w>", 1L), ("aa", "aa</w>", 1L)),
      out.mkString(", "))
  }

  test("encode applies the learned merges to unseen words") {
    val docs = corpus("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
    val merges = BpeOps.bpeTrain(docs, "doc_id", "text", merges = 5)
      .orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // "lowest" (unseen): l,o,w,e,s,t,</w> → es → est → est</w> → lo →
    // low = [low, est</w>]; "lower" (seen) keeps e,r unfused
    val enc = BpeOps.bpeEncode(
        Seq((1L, "lowest lower")).toDF("doc_id", "text"), "text", merges)
      .select("bpe_tokens").as[Seq[String]].head()
    assert(enc == Seq("low", "est</w>", "low", "e", "r", "</w>"),
      enc.mkString("|"))
  }

  test("early exhaustion: a single-symbol vocab stops before the budget") {
    // one word "ab" → merges (a,b), (ab,</w>), then nothing pairable
    val out = BpeOps.bpeTrain(corpus("ab" -> 4), "doc_id", "text",
        merges = 10)
      .collect()
    assert(out.length == 2, out.mkString(", "))
  }

  test("bulk mapPartitions encoder == composed-expression encoder") {
    val docs = corpus("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
    val merges = BpeOps.bpeTrain(docs, "doc_id", "text", merges = 5)
      .orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val probe = Seq(
      (1L, "g1", "lowest lower"),
      (2L, "g1", "newest widest unseen"),
      (3L, "g2", ""),                       // empty doc: 0 words, 0 tokens
      (4L, "g2", "  low   low  "),          // whitespace runs collapse
      (5L, "g2", "aaaa lowestlow"))
      .toDF("doc_id", "source", "text")
    val viaExpr = BpeOps.bpeEncode(probe, "text", merges)
      .select(col("doc_id"), col("bpe_tokens"))
      .as[(Long, Seq[String])].collect().toMap
    val viaBulk = BpeOps.bpeTokenize(probe, "doc_id", "source", "text", merges)
      .select(col("id"), col("tokens"))
      .as[(Long, Seq[String])].collect().toMap
    assert(viaBulk.keySet == viaExpr.keySet)
    viaBulk.foreach { case (id, toks) =>
      assert(toks == viaExpr(id), s"doc $id: $toks vs ${viaExpr(id)}")
    }
    // n_words is the whitespace word count (the fertility denominator)
    val words = BpeOps.bpeTokenize(probe, "doc_id", "source", "text", merges)
      .select(col("id"), col("n_words")).as[(Long, Long)].collect().toMap
    assert(words == Map(1L -> 2L, 2L -> 3L, 3L -> 0L, 4L -> 2L, 5L -> 2L))
  }

  test("bulk encoder: trained segmentation, cache-independent") {
    val docs = corpus("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
    val merges = BpeOps.bpeTrain(docs, "doc_id", "text", merges = 5)
      .orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // repeated words exercise the per-partition cache path; 1 partition
    // forces every row through the same cache instance
    val rep = Seq((1L, "s", "lowest lowest lowest newest"))
      .toDF("doc_id", "source", "text").coalesce(1)
    val toks = BpeOps.bpeTokenize(rep, "doc_id", "source", "text", merges)
      .select(col("tokens")).as[Seq[String]].head()
    assert(toks == Seq("low", "est</w>", "low", "est</w>", "low", "est</w>",
      "n", "e", "w", "est</w>"), toks.mkString("|"))
  }
}
