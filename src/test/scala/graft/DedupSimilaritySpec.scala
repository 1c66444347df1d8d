package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, SimilarityOps}

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat today and slept"),
    (2L, "the cat sat on the mat today and slept"),   // exact dup of 1
    (3L, "the cat sat on the mat today and purred loudly"), // near dup
    (4L, "completely different words entirely unrelated content here now")
  ).toDF("doc_id", "text")

  test("exactDedup groups identical docs under min id") {
    val out = DedupOps.exactDedup(docs, "doc_id", "text")
      .select("doc_id", "canonical_id", "is_duplicate").orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ==
      Seq((1L, 1L, 0), (2L, 1L, 1), (3L, 3L, 0), (4L, 4L, 0)))
  }

  test("ngramJaccardPairs finds exact pair with J=1 and near pair, not the unrelated doc") {
    val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2)
      .orderBy("id_a", "id_b").collect()
    val asMap = pairs.map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(asMap((1L, 2L)) == 1.0)
    assert(asMap.contains(1L -> 3L) && asMap((1L, 3L)) < 1.0)
    assert(!asMap.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("prefix filtering is exact: pairs match naive all-pairs Jaccard on a mixed corpus") {
    // richer corpus: dup cluster, near-dups, overlapping-but-below-threshold,
    // plus one very hot shingle shared by everything ("lorem ipsum dolor")
    val corpus = Seq(
      (1L, "lorem ipsum dolor the cat sat on the mat today"),
      (2L, "lorem ipsum dolor the cat sat on the mat today"),
      (3L, "lorem ipsum dolor the cat sat on the mat yesterday evening"),
      (4L, "lorem ipsum dolor a dog ran in the park quickly"),
      (5L, "lorem ipsum dolor completely different trailing content here"),
      (6L, "unrelated words with no shared trigrams at all whatsoever")
    ).toDF("doc_id", "text")
    val t = 0.25
    val got = DedupOps.ngramJaccardPairs(corpus, "doc_id", "text", 3, t)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // naive oracle computed in the driver (6 docs)
    def shingleSet(s: String) =
      s.trim.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val sets = corpus.collect().map(r => r.getLong(0) -> shingleSet(r.getString(1))).toMap
    val expected = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) intersect sets(b)).size.toDouble
      j = inter / (sets(a).size + sets(b).size - inter)
      if j >= t
    } yield (a, b) -> j).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, j) => assert(math.abs(got(k) - j) < 1e-12, s"pair $k") }
  }

  test("bucket-size cap: generous cap leaves pairs unchanged; cap=1 drops all candidates") {
    // default is UNCAPPED (no counting window at all), so `generous` below
    // exercises the genuinely different capped code path against it
    val base = DedupOps.simhashPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val generous = DedupOps.simhashPairs(docs, "doc_id", "text", maxBucketSize = 10000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(generous == base)
    val capped = DedupOps.simhashPairs(docs, "doc_id", "text", maxBucketSize = 1)
      .collect()
    assert(capped.isEmpty)
  }

  test("nearDupClusters: components, singletons, and a chain that needs propagation rounds") {
    // components: {1,2,3} (chain), {5,6}, singleton 7; chain 10-11-12-13-14
    // exercises multi-round flooding (diameter 4)
    val ids = (Seq(1L, 2L, 3L, 5L, 6L, 7L) ++ (10L to 14L)).map(Tuple1(_)).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L)).toDF("id_a", "id_b")
    val got = graft.operators.DedupOps.nearDupClusters(ids, pairs, "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // driver union-find oracle
    val parent = scala.collection.mutable.Map((Seq(1L, 2L, 3L, 5L, 6L, 7L) ++ (10L to 14L)).map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    Seq((1L, 2L), (2L, 3L), (5L, 6L), (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L))
      .foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    parent.keys.foreach { id =>
      assert(got(id)._1 == find(id), s"cluster of $id")
      assert(got(id)._2 == (if (find(id) == id) 0 else 1))
    }
  }

  test("nearDupClusters: driver union-find finish ≡ pure distributed contraction") {
    // same fixture as above: two chains + a pair + a singleton. The default
    // gate takes the bounded driver path; maxDriverEdges = 0 forces the
    // full star-contraction loop. Labels must agree row for row.
    val ids = (Seq(1L, 2L, 3L, 5L, 6L, 7L) ++ (10L to 14L)).map(Tuple1(_)).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L)).toDF("id_a", "id_b")
    val driver = DedupOps.nearDupClusters(ids, pairs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val dist = DedupOps.nearDupClusters(ids, pairs, "doc_id", maxDriverEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(driver == dist)
  }

  test("minhashLshPairs catches the exact duplicate (identical signatures)") {
    val pairs = DedupOps.minhashLshPairs(docs, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
  }

  test("simhash of identical docs is identical; pairs report hamming 0") {
    val sh = DedupOps.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    val pairs = DedupOps.simhashPairs(docs, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((1L, 2L)) == 0)
  }

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f), 0),
    (2L, Array(0.0f, 1.0f, 0.0f), 1),
    (3L, Array(-1.0f, 0.0f, 0.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("bruteForceTopK ranks query itself first, orthogonal/opposite last") {
    val out = SimilarityOps.bruteForceTopK(vecs, "vec_id", "embedding", 0L, 4, identity)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.head._1 == 0L && math.abs(out.head._2 - 1.0) < 1e-12)
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(out.last._2 < 0)
  }

  test("lshTopK returns the query itself (same bucket) with cos 1") {
    val out = SimilarityOps.lshTopK(vecs, "vec_id", "embedding", 0L, 4,
      seed = 7L, nPlanes = 2, dim = 3, identity)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(math.abs(out(0L) - 1.0) < 1e-12)
  }

  test("soft IVF assignment recovers boundary pairs hard assignment drops") {
    // three tight clusters at (1,0), (0,1), (-1,0) plus a cosine-similar
    // boundary pair straddling the A/B cell boundary: hard assignment puts
    // its members in different cells (no shared block), nAssign=2 gives
    // both members {A,B} as their two nearest cells
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.98f, 0.2f)),     // cluster A
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.2f, 0.98f)),     // cluster B
      (4L, Array(-1.0f, 0.0f)), (5L, Array(-0.98f, 0.2f)),   // cluster C
      (6L, Array(0.8f, 0.6f)), (7L, Array(0.6f, 0.8f))       // boundary pair
    ).toDF("vec_id", "embedding")
    val (indexed, centers) = SimilarityOps.fitIvf(emb, "vec_id", "embedding",
      nCells = 3, seed = 1L)
    // sanity: the boundary members really quantize into DIFFERENT cells
    val cells = indexed.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(cells(6L) != cells(7L), s"fixture should straddle cells: $cells")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hard = pairSet(SimilarityOps.ivfCosinePairs(indexed, "vec_id", 0.9, identity))
    val soft = pairSet(SimilarityOps.ivfCosinePairsSoft(indexed, centers, "vec_id",
      0.9, nAssign = 2, identity))
    assert(!hard.contains((6L, 7L)), "hard assignment should miss the boundary pair")
    assert(soft.contains((6L, 7L)), s"soft assignment must recover it: $soft")
    assert(hard.subsetOf(soft), "soft must never lose a hard pair")
    // soft widens blocks, not the threshold: far clusters still never pair
    assert(!soft.exists { case (a, b) => Set(a, b).intersect(Set(4L, 5L)).size == 1 },
      "C-cluster vectors must not pair across clusters")
  }
}
