package graft

import org.apache.spark.sql.functions._
import graft.operators.MultimodalOps

class MultimodalChunkSpec extends SparkSpec {
  import spark.implicits._

  private def media(texts: String*) =
    MultimodalOps.withPayload(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      "doc_id", "text")

  test("chunks: boundaries, the final short chunk, and exact-multiple payloads") {
    val exact = "a" * 8   // exactly 2 chunks of 4 => n_chunks = 3, last empty
    val short = "abc"     // 1 chunk
    val out = MultimodalOps.chunks(media(exact, short), 4)
      .select(col("doc_id"), col("chunk_idx"), octet_length(col("chunk")).as("len"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(out == Set((0L, 0, 4), (0L, 1, 4), (0L, 2, 0), (1L, 0, 3)))
    // reassembling the chunks yields the original payload (driver-side
    // sort: collect_list order across a shuffle is not contractual)
    val glued = MultimodalOps.chunks(media("hello world, chunked"), 4)
      .collect().map(r => r.getInt(1) -> new String(r.getAs[Array[Byte]](2)))
      .sortBy(_._1).map(_._2).mkString
    assert(glued == "hello world, chunked")
  }

  test("frameSample and sampledChunks agree and keep every k-th chunk only") {
    val viaFilter = MultimodalOps.frameSample(MultimodalOps.chunks(media("x" * 40), 4), 3)
      .select("chunk_idx").collect().map(_.getInt(0)).toSeq.sorted
    assert(viaFilter == Seq(0, 3, 6, 9))
    val viaSampled = MultimodalOps.sampledChunks(media("x" * 40), 4, 3)
      .select("chunk_idx").collect().map(_.getInt(0)).toSeq.sorted
    assert(viaSampled == viaFilter)
  }
}
