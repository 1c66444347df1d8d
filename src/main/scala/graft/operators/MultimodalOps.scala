package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs batched
  * per partition so a real codec would amortize model/codec init per
  * partition (the Scala analogue of an Arrow-batched Python UDF).
  *
  * The decode itself is a STUB — image/audio codecs are not in this
  * container — but it is a deterministic fake over the real bytes, so the
  * Spark-side contract (schema, partitioning, batch shape, null handling)
  * is real and testable end to end. */
object MultimodalOps {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, byte_len: Int, head_byte: Int,
                           byte_sum: Long, frames: Int)

  /** Attach binary payload + metadata columns to a documents table —
    * the ingest shape for image/audio/video sidecars. */
  def withPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        octet_length(col(textCol)).as("byte_len"),
        lit("application/octet-stream").as("mime"),
        (floor(octet_length(col(textCol)) / lit(256.0)) + 1).cast("int").as("n_chunks")
      ).as("media_meta"))

  /** BYTE-SEMANTICS CONTRACT: chunk math mixes `octet_length` (bytes) with
    * `substr`, and `substr` is only byte-addressed on BinaryType — on a
    * StringType payload it counts CHARACTERS, so any non-ASCII payload
    * would get misaligned chunk boundaries and a wrong chunk count. The
    * chunking ops therefore REQUIRE a BinaryType `payload` (what
    * [[withPayload]] produces); string payloads must be cast to binary
    * (UTF-8 bytes) first, and the requirement fails fast otherwise. */
  private def requireBinaryPayload(media: DataFrame, op: String): Unit = {
    val dt = media.schema("payload").dataType
    require(dt == org.apache.spark.sql.types.BinaryType,
      s"$op requires a BinaryType 'payload' column (byte-addressed substr); got $dt — " +
        "cast string payloads to binary (UTF-8) first, e.g. col.cast(\"binary\")")
  }

  /** Fixed-size payload chunks, one row per chunk — the shard shape that
    * parallelizes decode across executors when a single media file is
    * bigger than a task should hold (video frame groups, audio windows).
    * Chunk count derives from the payload length and THIS call's chunk
    * size (`floor(len/chunkBytes)+1`, the metadata convention — an
    * exact-multiple payload carries one trailing empty chunk).
    * Payload must be BinaryType — see [[requireBinaryPayload]]. */
  def chunks(media: DataFrame, chunkBytes: Int): DataFrame = {
    requireBinaryPayload(media, "chunks")
    val n = (floor(octet_length(col("payload")) / lit(chunkBytes.toDouble)) + 1).cast("int")
    media.select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), n - 1),
          i => col("payload").substr(i * chunkBytes + 1, lit(chunkBytes)))))
      .toDF("doc_id", "chunk_idx", "chunk")
  }

  /** Every k-th chunk — deterministic frame sampling (video keyframe /
    * audio window subsampling) over an ALREADY-chunked frame. NOTE: a
    * predicate on a generator-output column cannot push below the explode,
    * so this form materializes every chunk first; when sampling at chunk
    * time, use [[sampledChunks]], which never slices the skipped bytes. */
  def frameSample(chunked: DataFrame, everyK: Int): DataFrame =
    chunked.filter(col("chunk_idx") % everyK === 0)

  /** Chunk and sample in one pass: the index sequence is filtered BEFORE
    * slicing, so skipped chunks are never copied out of the payload.
    * Payload must be BinaryType — see [[requireBinaryPayload]]. */
  def sampledChunks(media: DataFrame, chunkBytes: Int, everyK: Int): DataFrame = {
    requireBinaryPayload(media, "sampledChunks")
    val n = (floor(octet_length(col("payload")) / lit(chunkBytes.toDouble)) + 1).cast("int")
    val sampledIdx = filter(sequence(lit(0), n - 1), i => i % everyK === 0)
    media.select(col("doc_id"),
        explode(transform(sampledIdx,
          i => struct(i.as("chunk_idx"),
            col("payload").substr(i * chunkBytes + 1, lit(chunkBytes)).as("chunk")))).as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.chunk"))
  }

  /** Batched per-partition "decode": one codec init per partition, then a
    * streaming pass over rows. Swap the body for a real decoder (JNI codec,
    * ONNX session, ...) without touching the plan shape. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        // real codecs would initialize HERE, once per partition
        rows.map { r =>
          val bytes = Option(r.payload).getOrElse(Array.emptyByteArray)
          val sum = bytes.foldLeft(0L)((acc, b) => acc + (b & 0xff))
          MediaFeatures(
            doc_id = r.doc_id,
            byte_len = bytes.length,
            head_byte = if (bytes.isEmpty) -1 else bytes(0) & 0xff,
            byte_sum = sum,
            frames = bytes.length / 256 + 1)
        }
      }
  }
}
