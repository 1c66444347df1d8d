package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Loader contract, generalized from the events-`ts` lesson: integral id
  * columns load as LongType whatever physical width the generator wrote.
  * Round 5 proved the upstream regenerates testdata with changed physical
  * types between rounds; ids are the next most likely column to shift
  * (int32 at small SF, int64 at scale), and typed driver-side consumers
  * (`getLong`, `Seq[Long]` anchors) would crash on the narrow width. Both
  * widths are written as in-repo fixtures and must load identically. */
class TableWidthContractSpec extends SparkSpec {
  import spark.implicits._

  test("documents/embeddings ids load as long from both int32 and int64 parquet") {
    val base = Files.createTempDirectory("graft-width").toString
    val d64 = s"$base/w64"; val d32 = s"$base/w32"
    val docs = Seq((1L, "alpha beta", "en", "src1", 10L),
      (2L, "gamma", "de", "src2", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val emb = Seq((1L, Seq(1.0f, 0.0f), 3), (2L, Seq(0.0f, 1.0f), 4))
      .toDF("vec_id", "embedding", "label")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d64/documents.parquet")
    emb.coalesce(1).write.mode("overwrite").parquet(s"$d64/embeddings.parquet")
    docs.withColumn("doc_id", col("doc_id").cast(IntegerType))
      .withColumn("n_chars", col("n_chars").cast(IntegerType))
      .coalesce(1).write.mode("overwrite").parquet(s"$d32/documents.parquet")
    emb.withColumn("vec_id", col("vec_id").cast(IntegerType))
      .coalesce(1).write.mode("overwrite").parquet(s"$d32/embeddings.parquet")

    for (dir <- Seq(d64, d32)) {
      val ld = Tables.documents(spark, dir)
      assert(ld.schema("doc_id").dataType == LongType, s"$dir doc_id")
      assert(ld.schema("n_chars").dataType == LongType, s"$dir n_chars")
      val le = Tables.embeddings(spark, dir)
      assert(le.schema("vec_id").dataType == LongType, s"$dir vec_id")
      // typed consumers that crash on int32 must work on both widths
      assert(le.collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 2L)))
    }
    // identical loaded CONTENT across widths
    val a = Tables.documents(spark, d64).orderBy("doc_id").collect().toSeq
    val b = Tables.documents(spark, d32).orderBy("doc_id").collect().toSeq
    assert(a == b, "width migration changed loaded rows")
  }

  test("events ids widen too; the ts normalization composes with it") {
    val base = Files.createTempDirectory("graft-width-ev").toString
    val ev = Seq((1, 1700000000123456L, 101, "view", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")).cast(TimestampNTZType))
    ev.coalesce(1).write.mode("overwrite").parquet(s"$base/events.parquet")
    val le = Tables.events(spark, base)
    assert(le.schema("event_id").dataType == LongType)
    assert(le.schema("user_id").dataType == LongType)
    assert(le.schema("ts").dataType == TimestampType)
    assert(le.head().getLong(0) == 1L)
  }
}
