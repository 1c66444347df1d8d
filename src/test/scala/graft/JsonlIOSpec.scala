package graft

import java.nio.file.Files
import org.apache.spark.sql.types.{StructType, LongType, StringType}
import graft.sources.JsonlIO

/** JSONL roundtrip + corrupt-line quarantine. */
class JsonlIOSpec extends SparkSpec {
  import spark.implicits._

  test("write/read roundtrip preserves rows under an explicit schema") {
    val dir = Files.createTempDirectory("jsonl").resolve("docs").toString
    val df = Seq((1L, "hello world", "en"), (2L, "bonjour", "fr"))
      .toDF("doc_id", "text", "lang")
    JsonlIO.write(df, dir)
    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType).add("lang", StringType)
    val back = JsonlIO.read(spark, dir, schema)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(back == Set((1L, "hello world", "en"), (2L, "bonjour", "fr")))
  }

  test("malformed lines quarantine into the corrupt column, not abort or vanish") {
    val dir = Files.createTempDirectory("jsonl").resolve("feed")
    Files.createDirectories(dir)
    Files.write(dir.resolve("part-0.json"),
      """{"doc_id": 1, "text": "ok"}
        |not json at all
        |{"doc_id": 3, "text": "also ok"}
        |""".stripMargin.getBytes)
    val schema = new StructType().add("doc_id", LongType).add("text", StringType)
    val got = JsonlIO.read(spark, dir.toString, schema, corruptCol = Some("_bad"))
      .selectExpr("doc_id", "text", "_bad IS NOT NULL AS bad")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), r.getBoolean(2)))
    assert(got.count(!_._3) == 2)           // two clean rows parsed
    assert(got.count(_._3) == 1)            // one quarantined line
    assert(got.filter(_._3).forall(_._1.isEmpty)) // quarantined row has no fields
    // the feed-health helper (a bare corrupt-only count would throw —
    // Spark's raw-JSON corrupt-column restriction, see JsonlIO.read doc)
    val df = JsonlIO.read(spark, dir.toString, schema, corruptCol = Some("_bad"))
    assert(JsonlIO.corruptCount(df, "_bad", "doc_id") == 1L)
  }
}
