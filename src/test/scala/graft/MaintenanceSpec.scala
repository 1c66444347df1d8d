package graft

import org.apache.spark.sql.functions._
import graft.sources.{Maintenance, Tables}

/** Small-file compaction: file count shrinks to the byte-sized target,
  * content is bit-identical, and the sorted variant keeps files on
  * disjoint time ranges (the property that preserves min/max pruning). */
class MaintenanceSpec extends SparkSpec {

  test("compact shrinks a shredded directory without changing the data") {
    val src = java.nio.file.Files.createTempDirectory("graft_shred").toString
    val out = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/c"
    val ev = Tables.events(spark, sfTiny)
    ev.repartition(64).write.mode("overwrite").parquet(src) // the ingest mess
    val report = Maintenance.compact(spark, src, out,
      targetFileBytes = 256L << 10, sortCols = Seq("ts"))
    assert(report.filesBefore == 64)
    assert(report.filesAfter < 16, s"expected a real reduction, got $report")
    assert(report.rows == ev.count())
    val back = spark.read.parquet(out)
    assert(back.exceptAll(ev).isEmpty && ev.exceptAll(back).isEmpty,
      "compaction must be a pure rewrite")
    // sorted compaction ⇒ per-file ts ranges are disjoint (pruning stays
    // effective): max(ts) of file i < min(ts) of file i+1
    val ranges = back.groupBy(input_file_name().as("f"))
      .agg(min("ts").as("lo"), max("ts").as("hi"))
      .orderBy("lo").collect()
    ranges.sliding(2).foreach {
      case Array(a, b) =>
        assert(!a.getTimestamp(2).after(b.getTimestamp(1)),
          s"file ranges overlap: ${a} vs ${b}")
      case _ => ()
    }
  }

  test("compact refuses a partition-layout directory instead of flattening it") {
    // a day=.../ layout seen through one read would fold the partition
    // column into the data files and size the rewrite from zero bytes —
    // the required behavior is a loud error directing per-partition runs
    val src = java.nio.file.Files.createTempDirectory("graft_partlayout").toString
    Tables.events(spark, sfTiny)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.partitionBy("day").mode("overwrite").parquet(src)
    val out = java.nio.file.Files.createTempDirectory("graft_partout").toString + "/c"
    val e = intercept[IllegalArgumentException] {
      Maintenance.compact(spark, src, out)
    }
    assert(e.getMessage.contains("subdirectories"))
  }
}
