package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{CsvIO, Tables}

class CsvIOSpec extends SparkSpec {

  test("csv roundtrip with explicit schema and tolerant timestamp parse") {
    val tmp = Files.createTempDirectory("csvio").toString
    val ev = Tables.events(spark, sfTiny)
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        col("event_type"), col("value"))
    CsvIO.write(ev, s"$tmp/out")
    val schema = StructType(Seq(StructField("ts", StringType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val back = CsvIO.read(spark, s"$tmp/out", schema, Map("ts" -> "yyyy-MM-dd HH:mm:ss"))
    assert(back.count() == ev.count())
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.filter(col("ts").isNull).count() == 0)
  }

  test("malformed timestamp degrades to null, not a job abort") {
    val tmp = Files.createTempDirectory("csvio").toString
    Files.writeString(java.nio.file.Paths.get(s"$tmp/bad.csv"),
      "ts,v\n2024-01-01 00:00:00,1.5\nnot-a-date,2.5\n")
    val schema = StructType(Seq(StructField("ts", StringType), StructField("v", DoubleType)))
    val rows = CsvIO.read(spark, s"$tmp/bad.csv", schema, Map("ts" -> "yyyy-MM-dd HH:mm:ss"))
      .orderBy("v").collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
  }

  test("date-partitioned sink lays out dt= directories and prunes scans") {
    val tmp = Files.createTempDirectory("part").toString
    CsvIO.writeDatePartitioned(Tables.events(spark, sfTiny), "ts", s"$tmp/ev")
    val dirs = new java.io.File(s"$tmp/ev").listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("dt=")))
    val pruned = spark.read.parquet(s"$tmp/ev").filter(col("dt") === "2024-01-05")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert(pruned.count() > 0)
  }
}
