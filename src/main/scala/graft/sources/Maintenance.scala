package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Table maintenance for parquet datasets — the day-2 operations a lake
  * actually runs. The one implemented here is small-file COMPACTION: a
  * streaming ingest (or an over-parallel batch write) leaves thousands of
  * KB-sized files per directory, and every later scan pays a task + footer
  * read per file — at 100 TB the listing alone dominates planning. Compact
  * rewrites a directory to ⌈bytes / targetFileBytes⌉ files.
  *
  * Scale notes:
  *  - The input size comes from the file LISTING (driver-side metadata,
  *    one RPC per directory — not a data read).
  *  - `sortCols` re-sorts within output files so parquet min/max stats
  *    stay tight after the rewrite (a compaction that shuffles time ranges
  *    together quietly destroys row-group pruning for every later query).
  *    With sortCols, sizing uses repartitionByRange on the same columns —
  *    output files then hold DISJOINT sorted ranges; without, a
  *    round-robin repartition balances bytes evenly.
  *  - Output goes to a NEW directory: compaction must be atomic at the
  *    table-pointer level (swap the directory / partition location after
  *    validation), never an in-place overwrite of files a reader may hold.
  */
object Maintenance {

  case class CompactReport(filesBefore: Int, filesAfter: Int,
                           bytesBefore: Long, rows: Long)

  /** List data files (skips `_SUCCESS`/metadata) under `dir`. LEAF
    * directories only: a partition layout (day=.../ subdirectories) must be
    * compacted per partition — flattening it through one read would fold
    * the partition columns into the data files and silently mis-size the
    * rewrite (the non-recursive listing would see zero bytes). */
  private def dataFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(p).toIndexedSeq
    val subdirs = entries.filter(_.isDirectory).map(_.getPath.getName)
    require(subdirs.isEmpty,
      s"$dir contains subdirectories (${subdirs.take(3).mkString(", ")}…) — " +
        "compact each leaf partition directory instead")
    val files = entries
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(s => (s.getPath.toString, s.getLen))
    require(files.nonEmpty, s"no data files under $dir")
    files
  }

  /** Row count from the parquet FOOTERS (driver-side metadata, no data
    * scan — same cost class as the input listing). */
  private def footerRows(spark: SparkSession, dir: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    dataFiles(spark, dir).map { case (f, _) =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(f), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
  }

  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetFileBytes: Long = 128L << 20,
              sortCols: Seq[String] = Nil): CompactReport = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val files = dataFiles(spark, inDir)
    val bytes = files.map(_._2).sum
    val nOut = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val in = spark.read.parquet(inDir)
    val shaped =
      if (sortCols.nonEmpty)
        in.repartitionByRange(nOut, sortCols.map(org.apache.spark.sql.functions.col): _*)
          .sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
      else in.repartition(nOut)
    shaped.write.mode("error").parquet(outDir)
    val rows = footerRows(spark, outDir)
    require(rows == footerRows(spark, inDir),
      s"row count changed during compaction of $inDir — output kept at $outDir for inspection")
    CompactReport(files.size, dataFiles(spark, outDir).size, bytes, rows)
  }

  /** Z-order clustering rewrite: lay `inDir` out along the Morton curve of
    * two dimensions so parquet row-group min/max stats stay tight on BOTH —
    * filters on either column then prune row groups at the scan
    * (`functions.ZOrder` has the curve details; ZOrderSpec measures the
    * stat tightening on real footers). Same atomicity contract as
    * [[compact]]: output to a NEW directory, swap the table pointer after
    * validation.
    *
    * `quantA`/`quantB` quantize each dimension into the `bits` budget
    * (e.g. `unix_micros(ts) div 60000000` for minute granularity); rows
    * land range-partitioned + sorted by the interleaved key, which the
    * write drops — the layout, not the key, is the product. */
  def clusterBy(spark: SparkSession, inDir: String, outDir: String,
                quantA: org.apache.spark.sql.Column,
                quantB: org.apache.spark.sql.Column,
                bits: Int = 16,
                targetFileBytes: Long = 128L << 20): CompactReport = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val files = dataFiles(spark, inDir)
    val bytes = files.map(_._2).sum
    val nOut = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val zkey = graft.functions.ZOrder.zorderKey(quantA, quantB, bits)
    spark.read.parquet(inDir)
      .withColumn("__zorder", zkey)
      .repartitionByRange(nOut, org.apache.spark.sql.functions.col("__zorder"))
      .sortWithinPartitions("__zorder")
      .drop("__zorder")
      .write.mode("error").parquet(outDir)
    val rows = footerRows(spark, outDir)
    require(rows == footerRows(spark, inDir),
      s"row count changed during clustering of $inDir — output kept at $outDir for inspection")
    CompactReport(files.size, dataFiles(spark, outDir).size, bytes, rows)
  }
}
