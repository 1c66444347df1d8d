package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV ingestion/egress matching the reference's storage layer (SURVEY §2.1
  * S1/S2): explicit schemas (never inference — a schema-inference pass reads
  * the data twice and guesses types at 100 TB), header handling, and
  * post-load timestamp parsing for the date columns pandas handled with
  * `parse_dates` (`pre_processing.py:93-176`). */
object CsvIO {

  /** Scan with a fixed schema; `tsCols` are string columns parsed to
    * timestamps with an explicit format (default matches the reference's
    * `'%Y-%m-%d %H:%M:%S'`, `data_generator.py:851`). */
  def read(spark: SparkSession, path: String, schema: StructType,
           tsCols: Map[String, String] = Map.empty): DataFrame = {
    val raw = spark.read.option("header", "true").schema(schema).csv(path)
    // try_to_timestamp, not to_timestamp: under ANSI mode (Spark 4 default)
    // one malformed date in 100 TB would abort the job; dirty rows become
    // nulls instead, matching the CSV parser's PERMISSIVE mode for the other
    // columns.
    tsCols.foldLeft(raw) { case (df, (c, fmt)) =>
      df.withColumn(c, try_to_timestamp(col(c), lit(fmt)))
    }
  }

  /** Sink (reference `df.to_csv`): one header-bearing CSV tree per call.
    * Callers control parallelism via the DataFrame's partitioning — no
    * implicit coalesce(1), which would serialize the write at scale. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Date-partitioned parquet sink — the cluster layout: `dt=YYYY-MM-DD/`
    * directories make every time-range scan a partition-pruned scan
    * (reference S6's 365-day filter becomes metadata-only). */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("dt").parquet(path)
}
