package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver testdata (`TESTDATA.md`).
  *
  * Mirrors the reference's CSV scan layer (`pre_processing.py:79-178`) as
  * plain parquet scans: schemas come from parquet footers, so Catalyst keeps
  * column pruning and predicate pushdown intact (SURVEY §2.1 S1/S6). At
  * cluster scale these would be date-partitioned tables; the API is the same.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects outright. Read nanos as raw longs
    * (`spark.sql.legacy.parquet.nanosAsLong`) and floor-convert to
    * microseconds — the same truncation DuckDB applies, so oracle timestamps
    * agree exactly. */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val df = spark.read.parquet(s"$dir/events.parquet")
      import org.apache.spark.sql.functions._
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } finally {
      // schema resolution captured the conf at read(); restore so later
      // parquet reads in the shared session see timestamps, not raw longs
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
