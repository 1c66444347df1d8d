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

  /** Schema-adaptive `events` loader. The upstream generator has shipped
    * `ts` in three physical layouts so far — parquet TIMESTAMP(NANOS)
    * (rejected by Spark's reader without a legacy conf), raw int64 nanos,
    * and native timestamp[us] (read as TIMESTAMP_NTZ) — and an engine aimed
    * at 100 TB must survive such upstream type migrations without a code
    * change. Branch on the footer schema and normalize every layout to the
    * same `TimestampType` column. Callers MUST run with
    * `spark.sql.session.timeZone=UTC` (all graft session builders pin it):
    * the NTZ→timestamp cast is then a bit-identical reinterpretation of the
    * stored microseconds, matching DuckDB's naive-timestamp oracle reads.
    */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val path = s"$dir/events.parquet"
    val plain =
      try Some(spark.read.parquet(path))
      catch { case _: Throwable => None } // TIMESTAMP(NANOS) footer → rejected at schema inference
    plain match {
      case Some(df) =>
        df.schema("ts").dataType match {
          case TimestampNTZType =>
            // timestamp[us], isAdjustedToUTC=false: reinterpret as UTC instant
            df.withColumn("ts", col("ts").cast(TimestampType))
          case LongType =>
            // raw int64 nanoseconds in a plain INT64 column: floor to micros,
            // the same truncation DuckDB applies
            df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case _ =>
            df // already TimestampType (e.g. inferTimestampNTZ=false reads)
        }
      case None => legacyNanosEvents(spark, path)
    }
  }

  /** Legacy layout: parquet logical TIMESTAMP(NANOS), which Spark only reads
    * via `spark.sql.legacy.parquet.nanosAsLong`. Floor-convert to micros. */
  private def legacyNanosEvents(spark: SparkSession, path: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val df = spark.read.parquet(path)
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

  /** Normalize integral id-like columns to LongType regardless of the
    * physical width the generator happened to write (int32 vs int64) —
    * the same survive-the-upstream-migration contract as the events `ts`
    * loader, generalized after round 5's layout break. Typed driver-side
    * consumers (`getLong`, `Seq[Long]` filters) must not depend on the
    * parquet footer's integer width; the driver's DuckDB compare already
    * canonicalizes integer widths, so the cast is gate-neutral. Non-
    * integral or missing columns pass through untouched. */
  private def widenIds(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    cols.foldLeft(df) { (d, c) =>
      d.schema.fields.find(_.name == c).map(_.dataType) match {
        case Some(ByteType | ShortType | IntegerType) =>
          d.withColumn(c, col(c).cast(LongType))
        case _ => d
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
  def events(s: SparkSession, d: String): DataFrame     =
    widenIds(eventsRaw(s, d), Seq("event_id", "user_id"))
  def documents(s: SparkSession, d: String): DataFrame  =
    widenIds(apply(s, d, "documents"), Seq("doc_id", "n_chars"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    widenIds(apply(s, d, "embeddings"), Seq("vec_id"))
}
