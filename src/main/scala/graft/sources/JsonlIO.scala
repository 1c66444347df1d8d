package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines ingestion/egress — the interchange format every public text
  * corpus ships in (one JSON object per line, splittable, append-friendly).
  * Same discipline as [[CsvIO]]: explicit schemas only (a schema-inference
  * pass reads 100 TB twice and unions object shapes), PERMISSIVE parsing so
  * one malformed line cannot abort a corpus-scale job, and an optional
  * corrupt-record column so dirty lines are quarantined instead of silently
  * dropped. */
object JsonlIO {

  /** Scan with a fixed schema. When `corruptCol` is set, the schema is
    * extended with that string column and unparseable lines land there
    * (Spark's PERMISSIVE contract). To monitor feed health use
    * [[corruptCount]] — Spark REJECTS queries over raw JSON whose only
    * referenced column is the internal corrupt-record column, so a bare
    * `filter(corrupt.isNotNull).count()` throws AnalysisException. */
  def read(spark: SparkSession, path: String, schema: StructType,
           corruptCol: Option[String] = None): DataFrame = {
    val full = corruptCol.fold(schema)(c => schema.add(c, "string"))
    val reader = spark.read.schema(full).option("mode", "PERMISSIVE")
    corruptCol.fold(reader)(c => reader.option("columnNameOfCorruptRecord", c))
      .json(path)
  }

  /** Quarantined-line count for feed-health monitoring. Both columns are
    * referenced in ONE aggregate so the pruned scan schema genuinely
    * contains a data column — a `filter(corrupt).count()` plan prunes back
    * to corrupt-only (the count needs no columns) and trips Spark's
    * restriction even when a data column was selected in between. */
  def corruptCount(df: DataFrame, corruptCol: String, anyDataCol: String): Long = {
    import org.apache.spark.sql.functions._
    df.agg(
        coalesce(sum(col(corruptCol).isNotNull.cast("long")), lit(0L)).as("n_bad"),
        count(col(anyDataCol)).as("__touch"))
      .head.getLong(0)
  }

  /** Sink: one JSONL tree per call; partitioning (and so file count)
    * is the caller's DataFrame partitioning — no implicit coalesce. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
