package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generic long-form data profiling — the `describe`/Deequ-style report a
  * pipeline runs before trusting a new drop: one row per column with
  * null/distinct/min/max/mean.
  *
  * Plan shape: one PRUNED single-column aggregate per column, unioned.
  * NOT a single wide aggregate — N exact `countDistinct`s in one `agg`
  * plan an Expand ×(N+1) over every row (measured 26.7 s vs 2-3 s on the
  * 6M-row gate table), while a lone distinct per aggregate plans the
  * ordinary two-phase partial-distinct. The per-column scans each read
  * ONE parquet column (`ReadSchema` pruning), so total I/O stays ≈ one
  * full-table scan and the N branches schedule concurrently. Numerics
  * profile as doubles; strings profile lexicographic min/max (exact
  * cross-engine for ASCII keys); other types report null/distinct only.
  *
  * Scale note: with `exact = false` the distinct count becomes
  * `approx_count_distinct` (HLL, mergeable) — at 100 TB prefer it and
  * the sketch error over N exact distinct shuffles. */
object ProfileOps {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true,
              scoreOut: Column => Column): DataFrame = {
    require(cols.nonEmpty && cols.size <= 64, s"profile set must be bounded, got ${cols.size}")
    val schema = df.schema
    def kindOf(c: String): String = schema(c).dataType match {
      case _: NumericType => "numeric"
      case StringType => "string"
      case _ => "other"
    }
    val nd: String => Column =
      if (exact) c => countDistinct(col(c))
      else c => approx_count_distinct(col(c))
    val perCol: Seq[DataFrame] = cols.map { c =>
      val kind = kindOf(c)
      val (mn, mx, av) = kind match {
        case "numeric" =>
          (scoreOut(min(col(c)).cast("double")),
            scoreOut(max(col(c)).cast("double")),
            scoreOut(avg(col(c).cast("double"))))
        case _ => (min(lit(null).cast("double")), max(lit(null).cast("double")),
          avg(lit(null).cast("double")))
      }
      val (smn, smx) = kind match {
        case "string" => (min(col(c)), max(col(c)))
        case _ => (min(lit(null).cast("string")), max(lit(null).cast("string")))
      }
      df.select(col(c)).agg(
        count(lit(1)).as("n_rows"),
        sum(col(c).isNull.cast("long")).as("n_nulls"),
        nd(c).cast("long").as("n_distinct"),
        mn.as("min_num"), mx.as("max_num"), av.as("mean_num"),
        smn.as("min_str"), smx.as("max_str"))
        .select(lit(c).as("column"), lit(kind).as("kind"), col("n_rows"),
          col("n_nulls"), col("n_distinct"), col("min_num"), col("max_num"),
          col("mean_num"), col("min_str"), col("max_str"))
    }
    perCol.reduce(_ unionByName _)
  }
}
