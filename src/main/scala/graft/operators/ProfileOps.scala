package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generic long-form data profiling — the `describe`/Deequ-style report a
  * pipeline runs before trusting a new drop: one row per column with
  * null/distinct/min/max/mean, computed in ONE scan (every per-column
  * statistic is an aggregate expression in a single `agg`, reshaped to
  * long form with a literal `stack`). Numerics profile as doubles;
  * strings profile lexicographic min/max (exact cross-engine for ASCII
  * keys); other types report null/distinct only.
  *
  * Scale note: `countDistinct` per column plans an expand ×(cols+1) — at
  * 100 TB swap `exact = false` to use `approx_count_distinct` (HLL,
  * mergeable, no expand); the gate keeps exact for oracle parity. */
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
    val aggs: Seq[Column] = cols.flatMap { c =>
      val base = Seq(
        sum(col(c).isNull.cast("long")).as(s"__nn_$c"),
        nd(c).cast("long").as(s"__dc_$c"))
      kindOf(c) match {
        case "numeric" => base ++ Seq(
          min(col(c)).cast("double").as(s"__mn_$c"),
          max(col(c)).cast("double").as(s"__mx_$c"),
          avg(col(c).cast("double")).as(s"__av_$c"))
        case "string" => base ++ Seq(
          min(col(c)).as(s"__smn_$c"), max(col(c)).as(s"__smx_$c"))
        case _ => base
      }
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // literal stack: one output row per profiled column
    val stacked = cols.map { c =>
      val (mn, mx, av) = kindOf(c) match {
        case "numeric" =>
          (scoreOut(col(s"__mn_$c")), scoreOut(col(s"__mx_$c")),
            scoreOut(col(s"__av_$c")))
        case _ =>
          (lit(null).cast("double"), lit(null).cast("double"),
            lit(null).cast("double"))
      }
      val (smn, smx) = kindOf(c) match {
        case "string" => (col(s"__smn_$c"), col(s"__smx_$c"))
        case _ => (lit(null).cast("string"), lit(null).cast("string"))
      }
      struct(lit(c).as("column"), lit(kindOf(c)).as("kind"),
        col("__n").as("n_rows"), col(s"__nn_$c").as("n_nulls"),
        col(s"__dc_$c").as("n_distinct"),
        mn.as("min_num"), mx.as("max_num"), av.as("mean_num"),
        smn.as("min_str"), smx.as("max_str"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }
}
