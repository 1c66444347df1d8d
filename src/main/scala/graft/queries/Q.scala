package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{floor, lit}

/** One verifiable query: a Spark implementation plus (where SQL-expressible)
  * an equivalent ANSI-SQL oracle run by the driver in DuckDB. */
case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String] = None)

object Q {
  /** Rounding offset 0.5 + phi/1000: window aggregates differ between Spark
    * and DuckDB at the last ulp (different summation association), and means
    * of terminating-decimal inputs structurally land on EXACT halves of the
    * rounding grid, where a plain +0.5 offset flips between engines. Biasing
    * the decision point to 0.499381966... puts it where terminating decimals
    * cannot land, so ulp-level noise can no longer change the rounded value. */
  val BIAS = 0.500618034
  /** Computed float measures are rounded on BOTH sides (Spark and the DuckDB
    * oracle SQL) with the explicit formula `floor(x·10^n + 0.5)/10^n` rather
    * than each engine's `round`: Spark rounds the shortest decimal repr
    * (BigDecimal HALF_UP) while DuckDB rounds the binary value, and
    * interpolated/averaged measures structurally land on exact halves, where
    * the two disagree. An identical arithmetic formula over identical input
    * doubles is bit-deterministic in both engines. 4 decimals for
    * money/quantity scale, 6 for statistics. Raw column passthroughs stay
    * unrounded (identical source bits on both sides). */
  def dec4(c: Column): Column = floor(c * lit(10000.0) + lit(BIAS)) / lit(10000.0)
  def dec6(c: Column): Column = floor(c * lit(1000000.0) + lit(BIAS)) / lit(1000000.0)
  /** SQL-side mirrors of [[dec4]]/[[dec6]] for authoring oracle queries. */
  def r4(e: String): String = s"floor(($e) * 10000.0 + $BIAS) / 10000.0"
  def r6(e: String): String = s"floor(($e) * 1000000.0 + $BIAS) / 1000000.0"
}
