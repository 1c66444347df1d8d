package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.round

/** One verifiable query: a Spark implementation plus (where SQL-expressible)
  * an equivalent ANSI-SQL oracle run by the driver in DuckDB. */
case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String] = None)

object Q {
  /** Computed float measures are rounded on BOTH sides (Spark and the DuckDB
    * oracle SQL) so the driver's value hash sees identical doubles: for
    * |x|·10^n < 2^53 both engines produce the nearest double to the same
    * decimal, so round-tripping is bit-exact. 4 decimals for money/quantity
    * scale, 6 for statistics. Raw column passthroughs stay unrounded
    * (identical source bits on both sides). */
  def dec4(c: Column): Column = round(c, 4)
  def dec6(c: Column): Column = round(c, 6)
}
