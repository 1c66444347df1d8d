package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve keys for write-time data clustering.
  *
  * At 100 TB the cheapest query is the one whose row groups never leave
  * disk: parquet keeps min/max per row group, and a scan filtered on a
  * column prunes every group whose range misses the predicate. Sorting by
  * ONE column keeps its stats tight but scatters every other column;
  * interleaving the bits of TWO dimensions (the Morton curve) keeps BOTH
  * ranges tight per file/row group, so filters on either dimension (or
  * both) prune — the standard lakehouse `CLUSTER BY` layout (Delta/Iceberg
  * Z-ORDER; Morton, "A computer oriented geodetic data base", 1966).
  *
  * The key is pure column algebra — five shift-and-mask rounds per
  * dimension (the classic bit-spread), fully codegen'd, no UDF — so an
  * external engine (the DuckDB oracle) reproduces it bit-for-bit with the
  * same integer arithmetic. Inputs are masked to `bits` low bits first;
  * callers quantize each dimension to that budget (e.g. minute-of-epoch,
  * id mod 2^16). 2·bits ≤ 62 keeps the key in a positive BIGINT.
  */
object ZOrder {

  /** Spread the low 31 bits of `x` so bit i lands at position 2i: the
    * shift-or-mask cascade doubles the gap each round. */
  private[graft] def spreadBits(x: Column): Column = {
    val m = Seq(
      0x0000FFFF0000FFFFL -> 16,
      0x00FF00FF00FF00FFL -> 8,
      0x0F0F0F0F0F0F0F0FL -> 4,
      0x3333333333333333L -> 2,
      0x5555555555555555L -> 1)
    m.foldLeft(x) { case (v, (mask, sh)) =>
      v.bitwiseOR(shiftleft(v, sh)).bitwiseAND(lit(mask))
    }
  }

  /** Morton key of (a, b): a's bits at even positions, b's at odd. */
  def zorderKey(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val mask = lit((1L << bits) - 1L)
    val sa = spreadBits(a.cast("bigint").bitwiseAND(mask))
    val sb = spreadBits(b.cast("bigint").bitwiseAND(mask))
    sa.bitwiseOR(shiftleft(sb, 1))
  }

  /** The same cascade as ANSI SQL (DuckDB syntax) over a column
    * expression, for oracle twins of [[zorderKey]]. */
  def spreadSql(x: String): String = {
    val m = Seq(
      0x0000FFFF0000FFFFL -> 16,
      0x00FF00FF00FF00FFL -> 8,
      0x0F0F0F0F0F0F0F0FL -> 4,
      0x3333333333333333L -> 2,
      0x5555555555555555L -> 1)
    m.foldLeft(x) { case (e, (mask, sh)) => s"((($e) | (($e) << $sh)) & $mask)" }
  }

  def zorderSql(a: String, b: String, bits: Int = 16): String = {
    val mask = (1L << bits) - 1L
    s"(${spreadSql(s"(($a) & $mask)")} | (${spreadSql(s"(($b) & $mask)")} << 1))"
  }
}
