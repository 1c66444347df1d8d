package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace-token count of a string in one allocation-free pass,
  * bit-compatible with `size(split(trim(s), "\\s+"))` — the tokenizer
  * length the whole corpus layer keys on (quality ratios, weights,
  * chunking, shard budgets). The HOF form materializes one UTF8String per
  * TOKEN just to take a length; this loop only counts run boundaries.
  *
  * EXACT semantics of the split form, edges included: Spark's `trim`
  * strips ASCII SPACES only (not tabs/newlines), and `split` uses limit
  * −1 (keeps leading AND trailing empty fields), so
  * size = (number of maximal `\s+` runs in the space-trimmed string) + 1
  * — which also covers the empty-string → [""] → 1 edge with no special
  * case. Whitespace is Java regex `\s` = [ \t\n\x0B\f\r] (ASCII).
  * PropertySpec fuzzes this identity against the real split. */
object TokenCount {
  def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def count(s: UTF8String): Int = {
    val str = s.toString
    // space-ONLY trim, matching Spark's trim()
    var lo = 0
    var hi = str.length
    while (lo < hi && str.charAt(lo) == ' ') lo += 1
    while (hi > lo && str.charAt(hi - 1) == ' ') hi -= 1
    var runs = 0
    var inWs = false
    var i = lo
    while (i < hi) {
      val ws = isWs(str.charAt(i))
      if (ws && !inWs) { runs += 1; inWs = true }
      else if (!ws) inWs = false
      i += 1
    }
    runs + 1
  }
}

/** Codegen'd scalar: `graft_token_count(text)` — see [[TokenCount]]. */
case class TokenCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any =
    TokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TokenCount.count($s)")

  override protected def withNewChildInternal(c: Expression): TokenCountExpr =
    copy(child = c)
  override def prettyName: String = "graft_token_count"
}
