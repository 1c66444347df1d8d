package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character-distribution statistics of a string in ONE JVM pass:
  * codepoint count and Shannon entropy H = log2(n) − (Σ cᵢ·log2 cᵢ)/n.
  *
  * Why a native expression and not column algebra: the HOF formulation
  * (split → sort → run lengths → aggregate fold) materializes one
  * UTF8String PER CHARACTER and walks interpreted lambdas — measured
  * 1.98 s over sf0.1 (and 5.4 s for the O(distinct·n) variant before it).
  * This loop touches each codepoint once against an int histogram:
  * ~100 ms for the same scan. CodegenFallback costs one boxed call per
  * ROW; the O(len) work per row dwarfs it, the same trade every
  * TypedImperativeAggregate in this package makes.
  *
  * ASCII codepoints hit a flat 128-slot histogram; the (rare on natural
  * text) rest go to an open HashMap. Empty/null-free semantics match the
  * HOF form: whitespace counts, empty string → (0, 0.0). */
case class CharEntropyStats(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars_h", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val ascii = new Array[Long](128)
    var other: java.util.HashMap[Integer, Long] = null
    var n = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      if (cp < 128) ascii(cp) += 1L
      else {
        if (other == null) other = new java.util.HashMap[Integer, Long]()
        other.merge(cp, 1L, (a, b) => a + b)
      }
      n += 1L
      i += Character.charCount(cp)
    }
    val LOG2 = math.log(2.0)
    var clogc = 0.0
    var j = 0
    while (j < 128) {
      val c = ascii(j)
      if (c > 0L) clogc += c * (math.log(c.toDouble) / LOG2)
      j += 1
    }
    if (other != null) other.forEach { (_, c) =>
      clogc += c * (math.log(c.toDouble) / LOG2)
    }
    val h = if (n > 0L) math.log(n.toDouble) / LOG2 - clogc / n else 0.0
    new GenericInternalRow(Array[Any](n, h))
  }

  override protected def withNewChildInternal(c: Expression): CharEntropyStats =
    copy(child = c)
  override def prettyName: String = "graft_char_entropy"
}
