package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** |A∩B| of two long arrays WITHOUT materializing the intersection:
  * `size(array_intersect(a, b))` builds the intersected ArrayData only to
  * read its length — this computes the count directly over one hash set.
  * Unlike [[SortedIntersectCount]] it needs no sort precondition, so the
  * optimizer can substitute it anywhere the size-of-intersect pattern
  * appears. Null ELEMENTS are ignored (they can never match under
  * array_intersect's null semantics for counting distinct matches of
  * non-null values; inputs here are hash arrays, which are never null). */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntersectCount.count($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object IntersectCount {
  /** Distinct-match count: smaller side into a hash set, probe the other,
    * remove on hit so duplicates count once (array_intersect semantics). */
  def count(a: ArrayData, b: ArrayData): Int = {
    val (small, big) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val set = new java.util.HashSet[Long](math.max(4, small.numElements() * 2))
    var i = 0
    while (i < small.numElements()) {
      if (!small.isNullAt(i)) set.add(small.getLong(i))
      i += 1
    }
    var c = 0
    var j = 0
    while (j < big.numElements() && !set.isEmpty) {
      if (!big.isNullAt(j) && set.remove(big.getLong(j))) c += 1
      j += 1
    }
    c
  }
}

/** Optimizer rule (injected via `GraftExtensions.injectOptimizerRule`):
  * rewrite `size(array_intersect(a, b))` over long arrays to
  * [[IntersectCount]]. Fires only when neither side's ELEMENTS can be null
  * (null elements change array_intersect's count: an all-null overlap
  * contributes one) and both are `array<bigint>` — the dedup hot path.
  * This is the tier-(c) extension shape: user code keeps writing the
  * portable builtin; the session optimizes it. */
object RewriteIntersectSize extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Size}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // !nullable guards the COLUMNS too: legacy size(NULL) is -1, while the
    // rewritten expression would return NULL — only rewrite when no null
    // array can ever reach it
    case Size(ArrayIntersect(a, b), _)
        if !a.nullable && !b.nullable &&
          isNonNullLongArray(a.dataType) && isNonNullLongArray(b.dataType) =>
      IntersectCount(a, b)
  }

  private def isNonNullLongArray(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, containsNull) => !containsNull
    case _ => false
  }
}
