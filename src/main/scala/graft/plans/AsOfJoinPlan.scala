package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join (SURVEY J6) as a first-class operator — the tier-(c)
  * extension shape: a logical node, a planner strategy, and a physical
  * operator, because Spark has no built-in as-of join.
  *
  * Semantics: for every left row, the LATEST right row with
  * `right.ts <= left.ts` in the same key group; the right value columns are
  * appended, null when no earlier right row exists (pandas
  * `merge_asof(direction='backward')`, the reference's replay lookup).
  *
  * Physical shape: both children hash-partitioned on the join keys and
  * sorted by (keys, ts) — declared via `requiredChildDistribution` /
  * `requiredChildOrdering`, so EnsureRequirements inserts exactly the
  * shuffles/sorts that are missing — then ONE forward-only merge pass per
  * partition with O(1) state (the current right group's latest values).
  * Against the union-then-window formulation this reads each side once,
  * carries no unified wide schema, and never materializes a window buffer;
  * against a range join there is no row explosion. Both inputs stream:
  * memory per task is one row of state, so a 100 TB side never spills. */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                    leftTs: Expression, rightTs: Expression,
                    rightValues: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ rightValues.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoin =
    copy(left = l, right = r)
}

/** Plans [[AsOfJoin]] into [[AsOfJoinExec]]; register via
  * `spark.experimental.extraStrategies` (session) or
  * `injectPlannerStrategy` (cluster-wide extensions). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, rv) =>
      AsOfJoinExec(lk, rk, lts, rts, rv, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Streaming merge as-of join. CONTRACT: key and ts columns are non-null
  * (a null left ts yields a null match rather than failing); ts must be a
  * long-backed type (timestamp / long). Duplicate right timestamps within
  * a key resolve to the LAST in sort order — pre-aggregate for a
  * deterministic tiebreak, as with `asofJoinLast`. */
case class AsOfJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression,
                        rightValues: Seq[Attribute],
                        left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ rightValues.map(_.withNullability(true))

  // full-key hash partitioning on both sides => co-partitioned zip is sound
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys, true, None) ::
      ClusteredDistribution(rightKeys, true, None) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val rVals = rightValues
    val outAttrs = output
    val keyTypes = leftKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val rValProj = UnsafeProjection.create(rVals, rOut)
      // bind the right section NULLABLE: unmatched left rows feed nulls
      // even when the source attribute was non-nullable, and a
      // non-nullable BoundReference would skip the null check
      val outProj = UnsafeProjection.create(outAttrs, lOut ++ rVals.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rVals.length)
      val rBuf = rIter.buffered
      // O(1) merge state: the latest right (key, values) consumed so far
      var holderKey: UnsafeRow = null
      var holderVals: UnsafeRow = null
      lIter.map { lrow =>
        val lKey = lKeyProj(lrow)
        val lTsRow = lTsProj(lrow)
        val lTsNull = lTsRow.isNullAt(0)
        val lTs = if (lTsNull) Long.MinValue else lTsRow.getLong(0)
        var scanning = !lTsNull
        while (scanning && rBuf.hasNext) {
          val peek = rBuf.head
          val rKey = rKeyProj(peek)
          val cmp = keyOrd.compare(rKey, lKey)
          val rTsRow = rTsProj(peek)
          val rTs = if (rTsRow.isNullAt(0)) Long.MinValue else rTsRow.getLong(0)
          if (cmp < 0 || (cmp == 0 && rTs <= lTs)) {
            if (cmp == 0) { // candidate "latest at or before" for this key
              holderKey = rKey.copy()
              holderVals = rValProj(peek).copy()
            }
            rBuf.next() // consume; earlier-key rows are simply passed over
          } else scanning = false
        }
        val matched = holderKey != null && keyOrd.compare(holderKey, lKey) == 0
        outProj(joined(lrow, if (matched) holderVals else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}
