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
                    rightValues: Seq[Attribute],
                    rightTiebreak: Seq[Expression] = Nil) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ rightValues.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoin =
    copy(left = l, right = r)
}

/** Plans [[AsOfJoin]] into [[AsOfJoinExec]]; register via
  * `spark.experimental.extraStrategies` (session) or
  * `injectPlannerStrategy` (cluster-wide extensions). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, rv, tb) =>
      AsOfJoinExec(lk, rk, lts, rts, rv, tb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Streaming merge as-of join. CONTRACT: key and ts columns are non-null
  * (a null left ts yields a null match rather than failing); ts must be a
  * long-backed type (timestamp / long). Duplicate right timestamps within
  * a key resolve to the LAST in sort order: with `rightTiebreak` columns
  * the row with the MAX tiebreak wins (they extend the right child's
  * required ordering, so the dedup costs a sort key instead of a whole
  * pre-aggregation pass + extra shuffle of the right side — at 100 TB the
  * right side is shuffled ONCE either way, but the aggregate form pays a
  * second exchange because hash(key, ts) partitioning cannot serve the
  * merge's hash(key) distribution). Without tiebreaks, pre-aggregate as
  * with `asofJoinLast`, or the tie pick is partition-order dependent. */
case class AsOfJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression,
                        rightValues: Seq[Attribute],
                        rightTiebreak: Seq[Expression],
                        left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ rightValues.map(_.withNullability(true))

  // full-key hash partitioning on both sides => co-partitioned zip is sound
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys, true, None) ::
      ClusteredDistribution(rightKeys, true, None) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    (rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending)) ++
      rightTiebreak.map(SortOrder(_, Ascending)))

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
    val keyArity = leftKeys.length
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // ONE fused (keys..., ts) projection per side: the natural-ascending
      // ordering below only reads the first `keyArity` fields, so the
      // appended ts rides along free and is read positionally — halves the
      // per-row projection count vs separate key/ts projections.
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val lKtProj = UnsafeProjection.create(lKeyExprs :+ lTsExpr, lOut)
      val rKtProj = UnsafeProjection.create(rKeyExprs :+ rTsExpr, rOut)
      val rValProj = UnsafeProjection.create(rVals, rOut)
      // bind the right section NULLABLE: unmatched left rows feed nulls
      // even when the source attribute was non-nullable, and a
      // non-nullable BoundReference would skip the null check
      val outProj = UnsafeProjection.create(outAttrs, lOut ++ rVals.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rVals.length)
      val rBuf = rIter.buffered
      // O(1) merge state, allocation-free in steady state: the holders own
      // their byte[] buffers and are refilled IN PLACE via copyFrom (which
      // grows the buffer only when a larger row arrives). The previous
      // copy()-per-consumed-row form allocated two fresh UnsafeRows for
      // every right row it passed over — the measured 3× small-scale loss
      // against the union-window formulation. The key holder is refilled
      // only when the right key actually changes, and an unconsumed peek's
      // projection is cached across left rows instead of re-evaluated.
      val holderKey = new UnsafeRow(keyTypes.length + 1)
      holderKey.pointTo(new Array[Byte](64), 64)
      val holderVals = new UnsafeRow(rVals.length)
      holderVals.pointTo(new Array[Byte](64), 64)
      var holderValid = false
      // cached projection of the current (unconsumed) right head; the
      // projection's reused output row stays valid until the next apply,
      // which happens only after the head is consumed
      var rkt: UnsafeRow = null
      var rTs = 0L
      var peekValid = false
      lIter.map { lrow =>
        val lkt = lKtProj(lrow)
        val lTsNull = lkt.isNullAt(keyArity)
        val lTs = if (lTsNull) Long.MinValue else lkt.getLong(keyArity)
        var scanning = !lTsNull
        while (scanning && (peekValid || rBuf.hasNext)) {
          if (!peekValid) {
            rkt = rKtProj(rBuf.head)
            rTs = if (rkt.isNullAt(keyArity)) Long.MinValue else rkt.getLong(keyArity)
            peekValid = true
          }
          val cmp = keyOrd.compare(rkt, lkt) // key-prefix compare
          if (cmp < 0 || (cmp == 0 && rTs <= lTs)) {
            if (cmp == 0) { // candidate "latest at or before" for this key
              if (!holderValid || keyOrd.compare(holderKey, rkt) != 0)
                holderKey.copyFrom(rkt)
              holderVals.copyFrom(rValProj(rBuf.head))
              holderValid = true
            }
            rBuf.next() // consume; earlier-key rows are simply passed over
            peekValid = false
          } else scanning = false
        }
        val matched = holderValid && keyOrd.compare(holderKey, lkt) == 0
        outProj(joined(lrow, if (matched) holderVals else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}
