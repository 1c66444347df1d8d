package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom filter of a long-hash column as ONE typed-imperative aggregate
  * (`org.apache.spark.util.sketch.BloomFilter` — Spark's public sketch,
  * the same structure its runtime join filters use). The buffer is
  * mergeable by bitwise OR (`mergeInPlace`), so partial aggregation
  * applies: every partition collapses to one filter before the shuffle,
  * and ONE serialized filter leaves the aggregation regardless of input
  * size. Deterministic: insertion hashes are seed-fixed Murmur3 and OR
  * is order-independent, so the merged bit array is identical across
  * partitionings, retries, and cluster sizes.
  *
  * This is the scale path [[graft.operators.CorpusOps.contamination]]'s
  * scaladoc promises for an eval side too big to broadcast as an exact
  * gram set: a benchmark corpus of millions of grams compresses to a
  * ~1 MB filter that rides to every executor as a plan literal, and the
  * 100 TB training scan probes it INSIDE the scan — no join at all, at
  * the price of a bounded, measurable false-positive rate. */
case class BloomAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(b: BloomFilter, row: InternalRow): BloomFilter = {
    val v = child.eval(row)
    if (v != null) b.putLong(v.asInstanceOf[Long])
    b
  }

  override def merge(b: BloomFilter, o: BloomFilter): BloomFilter = {
    b.mergeInPlace(o); b
  }

  override def eval(b: BloomFilter): Any = serialize(b)

  override def serialize(b: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    b.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def withNewMutableAggBufferOffset(n: Int): BloomAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): BloomAgg =
    copy(child = c)
  override def prettyName: String = "graft_bloom_agg"
}

/** Membership probe of a long hash against a SERIALIZED bloom filter that
  * must be a foldable (plan-literal) expression: the filter is
  * deserialized ONCE per plan — never per row — and codegen references the
  * deserialized object directly, so the probe inlines into whole-stage
  * codegen as one virtual call over the scan. Requiring foldability is
  * deliberate: a non-literal filter column would force per-row
  * deserialization, which is exactly the degenerate shape this expression
  * exists to rule out (the driver collects the one aggregated filter row
  * — bounded, benchmark-sized — and re-plants it as a literal, the same
  * bounded-metadata discipline as the IVF centroid literals). */
case class BloomMightContainLong(left: Expression, right: Expression)
    extends BinaryExpression {

  require(left.foldable,
    "graft_bloom_contains: the bloom argument must be a literal " +
      "(collect the aggregated filter and re-plant it as a plan literal)")

  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(a: Any, b: Any): Any =
    filter.mightContainLong(b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, b) => s"${ev.value} = $f.mightContainLong($b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)

  override def prettyName: String = "graft_bloom_contains"
}
