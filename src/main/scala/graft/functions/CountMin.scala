package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Count-Min sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms 2005)
  * over 64-bit keys, shared by the aggregate (build) and the scalar probe
  * (query).
  *
  * Row hashes use the standard pairwise trick h_r(x) = a(x) + r·b(x) mod
  * width, with a and b two independent finalizer mixes of the key — fully
  * deterministic, no seeds carried in the sketch. */
object CountMin {
  /** splitmix64 finalizer — the avalanche mix, bijective on Long. */
  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Bucket index of key `v` in row `r` of a width-`w` sketch. */
  def bucket(v: Long, r: Int, w: Int): Int = {
    val a = mix(v)
    val b = mix(v ^ 0x9e3779b97f4a7c15L) | 1L // odd → full-period row stride
    val h = a + r.toLong * b
    // floorMod: h is signed; a negative index would crash the probe
    ((h % w + w) % w).toInt
  }

  /** Wire format: depth, width, then depth·width row-major counters. */
  def serialize(depth: Int, width: Int, counts: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + counts.length * 8)
    bb.putInt(depth); bb.putInt(width)
    counts.foreach(bb.putLong)
    bb.array()
  }

  def estimate(sketch: Array[Byte], key: Long): Long = {
    val bb = ByteBuffer.wrap(sketch)
    val depth = bb.getInt
    val width = bb.getInt
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = bb.getLong(8 + (r * width + bucket(key, r, width)) * 8)
      if (c < best) best = c
      r += 1
    }
    best
  }
}

/** Mergeable Count-Min frequency sketch as one typed-imperative aggregate:
  * point-frequency estimates over an unbounded key stream in fixed memory
  * (depth × width counters), one summary per aggregation buffer.
  *
  * The 100 TB story mirrors [[HeavyHittersAgg]] and the HLL rollup: an
  * exact per-key count is a full shuffle keyed by token; this sketch is
  * map-side combinable (each task collapses its partition into one
  * depth×width grid before the shuffle), merges by elementwise ADDITION
  * (exactly mergeable — the merged sketch equals the sketch of the
  * concatenated stream, no approximation compounding), and supports
  * per-day / per-source sketch tables that roll up without rescanning.
  * Where Misra–Gries answers "what are the heavy items" with LOWER bounds,
  * count-min answers "how often did THIS item occur" with UPPER bounds:
  * estimate ≥ true count always, and ≤ true + ε·N with probability 1−δ
  * for width = ⌈e/ε⌉, depth = ⌈ln(1/δ)⌉.
  *
  * Input: 64-bit keys (hash strings with xxhash64 first — the engine-wide
  * 8-bytes-on-the-wire discipline). Output: the serialized sketch
  * (binary), probed by `graft_cms_estimate`. */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 32, s"depth must be in [1,32], got $depth")
  require(width >= 2, s"width must be >= 2, got $width")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(b: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      var r = 0
      while (r < depth) {
        b(r * width + CountMin.bucket(key, r, width)) += 1L
        r += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = CountMin.serialize(depth, width, b)

  override def serialize(b: Array[Long]): Array[Byte] =
    CountMin.serialize(depth, width, b)

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt; val w = bb.getInt
    require(d == depth && w == width,
      s"sketch shape mismatch: got ${d}x$w, expected ${depth}x$width")
    val b = new Array[Long](d * w)
    var i = 0
    while (i < b.length) { b(i) = bb.getLong; i += 1 }
    b
  }

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def withNewMutableAggBufferOffset(n: Int): CountMinAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CountMinAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): CountMinAgg =
    copy(child = c)
  override def prettyName: String = "graft_cms_agg"
}

/** Scalar probe: min over the sketch rows at the key's buckets — the
  * count-min point estimate (upper bound on the true frequency). Reads
  * depth/width from the sketch header, so one probe expression serves any
  * sketch shape. */
case class CmsEstimateLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(sketch: Any, key: Any): Any =
    CountMin.estimate(sketch.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (s, k) =>
      s"graft.functions.CountMin.estimate($s, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimateLong =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_cms_estimate"
}
