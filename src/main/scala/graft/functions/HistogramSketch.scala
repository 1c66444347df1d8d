package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Fixed-bin histogram sketch over a known value range, shared by the
  * aggregate (build) and the scalar quantile probe.
  *
  * This is the quantiles member of the engine's mergeable-sketch family
  * (HLL: distinct; bloom: membership; Misra–Gries: heavy items; count-min:
  * frequency): `bins` equal-width counters over [lo, hi) plus underflow /
  * overflow cells. Merging is elementwise ADDITION — exactly mergeable,
  * no approximation compounding — so per-day / per-source histogram rows
  * roll up into month/corpus quantiles without rescanning, which the
  * streaming-friendly alternatives (GK, KLL) only achieve approximately
  * and with far heavier merge logic. The price is a KNOWN range and a
  * fixed resolution: the quantile estimate is exact to one bin width
  * (linear interpolation inside the bin), which for telemetry with
  * bounded physical ranges is the standard production tradeoff. */
object HistogramSketch {

  /** Wire format: bins, lo, hi, then (bins + 2) counters — [0] underflow
    * (x < lo), [1..bins] in-range, [bins+1] overflow (x ≥ hi). */
  def serialize(bins: Int, lo: Double, hi: Double, counts: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 + counts.length * 8)
    bb.putInt(bins); bb.putDouble(lo); bb.putDouble(hi)
    counts.foreach(bb.putLong)
    bb.array()
  }

  def cell(x: Double, bins: Int, lo: Double, hi: Double): Int =
    if (x < lo) 0
    else if (x >= hi) bins + 1
    else {
      val i = ((x - lo) / (hi - lo) * bins).toInt
      // right-edge float guard: (x-lo)/(hi-lo)*bins can round UP to bins
      1 + math.min(i, bins - 1)
    }

  /** Quantile estimate: walk the cumulative counts to the q·N-th value and
    * interpolate linearly inside its bin. Underflow mass resolves to `lo`,
    * overflow to `hi` (the sketch cannot see beyond its range — callers
    * size [lo, hi) to cover it). Returns null for an empty sketch. */
  def quantile(sketch: Array[Byte], q: Double): Any = {
    val bb = ByteBuffer.wrap(sketch)
    val bins = bb.getInt
    val lo = bb.getDouble
    val hi = bb.getDouble
    val counts = new Array[Long](bins + 2)
    var i = 0
    var n = 0L
    while (i < counts.length) { counts(i) = bb.getLong; n += counts(i); i += 1 }
    if (n == 0L) return null
    val qq = math.max(0.0, math.min(1.0, q))
    val target = qq * n
    var cum = 0.0
    if (counts(0) > 0) {
      cum = counts(0).toDouble
      if (target <= cum) return lo
    }
    val w = (hi - lo) / bins
    i = 1
    while (i <= bins) {
      val c = counts(i)
      if (c > 0) {
        if (target <= cum + c) {
          val frac = (target - cum) / c
          return lo + (i - 1) * w + frac * w
        }
        cum += c
      }
      i += 1
    }
    hi
  }
}

/** Mergeable fixed-bin histogram as one typed-imperative aggregate: the
  * full value distribution of a group in (bins + 2) longs. Map-side
  * combinable — each task collapses its partition to one counter array
  * before the shuffle — and byte-identical under re-partitioning (counter
  * addition commutes). Probe with `graft_hist_quantile`. */
case class HistogramAgg(
    child: Expression,
    bins: Int,
    lo: Double,
    hi: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(bins >= 1 && bins <= 65536, s"bins must be in [1, 65536], got $bins")
  require(lo < hi, s"need lo < hi, got [$lo, $hi)")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins + 2)

  override def update(b: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) b(HistogramSketch.cell(v.asInstanceOf[Double], bins, lo, hi)) += 1L
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = HistogramSketch.serialize(bins, lo, hi, b)

  override def serialize(b: Array[Long]): Array[Byte] =
    HistogramSketch.serialize(bins, lo, hi, b)

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val nb = bb.getInt
    require(nb == bins, s"sketch shape mismatch: $nb bins, expected $bins")
    bb.getDouble; bb.getDouble
    val b = new Array[Long](nb + 2)
    var i = 0
    while (i < b.length) { b(i) = bb.getLong; i += 1 }
    b
  }

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def withNewMutableAggBufferOffset(n: Int): HistogramAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HistogramAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): HistogramAgg =
    copy(child = c)
  override def prettyName: String = "graft_hist_agg"
}

/** Scalar probe: quantile estimate from a histogram sketch (one bin width
  * of error for in-range data; range edges for under/overflow mass). */
case class HistQuantile(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(sketch: Any, q: Any): Any =
    HistogramSketch.quantile(sketch.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    // quantile() may return null (empty sketch) — route through the
    // boxed-Any path with an explicit null check
    val f = "graft.functions.HistogramSketch"
    nullSafeCodeGen(ctx, ev, (s, k) =>
      s"""Object r = $f.quantile($s, $k);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) r).doubleValue(); }""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HistQuantile =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_hist_quantile"
}
