package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** t-digest (Dunning & Ertl, "Computing extremely accurate quantiles
  * using t-digests", 2019) — the UNBOUNDED-range member of the engine's
  * mergeable-sketch family. The fixed-bin [[HistogramSketch]] is exactly
  * mergeable but needs a KNOWN [lo, hi); the t-digest needs nothing: a
  * compression-δ digest keeps ≲ 2δ centroids whose sizes follow the k₁
  * scale function δ/2π·asin(2q−1), so resolution concentrates at the
  * tails — p99.9 of an unbounded latency column is exactly the query a
  * fixed-range histogram cannot answer and this can.
  *
  * Scale shape: one digest is O(δ) doubles regardless of input size;
  * map-side combinable (each task folds its partition into its own
  * digest, merge is concatenate + one compress pass); per-day / per-source
  * digest ROWS roll up via [[TDigestMergeAgg]] without rescanning raw
  * data. The price vs the histogram: merging is order-sensitive (NOT
  * byte-identical under repartitioning — only the rank-error BOUND is
  * invariant, which TDigestSpec pins), so gate entries over it are
  * rows-only with the spec carrying the accuracy contract.
  *
  * Wire format: δ (int), n centroids (int), min, max, then (mean,
  * weight) pairs sorted by mean. */
object TDigest {

  /** k₁ scale function — centroid size limits follow its derivative, so
    * capacity concentrates where asin is steep (q → 0, 1: the tails). */
  private def k1(q: Double, delta: Double): Double =
    delta / (2.0 * math.Pi) * math.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0)

  /** One merge-compress pass: sort (mean, weight) pairs by mean, then
    * greedily pool adjacent centroids while the pooled span stays within
    * one k-unit. Returns packed (means, weights, count). */
  def compress(means: Array[Double], weights: Array[Double], n: Int,
               delta: Int): (Array[Double], Array[Double], Int) = {
    if (n == 0) return (means, weights, 0)
    val idx = Array.range(0, n).sortBy(means(_))
    var total = 0.0
    var i = 0
    while (i < n) { total += weights(i); i += 1 }
    val om = new Array[Double](n)
    val ow = new Array[Double](n)
    var out = 0
    var curM = means(idx(0))
    var curW = weights(idx(0))
    var wSoFar = 0.0
    var kBegin = k1(0.0, delta)
    i = 1
    while (i < n) {
      val m = means(idx(i))
      val w = weights(idx(i))
      val qRight = (wSoFar + curW + w) / total
      if (k1(qRight, delta) - kBegin <= 1.0) {
        // pool: weighted mean stays within the k-unit
        curM = (curM * curW + m * w) / (curW + w)
        curW += w
      } else {
        om(out) = curM; ow(out) = curW; out += 1
        wSoFar += curW
        kBegin = k1(wSoFar / total, delta)
        curM = m; curW = w
      }
      i += 1
    }
    om(out) = curM; ow(out) = curW; out += 1
    (om, ow, out)
  }

  def serialize(delta: Int, means: Array[Double], weights: Array[Double],
                n: Int, min: Double, max: Double): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 + n * 16)
    bb.putInt(delta); bb.putInt(n); bb.putDouble(min); bb.putDouble(max)
    var i = 0
    while (i < n) { bb.putDouble(means(i)); bb.putDouble(weights(i)); i += 1 }
    bb.array()
  }

  /** Quantile estimate: centroids carry their mass at the mean, with
    * linear interpolation between adjacent centroid midpoints; the
    * stored min/max anchor the extreme quantiles (a singleton first/last
    * centroid IS the exact min/max). Null for an empty digest. */
  def quantile(sketch: Array[Byte], q: Double): Any = {
    val bb = ByteBuffer.wrap(sketch)
    bb.getInt
    val n = bb.getInt
    if (n == 0) return null
    val min = bb.getDouble
    val max = bb.getDouble
    val means = new Array[Double](n)
    val weights = new Array[Double](n)
    var total = 0.0
    var i = 0
    while (i < n) {
      means(i) = bb.getDouble; weights(i) = bb.getDouble
      total += weights(i); i += 1
    }
    val qq = math.max(0.0, math.min(1.0, q))
    val target = qq * total
    // cumulative weight at each centroid's MIDPOINT
    var cum = 0.0
    i = 0
    var prevMid = 0.0
    var prevMean = min
    while (i < n) {
      val mid = cum + weights(i) / 2.0
      if (target <= mid) {
        val frac = if (mid - prevMid <= 0) 1.0
                   else (target - prevMid) / (mid - prevMid)
        return prevMean + frac * (means(i) - prevMean)
      }
      cum += weights(i)
      prevMid = mid
      prevMean = means(i)
      i += 1
    }
    // past the last midpoint: interpolate toward the true max
    val frac = if (total - prevMid <= 0) 1.0
               else (target - prevMid) / (total - prevMid)
    math.min(max, prevMean + frac * (max - prevMean))
  }
}

/** Growable centroid buffer: raw points append until the buffer tops 8δ,
  * then one compress pass folds them; min/max ride along exactly.
  * `delta` is raisable (not fixed at construction) so the merge-rollup
  * aggregate can adopt the resolution of the digests it is fed instead
  * of silently re-compressing high-δ sketches at a coarser default. */
final class TDigestBuffer(initialDelta: Int) {
  var delta: Int = initialDelta
  var means: Array[Double] = new Array[Double](delta * 8)
  var weights: Array[Double] = new Array[Double](delta * 8)
  var n: Int = 0
  var min: Double = Double.PositiveInfinity
  var max: Double = Double.NegativeInfinity

  def add(x: Double, w: Double): Unit = {
    if (n == means.length) compact()
    if (n == means.length) { // compress didn't shrink (pathological): grow
      means = java.util.Arrays.copyOf(means, n * 2)
      weights = java.util.Arrays.copyOf(weights, n * 2)
    }
    means(n) = x; weights(n) = w; n += 1
    if (x < min) min = x
    if (x > max) max = x
  }

  def compact(): Unit = {
    val (m, w, k) = TDigest.compress(means, weights, n, delta)
    System.arraycopy(m, 0, means, 0, k)
    System.arraycopy(w, 0, weights, 0, k)
    n = k
  }

  /** Raise the compression delta to at least `d` (never lowers it, so a
    * rollup over mixed-δ inputs lands on the finest resolution seen).
    * Grows the append buffer to match; existing centroids are kept. */
  def raiseDelta(d: Int): Unit = {
    if (d > delta) {
      delta = d
      if (means.length < d * 8) {
        means = java.util.Arrays.copyOf(means, d * 8)
        weights = java.util.Arrays.copyOf(weights, d * 8)
      }
    }
  }
}

/** Build aggregate: `graft_tdigest_agg(x, delta)` → binary digest. */
case class TDigestAgg(
    child: Expression,
    delta: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestBuffer]
  with UnaryLike[Expression] {

  require(delta >= 10 && delta <= 10000,
    s"compression delta must be in [10, 10000], got $delta")

  override def createAggregationBuffer(): TDigestBuffer = new TDigestBuffer(delta)

  override def update(b: TDigestBuffer, row: InternalRow): TDigestBuffer = {
    val v = child.eval(row)
    if (v != null) b.add(v.asInstanceOf[Double], 1.0)
    b
  }

  override def merge(b: TDigestBuffer, o: TDigestBuffer): TDigestBuffer = {
    var i = 0
    while (i < o.n) { b.add(o.means(i), o.weights(i)); i += 1 }
    if (o.min < b.min) b.min = o.min
    if (o.max > b.max) b.max = o.max
    b
  }

  override def eval(b: TDigestBuffer): Any = {
    b.compact()
    TDigest.serialize(delta, b.means, b.weights, b.n, b.min, b.max)
  }

  override def serialize(b: TDigestBuffer): Array[Byte] = {
    b.compact()
    TDigest.serialize(delta, b.means, b.weights, b.n, b.min, b.max)
  }

  override def deserialize(bytes: Array[Byte]): TDigestBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val k = bb.getInt
    val buf = new TDigestBuffer(d)
    buf.min = bb.getDouble
    buf.max = bb.getDouble
    var i = 0
    while (i < k) { buf.means(i) = bb.getDouble; buf.weights(i) = bb.getDouble; i += 1 }
    buf.n = k
    buf
  }

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def withNewMutableAggBufferOffset(n: Int): TDigestAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TDigestAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): TDigestAgg =
    copy(child = c)
  override def prettyName: String = "graft_tdigest_agg"
}

/** Rollup aggregate: `graft_tdigest_merge(sketch)` unions already-built
  * digest ROWS (per-day, per-source) into one digest — the no-rescan
  * rollup path, mirror of the q106 HLL union. */
case class TDigestMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestBuffer]
  with UnaryLike[Expression] {

  // seed delta is only a floor: update/merge adopt the max delta seen in
  // the input digests (raiseDelta), so rolling up δ=1000 sketches keeps
  // δ=1000 accuracy instead of silently re-compressing at 100
  override def createAggregationBuffer(): TDigestBuffer = new TDigestBuffer(100)

  override def update(b: TDigestBuffer, row: InternalRow): TDigestBuffer = {
    val v = child.eval(row)
    if (v == null) return b
    val bb = ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    b.raiseDelta(bb.getInt)
    val k = bb.getInt
    val mn = bb.getDouble
    val mx = bb.getDouble
    var i = 0
    while (i < k) { b.add(bb.getDouble, bb.getDouble); i += 1 }
    if (k > 0) {
      if (mn < b.min) b.min = mn
      if (mx > b.max) b.max = mx
    }
    b
  }

  override def merge(b: TDigestBuffer, o: TDigestBuffer): TDigestBuffer = {
    b.raiseDelta(o.delta)
    var i = 0
    while (i < o.n) { b.add(o.means(i), o.weights(i)); i += 1 }
    if (o.min < b.min) b.min = o.min
    if (o.max > b.max) b.max = o.max
    b
  }

  override def eval(b: TDigestBuffer): Any = {
    b.compact()
    TDigest.serialize(b.delta, b.means, b.weights, b.n, b.min, b.max)
  }

  override def serialize(b: TDigestBuffer): Array[Byte] = {
    b.compact()
    TDigest.serialize(b.delta, b.means, b.weights, b.n, b.min, b.max)
  }

  override def deserialize(bytes: Array[Byte]): TDigestBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val k = bb.getInt
    val buf = new TDigestBuffer(d)
    buf.min = bb.getDouble
    buf.max = bb.getDouble
    var i = 0
    while (i < k) { buf.means(i) = bb.getDouble; buf.weights(i) = bb.getDouble; i += 1 }
    buf.n = k
    buf
  }

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def withNewMutableAggBufferOffset(n: Int): TDigestMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TDigestMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): TDigestMergeAgg =
    copy(child = c)
  override def prettyName: String = "graft_tdigest_merge"
}

/** Scalar probe: `graft_tdigest_quantile(sketch, q)`. */
case class TDigestQuantile(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(sketch: Any, q: Any): Any =
    TDigest.quantile(sketch.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val f = "graft.functions.TDigest"
    nullSafeCodeGen(ctx, ev, (s, k) =>
      s"""Object r = $f.quantile($s, $k);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) r).doubleValue(); }""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TDigestQuantile =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_tdigest_quantile"
}
