package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** splitmix64 finalizer (Steele et al., "Fast Splittable Pseudorandom
  * Number Generators", OOPSLA'14 — the JDK's SplittableRandom mixer):
  * full-avalanche 64→64 mixing with two multiplies. JVM long arithmetic
  * wraps, so this is safe where SQL-level `a·h+b` permutations would throw
  * under ANSI mode. */
object MinHash {
  @inline final def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  /** Lane seeds — themselves mixed so consecutive lanes decorrelate. */
  def seeds(k: Int): Array[Long] = Array.tabulate(k)(i => mix(0x5851F42D4C957F2DL + i))
}

/** MinHash signature as ONE typed-imperative aggregate: per input hash, all
  * `numHashes` lane values are derived in a tight JVM loop
  * (`mix(h ^ seed_i)`) against a primitive long[] buffer, instead of
  * evaluating `numHashes` separate `min(xxhash64(h, i))` Catalyst
  * expression trees per row. Partial aggregation still applies (the
  * buffer is element-wise-min mergeable), so map-side combine collapses
  * each partition to one signature per doc before the shuffle — the
  * property that makes minhashing viable at 100 TB. Output:
  * array<long> of the `numHashes` lane minima (Long.MaxValue for an
  * empty group, which callers never produce — every doc has >= 1 shingle). */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private lazy val seeds = MinHash.seeds(numHashes)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(b: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val x = MinHash.mix(h ^ seeds(i))
        if (x < b(i)) b(i) = x
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (o(i) < b(i)) b(i) = o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    var i = 0
    while (i < numHashes) { bb.putLong(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong())
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def withNewMutableAggBufferOffset(n: Int): MinHashAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MinHashAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): MinHashAgg =
    copy(child = c)
  override def prettyName: String = "graft_minhash"
}
