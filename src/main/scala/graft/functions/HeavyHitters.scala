package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as ONE typed-imperative aggregate
  * (Misra & Gries, "Finding repeated elements", Sci. Comp. Prog. 1982;
  * merge step per Agarwal et al., "Mergeable summaries", PODS'12).
  *
  * The 100 TB story: an exact vocabulary count is a full shuffle keyed by
  * token — fine as a batch job (q82), unaffordable as a side-statistic
  * inside another pass. This summary holds AT MOST `capacity` entries per
  * aggregation buffer, is map-side combinable (each task collapses its
  * partition to one ≤capacity-entry summary before the shuffle), and
  * merges associatively, so the corpus head is computable in one linear
  * scan with bounded memory — the same mergeability contract as the HLL
  * and bloom aggregates already in the gate.
  *
  * Guarantees (N = stream length, k = capacity): every item with true
  * frequency > N/(k+1) is present in the summary, and each reported count
  * is a LOWER bound undershooting the true frequency by at most N/(k+1).
  * Which sub-threshold items additionally linger depends on partition
  * merge order — hence the gate query is rows-only, and HeavyHittersSpec
  * pins the guarantees by cross-validation against exact counts under
  * different partitionings.
  *
  * Output: array<struct<item string, count_lower bigint>> sorted by
  * (count desc, item asc). */
case class HeavyHittersAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(b: mutable.HashMap[UTF8String, Long],
                      row: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(row)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      b.get(s) match {
        case Some(c) => b.update(s, c + 1)
        case None if b.size < capacity =>
          // clone: the UTF8String may point into a reused row buffer
          b.update(s.clone(), 1L)
        case None =>
          // the classic MG step: a full summary and a new item decrement
          // EVERY counter (amortized O(1) — each decrement pays back an
          // earlier increment); entries at zero vacate their slot
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          b.mapValuesInPlace((_, c) => c - 1)
          b.foreach { case (key, c) => if (c <= 0) dead += key }
          dead.foreach(b.remove)
      }
    }
    b
  }

  override def merge(b: mutable.HashMap[UTF8String, Long],
                     o: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    o.foreach { case (key, c) =>
      b.updateWith(key)(prev => Some(prev.getOrElse(0L) + c))
    }
    if (b.size > capacity) {
      // Agarwal et al. §3.1: subtract the (k+1)-th largest count from all,
      // drop the non-positive — the summary shrinks back to ≤ k entries
      // and the error bound composes additively
      val counts = b.values.toArray
      java.util.Arrays.sort(counts)
      val thresh = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      b.mapValuesInPlace((_, c) => c - thresh)
      b.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(b.remove)
    }
    b
  }

  override def eval(b: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = b.toArray.sortBy { case (s, c) => (-c, s.toString) }
    new GenericArrayData(sorted.map { case (s, c) =>
      new GenericInternalRow(Array[Any](s, c))
    })
  }

  override def serialize(b: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val items = b.toArray
    val size = 4 + items.map { case (s, _) => 4 + s.numBytes() + 8 }.sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(items.length)
    items.foreach { case (s, c) =>
      val bytes = s.getBytes
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      b.update(UTF8String.fromBytes(arr), bb.getLong)
      i += 1
    }
    b
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count_lower", LongType, nullable = false))),
    containsNull = false)
  override def withNewMutableAggBufferOffset(n: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): HeavyHittersAgg =
    copy(child = c)
  override def prettyName: String = "graft_heavy_hitters"
}
