package graft.functions

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter state: at most `k` (item, counter)
  * pairs (Misra & Gries, "Finding repeated elements", 1982; the
  * mergeable formulation of Agarwal et al., "Mergeable summaries",
  * PODS 2012).
  *
  * Update: increment a present item, admit a new one while there is
  * room, otherwise subtract the buffer's minimum counter from every
  * counter and evict the zeros (the batched form of the classic
  * decrement-all round — equivalent to running it `min` times).
  * Merge: sum counterparts, then subtract the (k+1)-th largest
  * counter and keep the positives.
  *
  * THE GUARANTEE (and the only thing the oracle leans on): after any
  * sequence of updates and merges over a stream of N items, every
  * item with true count > N/(k+1) is PRESENT in the buffer, and each
  * kept counter underestimates its item's true count by at most
  * N/(k+1). Which *other* items appear — and the counter values —
  * depend on arrival/merge order, so queries should consume
  * membership (+ the error bound), not the raw counters.
  */
private[graft] final class MgBuffer(val k: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(item: String, by: Long): Unit = {
    val cur = counts.getOrElse(item, 0L)
    if (cur > 0L || counts.size < k) {
      counts.update(item, cur + by)
    } else {
      val min = math.min(counts.valuesIterator.min, by)
      // subtract min from everything incl. the incoming increment
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace((_, v) => v - min)
      counts.foreach { case (key, v) => if (v <= 0L) dead += key }
      dead.foreach(counts.remove)
      if (by - min > 0L) counts.update(item, by - min)
    }
  }

  /** Shrink after a merge: subtract the (k+1)-th largest counter,
    * keep positives (no-op while size <= k).
    */
  def shrink(): Unit = if (counts.size > k) {
    val sorted = counts.values.toArray
    java.util.Arrays.sort(sorted)
    val sub = sorted(sorted.length - k - 1) // (k+1)-th largest
    val dead = mutable.ArrayBuffer.empty[String]
    counts.mapValuesInPlace((_, v) => v - sub)
    counts.foreach { case (key, v) => if (v <= 0L) dead += key }
    dead.foreach(counts.remove)
  }
}

/** [[MgBuffer]] as a `TypedImperativeAggregate`: bounded-state
  * heavy hitters over a string child, emitted as
  * `array<struct<item, cnt>>` sorted by item (deterministic
  * ORDER — the counter VALUES remain merge-order-dependent by the
  * algorithm's nature; see the class doc for what is guaranteed).
  * State is ≤ k entries per group at any corpus size — the exact
  * alternative (a full value-count table) grows with the
  * vocabulary. Null children are skipped.
  */
case class MgSketchAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] with UnaryLike[Expression] {

  require(k >= 1 && k <= (1 << 16), s"k must be in [1, 65536]; got $k")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    other.counts.foreach { case (item, c) =>
      buf.counts.update(item, buf.counts.getOrElse(item, 0L) + c)
    }
    buf.shrink()
    buf
  }

  override def eval(buf: MgBuffer): Any = {
    val rows = buf.counts.toArray.sortBy(_._1).map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (item, c) =>
      val b = item.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new MgBuffer(k)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counts.update(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgSketchAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgSketchAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MgSketchAggregate =
    copy(child = newChild)
  override def prettyName: String = "mg_sketch"
}
