package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded buffer of the k smallest DISTINCT hash values seen —
  * the state of a KMV (k-minimum-values) distinct-count sketch
  * (Bar-Yossef et al., "Counting distinct elements in a data
  * stream", RANDOM 2002; the estimator (k−1)/U₍k₎ of
  * Beyer et al., SIGMOD 2007).
  *
  * Values are kept in ascending order in a flat `Array[Long]`
  * (`n ≤ k` live entries): membership + insertion point come from
  * one binary search, a full buffer rejects `v ≥ max` in O(log k)
  * with zero allocation, and an accepted insert shifts with
  * `System.arraycopy`. Accepted inserts decay like k/N, so the
  * shift cost vanishes as a group grows — the steady state is a
  * read-only binary search per row.
  */
private[graft] final class KmvBuffer(val k: Int) {
  var n: Int = 0
  val arr: Array[Long] = new Array[Long](k)

  def insert(v: Long): Unit = {
    if (n == k && v >= arr(n - 1)) return
    val idx = java.util.Arrays.binarySearch(arr, 0, n, v)
    if (idx >= 0) return // already present
    val ins = -idx - 1
    if (n < k) {
      System.arraycopy(arr, ins, arr, ins + 1, n - ins)
      arr(ins) = v
      n += 1
    } else {
      // full: drop the current max, keep the buffer sorted
      System.arraycopy(arr, ins, arr, ins + 1, k - 1 - ins)
      arr(ins) = v
    }
  }
}

/** KMV distinct sketch as a [[TypedImperativeAggregate]]: the k
  * smallest distinct values of the (long-valued) child per group,
  * emitted ascending as `array<bigint>`.
  *
  * WHY an aggregate and not `count(DISTINCT …)`: exact distinct
  * shuffles every distinct value; this buffer is ≤ 8k bytes per
  * group, partial-aggregates map-side, and merges by insertion —
  * the per-executor state of "distinct tokens per language" over a
  * 100 TB corpus is groups × k longs, independent of cardinality.
  * Downstream the caller reads the estimate off the array
  * (`(k−1)/U₍k₎` when full, the exact size when not — see
  * [[graft.operators.Profile.distinctKmv]]), and two sketches of
  * the same hash family union by merging arrays, so per-shard
  * sketches roll up without rescanning data.
  *
  * Determinism: the output depends only on the SET of child values
  * — insertion order, partitioning, and merge order are immaterial
  * — so a portable hash child (md5-prefix) makes the whole result
  * engine-replayable (the DuckDB oracle replays it with a window
  * rank over the same hashes). Null children are skipped.
  */
case class KmvSketchAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k > 0 && k <= (1 << 20), s"k must be in [1, 2^20]; got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    var i = 0
    while (i < other.n) { buf.insert(other.arr(i)); i += 1 }
    buf
  }

  override def eval(buf: KmvBuffer): Any = {
    val out = new Array[Long](buf.n)
    System.arraycopy(buf.arr, 0, out, 0, buf.n)
    new GenericArrayData(out)
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new KmvBuffer(k)
    // serialized form is ascending + distinct: copy straight in
    var i = 0
    while (i < n) { buf.arr(i) = bb.getLong(); i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAggregate =
    copy(child = newChild)
  override def prettyName: String = "kmv_sketch"
}
