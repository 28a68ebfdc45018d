package graft.functions

import java.math.BigInteger
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** One-buffer second-moment accumulator for PCA / covariance
  * (reference concern: the moment scan behind `add_trend_line`-style
  * fitting, generalized to d-dim embeddings — see
  * [[graft.operators.Pca]]).
  *
  * Semantically IDENTICAL to summing the generated array
  * `[1] ++ x ++ upperTriangle(x·xᵀ)` of exact decimals (the
  * posexplode formulation this kernel replaces): the child is the
  * SAME `transform(vec, _.cast(decimal(elemP, scale)))` pre-cast, so
  * Spark's cast rounding is reproduced bit-for-bit, and every
  * product/sum here is exact integer arithmetic on the decimals'
  * unscaled longs — order-independent, partition-deterministic, and
  * equal to the decimal-sum path on every input (randomized-equality
  * spec in PcaSpec).
  *
  * WHY: the explode path generates d(d+1)/2 + d + 1 rows PER VECTOR
  * (2,145 at d = 64) just to feed a hash aggregate whose key space is
  * those same 2,145 positions — the row machinery, not the
  * arithmetic, dominated the board's largest CPU line (q_cov 45.8 s
  * at sf1). This kernel does the same multiplies into ONE flat
  * Array[Long] buffer per partition (128-bit hi/lo pairs per slot —
  * Σ of 10^16-unscaled products overflows a single long at corpus
  * scale), then merges 32 buffers and emits one decimal array.
  *
  * Exactness bounds: unscaled elements < 10^elemP, so products stay
  * inside a long while elemP ≤ 9 (10^18 < 2^63); the 128-bit slot
  * accumulators then hold ≥ 10^22 rows. Callers must enforce
  * elemP ≤ 9 (Pca.momentFrame falls back to the explode path above
  * that).
  *
  * Null handling mirrors the explode path exactly: a null element
  * contributes nothing to its Σxᵢ slot or any product slot it
  * touches, while the row still counts in slot 0.
  */
case class DecimalMomentAggregate(
    child: Expression,
    dim: Int,
    scale: Int,
    intDigits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val elemP = intDigits + scale
  require(dim > 0, "dim must be positive")
  require(elemP <= 9,
    s"DecimalMomentAggregate needs elemP = intDigits + scale <= 9 for exact " +
      s"long products; got $elemP — use the decimal explode path instead")

  private val sumScale = 2 * scale
  private val sumPrecision = math.min(38, 2 * elemP + 1 + 10)
  // slots: [0] = n, [1..dim] = Σxᵢ, then the row-major upper triangle
  private val slots = 1 + dim + dim * (dim + 1) / 2
  // count ticks in sum-scale units; Σxᵢ needs scale → sumScale rescale
  private val countUnit = math.pow(10, sumScale).toLong
  private val xRescale = math.pow(10, scale).toLong

  override def dataType: DataType =
    ArrayType(DecimalType(sumPrecision, sumScale), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](2 * slots)

  // 128-bit signed add of the 64-bit value v into slot s (hi at 2s, lo
  // at 2s+1): unsigned-carry detection on the low word, sign-extended
  // high word.
  @inline private def add128(buf: Array[Long], s: Int, v: Long): Unit = {
    val lo = buf(2 * s + 1)
    val newLo = lo + v
    val carry = ((lo & v) | ((lo | v) & ~newLo)) >>> 63
    buf(2 * s) += (v >> 63) + carry
    buf(2 * s + 1) = newLo
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val arr = child.eval(input)
    if (arr == null) return buf
    val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    require(a.numElements() == dim,
      s"moment input vector has ${a.numElements()} elements, expected $dim")
    // unscaled longs; Long.MinValue marks a null element (unreachable
    // as a real unscaled value at elemP <= 9)
    val u = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      u(i) =
        if (a.isNullAt(i)) Long.MinValue
        else a.getDecimal(i, elemP, scale).toUnscaledLong
      i += 1
    }
    add128(buf, 0, countUnit)
    i = 0
    var tri = 1 + dim
    while (i < dim) {
      val ui = u(i)
      if (ui != Long.MinValue) {
        add128(buf, 1 + i, ui * xRescale)
        var j = i
        while (j < dim) {
          val uj = u(j)
          if (uj != Long.MinValue) add128(buf, tri + (j - i), ui * uj)
          j += 1
        }
      }
      tri += dim - i
      i += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var s = 0
    while (s < slots) {
      val lo1 = buf(2 * s + 1); val lo2 = other(2 * s + 1)
      val newLo = lo1 + lo2
      val carry = ((lo1 & lo2) | ((lo1 | lo2) & ~newLo)) >>> 63
      buf(2 * s) += other(2 * s) + carry
      buf(2 * s + 1) = newLo
      s += 1
    }
    buf
  }

  private val mask64 = BigInteger.ONE.shiftLeft(64).subtract(BigInteger.ONE)

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](slots)
    var s = 0
    while (s < slots) {
      val hi = buf(2 * s); val lo = buf(2 * s + 1)
      val bi =
        if (hi == 0 && lo >= 0) BigInteger.valueOf(lo)
        else BigInteger.valueOf(hi).shiftLeft(64)
          .add(BigInteger.valueOf(lo).and(mask64))
      out(s) = org.apache.spark.sql.types.Decimal(
        new java.math.BigDecimal(bi, sumScale), sumPrecision, sumScale)
      s += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DecimalMomentAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DecimalMomentAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DecimalMomentAggregate =
    copy(child = newChild)
  override def prettyName: String = "decimal_moments"
}
