package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native (whole-stage-codegen) Catalyst expressions for the vector
  * hot path. The `zip_with`/`aggregate` higher-order-function
  * formulations in [[VectorFunctions]] are declarative and
  * oracle-portable, but HOFs are interpreted (no codegen) and
  * allocate an intermediate array per pass — ~3 ms/row for a 6-plane
  * 64-dim bucket. These expressions generate tight primitive loops
  * and are bit-identical to the HOF versions (same double
  * accumulation order, same null semantics), verified by
  * `VectorFunctionsSpec`.
  */
object VectorExpressions {

  private[functions] def elemPrim(dt: DataType): (String, String) = dt match {
    case ArrayType(FloatType, _)  => ("getFloat", "float")
    case ArrayType(DoubleType, _) => ("getDouble", "double")
    case other => throw new IllegalArgumentException(
      s"expected array<float> or array<double>, got ${other.simpleString}")
  }

  private[functions] def elemAt(arr: ArrayData, dt: DataType, i: Int): Double =
    dt match {
      case ArrayType(FloatType, _)  => arr.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => arr.getDouble(i)
      case _ => throw new IllegalStateException("checked in checkInputDataTypes")
    }
}

/** cosine(a, b) = Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²), null when either norm is
  * zero, when lengths mismatch, or when an element is null — exactly
  * [[VectorFunctions.cosineSimilarity]].
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  import VectorExpressions._

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> inputs")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = elemAt(x, left.dataType, i)
      val yv = elemAt(y, right.dataType, i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom > 0.0) dot / denom else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (getL, _) = elemPrim(left.dataType)
      val (getR, _) = elemPrim(right.dataType)
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) { ${ev.isNull} = true; } else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xv = (double) $a.$getL($i);
         |    double $yv = (double) $b.$getR($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |    if ($denom > 0.0) { ${ev.value} = $dot / $denom; } else { ${ev.isNull} = true; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Σ(aᵢ−bᵢ)² — exactly [[VectorFunctions.squaredL2Distance]]'s
  * zip_with/aggregate fold (same index-order double accumulation;
  * null on length mismatch or a null element, matching zip_with's
  * null padding). The PQ fit/encode/ADC hot path evaluates this
  * once per (row, centroid) pair, where the interpreted HOF version
  * dominated the wall clock.
  */
case class SquaredL2Distance(left: Expression, right: Expression)
    extends BinaryExpression {
  import VectorExpressions._

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "squared_l2_distance"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> inputs")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = elemAt(x, left.dataType, i) - elemAt(y, right.dataType, i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (getL, _) = elemPrim(left.dataType)
      val (getR, _) = elemPrim(right.dataType)
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) { ${ev.isNull} = true; } else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = (double) $a.$getL($i) - (double) $b.$getR($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredL2Distance =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket id: bit p = (vec · planes(p)) > 0 —
  * exactly [[VectorFunctions.hyperplaneBucket]] (bucket 0 when the
  * vector length mismatches the planes or an element is null, like
  * the HOF version's null-vote fallthrough).
  */
case class HyperplaneBucket(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {
  import VectorExpressions._

  private lazy val planeArr: Array[Array[Double]] = planes.map(_.toArray).toArray
  private lazy val dim: Int = if (planes.isEmpty) 0 else planes.head.length

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hyperplane_bucket"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float>/array<double> input")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != dim) return 0
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return 0; i += 1 }
    var bucket = 0
    var p = 0
    while (p < planeArr.length) {
      val row = planeArr(p)
      var dot = 0.0
      i = 0
      while (i < n) { dot += elemAt(arr, child.dataType, i) * row(i); i += 1 }
      if (dot > 0.0) bucket |= 1 << p
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val (get, _) = elemPrim(child.dataType)
      val pRef = ctx.addReferenceObj("planes", planeArr, "double[][]")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val ok = ctx.freshName("ok")
      val dot = ctx.freshName("dot")
      val row = ctx.freshName("row")
      s"""
         |int $n = $a.numElements();
         |boolean $ok = ($n == $dim);
         |for (int $i = 0; $ok && $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $ok = false; }
         |}
         |${ev.value} = 0;
         |if ($ok) {
         |  for (int $p = 0; $p < $pRef.length; $p++) {
         |    double[] $row = $pRef[$p];
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += ((double) $a.$get($i)) * $row[$i];
         |    }
         |    if ($dot > 0.0) { ${ev.value} |= (1 << $p); }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

/** Symmetric per-vector int8 quantization:
  * scale = max|vᵢ| (float), qᵢ = round(127·vᵢ/scale) as tinyint
  * (round half AWAY FROM ZERO — DuckDB `round` semantics, NOT
  * `Math.rint`'s half-even). Zero vector → scale 0, all-zero codes.
  * 4× smaller ANN shuffle/storage payloads; reconstruction error is
  * bounded by scale/254 per component. Output struct(scale, q).
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {
  import VectorExpressions._

  override def dataType: DataType = QuantizeInt8.schema
  override def nullable: Boolean = true
  override def prettyName: String = "quantize_int8"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float>/array<double> input")
    }

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    QuantizeInt8.quantize(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resTerm = ctx.freshName("qres")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $resTerm =
         |  graft.functions.QuantizeInt8.quantize($c, $isFloat);
         |if ($resTerm == null) { ${ev.isNull} = true; } else { ${ev.value} = $resTerm; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object QuantizeInt8 {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  val schema: StructType = StructType(Seq(
    StructField("scale", FloatType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false)))

  /** Null on a null element (mirrors the declarative twin's
    * null-propagation through `transform`).
    */
  def quantize(arr: ArrayData, isFloat: Boolean): InternalRow = {
    val n = arr.numElements()
    var i = 0
    // max|v| tracked at input precision so it equals
    // array_max(transform(v, abs)) bit-for-bit on float inputs
    var maxAbs = 0.0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = math.abs(
        if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    val scaleF = maxAbs.toFloat
    val q = new Array[Byte](n)
    if (maxAbs > 0.0) {
      // float inputs divide by the FLOAT scale (matching the oracle's
      // scale::DOUBLE of a float column); double inputs keep full
      // precision
      val denom = if (isFloat) scaleF.toDouble else maxAbs
      i = 0
      while (i < n) {
        val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val x = v * 127.0 / denom
        // round half away from zero (DuckDB round / Spark round)
        q(i) = (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toByte
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](scaleF, new GenericArrayData(q)))
  }
}

/** Rademacher (±1/√k) random projection — the Johnson–Lindenstrauss
  * dimensionality-reduction tier (Achlioptas 2003, "database-friendly
  * random projections"): out(p) = (Σᵢ signs(p)(i)·vᵢ) / √k with the
  * same deterministic md5-parity signs as the LSH planes
  * ([[VectorFunctions.planeSigns]]) — no fitted model to ship, any
  * engine regenerates the matrix. Distances/inner products are
  * preserved within 1±ε, so the projected vectors drop into every
  * downstream ANN operator at k/d of the scan+shuffle payload.
  * Null on length mismatch or a null element; sequential index-order
  * accumulation keeps the doubles engine-replayable.
  */
case class RademacherProject(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  private lazy val planeArr: Array[Array[Double]] = planes.map(_.toArray).toArray

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "rademacher_project"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float>/array<double> input")
    }

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    RademacherProject.project(input.asInstanceOf[ArrayData], isFloat, planeArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resTerm = ctx.freshName("rpres")
    val pRef = ctx.addReferenceObj("planes", planeArr, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $resTerm =
         |  graft.functions.RademacherProject.project($c, $isFloat, $pRef);
         |if ($resTerm == null) { ${ev.isNull} = true; } else { ${ev.value} = $resTerm; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RademacherProject =
    copy(child = newChild)
}

object RademacherProject {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  def project(
      arr: ArrayData,
      isFloat: Boolean,
      planes: Array[Array[Double]]): GenericArrayData = {
    val k = planes.length
    if (k == 0) return null
    val n = arr.numElements()
    if (n != planes(0).length) return null
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return null; i += 1 }
    // 1/√k: one multiply per component AFTER the fold, so the oracle
    // replays it as `dot * (1/sqrt(k))` with the same single rounding
    val inv = 1.0 / math.sqrt(k.toDouble)
    val out = new Array[Double](k)
    var p = 0
    while (p < k) {
      val row = planes(p)
      var dot = 0.0
      i = 0
      while (i < n) {
        dot += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)) * row(i)
        i += 1
      }
      out(p) = dot * inv
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** Cosine over int8 codes ([[QuantizeInt8]]'s `q` arrays). Cosine is
  * scale-invariant, so the per-vector scales cancel and the whole
  * similarity runs on integer dot/norm accumulators — ~4× less
  * memory traffic than float vectors and no multiplies wider than
  * 16-bit products. Null on length mismatch, null elements, or a
  * zero-code vector (same contract as [[CosineSimilarity]]).
  */
case class CosineSimilarityInt8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity_int8"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(ByteType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<tinyint> inputs (see quantize8)")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarityInt8.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("cres")
      s"""
         |Object $res = graft.functions.CosineSimilarityInt8.cosine($a, $b);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $res).doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityInt8 =
    copy(left = newLeft, right = newRight)
}

/** Sign-bit (1-bit) vector code: word j holds bits for elements
  * 64j..64j+63, bit i set iff the element is strictly positive —
  * 32× smaller than float payloads. Output `array<bigint>` of
  * ceil(n/64) words (empty input → empty code); null on a null
  * element. Pair with [[HammingDistance]]: for mean-centered
  * embeddings, 1 − hamming/dim tracks cosine (the SimHash bound).
  */
case class PackSignBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pack_sign_bits"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float>/array<double> input")
    }

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    PackSignBits.pack(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("packed")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.PackSignBits.pack($c, $isFloat);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PackSignBits =
    copy(child = newChild)
}

object PackSignBits {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  def pack(arr: ArrayData, isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    val words = new Array[Long]((n + 63) / 64)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      if (v > 0.0) words(i >> 6) |= 1L << (i & 63)
      i += 1
    }
    new GenericArrayData(words)
  }
}

/** Hamming distance between two [[PackSignBits]] codes: Σ popcount
  * of the word-wise XOR. Null on word-count mismatch or null words
  * (same contract as [[CosineSimilarity]] on length mismatch).
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "hamming_distance"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> code inputs (see packSignBits)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (y.numElements() != n) return null
    var d = 0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      d += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) { ${ev.isNull} = true; } else {
         |  int $d = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $d += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $d; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarityInt8 {
  def cosine(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getByte(i).toLong
      val yv = y.getByte(i).toLong
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    if (na == 0L || nb == 0L) null
    else java.lang.Double.valueOf(
      dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)))
  }
}

/** Row-local nearest-centroid argmax/argmin over a (broadcast) centroid
  * matrix column — `array<struct<cid, vec>>`, sorted ascending by the
  * (unique) cid. Replaces the join-explode + max(struct)/min(struct)
  * hash-aggregation shape of the IVF/k-means assignment: the corpus
  * row never fans out to nlist candidate rows and, critically, never
  * re-shuffles through a groupBy(corpus_id) — the argmax happens
  * inside the row (guide §2.4: remove shuffles outright).
  *
  * Bit-equivalence with the aggregation it replaces:
  *  - metric "cosine": winner = max cosine ([[CosineSimilarity]]'s
  *    exact kernel), ties and all-null scores → LOWEST cid — exactly
  *    `max(struct(cos, -cid))` given the matrix is cid-ascending and
  *    the scan keeps the first strictly-better candidate.
  *  - metric "l2r6": winner = min of `round(squared_l2, 6)`
  *    ([[SquaredL2Distance]]'s kernel + Spark's HALF_UP double round),
  *    null distances WIN (Spark struct ordering puts nulls first in
  *    `min(struct(d, cid))`), ties → lowest cid.
  *
  * Score comparisons use Spark's nan-safe double ordering (NaN ==
  * NaN, NaN above everything, ±0.0 equal) — the ordering the
  * max/min(struct) aggregations applied — so the equivalence holds
  * on non-finite inputs too.
  *
  * Returns struct(cid, score double). Null ⇔ the matrix itself is
  * null or EMPTY (the join shapes emit no row then — callers filter
  * or pre-filter the matrix frame), or every matrix element is a
  * null struct (null elements cannot arise from the internal
  * collect_list builders and are skipped — they carry no cid);
  * a null/mismatched input vector yields struct(first cid, null score)
  * exactly like the aggregation (null compares lowest/highest).
  */
case class NearestCentroid(left: Expression, right: Expression, metric: String)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import VectorExpressions._

  private lazy val cenType: StructType =
    right.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private lazy val cidType: DataType = cenType.fields(0).dataType
  private lazy val vecType: DataType = cenType.fields(1).dataType

  override def dataType: DataType = StructType(Seq(
    StructField("cid", cidType, nullable = true),
    StructField("score", DoubleType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = s"nearest_centroid_$metric"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val okMetric = metric == "cosine" || metric == "l2r6"
    val okLeft = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val okRight = right.dataType match {
      case ArrayType(s: StructType, _) if s.fields.length == 2 =>
        s.fields(1).dataType match {
          case ArrayType(FloatType | DoubleType, _) => true
          case _ => false
        }
      case _ => false
    }
    if (okMetric && okLeft && okRight)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<struct<cid, array<float|double>>>)")
  }

  private def cosine(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = elemAt(x, left.dataType, i)
      val yv = elemAt(y, vecType, i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom > 0.0) java.lang.Double.valueOf(dot / denom) else null
  }

  private def l2r6(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = elemAt(x, left.dataType, i) - elemAt(y, vecType, i)
      acc += d * d
      i += 1
    }
    // Spark Round(double, 6) semantics (HALF_UP over the shortest
    // decimal representation) — matches round(squaredL2Distance, 6).
    if (acc.isNaN || acc.isInfinite) java.lang.Double.valueOf(acc)
    else java.lang.Double.valueOf(BigDecimal(acc)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  /** Spark's nan-safe double ordering (`Utils.nanSafeCompareDoubles`):
    * NaN == NaN and NaN sorts ABOVE everything else, ±0.0 compare
    * equal — the ordering `max(struct)`/`min(struct)` used, so the
    * bit-equivalence contract holds on non-finite scores too
    * (round-16 ADVICE: plain `>`/`<` silently dropped NaN winners for
    * cosine and kept NaN losers for l2r6).
    */
  private def nanSafeCompare(x: Double, y: Double): Int = {
    val xN = java.lang.Double.isNaN(x)
    val yN = java.lang.Double.isNaN(y)
    if ((xN && yN) || (x == y)) 0
    else if (xN) 1
    else if (yN) -1
    else if (x > y) 1 else -1
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val cens = right.eval(input)
    if (cens == null) return null
    val arr = cens.asInstanceOf[ArrayData]
    val k = arr.numElements()
    val vecRaw = left.eval(input)
    val vec = if (vecRaw == null) null else vecRaw.asInstanceOf[ArrayData]
    val isCos = metric == "cosine"
    // NULL struct elements (impossible from the internal collect_list
    // builders, possible through the public nearestCentroidNative API)
    // are SKIPPED rather than NPE'd: they carry no cid to assign to.
    var bestIdx = -1
    var bestScore: java.lang.Double = null
    var i = 0
    while (i < k) {
      val c = arr.getStruct(i, 2)
      if (c != null) {
        if (bestIdx < 0) {
          bestIdx = i
          bestScore =
            if (vec == null) null
            else {
              val v0 = if (c.isNullAt(1)) null else c.getArray(1)
              if (v0 == null) null
              else if (isCos) cosine(vec, v0) else l2r6(vec, v0)
            }
        } else if (vec != null) {
          val cv = if (c.isNullAt(1)) null else c.getArray(1)
          val s: java.lang.Double =
            if (cv == null) null else if (isCos) cosine(vec, cv) else l2r6(vec, cv)
          val better =
            if (isCos) s != null &&
              (bestScore == null || nanSafeCompare(s, bestScore) > 0)
            // l2r6: nulls sort FIRST in min(struct(d, cid)) — a null
            // distance beats any non-null; among nulls the earlier
            // (lower) cid stays.
            else (s == null && bestScore != null) ||
              (s != null && bestScore != null && nanSafeCompare(s, bestScore) < 0)
          if (better) { bestIdx = i; bestScore = s }
        }
      }
      i += 1
    }
    if (bestIdx < 0) return null // empty matrix, or every element null
    val cidRow = arr.getStruct(bestIdx, 2)
    val cid = cidRow.get(0, cidType)
    org.apache.spark.sql.catalyst.InternalRow(cid, bestScore)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}
