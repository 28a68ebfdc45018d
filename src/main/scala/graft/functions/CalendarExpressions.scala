package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Gregorian→Jalali day-count arithmetic as one compact kernel.
  *
  * The declarative formulation (nested `when` chains + day-count
  * columns) is correct but expands to >64 KB of generated Java once a
  * format string references (jy, jm, jd) more than once — Janino
  * refuses, whole-stage codegen is disabled for the stage, and every
  * run pays a compile-fail-retry plus interpreted evaluation. The
  * kernel below is the same public-domain algorithm (reference:
  * kolang/column_functions.py:354) in ~30 integer ops; `floorDiv`
  * mirrors the Column formulation's floor-of-division and `%` its
  * truncated remainder, so results are bit-identical (ScalaTest
  * anchors + the DuckDB oracle cover both).
  */
object JalaliKernel {
  private val cum = Array(0, 31, 62, 93, 124, 155, 186, 216, 246, 276, 306, 336)

  /** (gregorianYear, dayOfYear 1-based) → InternalRow(jy, jm, jd). */
  def ymd(gYear: Int, dayOfYear: Int): InternalRow = {
    val gy = gYear - 1600
    val gDayNo = 365 * gy + Math.floorDiv(gy + 3, 4) - Math.floorDiv(gy + 99, 100) +
      Math.floorDiv(gy + 399, 400) + (dayOfYear - 1)
    val jDayNo0 = gDayNo - 79
    val jNp = Math.floorDiv(jDayNo0, 12053)
    val jDayNo1 = jDayNo0 % 12053
    var jy = 979 + 33 * jNp + 4 * Math.floorDiv(jDayNo1, 1461)
    var jDayNo = jDayNo1 % 1461
    if (jDayNo >= 366) {
      jy += Math.floorDiv(jDayNo - 1, 365)
      jDayNo = (jDayNo - 1) % 365
    }
    var jm = 12
    var i = 1
    while (i < 12 && jm == 12) {
      if (jDayNo < cum(i)) jm = i
      i += 1
    }
    val jd = jDayNo - cum(jm - 1) + 1
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](jy, jm, jd))
  }
}

/** Native (jy, jm, jd) struct from (gregorian year, day-of-year). */
case class JalaliYmd(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("jy", IntegerType, nullable = false),
    StructField("jm", IntegerType, nullable = false),
    StructField("jd", IntegerType, nullable = false)))
  override def prettyName: String = "jalali_ymd"

  override def nullSafeEval(y: Any, doy: Any): Any =
    JalaliKernel.ymd(y.asInstanceOf[Int], doy.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JalaliKernel.ymd($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JalaliYmd =
    copy(left = newLeft, right = newRight)
}
