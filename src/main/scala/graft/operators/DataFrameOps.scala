package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DataFrame-level operators.
  *
  * Re-expression of the reference's `kolang/dataframe_functions.py`
  * as Spark-first Scala: `unpivot` rides Spark's native
  * `Dataset.unpivot` (one narrow projection, no shuffle), and
  * `unionAll` pads missing columns with typed nulls so Catalyst can
  * still prune and push through the union.
  */
object DataFrameOps {

  /** Unpivot `onColumns` into (inColumn, valueColumn) long format
    * (reference dataframe_functions.py:15 `unpivot`). Uses Spark's
    * built-in `unpivot` (the `stack` the reference hand-built).
    */
  def unpivot(
      df: DataFrame,
      onColumns: Seq[String],
      inColumn: String,
      valueColumn: String = "value",
      ignoreNull: Boolean = true): DataFrame = {
    val ids = df.columns.filterNot(onColumns.contains).map(col).toSeq
    val out =
      df.unpivot(ids.toArray, onColumns.map(col).toArray, inColumn, valueColumn)
    if (ignoreNull) out.where(col(valueColumn).isNotNull) else out
  }

  /** Transpose a SMALL DataFrame: values of `keyCol` become columns,
    * remaining column names become rows
    * (reference dataframe_functions.py:137 `transpose`).
    *
    * Driver-side by construction (like the reference's pandas round
    * trip) — output schema depends on data. Guarded by `maxRows`.
    */
  def transpose(df: DataFrame, keyCol: String, maxRows: Int = 10000): DataFrame = {
    // Guard BEFORE materializing: limit(maxRows + 1) bounds what the
    // driver pulls, so an oversized frame fails fast instead of
    // OOMing the driver on a full collect.
    val rows = df.limit(maxRows + 1).collect()
    require(
      rows.length <= maxRows,
      s"transpose is a small-data operator; got > $maxRows rows")
    val spark = df.sparkSession
    val otherCols = df.columns.filterNot(_ == keyCol)
    val keyIdx = df.columns.indexOf(keyCol)
    require(keyIdx >= 0, s"column $keyCol not found")

    val newColNames = rows.map(r => String.valueOf(r.get(keyIdx)))
    val schema = StructType(
      StructField("index", StringType) +:
        newColNames.map(n => StructField(n, StringType)).toSeq)
    val outRows = otherCols.map { c =>
      val ci = df.columns.indexOf(c)
      Row.fromSeq(
        c +: rows.map(r => if (r.isNullAt(ci)) null else String.valueOf(r.get(ci))).toSeq)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(outRows.toIndexedSeq, 1),
      schema)
  }

  /** Union DataFrames with differing columns, padding the missing
    * ones with nulls (reference dataframe_functions.py:155
    * `union_all`). With `force=true`, common columns whose types
    * disagree (and one side is string-castable) are cast to string
    * first (reference dataframe_functions.py:224 `safe_union`).
    */
  def unionAll(dfs: Seq[DataFrame], force: Boolean = false): DataFrame = {
    require(dfs.nonEmpty, "unionAll of zero DataFrames")
    dfs.reduce((a, b) => unionPair(a, b, force))
  }

  def safeUnion(dfs: Seq[DataFrame]): DataFrame = unionAll(dfs, force = true)

  private def unionPair(df1: DataFrame, df2: DataFrame, force: Boolean): DataFrame = {
    val cols1 = df1.columns.toSeq
    val cols2 = df2.columns.toSeq
    val missing1 = cols2.filterNot(cols1.contains)
    val missing2 = cols1.filterNot(cols2.contains)
    // Typed null padding: take the dtype from the side that has the
    // column, so no NullType reaches the union's type coercion.
    def dtypeOf(df: DataFrame, c: String) = df.schema(c).dataType
    var a = missing1.foldLeft(df1)((d, c) =>
      d.withColumn(c, lit(null).cast(dtypeOf(df2, c))))
    var b = missing2.foldLeft(df2)((d, c) =>
      d.withColumn(c, lit(null).cast(dtypeOf(df1, c))))
    if (force) {
      val common = cols1.intersect(cols2)
      common.foreach { c =>
        val (t1, t2) = (dtypeOf(df1, c), dtypeOf(df2, c))
        if (t1 != t2) {
          a = a.withColumn(c, col(c).cast(StringType))
          b = b.withColumn(c, col(c).cast(StringType))
        }
      }
    }
    a.unionByName(b)
  }

  /** Local rows → DataFrame with an explicit schema. Scala analog of
    * the reference's `pandas_to_spark`
    * (reference dataframe_functions.py:96) — in Scala the schema is
    * explicit rather than sniffed from pandas dtypes.
    */
  def localToDf(spark: SparkSession, rows: Seq[Row], schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)

  /** Schema-INFERRING overload — the reference's `pandas_to_spark`
    * ergonomic (dataframe_functions.py:109-135 `equivalent_type`):
    * each column's Spark type comes from its first non-null value's
    * runtime class (the reference sniffs pandas dtypes; local Scala
    * rows carry the same information in their values). Unrecognized
    * classes and all-null columns fall back to StringType exactly
    * like the reference's catch-all, with nulls preserved and other
    * values stringified via toString. Columns are nullable.
    */
  def localToDf(
      spark: SparkSession,
      rows: Seq[Row],
      colNames: Seq[String]): DataFrame = {
    require(rows.forall(_.length == colNames.length),
      s"every row must have ${colNames.length} values (one per column name)")
    def inferred(i: Int): DataType =
      rows.iterator.map(_.get(i)).collectFirst {
        case v if v != null => v
      } match {
        case Some(_: String) => StringType
        case Some(_: java.lang.Integer) => IntegerType
        case Some(_: java.lang.Long) => LongType
        case Some(_: java.lang.Double) => DoubleType
        case Some(_: java.lang.Float) => FloatType
        case Some(_: java.lang.Short) => ShortType
        case Some(_: java.lang.Byte) => ByteType
        case Some(_: java.lang.Boolean) => BooleanType
        case Some(_: java.sql.Timestamp) => TimestampType
        case Some(_: java.time.Instant) => TimestampType
        case Some(_: java.sql.Date) => DateType
        case Some(_: java.time.LocalDate) => DateType
        case Some(_: java.math.BigDecimal) => DecimalType.SYSTEM_DEFAULT
        case Some(_: scala.math.BigDecimal) => DecimalType.SYSTEM_DEFAULT
        case Some(_: Array[Byte]) => BinaryType
        case _ => StringType // all-null or unrecognized: reference catch-all
      }
    val types = colNames.indices.map(inferred)
    // stringify values landing in a fallback StringType column whose
    // runtime class isn't String (mixed/unrecognized) so createDataFrame
    // can't throw on them
    val coerced = rows.map { r =>
      Row.fromSeq(r.toSeq.zipWithIndex.map {
        case (null, _) => null
        case (v, i) if types(i) == StringType && !v.isInstanceOf[String] =>
          v.toString
        case (v, _) => v
      })
    }
    val schema = StructType(colNames.zip(types).map {
      case (n, t) => StructField(n, t, nullable = true)
    })
    localToDf(spark, coerced, schema)
  }
}
