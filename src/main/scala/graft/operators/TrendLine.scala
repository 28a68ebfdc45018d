package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Polynomial trend lines over date-indexed data.
  *
  * Re-expression of reference dataframe_functions.py:376
  * `add_trend_line`, which ran MLlib LinearRegression plus a
  * driver-side pandas date range. Spark-first redesign: a degree-d
  * polynomial least-squares fit needs only the moment sums
  * Σx^0..Σx^2d and Σx^i·y — ONE aggregation pass over the data — and
  * a (d+1)×(d+1) normal-equation solve on the driver. The prediction
  * date spine is `sequence(minDate, maxDate+horizon)` exploded on the
  * cluster. No MLlib, no collect of data rows; scales to any row
  * count at any SF.
  */
object TrendLine {

  /** Adds `<value>_trendline` columns (and future rows when
    * `predictionDay > 0`) for each of `valueCols`.
    *
    * Output: one row per date in [min(dateCol), max(dateCol) +
    * predictionDay]; original value columns joined back (null on
    * predicted-only dates), trendline columns always populated.
    */
  def addTrendLine(
      df: DataFrame,
      valueCols: Seq[String],
      dateCol: String = "date",
      predictionDay: Int = 0,
      degree: Int = 1): DataFrame = {
    require(degree >= 1 && degree <= 6, s"degree must be in [1,6], got $degree")
    val spark = df.sparkSession

    val dated = df.withColumn(dateCol, col(dateCol).cast("date"))

    // x = days since min date. Two tiny driver scalars (min/max date),
    // then one wide agg for every moment of every value column.
    val Row0 = dated.agg(min(col(dateCol)), max(col(dateCol))).head()
    val (startDate, endDate) =
      (Row0.getDate(0), Row0.getDate(1))
    val x = datediff(col(dateCol), lit(startDate)).cast("double")

    // Reference fits ONLY on observed rows (its spine + fillna(0)
    // happens after fitting, for prediction output); match that.
    val fitBase = dated.withColumn("__x", x)

    // Per-column moments, both conditioned on the SAME row set (rows
    // where that column is non-null): Spark's sum skips nulls in
    // Σxᵖ·y, so an unconditioned Σxᵖ would mix row sets and solve the
    // wrong normal equations whenever a value column has nulls.
    val momentAggs: Seq[Column] = valueCols.flatMap { v =>
      (0 to 2 * degree).map(p =>
        sum(when(col(v).isNotNull, pow(col("__x"), p))).as(s"sx_${v}_$p")) ++
        (0 to degree).map(p =>
          sum(pow(col("__x"), p) * col(v)).as(s"sxy_${v}_$p"))
    }
    val m = fitBase.agg(momentAggs.head, momentAggs.tail: _*).head()

    val coeffs: Map[String, Array[Double]] = valueCols.map { v =>
      require(!m.isNullAt(m.fieldIndex(s"sx_${v}_0")),
        s"trend line for '$v': no non-null values to fit")
      val sx = (0 to 2 * degree).map(p => m.getAs[Double](s"sx_${v}_$p")).toArray
      val b = (0 to degree).map(p => m.getAs[Double](s"sxy_${v}_$p")).toArray
      val a = Array.tabulate(degree + 1, degree + 1)((i, j) => sx(i + j))
      v -> solve(a, b)
    }.toMap

    // Output spine: every date in [start, end + predictionDay];
    // trendline everywhere, original values null on unobserved dates.
    val spine = spark
      .range(1)
      .select(
        explode(
          sequence(
            lit(startDate),
            date_add(lit(endDate), math.max(predictionDay, 0))))
          .as(dateCol))
      .withColumn("__x", x)

    valueCols
      .foldLeft(spine) { (acc, v) =>
        val beta = coeffs(v)
        val pred = beta.zipWithIndex
          .map { case (c, p) => lit(c) * pow(col("__x"), p) }
          .reduce(_ + _)
        acc.withColumn(s"${v}_trendline", pred)
      }
      .drop("__x")
      .join(dated.select(dateCol, valueCols: _*), Seq(dateCol), "left")
  }

  /** Gaussian elimination with partial pivoting for the small
    * (degree+1)² normal-equation system.
    */
  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    val m = Array.tabulate(n)(i => a(i) :+ b(i))
    for (colI <- 0 until n) {
      val piv = (colI until n).maxBy(r => math.abs(m(r)(colI)))
      val tmp = m(colI); m(colI) = m(piv); m(piv) = tmp
      require(math.abs(m(colI)(colI)) > 1e-12, "singular normal equations")
      for (r <- colI + 1 until n) {
        val f = m(r)(colI) / m(colI)(colI)
        for (k <- colI to n) m(r)(k) -= f * m(colI)(k)
      }
    }
    val xArr = new Array[Double](n)
    for (i <- n - 1 to 0 by -1) {
      var s = m(i)(n)
      for (j <- i + 1 until n) s -= m(i)(j) * xArr(j)
      xArr(i) = s / m(i)(i)
    }
    xArr
  }
}
