package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling: per-column stats for pipeline health checks.
  *
  * One aggregation job computes every column's row/null/distinct
  * counts; the single result row is exploded into one output row per
  * column. Exact `countDistinct` triggers Spark's expand-based
  * multi-distinct rewrite — fine for a handful of columns; pass
  * `approx = true` at 100 TB (HLL sketches, one pass, no expand).
  */
object Profile {

  /** @return one row per profiled column:
    *         (column, n_rows, n_nulls, n_distinct).
    */
  def profile(
      df: DataFrame,
      cols: Seq[String] = Nil,
      approx: Boolean = false): DataFrame = {
    val target = if (cols.isEmpty) df.columns.toSeq else cols
    require(target.nonEmpty, "nothing to profile")
    val aggs = count(lit(1)).as("__n") +: target.flatMap { c =>
      val dist =
        if (approx) approx_count_distinct(col(c))
        else countDistinct(col(c))
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        dist.as(s"__dist_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(
        explode(array(target.map(c =>
          struct(
            lit(c).as("column"),
            col("__n").as("n_rows"),
            col(s"__nulls_$c").as("n_nulls"),
            col(s"__dist_$c").as("n_distinct"))): _*)).as("p"))
      .select("p.*")
  }
}
