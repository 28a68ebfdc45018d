package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` helpers for wrapping native Catalyst
  * expressions into [[Column]]s (the classic-backend conversion in
  * Spark 4 lives behind package-private `ExpressionUtils`). The usual
  * extension-library shim; nothing here depends on internals beyond
  * that one conversion.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Partition counts of the plan's RDD-backed leaves (LogicalRDD —
    * localCheckpoint results, `createDataFrame(rdd)` frames), read
    * from plan metadata WITHOUT executing anything. `df.rdd` on an
    * AQE plan would call `getFinalPhysicalPlan` and materialize every
    * intermediate stage just to learn a partition count.
    */
  def leafRddPartitions(df: Dataset[_]): Seq[Int] =
    df.queryExecution.optimizedPlan.collectLeaves().collect {
      case l: execution.LogicalRDD => l.rdd.getNumPartitions
    }

  /** Locations of every table the session catalog knows about, across
    * all databases (views and tables without a resolvable location are
    * skipped). Used to verify a default-warehouse directory is truly
    * ORPHANED before clearing it — a name-inferred path could be some
    * other table's external data.
    */
  def tableLocations(spark: SparkSession): Seq[java.net.URI] = {
    val cat = spark.sessionState.catalog
    cat.listDatabases().flatMap { db =>
      cat.listTables(db).flatMap { ti =>
        scala.util.Try(cat.getTableMetadata(ti).location).toOption
      }
    }
  }

  /** Register an Expression-backed SQL function on a live session
    * (the extensions path only applies at session build time).
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
