package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialize-or-load parquet cache keyed by parameter combinations.
  *
  * Re-expression of reference dataframe_functions.py:257
  * `load_or_calculate_parquet`. Each parameter combination maps to a
  * Hive-style `key=value/` partition directory, so the final read is
  * ONE partitioned parquet source and downstream filters on the
  * parameter columns partition-prune instead of scanning everything —
  * the property that matters at 100 TB.
  */
object ParquetCache {

  /** Runs `func` for every combination in `rangeParams` whose
    * partition dir doesn't exist yet (or all, when `overwrite`),
    * writes each result, then returns the unioned partitioned read.
    *
    * @param error "ignore" logs and skips a failing combination;
    *              "stop" rethrows.
    */
  def loadOrCalculate(
      spark: SparkSession,
      func: Map[String, Any] => DataFrame,
      path: String,
      rangeParams: Seq[(String, Seq[Any])],
      constantParams: Map[String, Any] = Map.empty,
      overwrite: Boolean = false,
      partitionSize: Int = 1,
      log: Boolean = true,
      error: String = "ignore"): DataFrame = {

    def logger(msg: => String): Unit = if (log) println(msg)

    val products: Seq[Seq[(String, Any)]] =
      rangeParams.foldLeft(Seq(Seq.empty[(String, Any)])) {
        case (acc, (k, vs)) => for (p <- acc; v <- vs) yield p :+ (k -> v)
      }

    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

    def productPath(product: Seq[(String, Any)]): Path =
      new Path((path +: product.map { case (k, v) => s"$k=$v" }).mkString("/"))

    products.foreach { product =>
      val dir = productPath(product)
      // A bare directory left by a failed/killed write must NOT count
      // as cached: require the committer's _SUCCESS marker.
      val exists = fs.exists(new Path(dir, "_SUCCESS"))
      if (exists && !overwrite) {
        logger(s"load ${product.toMap}")
      } else {
        try {
          val df = func(product.toMap ++ constantParams)
          df.repartition(partitionSize)
            .write.mode("overwrite")
            .parquet(dir.toString)
          logger(s"calculate ${product.toMap}")
        } catch {
          case e: Exception if error == "ignore" =>
            logger(s"error on calculate ${product.toMap}: ${e.getMessage}")
          case e: Exception =>
            throw e
        }
      }
    }

    spark.read.option("basePath", path).parquet(path)
  }
}
