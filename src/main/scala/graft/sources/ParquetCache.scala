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

  /** Per-call cache observability (the reference logs hits/misses via
    * its module logger, dataframe_functions.py:326 — this returns the
    * same facts as data): which parameter combinations loaded from an
    * existing partition, which were (re)built, and which failed under
    * `error = "ignore"`.
    */
  case class CacheReport(
      loaded: Seq[Map[String, Any]],
      built: Seq[Map[String, Any]],
      failed: Seq[(Map[String, Any], String)]) {
    def hits: Int = loaded.size
    def rebuilds: Int = built.size
  }

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
      error: String = "ignore"): DataFrame =
    loadOrCalculateWithReport(spark, func, path, rangeParams,
      constantParams, overwrite, partitionSize, log, error)._1

  /** [[loadOrCalculate]] plus the [[CacheReport]] of what each
    * combination did (hit / rebuild / failure) this call.
    */
  def loadOrCalculateWithReport(
      spark: SparkSession,
      func: Map[String, Any] => DataFrame,
      path: String,
      rangeParams: Seq[(String, Seq[Any])],
      constantParams: Map[String, Any] = Map.empty,
      overwrite: Boolean = false,
      partitionSize: Int = 1,
      log: Boolean = true,
      error: String = "ignore"): (DataFrame, CacheReport) = {

    def logger(msg: => String): Unit = if (log) println(msg)

    val products: Seq[Seq[(String, Any)]] =
      rangeParams.foldLeft(Seq(Seq.empty[(String, Any)])) {
        case (acc, (k, vs)) => for (p <- acc; v <- vs) yield p :+ (k -> v)
      }

    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

    def productPath(product: Seq[(String, Any)]): Path =
      new Path((path +: product.map { case (k, v) => s"$k=$v" }).mkString("/"))

    val loaded = Seq.newBuilder[Map[String, Any]]
    val built = Seq.newBuilder[Map[String, Any]]
    val failed = Seq.newBuilder[(Map[String, Any], String)]
    products.foreach { product =>
      val dir = productPath(product)
      // A bare directory left by a failed/killed write must NOT count
      // as cached: require the committer's _SUCCESS marker.
      val exists = fs.exists(new Path(dir, "_SUCCESS"))
      if (exists && !overwrite) {
        logger(s"load ${product.toMap}")
        loaded += product.toMap
      } else {
        try {
          val df = func(product.toMap ++ constantParams)
          df.repartition(partitionSize)
            .write.mode("overwrite")
            .parquet(dir.toString)
          logger(s"calculate ${product.toMap}")
          built += product.toMap
        } catch {
          case e: Exception if error == "ignore" =>
            logger(s"error on calculate ${product.toMap}: ${e.getMessage}")
            failed += ((product.toMap, String.valueOf(e.getMessage)))
          case e: Exception =>
            throw e
        }
      }
    }

    (spark.read.option("basePath", path).parquet(path),
      CacheReport(loaded.result(), built.result(), failed.result()))
  }
}
