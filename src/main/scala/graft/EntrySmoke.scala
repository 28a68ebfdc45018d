package graft

import org.apache.spark.sql.SparkSession

/** Local replication of the driver's t1 smoke: run `SparkEntry.entry`
  * and assert rows > 0. `sbt "runMain graft.EntrySmoke"`.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    df.show(20, truncate = false)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    spark.stop()
    assert(n > 0, "entry() returned no rows")
  }
}
