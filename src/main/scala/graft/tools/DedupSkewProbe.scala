package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Skew-injected dedup stress (round-15 verdict optional ask #7):
  * force a single LSH band bucket to hold a large slice of the sf1
  * corpus (identical text ⇒ identical minhash signature ⇒ every band
  * collides) and record that `maxBucket` keeps the candidate/verify
  * stage bounded while the uncapped run pays the quadratic bucket.
  *
  * Three timed variants over sf1 documents:
  *  - base: the corpus as generated (natural bucket sizes)
  *  - skew 1% UNCAPPED: ~1% of docs share one text — the degenerate
  *    bucket alone contributes ~(0.01n)² candidate pairs, the
  *    quadratic cost the cap exists for (1% chosen so the probe
  *    terminates; 10% uncapped would be ~100× that)
  *  - skew 10% CAPPED (maxBucket=2000): the hot bucket exceeds the
  *    cap and is DROPPED from candidate generation; runtime must
  *    stay at base level and the remaining pair set equals base
  *    minus pairs involving rewritten docs
  *
  * `SPARK_GRAFT_SF_DIR=<sf1 dir> sbt "runMain graft.tools.DedupSkewProbe"`
  */
object DedupSkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val hot = "the same hot boilerplate page text repeated across the " +
      "crawl a thousand times with enough words to shingle properly " +
      "and collide in every single band of the minhash signature"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .localCheckpoint()
    val n = docs.count()
    println(s"corpus rows=$n, dir=$dir")

    def skewed(everyNth: Int): DataFrame = docs
      .withColumn("text",
        when(pmod(col("doc_id"), lit(everyNth)) === 0, lit(hot))
          .otherwise(col("text")))
      .localCheckpoint()

    def run(label: String, df: DataFrame, maxBucket: Int): Unit = {
      val t0 = System.nanoTime()
      val pairs = Dedup.minHashLshPairs(df, "text", "doc_id",
        shingleK = 5, numHashes = 8, bands = 2, jaccardThreshold = 0.5,
        maxBucket = maxBucket).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"| $label | $secs%.2f s | $pairs pairs |")
    }

    println("| variant | wall | result |")
    println("|---|---|---|")
    run("base (no skew, uncapped)", docs, 0)
    run(s"skew 1% one-text (${n / 100} rows), UNCAPPED", skewed(100), 0)
    run(s"skew 10% one-text (${n / 10} rows), maxBucket=2000", skewed(10), 2000)
    spark.stop()
  }
}
