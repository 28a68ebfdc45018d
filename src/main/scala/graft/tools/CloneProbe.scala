package graft.operators

// lives in graft.operators for access to private[operators] internals
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage timing for the adversarial clone corpus (dev tool). */
object CloneProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val base = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val docs = (0 until 8)
      .map(i => base.select((col("doc_id") + i * 10000000L).as("doc_id"), col("text")))
      .reduce(_ unionByName _)

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // replicate minHashLshPairs internals
    val src = Parallelism.spread(docs)
    val shingled = src.select(col("doc_id").as("__id"),
      Dedup.charShingles(col("text"), 5).as("__sh"))
    val minned = shingled.withColumn("__mins", Dedup.chunkMinsNative(col("__sh"), 8))
    val exploded = minned.select(col("__id"), size(col("__sh")).as("__sz"),
      posexplode(Dedup.bandKeys(col("__mins"), 8, 2)).as(Seq("__bpos", "__bkey")))
    val cands = Dedup.bucketPairs(exploded, struct(col("__id"), col("__sz")), 0)
      .where(col("__a.__id") < col("__b.__id"))
      .select(col("__a.__id").as("id_a"), col("__b.__id").as("id_b"))
      .distinct()
    time("cands count")(println("  cands=" + cands.count()))
    time("cands count again")(cands.count())
    val attached = cands
      .join(src.select(col("doc_id").as("id_a"), col("text").as("__t")), Seq("id_a"))
      .select(col("id_a"), col("id_b"), Dedup.charShingles(col("__t"), 5).as("__set_a"))
      .join(src.select(col("doc_id").as("id_b"), col("text").as("__t")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("__set_a"),
        Dedup.charShingles(col("__t"), 5).as("__set_b"))
    time("attach count")(attached.count())
    val verified = attached
      .withColumn("jaccard", Dedup.jaccardSim(col("__set_a"), col("__set_b")))
      .where(col("jaccard") >= 0.5)
    time("verified count")(verified.count())
    // isolate: materialize attached sets, then jaccard alone
    val ck = time("attach checkpoint")(attached.localCheckpoint(true))
    time("jaccard on checkpointed")(
      ck.withColumn("jaccard", Dedup.jaccardSim(col("__set_a"), col("__set_b")))
        .where(col("jaccard") >= 0.5).count())
    // isolate: set computation alone (force via noop write)
    time("attach noop (sets forced)")(
      attached.write.format("noop").mode("overwrite").save())
    time("full operator (barrier)")(
      Dedup.minHashLshPairs(docs, "text", "doc_id", 5, 8, 2, 0.5).count())
    spark.stop()
  }
}
