package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet("/root/repo/testdata-sf1/embeddings.parquet")
    val corpus = e.where(pmod(col("vec_id"), lit(4)) === 0)
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PQPROBE $tag ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    e.limit(1).collect(); spark.range(100000).agg(sum("id")).collect()
    time("count")(corpus.where(col("embedding").isNotNull).count())
    // replicate fitCodebooks internals
    val subDim = 8; val m = 8
    val subs = array((0 until m).map(s =>
      slice(col("embedding"), s * subDim + 1, subDim).cast("array<double>")): _*)
    val sub = corpus.where(col("embedding").isNotNull)
      .select(col("vec_id").as("__id"), posexplode(subs).as(Seq("__s", "__sub")))
    val fitSub = sub.where(pmod(col("__id"), lit(16)) === 0)
    val cen0 = sub.where(pmod(col("__id"), lit(79)) === 0)
      .select(col("__s"), col("__id").as("__cid"), col("__sub").as("__cvec"))
    time("sub scan")(sub.write.format("noop").mode("overwrite").save())
    time("cen0")(cen0.write.format("noop").mode("overwrite").save())
    import graft.functions.VectorFunctions.squaredL2DistanceNative
    val d1 = fitSub.join(broadcast(cen0), Seq("__s"))
      .withColumn("__d", round(squaredL2DistanceNative(col("__sub"), col("__cvec")), 6))
    time("d1 join")(d1.write.format("noop").mode("overwrite").save())
    val a1 = d1.groupBy(col("__id"), col("__s"))
      .agg(min(struct(col("__d"), col("__cid"), col("__sub"))).as("__m"))
    time("a1 argmin")(a1.write.format("noop").mode("overwrite").save())
    val cen1 = a1.select(col("__id"), col("__s"), col("__m.__cid").as("__cid"),
        col("__m.__sub").as("__sub"))
      .select(col("__s"), col("__cid"), posexplode(col("__sub")).as(Seq("__pos", "__x")))
      .groupBy(col("__s"), col("__cid"), col("__pos"))
      .agg(round(avg(col("__x")), 6).as("__mx"))
      .groupBy(col("__s"), col("__cid"))
      .agg(transform(array_sort(collect_list(struct(col("__pos"), col("__mx")))),
        x => x.getField("__mx")).as("__cvec"))
    time("cen1 full fit DAG")(cen1.write.format("noop").mode("overwrite").save())
    time("localCheckpoint")(cen1.localCheckpoint())
    spark.stop()
  }
}
