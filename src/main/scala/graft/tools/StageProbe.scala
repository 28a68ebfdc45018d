package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for the dedup hotspots (dev tool, not part of
  * the driver contract). `sbt "runMain graft.tools.StageProbe"`.
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val d = spark.read.parquet(s"$dir/documents.parquet")
    val docs = d.unionByName(
      d.where(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val sh = Dedup.charShingles(col("text"), 5)
    val shingled = docs.select(col("doc_id").as("__id"), sh.as("__sh"))
    val hashed = shingled.withColumn("__hx", transform(col("__sh"), s => md5(s)))
    val mins = (0 until 8).map(h => Dedup.chunkMin(col("__hx"), h).as(s"__m$h"))
    val minned = hashed.select(col("__id") +: col("__sh") +: mins: _*)

    time("shingle only")(shingled)
    time("shingle+md5")(hashed.select("__id", "__hx"))
    time("minima")(minned.drop("__sh"))

    // candidate volume with 4 bands of 2 vs 2 bands of 4
    for (bands <- Seq(4, 2)) {
      val rows = 8 / bands
      val bandCols = (0 until bands).map { b =>
        md5(concat_ws("|", (0 until rows).map(r => col(s"__m${b * rows + r}")): _*))
      }
      val exploded = minned
        .select(col("__id"), posexplode(array(bandCols: _*)).as(Seq("__bpos", "__bkey")))
      val a = exploded.select(col("__id").as("id_a"), col("__bpos"), col("__bkey"))
      val b = exploded.select(col("__id").as("id_b"), col("__bpos"), col("__bkey"))
      val cand = a.join(b, Seq("__bpos", "__bkey"))
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      val t0 = System.nanoTime()
      val n = cand.count()
      println(f"candidates bands=$bands%d ($n%d pairs) ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    // bucket occupancy: join output rows = Σ K² per (bpos, bkey)
    for (bands <- Seq(4, 2)) {
      val rows = 8 / bands
      val bandCols = (0 until bands).map { b =>
        md5(concat_ws("|", (0 until rows).map(r => col(s"__m${b * rows + r}")): _*))
      }
      val exploded = minned
        .select(col("__id"), posexplode(array(bandCols: _*)).as(Seq("__bpos", "__bkey")))
      val occ = exploded.groupBy("__bpos", "__bkey").count()
        .agg(sum(col("count") * col("count")).as("k2"), max("count").as("kmax"))
        .head()
      println(s"bands=$bands sumK2=${occ.getLong(0)} maxBucket=${occ.getLong(1)}")
    }

    time("full pairs (bands=4)")(
      Dedup.minHashLshPairs(docs, "text", "doc_id", 5, 8, 4, 0.5))
    time("full pairs (bands=2)")(
      Dedup.minHashLshPairs(docs, "text", "doc_id", 5, 8, 2, 0.5))

    // variant: carry shingle sets through the band explosion → ONE join
    for (bands <- Seq(4, 2)) {
      val rows = 8 / bands
      val bandCols = (0 until bands).map { b =>
        md5(concat_ws("|", (0 until rows).map(r => col(s"__m${b * rows + r}")): _*))
      }
      val exploded = minned
        .select(col("__id"), col("__sh"),
          posexplode(array(bandCols: _*)).as(Seq("__bpos", "__bkey")))
      val a = exploded.select(col("__id").as("id_a"), col("__sh").as("__set_a"),
        col("__bpos"), col("__bkey"))
      val b = exploded.select(col("__id").as("id_b"), col("__sh").as("__set_b"),
        col("__bpos"), col("__bkey"))
      val pairs = a.join(b, Seq("__bpos", "__bkey"))
        .where(col("id_a") < col("id_b"))
        .where(
          least(size(col("__set_a")), size(col("__set_b"))).cast("double") >=
            lit(0.5) * greatest(size(col("__set_a")), size(col("__set_b"))))
        .withColumn("jaccard",
          size(array_intersect(col("__set_a"), col("__set_b"))).cast("double") /
            size(array_union(col("__set_a"), col("__set_b"))).cast("double"))
        .where(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .distinct()
      time(s"carried-sets (bands=$bands)")(pairs)
    }

    val t0 = System.nanoTime()
    val sig = docs.select(Dedup.simHash(col("text"), 28, 2).as("s"))
    sig.write.format("noop").mode("overwrite").save()
    println(f"simhash signatures ${(System.nanoTime() - t0) / 1e9}%8.2f s")

    spark.stop()
  }
}
