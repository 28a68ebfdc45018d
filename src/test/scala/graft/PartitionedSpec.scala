package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Partitioned

class PartitionedSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_part_").toString

  test("writePartitioned: hive layout, manifest counts, full-fidelity read-back") {
    val df = Seq(
      (1L, "en", "a"), (2L, "en", "b"), (3L, "de", "c"), (4L, "fa", "d"))
      .toDF("id", "lang", "text")
    val dir = tmp()
    val manifest = Partitioned.writePartitioned(df, dir, Seq("lang"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(manifest == Map("en" -> 2L, "de" -> 1L, "fa" -> 1L))
    // hive directories exist
    assert(new java.io.File(s"$dir/lang=en").isDirectory)
    // read-back is lossless (partition col restored as a column)
    val back = Partitioned.readPartitioned(spark, dir)
      .select("id", "lang", "text").as[(Long, String, String)].collect().toSet
    assert(back == df.as[(Long, String, String)].collect().toSet)
  }

  test("a partition-column filter prunes at the directory level") {
    val df = (0 until 100).map(i => (i.toLong, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val dir = tmp()
    Partitioned.writePartitioned(df, dir, Seq("lang"))
    val pruned = Partitioned.readPartitioned(spark, dir)
      .where(col("lang") === "en")
    Partitioned.assertPartitionPruned(pruned, "lang")
    assert(pruned.count() == 50)
    // a data-column filter must NOT claim partition pruning
    val unpruned = Partitioned.readPartitioned(spark, dir)
      .where(col("id") > 10)
    intercept[IllegalArgumentException] {
      Partitioned.assertPartitionPruned(unpruned, "id")
    }
  }

  test("filesPerPartition salts a hot partition over several files, losslessly") {
    // 90% of rows share lang=en — the skewed-value case where one
    // writer task would otherwise serialize the hot slice
    val df = (0 until 200)
      .map(i => (i.toLong, if (i % 10 == 0) "de" else "en", s"t$i"))
      .toDF("id", "lang", "text")
    val dir = tmp()
    // test-size rows all fit one AQE-coalesced partition; at scale a
    // hot slice exceeds the advisory size and stays spread — disable
    // coalescing here so the salt's task fan-out is observable
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val manifest =
      try Partitioned
        .writePartitioned(df, dir, Seq("lang"), filesPerPartition = 4)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      finally spark.conf
        .set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    assert(manifest == Map("en" -> 180L, "de" -> 20L))
    val enFiles = new java.io.File(s"$dir/lang=en")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(enFiles > 1 && enFiles <= 4,
      s"hot partition written as $enFiles files, expected 2..4")
    val back = Partitioned.readPartitioned(spark, dir)
      .select("id", "lang", "text").as[(Long, String, String)].collect().toSet
    assert(back == df.as[(Long, String, String)].collect().toSet)
  }

  test("the cardinality guard rejects id-like partition columns") {
    val df = (0 until 50).map(i => (i.toLong, s"v$i")).toDF("id", "k")
    intercept[IllegalArgumentException] {
      Partitioned.writePartitioned(df, tmp(), Seq("k"), maxPartitions = 10)
    }
  }
}
