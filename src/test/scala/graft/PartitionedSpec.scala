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

  test("the cardinality guard rejects id-like partition columns") {
    val df = (0 until 50).map(i => (i.toLong, s"v$i")).toDF("id", "k")
    intercept[IllegalArgumentException] {
      Partitioned.writePartitioned(df, tmp(), Seq("k"), maxPartitions = 10)
    }
  }
}
