package graft

import graft.sources.ShardExport
import org.apache.spark.sql.functions._

class ShardExportSpec extends SparkSpec {
  import spark.implicits._

  test("shardAssignment: fixed-size shards over the hash order, short tail") {
    val df = spark.range(150).toDF("id")
    val out = ShardExport.shardAssignment(df, "id", rowsPerShard = 40, seed = 1)
      .select($"id", $"order_id", $"shard", $"shard_pos")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.length == 150)
    out.foreach { case (_, ord, shard, pos) =>
      assert(shard == ord / 40 && pos == ord % 40)
    }
    val sizes = out.groupBy(_._3).view.mapValues(_.size).toMap
    assert(sizes == Map(0L -> 40, 1L -> 40, 2L -> 40, 3L -> 30))
    // reproducible under repartitioning
    val again = ShardExport.shardAssignment(df.repartition(7), "id", 40, seed = 1)
      .select($"id", $"order_id", $"shard", $"shard_pos")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.sortBy(_._1) == again.sortBy(_._1))
  }

  test("write: one file per shard directory, manifest matches, round trip intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    try {
      val df = spark.range(100).toDF("id").withColumn("v", $"id" * 2)
      val manifest = ShardExport.write(df, dir, "id", rowsPerShard = 30, seed = 2)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      // 100 rows / 30 per shard -> shards 0..3 with 30/30/30/10 rows
      assert(manifest.map(m => m._1 -> m._2) == Seq(0L -> 30L, 1L -> 30L, 2L -> 30L, 3L -> 10L))
      // manifest order bounds are contiguous and disjoint
      manifest.foreach { case (shard, n, first, last) =>
        assert(first == shard * 30 && last == first + n - 1)
      }
      // one parquet file per shard directory
      val shardDirs = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      assert(shardDirs.length == 4)
      shardDirs.foreach { d =>
        val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1, s"${d.getName} has ${files.length} files")
      }
      // round trip: written data equals the assignment
      val back = spark.read.parquet(dir)
        .select($"id", $"v", $"shard".cast("long"), $"shard_pos")
        .as[(Long, Long, Long, Long)].collect().toSet
      val expect = ShardExport.shardAssignment(df, "id", 30, seed = 2)
        .select($"id", $"v", $"shard", $"shard_pos")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(back == expect)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir))
    }
  }
}
