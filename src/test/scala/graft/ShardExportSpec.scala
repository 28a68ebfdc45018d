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

  test("packToShards: sequences equal the concatenated id stream cut at seqLen") {
    import graft.functions.{Bpe, TextAnalysis}
    val spec = Bpe.testFixture
    val docs = Seq(
      (1L, "the cat sat on the mat and the dog ran over the hill"),
      (2L, ""), // zero tokens: must vanish from the stream
      (3L, "a quick brown fox jumps over the lazy dog again and again"),
      (4L, "some more text to push the stream across a sequence boundary"),
      (5L, "tail words that end up in the dropped partial sequence maybe"))
      .toDF("doc_id", "text")
    val seqLen = 16
    // expected: per-doc ids in doc_id order, concatenated, chunked
    val perDoc = docs
      .select($"doc_id", Bpe.bpeTokenIds($"text", spec).as("ids"))
      .as[(Long, Seq[Int])].collect().sortBy(_._1)
    val stream = perDoc.flatMap(_._2)
    val full = stream.grouped(seqLen).zipWithIndex
      .collect { case (chunk, i) if chunk.length == seqLen => i.toLong -> chunk.toSeq }
      .toMap
    assert(full.nonEmpty, "fixture corpus must fill at least one sequence")
    assert(stream.length % seqLen != 0, "test needs a partial tail to exercise the drop")

    val got = TextAnalysis.packToShards(docs, "text", spec, $"doc_id", seqLen)
      .select($"seq_id", $"input_ids", $"n_tokens")
      .as[(Long, Seq[Int], Int)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == full.keys.toSeq.sorted)
    got.foreach { case (sid, ids, n) =>
      assert(n == seqLen)
      assert(ids == full(sid), s"seq $sid content mismatch")
    }
    // dropPartial=false keeps the tail with the leftover tokens
    val withTail = TextAnalysis
      .packToShards(docs, "text", spec, $"doc_id", seqLen, dropPartial = false)
      .select($"seq_id", $"input_ids")
      .as[(Long, Seq[Int])].collect().sortBy(_._1)
    assert(withTail.length == full.size + 1)
    assert(withTail.last._2 == stream.drop(full.size * seqLen).toSeq)
    // reproducible under repartitioning (fragment shuffle is keyed)
    val again = TextAnalysis
      .packToShards(docs.repartition(5), "text", spec, $"doc_id", seqLen)
      .select($"seq_id", $"input_ids")
      .as[(Long, Seq[Int])].collect().sortBy(_._1)
    assert(again.map(t => t._1 -> t._2).toSeq == got.map(t => t._1 -> t._2).toSeq)
  }

  test("writeSequences: one file per shard dir, contiguous manifest, round trip") {
    import graft.functions.{Bpe, TextAnalysis}
    val dir = java.nio.file.Files.createTempDirectory("graft-seqshards").toString
    try {
      val docs = spark.range(40)
        .select($"id".as("doc_id"),
          concat(lit("word number "), $"id".cast("string"),
            lit(" and some filler text for packing")).as("text"))
      val seqs = TextAnalysis.packToShards(docs, "text", Bpe.testFixture, $"doc_id", 32)
      val manifest = ShardExport.writeSequences(seqs, dir, seqsPerShard = 3)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(manifest.nonEmpty)
      manifest.foreach { case (shard, n, first, last) =>
        assert(first == shard * 3 && last == first + n - 1 && n <= 3)
      }
      val shardDirs = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      assert(shardDirs.length == manifest.length)
      shardDirs.foreach { d =>
        assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1,
          s"${d.getName} must hold exactly one file")
      }
      val back = spark.read.parquet(dir)
        .select($"seq_id", $"input_ids").as[(Long, Seq[Int])].collect().toSet
      val expect = seqs.select($"seq_id", $"input_ids")
        .as[(Long, Seq[Int])].collect().toSet
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
