package graft

import graft.sources.Tar
import org.apache.spark.sql.functions._

/** ustar tar-shard interchange: member synthesis structure (header
  * fields, checksum, padding), shard assembly, the quarantining
  * parser's resync behavior, gzip, and the file-granular reader +
  * manifest.
  */
class TarSpec extends SparkSpec {
  import spark.implicits._

  private def entry(name: String, payload: Array[Byte]): Array[Byte] =
    Tar.entryBytes(name, payload)

  test("entryBytes: ustar header structure, checksum, block padding") {
    val p = "hello tar".getBytes("UTF-8")
    val e = entry("docs/1.txt", p)
    assert(e.length == 512 + 512) // header + one padded payload block
    assert(new String(e, 0, 10, "UTF-8") == "docs/1.txt")
    assert(e(10) == 0)
    assert(new String(e, 257, 5, "US-ASCII") == "ustar")
    assert(e(156) == '0') // regular file
    // size field: %011o of 9
    assert(new String(e, 124, 11, "US-ASCII") == "00000000011")
    // checksum: recompute with the field spaced out
    val copy = e.take(512)
    java.util.Arrays.fill(copy, 148, 156, ' '.toByte)
    val sum = copy.map(_ & 0xff).sum
    assert(new String(e, 148, 6, "US-ASCII") == "%06o".format(sum))
    // payload then zero padding
    assert(e.slice(512, 521).toSeq == p.toSeq)
    assert(e.drop(521).forall(_ == 0))
    // exact-block payload gets NO padding
    assert(entry("a", new Array[Byte](512)).length == 1024)
    // unserializable inputs -> null
    assert(entry("", p) == null)
    assert(entry("x" * 101, p) == null)
    assert(entry(null, p) == null)
    assert(entry("a", null) == null)
  }

  test("toTarEntries -> shardBytes -> parseBlob: multi-member identity roundtrip") {
    val rows = Seq(("1.txt", "first"), ("2.txt", "second member"),
      ("3.bin", "third — unicode é中"))
    val entries = Tar.toTarEntries(
      rows.toDF("name", "text").select($"name", encode($"text", "UTF-8").as("p")),
      "name", "p")
    val shard = entries.agg(Tar.shardBytes(
      transform(array_sort(collect_list(struct($"name".as("k"), $"tar_entry".as("e")))),
        s => s.getField("e"))).as("bytes"))
      .as[Array[Byte]].head()
    // terminator: at least two zero blocks, total a block multiple
    assert(shard.length % 512 == 0)
    assert(shard.takeRight(1024).forall(_ == 0))
    val recs = Tar.parseBlob(shard, 1 << 20, 1 << 24).toSeq
    assert(recs.map(_.corrupt).forall(_ == null))
    assert(recs.map(_.name) == rows.map(_._1))
    assert(recs.map(r => new String(r.payload, "UTF-8")) == rows.map(_._2))
    assert(recs.map(_.size.toLong) ==
      rows.map(_._2.getBytes("UTF-8").length.toLong))
  }

  test("parseBlob: corrupt header quarantines and resyncs at the next valid block") {
    val good1 = entry("a.txt", "aaaa".getBytes)
    val good2 = entry("b.txt", "bbbb".getBytes)
    val garbage = Array.fill[Byte](512)('x')
    val blob = good1 ++ garbage ++ good2 ++ new Array[Byte](1024)
    val recs = Tar.parseBlob(blob, 1 << 20, 1 << 24).toSeq
    assert(recs.length == 3)
    assert(recs(0).name == "a.txt" && recs(0).corrupt == null)
    assert(recs(1).corrupt != null &&
      recs(1).corrupt.contains("bad tar header"))
    assert(recs(2).name == "b.txt" && recs(2).corrupt == null)
  }

  test("parseBlob: oversize member, truncation, data after terminator — one row each") {
    val big = entry("big.bin", new Array[Byte](2048))
    val over = Tar.parseBlob(big ++ new Array[Byte](1024), 1024, 1 << 24).toSeq
    assert(over.exists(r => r.corrupt != null && r.corrupt.contains("maxEntryBytes")))

    val truncated = entry("t.txt", "0123456789".getBytes).take(512 + 4)
    val tr = Tar.parseBlob(truncated, 1 << 20, 1 << 24).toSeq
    assert(tr.length == 1 && tr.head.corrupt.contains("truncated member 't.txt'"))

    val tail = entry("a.txt", "x".getBytes) ++ new Array[Byte](1024) ++
      Array.fill[Byte](512)('y')
    val tl = Tar.parseBlob(tail, 1 << 20, 1 << 24).toSeq
    assert(tl.length == 2 && tl(0).name == "a.txt" &&
      tl(1).corrupt.contains("after archive terminator"))
  }

  test("gzip shards inflate; bad gzip quarantines as one row") {
    val shard = entry("z.txt", "zipped".getBytes) ++ new Array[Byte](1024)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(shard); gz.close()
    val recs = Tar.parseBlob(bos.toByteArray, 1 << 20, 1 << 24).toSeq
    assert(recs.length == 1 && recs.head.name == "z.txt" &&
      new String(recs.head.payload, "UTF-8") == "zipped")
    val bad = Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3)
    val b = Tar.parseBlob(bad, 1 << 20, 1 << 24).toSeq
    assert(b.length == 1 && b.head.corrupt != null && b.head.corrupt.startsWith("gzip"))
  }

  test("parseBlob: random garbage never throws, always terminates, only quarantines") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val n = rng.nextInt(4096)
      val junk = new Array[Byte](n)
      rng.nextBytes(junk)
      val recs = Tar.parseBlob(junk, 1 << 20, 1 << 24).toSeq
      // a random blob validating a checksummed ustar header is
      // ~impossible: every emitted row must be a quarantine row
      recs.foreach(r => assert(r.corrupt != null))
      assert(recs.lengthCompare(n / 512 + 2) <= 0, "at most one row per block")
    }
    // random bytes spliced BETWEEN valid members still parse the members
    val good = entry("ok.txt", "ok".getBytes)
    val mid = Array.fill[Byte](1024)(0x55)
    val recs = Tar.parseBlob(good ++ mid ++ good ++ new Array[Byte](1024),
      1 << 20, 1 << 24).toSeq
    assert(recs.count(_.corrupt == null) == 2)
    assert(recs.filter(_.corrupt == null).forall(_.name == "ok.txt"))
  }

  test("readTarShards + tarManifest: file-granular ingest, bounded audit") {
    val dir = java.nio.file.Files.createTempDirectory("tarspec").toFile
    try {
      val s1 = entry("a.txt", "aa".getBytes) ++ entry("b.txt", "bbb".getBytes) ++
        new Array[Byte](1024)
      val s2 = entry("c.txt", "cccc".getBytes) ++ Array.fill[Byte](512)('x') ++
        new Array[Byte](1024)
      java.nio.file.Files.write(new java.io.File(dir, "s1.tar").toPath, s1)
      java.nio.file.Files.write(new java.io.File(dir, "s2.tar").toPath, s2)
      val parsed = Tar.readTarShards(spark, dir.getAbsolutePath + "/*.tar")
      val m = Tar.tarManifest(parsed).orderBy($"tar_file")
        .select("n_rows", "n_members", "n_corrupt", "payload_bytes")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(m == Seq((2L, 2L, 0L, 5L), (2L, 1L, 1L, 4L)))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
