package graft

import graft.sources.Warc
import org.apache.spark.sql.functions._

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(uri: String, body: String, extra: String = ""): Array[Byte] = {
    val payload = body.getBytes("UTF-8")
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:x:$uri>\r\n" +
      s"WARC-Date: 2024-01-01T00:00:00Z\r\nWARC-Target-URI: $uri\r\n" +
      extra +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8") ++
      payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  test("toWarcRecords -> parseWarc: identity roundtrip, multi-byte payloads") {
    val docs = Seq(
      (1L, "plain ascii"),
      (2L, "snowman ☃ and é combining"), // multi-byte: length is BYTES
      (3L, "")).toDF("id", "text")
    val out = Warc.parseWarc(
      Warc.toWarcRecords(
        docs.select(concat(lit("http://ex.test/"), $"id").as("uri"),
          encode($"text", "UTF-8").as("payload")),
        "uri", "payload").select("warc"),
      "warc")
    assert(out.where(col(Warc.corruptCol).isNotNull).count() == 0)
    val rows = out
      .select($"target_uri", decode($"payload", "UTF-8").as("t"),
        $"content_length", $"warc_type", $"warc_date")
      .as[(String, String, Long, String, String)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq ==
      Seq("http://ex.test/1", "http://ex.test/2", "http://ex.test/3"))
    assert(rows.map(_._2).toSeq ==
      Seq("plain ascii", "snowman ☃ and é combining", ""))
    assert(rows(1)._3 == "snowman ☃ and é combining".getBytes("UTF-8").length)
    assert(rows.forall(r => r._4 == "response" && r._5 == "2024-01-01T00:00:00Z"))
    // null uri or payload -> null record bytes, parseWarc skips nulls
    val nulls = Warc.toWarcRecords(
      Seq((Option.empty[String], Some("x")), (Some("u"), Option.empty[String]))
        .toDF("uri", "t")
        .select($"uri", encode($"t", "UTF-8").as("payload")),
      "uri", "payload")
    assert(nulls.where($"warc".isNotNull).count() == 0)
    assert(Warc.parseWarc(nulls.select("warc"), "warc").count() == 0)
  }

  test("parseBlob: multi-record segment in order; stray CRLF padding tolerated") {
    val blob = rec("http://a", "aaa") ++ "\r\n".getBytes("UTF-8") ++
      rec("http://b", "bbbb", "X-Extra: 1\r\n") ++ rec("http://c", "")
    val rs = Warc.parseBlob(blob, 1L << 20, 1L << 24).toSeq
    assert(rs.map(_.corrupt).forall(_ == null), rs.map(_.corrupt))
    assert(rs.map(_.targetUri) == Seq("http://a", "http://b", "http://c"))
    assert(rs.map(_.contentLength.toLong) == Seq(3L, 4L, 0L))
    assert(new String(rs(1).payload, "UTF-8") == "bbbb")
  }

  test("parseBlob: corrupt regions quarantine and resync; the rest of the segment survives") {
    // 1) leading garbage  2) good record  3) bad Content-Length
    // 4) good record  5) truncated payload at EOF
    val truncated = {
      val full = rec("http://t", "0123456789")
      full.take(full.length - 14) // cut into the payload
    }
    val badLen = ("WARC/1.0\r\nWARC-Target-URI: http://bad\r\n" +
      "Content-Length: NOPE\r\n\r\n").getBytes("UTF-8")
    val blob = "garbage!".getBytes("UTF-8") ++ rec("http://ok1", "x") ++
      badLen ++ rec("http://ok2", "yy") ++ truncated
    val rs = Warc.parseBlob(blob, 1L << 20, 1L << 24).toSeq
    val good = rs.filter(_.corrupt == null)
    val bad = rs.filter(_.corrupt != null)
    assert(good.map(_.targetUri) == Seq("http://ok1", "http://ok2"))
    assert(bad.size == 3, rs.map(r => (r.targetUri, r.corrupt)))
    assert(bad.exists(_.corrupt.contains("expected WARC/ magic")))
    assert(bad.exists(_.corrupt.contains("Content-Length 'NOPE'")))
    assert(bad.exists(_.corrupt.contains("truncated payload")))
    // an over-limit Content-Length quarantines instead of allocating
    val big = ("WARC/1.0\r\nWARC-Target-URI: http://big\r\n" +
      "Content-Length: 99999999\r\n\r\n").getBytes("UTF-8")
    val rs2 = Warc.parseBlob(big, maxRecordBytes = 1024, maxBlobBytes = 1L << 20).toSeq
    assert(rs2.size == 1 && rs2.head.corrupt.contains("exceeds maxRecordBytes"))
  }

  test("gzip segments inflate (multi-member) with a bound; bad gzip quarantines") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    // one member per record — the .warc.gz convention
    val blob = gz(rec("http://a", "aaa")) ++ gz(rec("http://b", "bb"))
    val rs = Warc.parseBlob(blob, 1L << 20, 1L << 24).toSeq
    assert(rs.map(_.corrupt).forall(_ == null))
    assert(rs.map(_.targetUri) == Seq("http://a", "http://b"))
    // inflated size beyond maxBlobBytes fails fast as one quarantine row
    val bomb = gz(Array.fill[Byte](4096)('a'))
    val rs2 = Warc.parseBlob(bomb, 64, 128).toSeq
    assert(rs2.size == 1 && rs2.head.corrupt != null &&
      rs2.head.corrupt.startsWith("gzip:"))
    // corrupt gzip bytes
    val broken = gz(rec("http://a", "aaa")).take(10)
    val rs3 = Warc.parseBlob(broken, 1L << 20, 1L << 24).toSeq
    assert(rs3.size == 1 && rs3.head.corrupt.startsWith("gzip:"))
  }

  test("readWarc + warcManifest: file-granular ingest, bounded audit") {
    val dir = java.nio.file.Files.createTempDirectory("warcspec").toFile
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir.getPath, "seg1.warc"),
        rec("http://a", "aaa") ++ rec("http://b", "bb"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir.getPath, "seg2.warc"),
        rec("http://c", "c") ++ "junk".getBytes("UTF-8"))
      val parsed = Warc.readWarc(spark, dir.getPath)
      assert(parsed.columns.head == "warc_file")
      val m = Warc.warcManifest(parsed)
        .select(regexp_extract($"warc_file", "seg[0-9]", 0).as("f"),
          $"n_records", $"n_corrupt", $"payload_bytes")
        .as[(String, Long, Long, Long)].collect().sortBy(_._1)
      assert(m.toSeq == Seq(("seg1", 2L, 0L, 5L), ("seg2", 1L, 1L, 1L)))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
