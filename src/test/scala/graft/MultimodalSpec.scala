package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("attachBinary: payload bytes + typed metadata struct") {
    val df = Seq((1L, "hello")).toDF("id", "text")
    val out = Multimodal.attachBinary(df, "text", kind = "audio")
    assert(out.schema("payload").dataType == BinaryType)
    assert(out.schema("media_meta").dataType.isInstanceOf[StructType])
    val r = out.select($"media_meta.kind", $"media_meta.size_bytes", $"media_meta.checksum")
      .as[(String, Long, String)].head()
    assert(r._1 == "audio")
    assert(r._2 == 5L)
    assert(r._3.length == 32) // md5 hex
  }

  test("decodeStub: fixed-width deterministic features, null-safe") {
    val df = Seq((1L, "same"), (2L, "same"), (3L, "different"))
      .toDF("id", "text")
    val withBin = Multimodal.attachBinary(df, "text").select("id", "payload")
    val out = Multimodal.decodeStub(withBin, "payload", dim = 8, batchSize = 2)
    val feats = out.select($"id", $"features").collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Float](1)))
      .toMap
    assert(feats(1L).get.length == 8)
    assert(feats(1L) == feats(2L)) // deterministic per payload
    assert(feats(1L) != feats(3L))

    val withNull = withBin.withColumn("payload",
      when($"id" === 1L, $"payload")) // id 2,3 → null payload
    val nf = Multimodal.decodeStub(withNull, "payload", dim = 4)
      .select($"id", $"features").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!nf(1L) && nf(2L) && nf(3L))
  }

  test("frameSample: n byte-slices per payload") {
    val df = Seq((1L, "0123456789abcdef0123456789abcdef")).toDF("id", "text")
    val withBin = Multimodal.attachBinary(df, "text")
    val out = Multimodal.frameSample(withBin, "payload", n = 4)
    val frames = out.select($"frames").collect()(0).getSeq[String](0)
    assert(frames.length == 4)
  }

  test("resizeFeatures: truncates and zero-pads to the target dim") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f, 4.0f, 5.0f)),
      (2L, Seq(1.0f, 2.0f)))
      .toDF("id", "feats")
    val out = Multimodal.resizeFeatures(df, "feats", dim = 4)
    val m = out.select($"id", $"feats").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(m(1L) == Seq(1.0f, 2.0f, 3.0f, 4.0f))
    assert(m(2L) == Seq(1.0f, 2.0f, 0.0f, 0.0f))
  }
}
