package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with a typed metadata
  * struct alongside. The Spark-side shape — schema, batching,
  * partition-parallel decode — is real and tested; the actual codec
  * call is STUBBED (this container has no image/audio libraries)
  * behind [[decodeStub]], a deterministic fake keyed on the payload
  * bytes, so pipelines are end-to-end runnable and assertable today
  * and swap in a real decoder by replacing one function.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("size_bytes", LongType),
    StructField("checksum", StringType)))

  /** Attach a binary payload column + metadata struct derived from a
    * source column (here: utf-8 bytes of text stand in for real media
    * bytes — the schema and plumbing are what downstream code sees).
    */
  def attachBinary(df: DataFrame, srcCol: String, kind: String = "image"): DataFrame =
    df.withColumn("payload", encode(col(srcCol), "UTF-8").cast(BinaryType))
      .withColumn(
        "media_meta",
        struct(
          lit(kind).as("kind"),
          octet_length(col("payload")).cast(LongType).as("size_bytes"),
          md5(col("payload")).as("checksum")))

  /** STUB decode: deterministic fake feature vector from payload
    * bytes. Replace the body with a real codec (JNI / jvm decoder)
    * without touching the plumbing: batched iteration per partition,
    * fixed-width float output, null-safe.
    *
    * Batch shape matters: a real decoder amortizes model/codec init
    * per batch, so we iterate in `batchSize` groups exactly as a
    * vectorized (Arrow/pandas-style) UDF would.
    */
  def decodeStub(
      df: DataFrame,
      payloadCol: String = "payload",
      dim: Int = 8,
      batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema.add(StructField("features", ArrayType(FloatType)))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // ---- per-batch init would go here (codec/model handle) ----
        batch.map { row =>
          val bytes = row.get(payloadIdx).asInstanceOf[Array[Byte]]
          val feats: Array[Float] =
            if (bytes == null) null
            else {
              // ??? real decoder goes here; deterministic fake below:
              // feature i = normalized rolling byte-sum with stride i+1
              Array.tabulate(dim) { i =>
                var acc = 0L
                var p = 0
                while (p < bytes.length) { acc = acc * 31 + (bytes(p) & 0xff); p += i + 1 }
                ((acc & 0xffffL).toFloat / 65535.0f)
              }
            }
          Row.fromSeq(row.toSeq :+ (feats: Any))
        }
      }
    }
  }

  /** "Frame sampling": n evenly spaced byte-slices of the payload —
    * the access pattern of video frame extraction, minus the codec.
    */
  def frameSample(df: DataFrame, payloadCol: String, n: Int): DataFrame = {
    val len = octet_length(col(payloadCol))
    val frames = transform(
      sequence(lit(0), lit(n - 1)),
      i => substring(col(payloadCol).cast(StringType), (i * greatest(len / n, lit(1))) + 1, lit(16)))
    df.withColumn("frames", frames)
  }

  /** "Resize": truncate/zero-pad a feature vector to `dim` — stands
    * in for image resize keeping the fixed-output-shape contract.
    */
  def resizeFeatures(df: DataFrame, featCol: String, dim: Int): DataFrame = {
    val padded = concat(
      col(featCol),
      array_repeat(lit(0.0f), greatest(lit(dim) - size(col(featCol)), lit(0))))
    df.withColumn(featCol, slice(padded, 1, dim))
  }
}
