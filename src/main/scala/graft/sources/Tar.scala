package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** POSIX ustar tar-shard interchange — the WebDataset convention
  * multimodal training pipelines actually consume (shards of ~10k
  * samples as plain tar members, read sequentially by data loaders) —
  * with the [[Jsonl]] contract: an EXPLICIT fixed schema,
  * corrupt-region QUARANTINE instead of job failure or silent loss,
  * and a bounded per-file manifest.
  *
  * Scale shape: tar is 512-byte-block framed with per-member size
  * headers, so like WARC it is FILE-granular — `binaryFile` hands
  * each shard to one task and shard COUNT is the parallelism (the
  * WebDataset layout is many ~100 MB–1 GB shards by design).
  * Member framing runs in `mapPartitions` (the byte-codec
  * dispensation — no Catalyst expression can express
  * length-delimited re-framing); everything before and after the
  * frame boundary is ordinary codegen'd columns.
  *
  * Member SYNTHESIS ([[toTarEntries]]) is a native binary
  * [[TarEntry]] expression (header build + checksum + padding is
  * byte arithmetic, which beats both a UDF and a 20-deep concat
  * chain), so Verify gets an identity roundtrip oracle with no
  * filesystem step; [[shardBytes]] assembles caller-ordered members
  * into one shard blob with the two-zero-block terminator.
  *
  * Robustness contract: a region whose header block fails the magic
  * or checksum test, whose size field is malformed or over
  * `maxEntryBytes`, or whose payload is truncated yields ONE
  * [[corruptCol]] row with a bounded snippet, and the parser RESYNCS
  * at the next 512-aligned block that validates as a header — one
  * mangled member costs itself while block alignment holds (a
  * corruption that destroys alignment costs its blob's remainder,
  * the documented tar-recovery limit).
  */
object Tar {

  /** The quarantine column, same name as [[Jsonl.corruptCol]]. */
  val corruptCol: String = Jsonl.corruptCol

  private val entryFields: Seq[StructField] = Seq(
    StructField("name", StringType),
    StructField("entry_size", LongType),
    StructField("payload", BinaryType),
    StructField(corruptCol, StringType))

  /** The fixed member schema every reader emits (plus carried input
    * columns).
    */
  val entrySchema: StructType = StructType(entryFields)

  // ------------------------------------------------------- synthesis

  /** Append one serialized ustar member per row in `outCol` (binary):
    * 512-byte header (name ≤ 100 bytes, mode 0644, uid/gid 0,
    * mtime 0 — deterministic by construction — typeflag '0', POSIX
    * `ustar` magic, spaces-then-computed checksum), payload, zero
    * padding to the block boundary. Rows with a null/empty/over-long
    * name or a null payload yield a null `outCol` (nothing
    * serializable — filter or quarantine upstream).
    */
  def toTarEntries(
      df: DataFrame,
      nameCol: String,
      payloadCol: String,
      outCol: String = "tar_entry"): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    df.withColumn(outCol, column(TarEntry(
      expression(col(nameCol)), expression(col(payloadCol)))))
  }

  /** Assemble caller-ORDERED member blobs (array<binary>) into one
    * shard blob: members back to back + the two-zero-block archive
    * terminator. Interchange/verify surface — a production shard
    * WRITER streams members per partition file instead of
    * materializing the blob as one row value.
    */
  def shardBytes(entriesSorted: Column): Column =
    concat(
      aggregate(entriesSorted, lit(Array.empty[Byte]),
        (acc, e) => concat(acc, e)),
      lit(new Array[Byte](1024)))

  private val BlockSize = 512

  /** Build one complete member (header block + payload + padding);
    * null for unserializable inputs (see [[toTarEntries]]).
    */
  private[graft] def entryBytes(name: String, payload: Array[Byte]): Array[Byte] = {
    if (name == null || payload == null) return null
    val nameB = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (nameB.length == 0 || nameB.length > 100) return null
    val padded = (BlockSize - payload.length % BlockSize) % BlockSize
    val out = new Array[Byte](BlockSize + payload.length + padded)
    System.arraycopy(nameB, 0, out, 0, nameB.length)
    putOctal(out, 100, 8, 0x1a4) // mode 0644
    putOctal(out, 108, 8, 0) // uid
    putOctal(out, 116, 8, 0) // gid
    putOctal(out, 124, 12, payload.length.toLong) // size
    putOctal(out, 136, 12, 0L) // mtime (deterministic)
    java.util.Arrays.fill(out, 148, 156, ' '.toByte) // chksum = spaces first
    out(156) = '0' // typeflag: regular file
    System.arraycopy("ustar".getBytes("US-ASCII"), 0, out, 257, 5)
    out(263) = '0'; out(264) = '0' // version "00"
    var sum = 0L
    var i = 0
    while (i < BlockSize) { sum += out(i) & 0xff; i += 1 }
    val cs = ("%06o".format(sum)).getBytes("US-ASCII")
    System.arraycopy(cs, 0, out, 148, 6)
    out(154) = 0; out(155) = ' '
    System.arraycopy(payload, 0, out, BlockSize, payload.length)
    out
  }

  private def putOctal(h: Array[Byte], off: Int, width: Int, value: Long): Unit = {
    val s = ("%0" + (width - 1) + "o").format(value).getBytes("US-ASCII")
    System.arraycopy(s, 0, h, off, width - 1)
    h(off + width - 1) = 0
  }

  // ------------------------------------------------------- parsing

  private[graft] case class Rec(
      name: String,
      size: java.lang.Long,
      payload: Array[Byte],
      corrupt: String)

  private def isZeroBlock(b: Array[Byte], off: Int): Boolean = {
    var i = off
    val end = off + BlockSize
    while (i < end) { if (b(i) != 0) return false; i += 1 }
    true
  }

  /** Header validity = `ustar` magic AND stored checksum matches the
    * spaces-substituted byte sum — the resync predicate.
    */
  private def headerValid(b: Array[Byte], off: Int): Boolean = {
    if (off + BlockSize > b.length) return false
    if (b(off + 257) != 'u' || b(off + 258) != 's' || b(off + 259) != 't' ||
      b(off + 260) != 'a' || b(off + 261) != 'r') return false
    val stored = parseOctal(b, off + 148, 8)
    if (stored < 0) return false
    var sum = 0L
    var i = off
    val end = off + BlockSize
    while (i < end) {
      val inCk = i - off >= 148 && i - off < 156
      sum += (if (inCk) ' '.toInt else b(i) & 0xff)
      i += 1
    }
    sum == stored
  }

  /** Octal field: leading NUL/space tolerated, digits, NUL/space
    * terminated; −1 on malformed.
    */
  private def parseOctal(b: Array[Byte], off: Int, width: Int): Long = {
    var i = off
    val end = off + width
    while (i < end && (b(i) == ' '.toByte || b(i) == 0)) i += 1
    var v = 0L
    var any = false
    while (i < end && b(i) >= '0' && b(i) <= '7') {
      v = v * 8 + (b(i) - '0'); any = true; i += 1
    }
    while (i < end && (b(i) == ' '.toByte || b(i) == 0)) i += 1
    if (!any || i != end) -1L else v
  }

  private def cString(b: Array[Byte], off: Int, width: Int): String = {
    var end = off
    while (end < off + width && b(end) != 0) end += 1
    new String(b, off, end - off, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def snippet(b: Array[Byte], from: Int): String = {
    val raw = new String(b, from, math.min(64, b.length - from),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    raw.map(c => if (c < ' ' || c > '~') '·' else c)
  }

  /** Parse one blob (a tar shard's bytes; gzip transparently
    * inflated) into members and quarantine rows. Block cursor — only
    * each member's payload is copied.
    */
  private[graft] def parseBlob(
      blob0: Array[Byte],
      maxEntryBytes: Long,
      maxBlobBytes: Long): Iterator[Rec] = {
    val blob =
      try Warc.gunzipIfNeeded(blob0, maxBlobBytes)
      catch {
        case e: Exception =>
          return Iterator.single(Rec(null, null, null, s"gzip: ${e.getMessage}"))
      }
    new Iterator[Rec] {
      private var pos = 0
      private var done = false
      private var nextRec: Rec = fetch()

      private def corrupt(at: Int, why: String): Rec = {
        // resync: next 512-aligned block that validates as a header;
        // a zero block past the corruption also ends the archive
        var p = at + BlockSize
        while (p + BlockSize <= blob.length && !headerValid(blob, p) &&
          !isZeroBlock(blob, p)) p += BlockSize
        pos = p
        Rec(null, null, null, s"$why @$at: ${snippet(blob, at)}")
      }

      private def fetch(): Rec = {
        if (done || pos >= blob.length) return null
        if (pos + BlockSize > blob.length)
          { done = true; return Rec(null, null, null,
            s"trailing partial block @$pos (${blob.length - pos} bytes)") }
        if (isZeroBlock(blob, pos)) {
          // end-of-archive: one or two zero blocks then nothing else
          // is clean; data after the terminator quarantines once
          var p = pos + BlockSize
          while (p + BlockSize <= blob.length && isZeroBlock(blob, p))
            p += BlockSize
          done = true
          if (p < blob.length)
            return Rec(null, null, null,
              s"data after archive terminator @$p: ${snippet(blob, p)}")
          return null
        }
        if (!headerValid(blob, pos))
          return corrupt(pos, "bad tar header (magic/checksum)")
        val size = parseOctal(blob, pos + 124, 12)
        if (size < 0)
          return corrupt(pos, "malformed size field")
        if (size > maxEntryBytes)
          return corrupt(pos, s"member size $size exceeds maxEntryBytes $maxEntryBytes")
        val name = cString(blob, pos, 100)
        val pStart = pos + BlockSize
        if (pStart + size > blob.length)
          { done = true; return Rec(null, null, null,
            s"truncated member '$name' (need $size bytes @$pStart)") }
        val payload = java.util.Arrays.copyOfRange(blob, pStart, pStart + size.toInt)
        val paddedLen = ((size + BlockSize - 1) / BlockSize) * BlockSize
        pos = (pStart + paddedLen).toInt
        Rec(name, size, payload, null)
      }

      override def hasNext: Boolean = nextRec != null
      override def next(): Rec = {
        val r = nextRec
        nextRec = fetch()
        r
      }
    }
  }

  /** Re-frame a binary column of tar bytes into members: one output
    * row per member or quarantined region, non-`bytesCol` input
    * columns carried through. Null blobs yield nothing.
    */
  def parseTar(
      df: DataFrame,
      bytesCol: String,
      maxEntryBytes: Long = 64L << 20,
      maxBlobBytes: Long = 4L << 30): DataFrame = {
    require(maxEntryBytes > 0 && maxBlobBytes >= maxEntryBytes,
      "need maxBlobBytes >= maxEntryBytes > 0")
    val keep = df.schema.fields.filterNot(_.name == bytesCol)
    require(keep.length < df.schema.length, s"no column $bytesCol")
    val outSchema = StructType(keep.toSeq ++ entryFields)
    val keepIdx = keep.map(f => df.schema.fieldIndex(f.name)).toSeq
    val bIdx = df.schema.fieldIndex(bytesCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.flatMap { row =>
        if (row.isNullAt(bIdx)) Iterator.empty
        else {
          val base = keepIdx.map(row.get)
          parseBlob(row.getAs[Array[Byte]](bIdx), maxEntryBytes, maxBlobBytes)
            .map(r => Row.fromSeq(base ++ Seq(r.name, r.size, r.payload, r.corrupt)))
        }
      }
    }
  }

  /** Distributed shard read: `binaryFile` hands each shard to one
    * task (shard count is the parallelism — tar framing is not
    * byte-splittable), then [[parseTar]] re-frames. Output =
    * `tar_file` + [[entrySchema]]'s columns.
    */
  def readTarShards(
      spark: SparkSession,
      path: String,
      maxEntryBytes: Long = 64L << 20,
      maxBlobBytes: Long = 4L << 30): DataFrame =
    parseTar(
      spark.read.format("binaryFile").load(path)
        .select(col("path").as("tar_file"), col("content")),
      "content", maxEntryBytes, maxBlobBytes)

  /** Bounded per-shard manifest over a [[readTarShards]] result:
    * member / quarantine counts and payload bytes per shard file
    * (one row per file, never per member).
    */
  def tarManifest(parsed: DataFrame, fileCol: String = "tar_file"): DataFrame =
    parsed.groupBy(col(fileCol))
      .agg(
        count(lit(1)).as("n_rows"),
        coalesce(sum(when(col(corruptCol).isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_members"),
        coalesce(sum(when(col(corruptCol).isNotNull, 1L).otherwise(0L)), lit(0L))
          .as("n_corrupt"),
        coalesce(sum(col("entry_size")), lit(0L)).as("payload_bytes"))
}

/** Native member-synthesis expression (see [[Tar.toTarEntries]]):
  * (name string, payload binary) → complete ustar member bytes, null
  * when unserializable.
  */
case class TarEntry(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "tar_entry"

  override def nullSafeEval(name: Any, payload: Any): Any =
    Tar.entryBytes(
      name.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString,
      payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (n, p) => {
      s"""${ev.value} = graft.sources.Tar.entryBytes($n.toString(), $p);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: org.apache.spark.sql.catalyst.expressions.Expression,
      newRight: org.apache.spark.sql.catalyst.expressions.Expression): TarEntry =
    copy(left = newLeft, right = newRight)
}
