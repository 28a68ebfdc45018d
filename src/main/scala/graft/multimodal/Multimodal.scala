package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with a typed metadata
  * struct alongside. Decode is REAL: PNG via the JDK's
  * `javax.imageio.ImageIO` and WAV via `javax.sound.sampled` — no
  * external codec dependency. The partition shape is what a
  * vectorized decoder needs at 100 TB: batched iteration (codec/model
  * init amortized per batch), fixed-width output, null-safe,
  * embarrassingly parallel (no shuffle).
  *
  * For test data the container has no media files, so
  * [[synthesizePng]] / [[synthesizeWav]] generate real encoded bytes
  * deterministically from a row id. The pixel/sample patterns are
  * chosen wrap-free so the decoded statistics have closed forms — the
  * DuckDB oracle recomputes them arithmetically, making the decode
  * round trip (synthesize → encode → decode → stats) fully
  * oracle-checked.
  */
object Multimodal {

  // ImageIO defaults to a FILE-backed stream cache — a temp file per
  // encode/decode call, i.e. per row. In-memory streams are strictly
  // better at our payload sizes (KBs) and remove temp-dir churn and
  // contention across 32 executor threads. (Class-loads on first use
  // per JVM, driver and executors alike.)
  ImageIO.setUseCache(false)

  val metaSchema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("size_bytes", LongType),
    StructField("checksum", StringType)))

  /** Attach a binary payload column + metadata struct derived from a
    * source column (utf-8 bytes of text stand in for real media bytes
    * where only the schema/plumbing is under test).
    */
  def attachBinary(df: DataFrame, srcCol: String, kind: String = "image"): DataFrame =
    df.withColumn("payload", encode(col(srcCol), "UTF-8").cast(BinaryType))
      .withColumn(
        "media_meta",
        struct(
          lit(kind).as("kind"),
          octet_length(col("payload")).cast(LongType).as("size_bytes"),
          md5(col("payload")).as("checksum")))

  // ------------------------------------------------------------------
  // Deterministic synthesis (real encoders, closed-form content)
  // ------------------------------------------------------------------

  /** Image geometry/pattern for id: sizes 8..16, channel values are
    * wrap-free affine functions of (x, y) so every decoded statistic
    * has an exact closed form:
    *   width  = 8 + id mod 9,  height = 8 + (id div 9) mod 9
    *   r(x,y) = (id mod 128)    + 3x + 5y   (max 127 + 45 + 75 = 247)
    *   g(x,y) = (3·id mod 100)  + 2x + 4y   (max  99 + 30 + 60 = 189)
    *   b(x,y) = (5·id mod 150)  +  x +  y   (max 149 + 15 + 15 = 179)
    */
  private[graft] def imageGeometry(id: Long): (Int, Int) =
    ((8 + Math.floorMod(id, 9L)).toInt, (8 + Math.floorMod(id / 9, 9L)).toInt)

  private[graft] def pixel(id: Long, x: Int, y: Int): (Int, Int, Int) = (
    Math.floorMod(id, 128L).toInt + 3 * x + 5 * y,
    Math.floorMod(3 * id, 100L).toInt + 2 * x + 4 * y,
    Math.floorMod(5 * id, 150L).toInt + x + y)

  // Per-thread codec instances: ImageIO.read/write run a
  // reader/writer REGISTRY scan per call, measured 3.6× contention
  // overhead across 32 executor threads (graft.tools.ImageProbe:
  // 8.12 µs/row aggregate vs the 2.25 ideal); the codec objects
  // themselves (same JDK reader/writer classes) are reusable via
  // setInput/setOutput. The cache covers every magic-sniffable JDK
  // format (PNG/JPEG/GIF/BMP/TIFF — a JPEG-heavy corpus must not pay
  // the registry contention PNG was measured to pay); payloads whose
  // magic we don't recognize still route through ImageIO.read's full
  // registry.
  private val localReaders =
    new ThreadLocal[java.util.HashMap[String, javax.imageio.ImageReader]] {
      override def initialValue() = new java.util.HashMap[String, javax.imageio.ImageReader]
    }
  private def cachedReader(fmt: String): javax.imageio.ImageReader = {
    val m = localReaders.get()
    var r = m.get(fmt)
    if (r == null) {
      r = ImageIO.getImageReadersByFormatName(fmt).next()
      m.put(fmt, r)
    }
    r
  }
  private val localPngWriter = new ThreadLocal[javax.imageio.ImageWriter] {
    override def initialValue(): javax.imageio.ImageWriter =
      ImageIO.getImageWritersByFormatName("png").next()
  }

  /** ImageIO format name from the payload's magic bytes, or null when
    * unrecognized (caller falls back to the full registry).
    */
  private def sniffFormat(b: Array[Byte]): String =
    if (b.length < 8) null
    else if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff) "jpeg"
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') "gif"
    else if (b(0) == 'B' && b(1) == 'M') "bmp"
    else if ((b(0) == 'I' && b(1) == 'I' && (b(2) & 0xff) == 42 && b(3) == 0) ||
      (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && (b(3) & 0xff) == 42)) "tiff"
    else null

  /** Decode an image payload: magic-recognized formats via the
    * per-thread cached reader (lock-free hot path), anything else via
    * `ImageIO.read`'s full registry. Same exception contract as
    * `ImageIO.read` — corrupt bodies throw, unclaimed formats return
    * null.
    */
  private[graft] def readImageCodec(bytes: Array[Byte]): BufferedImage = {
    val fmt = sniffFormat(bytes)
    if (fmt == null) ImageIO.read(new ByteArrayInputStream(bytes))
    else {
      val r = cachedReader(fmt)
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new ByteArrayInputStream(bytes))
      try {
        r.setInput(iis, true, true)
        r.read(0)
      } catch {
        case e: Throwable =>
          // a failed read can leave reader state dirty — rebuild lazily
          r.dispose(); localReaders.get().remove(fmt); throw e
      } finally iis.close()
    }
  }

  /** Encode a BufferedImage as PNG via the per-thread cached writer
    * (the bytes are the same JDK PNG encoder's output).
    */
  private def writePngCodec(img: BufferedImage): Array[Byte] = {
    val w = localPngWriter.get()
    val bos = new ByteArrayOutputStream(1024)
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      w.setOutput(ios)
      w.write(img)
      ios.flush()
    } catch {
      case e: Throwable => w.dispose(); localPngWriter.remove(); throw e
    } finally ios.close()
    bos.toByteArray
  }

  private[graft] def pngBytes(id: Long): Array[Byte] = {
    val (w, h) = imageGeometry(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = pixel(id, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    writePngCodec(img)
  }

  /** Add a `payload` column of REAL PNG bytes (ImageIO-encoded)
    * deterministically derived from `idCol`. Row-local, no shuffle.
    */
  def synthesizePng(df: DataFrame, idCol: String, outCol: String = "payload"): DataFrame = {
    val outSchema = df.schema.add(StructField(outCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes: Array[Byte] =
          if (row.isNullAt(idIdx)) null else pngBytes(row.getLong(idIdx))
        Row.fromSeq(row.toSeq :+ (bytes: Any))
      }
    }
  }

  // ---- diverse image synthesis (perceptual-hash test corpus) -----
  //
  // The smooth affine pattern above is wrap-free and closed-form for
  // decode/resize means, but its gradients are MONOTONE: every dHash
  // bit reduces to "did the sampled column advance", i.e. a function
  // of the width alone — ≤ 9 distinct codes at any corpus size, so
  // at sf1 every 16-bit chunk bucket blows past the pairing cap and
  // the near-dup query only exercises the guard. The diverse pattern
  // fixes the TEST CORPUS (the operator is untouched): ids come in
  // near-dup groups of 3 (byte-identical PNGs — the pair population
  // stays LINEAR in corpus size at every SF), and each group gets an
  // LCG-seeded ±40 R-channel stripe per pixel column that flips luma
  // gradients pseudo-randomly — hash diversity grows with the
  // corpus, buckets stay bounded, and every bit is still closed-form
  // (the LCG is plain integer arithmetic the oracle replays).

  private[graft] def diverseSeed(id: Long): Long = Math.floorDiv(id, 3L)

  /** Classic 31-bit LCG with one xor-fold of the high half into the
    * low — plain integer arithmetic any engine replays. The fold
    * matters: raw LCG low bits are short-period (bit k has period
    * 2^(k+1)), which manufactures structured cross-group hash
    * collisions; xoring in the high bits gives every stripe index
    * high-period entropy.
    */
  private[graft] def diverseHash(g: Long): Long = {
    val h0 = Math.floorMod(g * 1103515245L + 12345L, 2147483648L)
    h0 ^ (h0 >> 16)
  }

  /** Wrap-free: 95 + 3·15 + 5·15 + 40 = 255 exactly on R. The
    * stripe bit is indexed by (x + y) % 31, not x alone: an x-only
    * stripe would repeat one 8-bit pattern across all 8 dHash rows
    * (≤ 256 codes per geometry → quadratic cross-group hash-equal
    * pairs); the diagonal index spreads the full 31-bit seed across
    * the grid, so codes are effectively unique per group and the
    * pair population stays within-group, i.e. linear.
    */
  private[graft] def pixelDiverse(id: Long, x: Int, y: Int): (Int, Int, Int) = {
    val g = diverseSeed(id)
    val h = diverseHash(g)
    (Math.floorMod(g, 96L).toInt + 3 * x + 5 * y +
      40 * ((h >> ((x + y) % 31)) & 1L).toInt,
      Math.floorMod(3 * g, 100L).toInt + 2 * x + 4 * y,
      Math.floorMod(5 * g, 150L).toInt + x + y)
  }

  private[graft] def imageGeometryDiverse(id: Long): (Int, Int) =
    imageGeometry(diverseSeed(id))

  private[graft] def pngBytesDiverse(id: Long): Array[Byte] = {
    val (w, h) = imageGeometryDiverse(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = pixelDiverse(id, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    writePngCodec(img)
  }

  /** [[synthesizePng]] with the DIVERSE pattern — the test corpus for
    * perceptual-hash PAIRING at scale (see block comment above).
    */
  def synthesizePngDiverse(df: DataFrame, idCol: String, outCol: String = "payload"): DataFrame = {
    val outSchema = df.schema.add(StructField(outCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes: Array[Byte] =
          if (row.isNullAt(idIdx)) null else pngBytesDiverse(row.getLong(idIdx))
        Row.fromSeq(row.toSeq :+ (bytes: Any))
      }
    }
  }

  /** REAL image decode: parse the payload with `javax.imageio`
    * (PNG/JPEG/GIF/BMP — whatever the JDK readers accept) and emit
    * `width`, `height` (long) and exact per-channel means
    * `mean_r/mean_g/mean_b` (double = integer pixel sum / pixel
    * count, so an arithmetic oracle can reproduce the doubles
    * bit-exactly). Null/undecodable payloads yield null stats.
    *
    * Batched like a vectorized (Arrow-style) UDF: per-batch init
    * amortizes codec/model setup when a heavier decoder is swapped in.
    */
  def decodeImage(
      df: DataFrame,
      payloadCol: String = "payload",
      batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema
      .add(StructField("width", LongType))
      .add(StructField("height", LongType))
      .add(StructField("mean_r", DoubleType))
      .add(StructField("mean_g", DoubleType))
      .add(StructField("mean_b", DoubleType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // ---- per-batch init for a heavier decoder goes here ----
        batch.map { row =>
          val bytes = row.get(payloadIdx).asInstanceOf[Array[Byte]]
          val stats: Seq[Any] =
            if (bytes == null) Seq(null, null, null, null, null)
            else {
              // a reader may CLAIM a stream (valid magic) and then
              // throw on a truncated/corrupt body — that's still an
              // undecodable payload, not a job-killer
              val img =
                try readImageCodec(bytes)
                catch { case scala.util.control.NonFatal(_) => null }
              if (img == null) Seq(null, null, null, null, null)
              else {
                val w = img.getWidth
                val h = img.getHeight
                var sr = 0L; var sg = 0L; var sb = 0L
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val rgb = img.getRGB(x, y)
                    sr += (rgb >> 16) & 0xff
                    sg += (rgb >> 8) & 0xff
                    sb += rgb & 0xff
                    x += 1
                  }
                  y += 1
                }
                val n = (w.toLong * h).toDouble
                // explicit Seq[Any]: mixed Long/Double literals would
                // otherwise weakly conform to Seq[Double]
                Seq[Any](w.toLong, h.toLong, sr / n, sg / n, sb / n)
              }
            }
          Row.fromSeq(row.toSeq ++ stats)
        }
      }
    }
  }

  /** Perceptual difference hash (dHash) of the image payload — the
    * standard cheap near-dup signature for images: REAL decode
    * (ImageIO), floor-NN resample to a 9×8 luma grid, and 64
    * horizontal-gradient bits (`lum(x+1) > lum(x)`), emitted as a
    * 16-hex-char string (two 32-bit halves — no signed-shift
    * arithmetic anywhere, so the DuckDB oracle's BIGINT sums replay
    * it exactly). Identical images hash equal; small perturbations
    * flip few bits — compare codes by Hamming distance, or group by
    * the code for exact visual dedup. Integer luma
    * `(299r + 587g + 114b) / 1000` and the floor sample
    * `sx = x·w/9, sy = y·h/8` keep every bit an exact closed form
    * over the synthesized test images. Null/undecodable → null.
    * Row-local, no shuffle, batched like [[decodeImage]].
    */
  def dHash(
      df: DataFrame,
      payloadCol: String = "payload",
      outCol: String = "dhash",
      batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema.add(StructField(outCol, StringType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.get(payloadIdx).asInstanceOf[Array[Byte]]
          val code: Any =
            if (bytes == null) null
            else {
              val img =
                try readImageCodec(bytes)
                catch { case scala.util.control.NonFatal(_) => null }
              if (img == null) null
              else {
                val w = img.getWidth
                val h = img.getHeight
                var hi = 0L
                var lo = 0L
                var y = 0
                while (y < 8) {
                  val sy = y * h / 8
                  var prev = 0
                  var x = 0
                  while (x < 9) {
                    val sx = x * w / 9
                    val rgb = img.getRGB(sx, sy)
                    val lum = (299 * ((rgb >> 16) & 0xff) +
                      587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
                    if (x > 0) {
                      val i = y * 8 + (x - 1)
                      if (lum > prev) {
                        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
                      }
                    }
                    prev = lum
                    x += 1
                  }
                  y += 1
                }
                f"$hi%08x$lo%08x"
              }
            }
          Row.fromSeq(row.toSeq :+ code)
        }
      }
    }
  }

  /** Per-image LUMA statistics over the REAL decode — the
    * blank/flat-image filter a multimodal curation pipeline gates on
    * (solid-color thumbnails, tracking pixels, dead camera frames
    * all show near-zero luma variance): integer luma per pixel
    * (`(299r + 587g + 114b) / 1000` — the [[dHash]] luma), EXACT
    * long sums S and Q, then
    * mean = S/n and var = (n·Q − S²)/n² — the variance numerator is
    * exact integer arithmetic, so the 6 dp roundings sit on
    * denominators n and n² (powers-of-small-ints, never a 5⁶ factor)
    * and can never land on a decimal half boundary either engine
    * rounds differently. `is_flat` compares the ROUNDED variance to
    * `flatVar`, so the flag replays exactly.
    *
    * Null/undecodable payloads yield null stats and null flag.
    * Row-local, batched like [[decodeImage]].
    */
  def lumaStats(
      df: DataFrame,
      payloadCol: String = "payload",
      flatVar: Double = 10.0,
      batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema
      .add(StructField("width", LongType))
      .add(StructField("height", LongType))
      .add(StructField("mean_luma", DoubleType))
      .add(StructField("var_luma", DoubleType))
      .add(StructField("is_flat", org.apache.spark.sql.types.BooleanType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.get(payloadIdx).asInstanceOf[Array[Byte]]
          val stats: Seq[Any] =
            if (bytes == null) Seq(null, null, null, null, null)
            else {
              val img =
                try readImageCodec(bytes)
                catch { case scala.util.control.NonFatal(_) => null }
              if (img == null) Seq(null, null, null, null, null)
              else {
                val w = img.getWidth
                val h = img.getHeight
                var s = 0L
                var q = 0L
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val rgb = img.getRGB(x, y)
                    val lum = (299 * ((rgb >> 16) & 0xff) +
                      587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
                    s += lum
                    q += lum.toLong * lum
                    x += 1
                  }
                  y += 1
                }
                val n = w.toLong * h
                val mean = r6(s.toDouble / n)
                val v = r6((n * q - s * s).toDouble / (n.toDouble * n))
                Seq[Any](w.toLong, h.toLong, mean, v, v < flatVar)
              }
            }
          Row.fromSeq(row.toSeq ++ stats)
        }
      }
    }
  }

  /** Audio synthesis pattern for id: 16-bit mono PCM, 8 kHz.
    *   n       = 160 + 16·(id mod 5)          (multiple of 16)
    *   s(i)    = 4·(id mod 256) + 8·(i mod 16) − 512
    * Wrap-free in 16-bit range; mean over any multiple of 16 samples
    * is exactly 4·(id mod 256) + 60 − 512 (Σ_{0..15} i = 120).
    */
  private[graft] def sampleCount(id: Long): Int =
    160 + 16 * Math.floorMod(id, 5L).toInt

  private[graft] def sampleAt(id: Long, i: Int): Int =
    4 * Math.floorMod(id, 256L).toInt + 8 * (i % 16) - 512

  private[graft] val WavRate = 8000f

  private[graft] def wavBytes(id: Long): Array[Byte] = {
    val n = sampleCount(id)
    val samples = new Array[Int](n)
    var i = 0
    while (i < n) { samples(i) = sampleAt(id, i); i += 1 }
    // canonical lock-free writer — AudioSystem.write's provider path
    // serializes executor threads (see [[parseWavPcm16Fast]]); the
    // bytes are identical for this format
    writeWavPcm16(samples, WavRate)
  }

  /** Add a `payload` column of REAL WAV bytes (RIFF container written
    * by `javax.sound.sampled`) derived from `idCol`.
    */
  def synthesizeWav(df: DataFrame, idCol: String, outCol: String = "payload"): DataFrame = {
    val outSchema = df.schema.add(StructField(outCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes: Array[Byte] =
          if (row.isNullAt(idIdx)) null else wavBytes(row.getLong(idIdx))
        Row.fromSeq(row.toSeq :+ (bytes: Any))
      }
    }
  }

  /** REAL audio decode: parse the WAV container with
    * `javax.sound.sampled.AudioSystem`, emit `n_samples`,
    * `sample_rate` and the exact mean sample value `mean_amp`
    * (integer sum / count). Null/unparsable payloads yield nulls.
    */
  def decodeWav(
      df: DataFrame,
      payloadCol: String = "payload",
      batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema
      .add(StructField("n_samples", LongType))
      .add(StructField("sample_rate", DoubleType))
      .add(StructField("mean_amp", DoubleType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.get(payloadIdx).asInstanceOf[Array[Byte]]
          val fast = parseWavPcm16Fast(bytes)
          val stats: Seq[Any] =
            if (bytes == null) Seq(null, null, null)
            else if (fast != null) {
              // canonical PCM: lock-free path (the at-scale one —
              // AudioSystem below serializes executor threads)
              val (samples, rate) = fast
              if (samples.length == 0) Seq(null, null, null)
              else {
                var sum = 0L
                var i = 0
                while (i < samples.length) { sum += samples(i); i += 1 }
                Seq[Any](samples.length.toLong, rate.toDouble,
                  sum.toDouble / samples.length)
              }
            } else {
              try {
                val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
                val fmt = ais.getFormat
                val n = ais.getFrameLength
                val data = ais.readAllBytes()
                if (n <= 0L) Seq(null, null, null) // 0-frame WAV: no mean
                else {
                  var sum = 0L
                  var i = 0
                  while (i + 1 < data.length) {
                    // little-endian signed 16-bit mono
                    sum += ((data(i + 1).toInt << 8) | (data(i) & 0xff)).toShort.toLong
                    i += 2
                  }
                  Seq[Any](n, fmt.getSampleRate.toDouble, sum.toDouble / n)
                }
              } catch {
                // truncated RIFF bodies throw IOException after the
                // container is claimed — same contract as image decode
                case scala.util.control.NonFatal(_) => Seq(null, null, null)
              }
            }
          Row.fromSeq(row.toSeq ++ stats)
        }
      }
    }
  }

  /** Silence/clipping gate — the audio twin of [[lumaStats]]'s
    * flat-image filter: a speech/audio curation pipeline drops dead
    * microphones (all-silent), truncated uploads (long silent tails)
    * and hot-mic distortion (clipped peaks) before paying for
    * transcription. REAL decode (the lock-free PCM16 path at scale),
    * per clip: peak, silence ratio (|s| ≤ `silenceThreshold`), clip
    * ratio (|s| ≥ `clipThreshold`), and RMS — sums are EXACT Long
    * integer arithmetic (Σ|s|² ≤ n·2³⁰ — no overflow below ~8e9
    * samples per clip), the three ratios/RMS round 6 dp at the
    * boundary (rms = √(Q/n), one double division then one √, fixed
    * order so the oracle replays). Null/unparsable/empty payloads
    * yield null stats. Row-local, batched, no shuffle.
    */
  def audioStats(
      df: DataFrame,
      payloadCol: String = "payload",
      silenceThreshold: Int = 32,
      clipThreshold: Int = 32700,
      batchSize: Int = 64): DataFrame = {
    require(silenceThreshold >= 0, "silenceThreshold must be >= 0")
    require(clipThreshold >= 1, "clipThreshold must be >= 1")
    val outSchema = df.schema
      .add(StructField("n_samples", LongType))
      .add(StructField("peak", LongType))
      .add(StructField("silence_ratio", DoubleType))
      .add(StructField("clip_ratio", DoubleType))
      .add(StructField("rms", DoubleType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    def r6(x: Double): Double = Math.rint(x * 1e6) / 1e6
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.get(payloadIdx).asInstanceOf[Array[Byte]]
          val parsed =
            if (bytes == null) null
            else
              try readPcm16(bytes)
              catch { case scala.util.control.NonFatal(_) => null }
          val stats: Seq[Any] =
            if (parsed == null || parsed._1.isEmpty) Seq(null, null, null, null, null)
            else {
              val s = parsed._1
              var peak = 0L
              var silent = 0L
              var clipped = 0L
              var q = 0L
              var i = 0
              while (i < s.length) {
                val a = math.abs(s(i)).toLong
                if (a > peak) peak = a
                if (a <= silenceThreshold) silent += 1
                if (a >= clipThreshold) clipped += 1
                q += a * a
                i += 1
              }
              val n = s.length.toDouble
              Seq[Any](s.length.toLong, peak,
                r6(silent / n), r6(clipped / n), r6(math.sqrt(q / n)))
            }
          Row.fromSeq(row.toSeq ++ stats)
        }
      }
    }
  }

  /** Perceptual AUDIO hash — the audio twin of [[dHash]]: decode the
    * WAV (real `javax.sound.sampled` parse), split the signal into 64
    * equal windows (window j covers frames i with ⌊i·64/n⌋ = j),
    * and threshold each window's mean |amplitude| against the global
    * mean — bit j = 1 iff sum_j·n > S·cnt_j, an EXACT integer
    * comparison (no float means), so the closed-form oracle replays
    * every bit. Output is the same `%08x%08x` 64-bit hex format as
    * [[dHash]], so [[graft.operators.Dedup.hammingPairs64]] pairs
    * audio near-dups completely unchanged. Null/unparsable/empty
    * payloads yield null. The window-energy bit rule compares the
    * two 128-bit products exactly (multiplyHigh + unsigned low
    * word), so arbitrarily long streams hash correctly — no Long
    * overflow ceiling.
    */
  def aHash(
      df: DataFrame,
      payloadCol: String = "payload",
      outCol: String = "ahash",
      batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema.add(StructField(outCol, StringType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.get(payloadIdx).asInstanceOf[Array[Byte]]
          def hashSamples(sampleAt: Int => Long, n: Long): String = {
            val sums = new Array[Long](64)
            val cnts = new Array[Long](64)
            var total = 0L
            var i = 0L
            while (i < n) {
              val a = math.abs(sampleAt(i.toInt))
              val w = ((i * 64) / n).toInt
              sums(w) += a
              cnts(w) += 1
              total += a
              i += 1
            }
            var hi = 0L
            var lo = 0L
            var j = 0
            while (j < 64) {
              // Exact 128-bit compare of sums(j)*n vs total*cnts(j):
              // with |sample| ≤ 32767 the 64-bit products overflow
              // once n exceeds ~1.3e8 samples (~50 min at 44.1 kHz),
              // silently flipping bits. All operands are
              // non-negative, so the signed multiplyHigh IS the
              // unsigned high word, and the low words compare
              // unsigned. Bit-identical to the old Long compare
              // whenever both products fit in 63 bits — the oracle
              // contract is unchanged.
              val h1 = Math.multiplyHigh(sums(j), n)
              val h2 = Math.multiplyHigh(total, cnts(j))
              val gt =
                if (h1 != h2) h1 > h2
                else java.lang.Long.compareUnsigned(sums(j) * n, total * cnts(j)) > 0
              if (gt) {
                if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
              }
              j += 1
            }
            f"$hi%08x$lo%08x"
          }
          val fast = parseWavPcm16Fast(bytes)
          val code: Any =
            if (bytes == null) null
            else if (fast != null) {
              // canonical PCM: lock-free path (see [[parseWavPcm16Fast]])
              val samples = fast._1
              if (samples.length == 0) null
              else hashSamples(i => samples(i).toLong, samples.length.toLong)
            } else {
              try {
                val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
                val n = ais.getFrameLength
                val data = ais.readAllBytes()
                if (n <= 0L) null
                else {
                  val m = math.min(n, data.length / 2L)
                  hashSamples(i => (((data(2 * i + 1).toInt << 8) |
                    (data(2 * i) & 0xff)).toShort).toLong, m)
                }
              } catch {
                case scala.util.control.NonFatal(_) => null
              }
            }
          Row.fromSeq(row.toSeq :+ code)
        }
      }
    }
  }

  /** Lock-free parse of a CANONICAL little-endian 16-bit mono PCM
    * RIFF/WAV — (samples, rate), or null when the payload is not
    * that shape (callers fall back to the javax.sound general
    * decoder). WHY THIS EXISTS: `AudioSystem.getAudioInputStream` /
    * `AudioSystem.write` run per-call provider discovery behind a
    * shared lock, which SERIALIZES an executor's threads — measured
    * on this container: 32 threads aggregate 2× SLOWER than one
    * thread (`graft.tools.AudioProbe`), i.e. the general decoder
    * cannot scale on a multi-core executor at all. Real corpora are
    * overwhelmingly canonical PCM, which this path decodes with
    * plain byte arithmetic — embarrassingly parallel; anything else
    * (compressed encodings, multi-channel, odd containers) still
    * routes through javax.sound.
    */
  private[graft] def parseWavPcm16Fast(bytes: Array[Byte]): (Array[Int], Float) = {
    if (bytes == null || bytes.length < 44) return null
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = u16(o).toLong | (u16(o + 2).toLong << 16)
    if (bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F' ||
        bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E')
      return null
    // Long offset walk: callers invoke this OUTSIDE their try blocks,
    // so it must be TOTAL — with Int, a >= 1 GiB payload whose chunk
    // size approaches the payload length could wrap `off` negative
    // and index out of bounds
    var off = 12L
    var rate = -1f
    var dataOff = -1L
    var dataLen = -1
    while (off + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
      val o = off.toInt
      val isFmt = bytes(o) == 'f' && bytes(o + 1) == 'm' &&
        bytes(o + 2) == 't' && bytes(o + 3) == ' '
      val isData = bytes(o) == 'd' && bytes(o + 1) == 'a' &&
        bytes(o + 2) == 't' && bytes(o + 3) == 'a'
      val sz = u32(o + 4)
      // a chunk larger than the whole payload is a lie
      if (sz < 0 || sz > bytes.length) return null
      if (isFmt) {
        // a canonical PCM fmt chunk declares ≥ 16 bytes; a smaller
        // declared size would have us read rate/bits from the NEXT
        // chunk's bytes — bounds-safe but wrong, so route such
        // containers to the javax.sound fallback instead
        if (sz < 16) return null
        if (off + 8 + 16 > bytes.length) return null
        val audioFormat = u16(o + 8)
        val channels = u16(o + 10)
        val bits = u16(o + 22)
        if (audioFormat != 1 || channels != 1 || bits != 16) return null
        val r = u32(o + 12)
        if (r <= 0) return null // a zero/absurd rate is not canonical
        rate = r.toFloat
      } else if (isData) {
        dataOff = off + 8
        dataLen = sz.toInt
      }
      off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    if (rate < 0 || dataOff < 0) return null
    if (dataOff + dataLen > bytes.length) return null // truncated body
    val n = dataLen / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val o = dataOff.toInt + 2 * i
      out(i) = (((bytes(o + 1).toInt << 8) | (bytes(o) & 0xff)).toShort).toInt
      i += 1
    }
    (out, rate)
  }

  /** Lock-free canonical 44-byte-header PCM WAV writer — the same
    * bytes `AudioSystem.write` emits for this format, without the
    * serialized provider path (see [[parseWavPcm16Fast]]).
    */
  private[graft] def writeWavPcm16(samples: Array[Int], rate: Float): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def tag(o: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    def p16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(o: Int, v: Long): Unit = {
      p16(o, (v & 0xffff).toInt); p16(o + 2, ((v >> 16) & 0xffff).toInt)
    }
    val r = math.round(rate)
    tag(0, "RIFF"); p32(4, 36L + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); p32(16, 16L); p16(20, 1); p16(22, 1)
    p32(24, r.toLong); p32(28, r.toLong * 2); p16(32, 2); p16(34, 16)
    tag(36, "data"); p32(40, dataLen.toLong)
    var i = 0
    while (i < samples.length) {
      out(44 + 2 * i) = (samples(i) & 0xff).toByte
      out(44 + 2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Parse a WAV payload to (16-bit signed samples, sample rate);
    * null for unparsable/empty payloads. Canonical PCM takes the
    * lock-free [[parseWavPcm16Fast]] path; anything else falls back
    * to the javax.sound general decoder (same frame walk as
    * [[decodeWav]]).
    */
  private def readPcm16(bytes: Array[Byte]): (Array[Int], Float) = {
    val fast = parseWavPcm16Fast(bytes)
    if (fast != null) return fast
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    // the byte walk below reinterprets frames as 16-bit LE signed
    // mono — any other decoded shape (8-bit, stereo, u-law,
    // big-endian) would be silently transformed as garbage samples;
    // those payloads degrade to null instead (the transform steps
    // support the 16-bit mono contract, not arbitrary re-sampling
    // of multi-channel audio)
    val canonicalShape =
      fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        !fmt.isBigEndian && fmt.getSampleRate > 0
    if (!canonicalShape) return null
    val n = ais.getFrameLength
    val data = ais.readAllBytes()
    if (n <= 0L) null
    else {
      val m = math.min(n, data.length / 2).toInt
      val out = new Array[Int](m)
      var i = 0
      while (i < m) {
        out(i) = (((data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff)).toShort).toInt
        i += 1
      }
      (out, fmt.getSampleRate)
    }
  }

  /** Re-encode 16-bit mono samples as a RIFF/WAV payload at `rate` —
    * the write side of the audio transform steps, the exact inverse
    * of [[readPcm16]] (canonical writer, see [[writeWavPcm16]]).
    */
  private def writePcm16(samples: Array[Int], rate: Float): Array[Byte] =
    writeWavPcm16(samples, rate)

  /** Shared shape of the audio transform steps: decode WAV →
    * row-local sample transform → re-encode WAV. Batched
    * mapPartitions like [[resizeImage]]; null/unparsable/empty
    * payloads pass through as null. No shuffle — the partition is
    * the unit of parallelism, exactly what a fleet of stateless
    * audio workers needs at 100 TB.
    */
  private def transformWav(
      df: DataFrame,
      payloadCol: String,
      outCol: String,
      batchSize: Int)(f: (Array[Int], Float) => (Array[Int], Float)): DataFrame = {
    val outSchema = df.schema.add(StructField(outCol, BinaryType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.get(payloadIdx).asInstanceOf[Array[Byte]]
          val out: Array[Byte] =
            if (bytes == null) null
            else {
              // the transform closure is INSIDE the try: a payload
              // that decodes but then breaks the transform's
              // arithmetic must degrade to null like any other
              // undecodable input, never kill the task
              try {
                val decoded = readPcm16(bytes)
                if (decoded == null) null
                else {
                  val (samples, rate) = f(decoded._1, decoded._2)
                  writePcm16(samples, rate)
                }
              } catch { case scala.util.control.NonFatal(_) => null }
            }
          Row.fromSeq(row.toSeq :+ (out: Any))
        }
      }
    }
  }

  /** REAL audio resample — the transform a multimodal corpus prep
    * runs before hashing/featurizing (models expect one fixed rate;
    * crawled audio arrives at many): linear interpolation from the
    * container's rate to `targetRate`, in EXACT integer arithmetic
    * so every output sample has a closed form any engine replays.
    * Output length m = ⌈n·target/src⌉ (duration-preserving); output
    * j reads source position j·src/target as the rational
    * (i0 = ⌊j·src/target⌋, frac = (j·src) mod target) and emits
    * s(i0) + ⌊(s(i0+1) − s(i0))·frac / target⌋ (FLOOR division —
    * `Math.floorDiv`; DuckDB's integer `//` truncates, so the oracle
    * spells floor out as (num − pmod) // den. The last position
    * clamps to s(n−1)).
    * Interpolation between in-range 16-bit samples stays in range —
    * no clipping step. Null/unparsable payloads pass through null.
    */
  def resampleWav(
      df: DataFrame,
      payloadCol: String = "payload",
      targetRate: Int = 16000,
      outCol: String = "resampled",
      batchSize: Int = 64): DataFrame = {
    require(targetRate >= 1, "targetRate must be positive")
    transformWav(df, payloadCol, outCol, batchSize) { (s, rate) =>
      val n = s.length
      val sr = math.round(rate).toLong
      val tr = targetRate.toLong
      require(sr > 0, s"non-positive source rate $sr")
      val mL = (n.toLong * tr + sr - 1) / sr
      // a tiny declared rate against a big payload would ask for an
      // absurd output — degrade (via the transform try) rather than
      // allocate gigabytes or overflow the Int below
      require(mL <= Int.MaxValue / 4, s"resample output $mL samples")
      val m = mL.toInt
      val out = new Array[Int](m)
      var j = 0
      while (j < m) {
        val num = j.toLong * sr
        val i0 = (num / tr).toInt
        val frac = num % tr
        out(j) =
          if (i0 >= n - 1) s(n - 1)
          else s(i0) + Math.floorDiv((s(i0 + 1) - s(i0)).toLong * frac, tr).toInt
        j += 1
      }
      (out, targetRate.toFloat)
    }
  }

  /** REAL audio peak normalization — the level-equalization step
    * before perceptual hashing or training (crawled audio spans
    * wildly different gains): scale every sample by
    * targetPeak/max|s| in exact integer arithmetic,
    * out = ⌊s·targetPeak / peak⌋ (FLOOR division — the oracle spells
    * it out as (num − pmod) // den since DuckDB `//` truncates on
    * negatives), so the loudest sample lands exactly on ±targetPeak and
    * the closed-form oracle replays every output sample. An all-zero
    * signal passes through unchanged (no peak to normalize); rate
    * and length are preserved. Null/unparsable payloads yield null.
    */
  def peakNormalizeWav(
      df: DataFrame,
      payloadCol: String = "payload",
      targetPeak: Int = 30000,
      outCol: String = "normalized",
      batchSize: Int = 64): DataFrame = {
    require(targetPeak >= 1 && targetPeak <= 32767, "targetPeak must be in [1, 32767]")
    transformWav(df, payloadCol, outCol, batchSize) { (s, rate) =>
      var peak = 0
      var i = 0
      while (i < s.length) {
        val a = math.abs(s(i))
        if (a > peak) peak = a
        i += 1
      }
      if (peak == 0) (s, rate)
      else {
        val out = new Array[Int](s.length)
        var k = 0
        while (k < s.length) {
          out(k) = Math.floorDiv(s(k).toLong * targetPeak, peak.toLong).toInt
          k += 1
        }
        (out, rate)
      }
    }
  }

  /** REAL image resize: decode the payload (ImageIO), nearest-
    * neighbour resample to `targetW`×`targetH` — dst(x,y) =
    * src(⌊x·sw/tw⌋, ⌊y·sh/th⌋), the standard NN mapping, written as
    * an explicit loop so the semantics are engine-reproducible — and
    * re-encode as PNG. Row-local, batched; null/undecodable payloads
    * pass through as null.
    */
  def resizeImage(
      df: DataFrame,
      payloadCol: String = "payload",
      targetW: Int = 8,
      targetH: Int = 8,
      outCol: String = "resized",
      batchSize: Int = 64): DataFrame = {
    require(targetW >= 1 && targetH >= 1, "target dims must be >= 1")
    val outSchema = df.schema.add(StructField(outCol, BinaryType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.get(payloadIdx).asInstanceOf[Array[Byte]]
          val out: Array[Byte] =
            if (bytes == null) null
            else {
              val img =
                try readImageCodec(bytes)
                catch { case scala.util.control.NonFatal(_) => null }
              if (img == null) null
              else {
                val sw = img.getWidth
                val sh = img.getHeight
                val dst = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
                var y = 0
                while (y < targetH) {
                  var x = 0
                  while (x < targetW) {
                    dst.setRGB(x, y, img.getRGB(x * sw / targetW, y * sh / targetH))
                    x += 1
                  }
                  y += 1
                }
                writePngCodec(dst)
              }
            }
          Row.fromSeq(row.toSeq :+ (out: Any))
        }
      }
    }
  }

  /** Fixed-width feature vector from decoded image stats — real
    * values (normalized geometry + channel means), declarative and
    * codegen'd; stands where an embedding model's output would go.
    */
  def imageFeatures(df: DataFrame, outCol: String = "features"): DataFrame =
    df.withColumn(outCol, array(
      (col("width") / 16.0d).cast(FloatType),
      (col("height") / 16.0d).cast(FloatType),
      (col("mean_r") / 255.0d).cast(FloatType),
      (col("mean_g") / 255.0d).cast(FloatType),
      (col("mean_b") / 255.0d).cast(FloatType),
      (col("width") / col("height")).cast(FloatType)))

  // ---- video: GVID container of real PNG frames ------------------
  //
  // No video codec ships in the JDK, so the CONTAINER is ours (the
  // task contract: stub the codec, make the Spark-side plumbing
  // real): magic "GVID" | n_frames u32 LE | fps u32 LE | per frame
  // (u32 LE byte length + a REAL JDK-PNG-encoded frame). Everything
  // downstream of sampleFrames is the existing real-codec image
  // path — decodeImage, dHash, resize all run unchanged on the
  // extracted frames, which is the point: one image toolchain
  // serves both modalities.

  private[graft] def videoFrameCount(id: Long): Int =
    3 + Math.floorMod(id, 4L).toInt

  private[graft] def videoFps(id: Long): Int =
    2 + Math.floorMod(id, 29L).toInt

  /** Frame f's wrap-free affine pixel pattern: the [[pixel]] bases
    * advance per frame INSIDE their channel modulus (so values never
    * exceed 255 at the ≤16×16 geometry) — closed-form for the
    * oracles, and the occasional modular wrap is the synthetic
    * "scene cut" [[sceneCuts]] detects.
    */
  private[graft] def framePixel(id: Long, f: Int, x: Int, y: Int): (Int, Int, Int) = (
    Math.floorMod(id + 17L * f, 128L).toInt + 3 * x + 5 * y,
    Math.floorMod(3 * id + 29L * f, 100L).toInt + 2 * x + 4 * y,
    Math.floorMod(5 * id + 31L * f, 150L).toInt + x + y)

  private def putU32(b: ByteArrayOutputStream, v: Long): Unit = {
    b.write((v & 0xff).toInt); b.write(((v >> 8) & 0xff).toInt)
    b.write(((v >> 16) & 0xff).toInt); b.write(((v >> 24) & 0xff).toInt)
  }

  private[graft] def videoBytes(id: Long): Array[Byte] = {
    val (w, h) = imageGeometry(id)
    val nf = videoFrameCount(id)
    val out = new ByteArrayOutputStream(1024)
    out.write('G'); out.write('V'); out.write('I'); out.write('D')
    putU32(out, nf)
    putU32(out, videoFps(id))
    var f = 0
    while (f < nf) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = framePixel(id, f, x, y)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val png = writePngCodec(img)
      putU32(out, png.length)
      out.write(png, 0, png.length)
      f += 1
    }
    out.toByteArray
  }

  /** Add a `payload` column of GVID bytes (real PNG frames inside)
    * deterministically derived from `idCol`. Row-local, no shuffle.
    */
  def synthesizeVideo(df: DataFrame, idCol: String, outCol: String = "payload"): DataFrame = {
    val outSchema = df.schema.add(StructField(outCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes: Array[Byte] =
          if (row.isNullAt(idIdx)) null else videoBytes(row.getLong(idIdx))
        Row.fromSeq(row.toSeq :+ (bytes: Any))
      }
    }
  }

  /** DIVERSE per-frame pixels (the video near-dup test corpus —
    * [[pixelDiverse]]'s rationale): ids come in byte-identical
    * groups of 3 (seed g = id div 3), each frame advances the
    * channel bases INSIDE their modulus and re-seeds the R stripe
    * (hash of g·7+f), so frame codes are effectively unique per
    * (group, frame) and the pair population stays linear. Wrap-free:
    * 95 + 3·15 + 5·15 + 40 = 255 on R.
    */
  private[graft] def framePixelDiverse(id: Long, f: Int, x: Int, y: Int): (Int, Int, Int) = {
    val g = diverseSeed(id)
    val h = diverseHash(g * 7 + f)
    (Math.floorMod(g + 17L * f, 96L).toInt + 3 * x + 5 * y +
      40 * ((h >> ((x + y) % 31)) & 1L).toInt,
      Math.floorMod(3 * g + 29L * f, 100L).toInt + 2 * x + 4 * y,
      Math.floorMod(5 * g + 31L * f, 150L).toInt + x + y)
  }

  private[graft] def videoBytesDiverse(id: Long): Array[Byte] = {
    val g = diverseSeed(id)
    val (w, h) = imageGeometry(g)
    val nf = videoFrameCount(g)
    val out = new ByteArrayOutputStream(1024)
    out.write('G'); out.write('V'); out.write('I'); out.write('D')
    putU32(out, nf)
    putU32(out, videoFps(g))
    var f = 0
    while (f < nf) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, gc, b) = framePixelDiverse(id, f, x, y)
          img.setRGB(x, y, (r << 16) | (gc << 8) | b)
          x += 1
        }
        y += 1
      }
      val png = writePngCodec(img)
      putU32(out, png.length)
      out.write(png, 0, png.length)
      f += 1
    }
    out.toByteArray
  }

  /** [[synthesizeVideo]] with the DIVERSE pattern — the test corpus
    * for VIDEO near-dup pairing (byte-identical groups of 3,
    * per-(group, frame) unique codes at any corpus size).
    */
  def synthesizeVideoDiverse(df: DataFrame, idCol: String, outCol: String = "payload"): DataFrame = {
    val outSchema = df.schema.add(StructField(outCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes: Array[Byte] =
          if (row.isNullAt(idIdx)) null else videoBytesDiverse(row.getLong(idIdx))
        Row.fromSeq(row.toSeq :+ (bytes: Any))
      }
    }
  }

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Walk a GVID payload: (frame offsets, fps), or null when the
    * magic is wrong or any declared frame overruns the payload — a
    * container whose directory lies is undecodable, not
    * partially-decodable (the parseWavPcm16Fast strictness).
    */
  private[graft] def walkVideo(bytes: Array[Byte]): (Array[(Int, Int)], Long) = {
    if (bytes == null || bytes.length < 12 ||
      bytes(0) != 'G' || bytes(1) != 'V' || bytes(2) != 'I' || bytes(3) != 'D')
      return null
    val nf = u32le(bytes, 4)
    // bound the directory BEFORE allocating it: every frame needs at
    // least its 4-byte length prefix, so a lying header (declared
    // n_frames in the billions on a 1 KB payload) is rejected here
    // rather than OOM-ing the executor on the Array allocation
    if (nf < 0 || nf > (bytes.length - 12L) / 4L) return null
    val frames = new Array[(Int, Int)](nf.toInt)
    var o = 12
    var f = 0
    while (f < nf) {
      if (o + 4 > bytes.length) return null
      val len = u32le(bytes, o)
      if (len < 0 || o + 4 + len > bytes.length) return null
      frames(f) = (o + 4, len.toInt)
      o += 4 + len.toInt
      f += 1
    }
    (frames, u32le(bytes, 8))
  }

  /** Container audit: (n_frames, fps, n_bytes) per payload from a
    * FULL directory walk (every declared frame must fit — a header
    * echo would accept a truncated file). Undecodable → nulls; the
    * row count is preserved, making this the audit twin of
    * [[sampleFrames]]'s drop-corrupt contract. Row-local, batched.
    */
  def decodeVideoMeta(
      df: DataFrame,
      payloadCol: String = "payload",
      batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema
      .add(StructField("n_frames", LongType))
      .add(StructField("fps", LongType))
      .add(StructField("n_bytes", LongType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.get(payloadIdx).asInstanceOf[Array[Byte]]
          val walked = walkVideo(bytes)
          val stats: Seq[Any] =
            if (walked == null) Seq(null, null, null)
            else Seq[Any](walked._1.length.toLong, walked._2, bytes.length.toLong)
          Row.fromSeq(row.toSeq ++ stats)
        }
      }
    }
  }

  /** Explode a GVID payload into one row per sampled frame
    * (`frame_idx % every == 0`): all input columns + (frame_idx,
    * `outCol` = the frame's PNG bytes) — the handoff to the image
    * operators (decodeImage/dHash/resizeImage run unchanged on the
    * output). Null/undecodable payloads emit ZERO rows by contract
    * ([[decodeVideoMeta]] is the audit that counts them). Row-local
    * flatMap — no shuffle; output size = Σ n_frames / every.
    */
  def sampleFrames(
      df: DataFrame,
      payloadCol: String = "payload",
      every: Int = 1,
      outCol: String = "frame"): DataFrame = {
    require(every >= 1, "every must be positive")
    val outSchema = df.schema
      .add(StructField("frame_idx", LongType))
      .add(StructField(outCol, BinaryType))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.flatMap { row =>
        val walked = walkVideo(row.get(payloadIdx).asInstanceOf[Array[Byte]])
        if (walked == null) Iterator.empty
        else {
          val bytes = row.get(payloadIdx).asInstanceOf[Array[Byte]]
          Iterator.range(0, walked._1.length, every).map { f =>
            val (off, len) = walked._1(f)
            Row.fromSeq(row.toSeq ++ Seq(f.toLong,
              java.util.Arrays.copyOfRange(bytes, off, off + len)))
          }
        }
      }
    }
  }

  /** Shot-boundary (scene-cut) detection over DECODED frame stats
    * (a [[sampleFrames]] → [[decodeImage]] output): per frame the
    * Rec.601 luma of the channel means, per video one lag window on
    * the frame order (parallel across videos — raw pixel data never
    * enters the window, only the per-frame stat rows), cut =
    * |Δluma| > threshold; a video's first frame is never a cut.
    */
  def sceneCuts(
      frames: DataFrame,
      idCol: String,
      frameIdxCol: String = "frame_idx",
      threshold: Double = 40.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val luma = (lit(299) * col("mean_r") + lit(587) * col("mean_g") +
      lit(114) * col("mean_b")) / lit(1000)
    val w = Window.partitionBy(col(idCol)).orderBy(col(frameIdxCol))
    val prev = graft.Cols.unique("__prev", frames)
    frames
      .withColumn("luma", luma)
      .withColumn(prev, lag(col("luma"), 1).over(w))
      .withColumn("is_cut",
        col(prev).isNotNull && abs(col("luma") - col(prev)) > threshold)
      .drop(prev)
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
