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

  test("synthesizePng produces real PNG bytes; decodeImage round-trips exactly") {
    val ids = Seq(0L, 1L, 7L, 8L, 9L, 80L, 81L, 12345L)
    val df = ids.toDF("id")
    val withPng = Multimodal.synthesizePng(df, "id")

    // real PNG container: magic bytes present, ImageIO parses it
    val firstBytes = withPng.select($"payload").head().getAs[Array[Byte]](0)
    assert(firstBytes.slice(1, 4).map(_.toChar).mkString == "PNG")

    val out = Multimodal.decodeImage(withPng, "payload", batchSize = 3)
      .select($"id", $"width", $"height", $"mean_r", $"mean_g", $"mean_b")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    ids.foreach { id =>
      val (w, h) = Multimodal.imageGeometry(id)
      val (gw, gh, mr, mg, mb) = out(id)
      assert(gw == w && gh == h, s"geometry for $id")
      // exact closed-form channel means (wrap-free affine pixels)
      def mean(f: (Int, Int) => Int): Double = {
        var s = 0L
        for (y <- 0 until h; x <- 0 until w) s += f(x, y)
        s.toDouble / (w * h)
      }
      assert(mr == mean((x, y) => Multimodal.pixel(id, x, y)._1), s"mean_r for $id")
      assert(mg == mean((x, y) => Multimodal.pixel(id, x, y)._2), s"mean_g for $id")
      assert(mb == mean((x, y) => Multimodal.pixel(id, x, y)._3), s"mean_b for $id")
    }

    // null payload → null stats
    val withNull = withPng.withColumn("payload", when($"id" === 0L, $"payload"))
    val nf = Multimodal.decodeImage(withNull, "payload")
      .select($"id", $"width").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!nf(0L) && nf(1L))

    // undecodable bytes → null stats (not an exception)
    val junk = Seq((1L, Array[Byte](1, 2, 3, 4))).toDF("id", "payload")
    assert(Multimodal.decodeImage(junk, "payload").select($"width").head().isNullAt(0))

    // valid PNG magic + truncated body: a reader CLAIMS the stream
    // then throws — must still yield nulls, not kill the job
    val truncated = Seq((1L, firstBytes.take(24))).toDF("id", "payload")
    assert(Multimodal.decodeImage(truncated, "payload").select($"width").head().isNullAt(0))
    assert(Multimodal.resizeImage(truncated, "payload").select($"resized").head().isNullAt(0))
  }

  test("synthesizeWav produces a real RIFF/WAV; decodeWav recovers exact stats") {
    val ids = Seq(0L, 1L, 4L, 255L, 256L, 999L)
    val df = ids.toDF("id")
    val withWav = Multimodal.synthesizeWav(df, "id")
    val firstBytes = withWav.select($"payload").head().getAs[Array[Byte]](0)
    assert(firstBytes.take(4).map(_.toChar).mkString == "RIFF")

    val out = Multimodal.decodeWav(withWav, "payload", batchSize = 2)
      .select($"id", $"n_samples", $"sample_rate", $"mean_amp")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    ids.foreach { id =>
      val n = Multimodal.sampleCount(id)
      val expMean = (0 until n).map(Multimodal.sampleAt(id, _).toLong).sum.toDouble / n
      val (gn, rate, mean) = out(id)
      assert(gn == n.toLong, s"n_samples for $id")
      assert(rate == 8000.0, s"rate for $id")
      assert(mean == expMean, s"mean_amp for $id")
    }

    // junk bytes → null stats
    val junk = Seq((1L, Array[Byte](9, 9, 9, 9))).toDF("id", "payload")
    assert(Multimodal.decodeWav(junk, "payload").select($"n_samples").head().isNullAt(0))

    // truncated RIFF (claimed container, then IOException) → nulls
    val truncated = Seq((1L, firstBytes.take(20))).toDF("id", "payload")
    assert(Multimodal.decodeWav(truncated, "payload").select($"n_samples").head().isNullAt(0))
  }

  test("resizeImage: exact nearest-neighbour resample, re-encoded as real PNG") {
    val ids = Seq(0L, 5L, 80L, 12345L)
    val withPng = Multimodal.synthesizePng(ids.toDF("id"), "id")
    val resized = Multimodal.resizeImage(withPng, "payload", targetW = 4, targetH = 6)

    // output is a real PNG again
    val rb = resized.select($"resized").head().getAs[Array[Byte]](0)
    assert(rb.slice(1, 4).map(_.toChar).mkString == "PNG")

    val out = Multimodal.decodeImage(resized, "resized")
      .select($"id", $"width", $"height", $"mean_r")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    ids.foreach { id =>
      val (sw, sh) = Multimodal.imageGeometry(id)
      // exact NN model: dst(x,y) = src(x*sw/4, y*sh/6)
      var s = 0L
      for (y <- 0 until 6; x <- 0 until 4)
        s += Multimodal.pixel(id, x * sw / 4, y * sh / 6)._1
      val (w, h, mr) = out(id)
      assert(w == 4L && h == 6L, s"geometry for $id")
      assert(mr == s.toDouble / 24, s"mean_r for $id")
    }

    // null payload passes through
    val withNull = withPng.withColumn("payload", when($"id" === 0L, $"payload"))
    val nf = Multimodal.resizeImage(withNull, "payload")
      .select($"id", $"resized").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!nf(0L) && nf(5L))
  }

  test("imageFeatures: fixed-width real features from decoded stats") {
    val decoded = Multimodal.decodeImage(
      Multimodal.synthesizePng(Seq(5L).toDF("id"), "id"), "payload")
    val feats = Multimodal.imageFeatures(decoded)
      .select($"features").head().getSeq[Float](0)
    assert(feats.length == 6)
    val (w, h) = Multimodal.imageGeometry(5L)
    assert(feats(0) == w / 16.0f && feats(1) == h / 16.0f)
    assert(feats.forall(f => !f.isNaN))
  }

  test("synthesizeVideo: GVID walk, frame sampling, real-PNG frames decode exactly") {
    val ids = Seq(0L, 1L, 5L, 9L, 80L, 12345L)
    val vids = Multimodal.synthesizeVideo(ids.toDF("id"), "id")

    // container magic + meta from the full walk
    val first = vids.select($"payload").head().getAs[Array[Byte]](0)
    assert(first.take(4).map(_.toChar).mkString == "GVID")
    val meta = Multimodal.decodeVideoMeta(vids, "payload")
      .select($"id", $"n_frames", $"fps", $"n_bytes").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    ids.foreach { id =>
      assert(meta(id)._1 == Multimodal.videoFrameCount(id).toLong, s"n_frames $id")
      assert(meta(id)._2 == Multimodal.videoFps(id).toLong, s"fps $id")
      assert(meta(id)._3 > 12, s"n_bytes $id")
    }

    // every=2 keeps frame indexes 0,2,4; every=1 keeps all
    val idx2 = Multimodal.sampleFrames(vids, "payload", every = 2)
      .where($"id" === 12345L).select($"frame_idx").as[Long].collect().sorted
    val nf = Multimodal.videoFrameCount(12345L)
    assert(idx2.toSeq == (0 until nf by 2).map(_.toLong))
    assert(Multimodal.sampleFrames(vids, "payload").count() ==
      ids.map(Multimodal.videoFrameCount(_).toLong).sum)

    // sampled frames are REAL PNGs: the unchanged image path decodes
    // them to the per-frame closed-form means
    val frames = Multimodal.sampleFrames(vids, "payload").drop("payload")
    val out = Multimodal.decodeImage(frames, "frame", batchSize = 3)
      .select($"id", $"frame_idx", $"width", $"height", $"mean_r", $"mean_g", $"mean_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    ids.foreach { id =>
      val (w, h) = Multimodal.imageGeometry(id)
      for (f <- 0 until Multimodal.videoFrameCount(id)) {
        val (gw, gh, mr, mg, mb) = out((id, f.toLong))
        assert(gw == w && gh == h, s"geometry $id/$f")
        def mean(c: (Int, Int, Int) => Int): Double = {
          var s = 0L
          for (y <- 0 until h; x <- 0 until w) {
            val p = Multimodal.framePixel(id, f, x, y)
            s += c(p._1, p._2, p._3)
          }
          s.toDouble / (w * h)
        }
        assert(mr == mean((r, _, _) => r), s"mean_r $id/$f")
        assert(mg == mean((_, g, _) => g), s"mean_g $id/$f")
        assert(mb == mean((_, _, b) => b), s"mean_b $id/$f")
      }
    }

    // corrupt containers: bad magic / truncated frame / lying
    // directory → meta nulls AND zero sampled frames, never a throw
    val bad = Seq(
      (1L, Array[Byte](1, 2, 3, 4, 5)), // wrong magic
      (2L, first.take(20)), // truncated mid-frame
      (3L, { val b = first.clone(); b(4) = 99; b }), // lying n_frames
      (4L, null.asInstanceOf[Array[Byte]]),
      // header declaring ~4e9 frames on a tiny payload: must be
      // rejected BEFORE the directory allocation, not OOM
      (5L, { val b = first.clone()
        b(4) = -1; b(5) = -1; b(6) = -1; b(7) = -1; b }))
      .toDF("id", "payload")
    val badMeta = Multimodal.decodeVideoMeta(bad, "payload")
      .select($"id", $"n_frames").collect()
    assert(badMeta.forall(_.isNullAt(1)))
    assert(Multimodal.sampleFrames(bad, "payload").count() == 0)
    intercept[IllegalArgumentException] {
      Multimodal.sampleFrames(vids, "payload", every = 0)
    }
  }

  test("synthesizeVideoDiverse: byte-identical groups of 3, distinct frame codes") {
    val vids = Multimodal.synthesizeVideoDiverse((0L until 12L).toDF("id"), "id")
    val payloads = vids.select($"id", $"payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    // ids 0,1,2 share seed 0 -> byte-identical; different groups differ
    assert(payloads(0L).sameElements(payloads(1L)))
    assert(payloads(1L).sameElements(payloads(2L)))
    assert(!payloads(2L).sameElements(payloads(3L)))
    // per-frame dHash: same code inside a group at each position;
    // frames of one video are NOT all equal (the stripe re-seeds per
    // frame), so position alignment carries signal
    val codes = Multimodal.dHash(
      Multimodal.sampleFrames(vids, "payload").drop("payload"), "frame")
      .select($"id", $"frame_idx", $"dhash")
      .as[(Long, Long, String)].collect()
    val byVid = codes.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(byVid(0L) == byVid(1L) && byVid(1L) == byVid(2L))
    assert(byVid(0L).distinct.size > 1, "frames differ within a video")
    // end to end: the aligned pairing recovers exactly the 3 pairs
    // per group at frac 1.0
    val pairs = graft.operators.Dedup.alignedSignaturePairs(
      codes.toSeq.toDF("id", "frame_idx", "dhash"), "id", "frame_idx", "dhash", 0.5)
      .select($"id_a", $"id_b", $"match_frac")
      .as[(Long, Long, Double)].collect()
    val perfect = pairs.filter(_._3 == 1.0).map(p => (p._1, p._2)).toSet
    val expected = (0L until 12L by 3).flatMap(g =>
      Seq((g, g + 1), (g, g + 2), (g + 1, g + 2))).toSet
    assert(expected.subsetOf(perfect), s"missing: ${expected -- perfect}")
  }

  test("sceneCuts: luma-delta flags over decoded frames; first frame never cuts") {
    // hand-built frame stats: video A jumps at frame 2 (luma delta
    // 299·120/1000 = 35.88 < 40? no — use a 200-step: 59.8), video B flat
    val stats = Seq(
      ("A", 0L, 10.0, 10.0, 10.0),
      ("A", 1L, 12.0, 11.0, 10.0), // |delta| small
      ("A", 2L, 212.0, 11.0, 10.0), // mean_r +200 -> delta 59.8 > 40
      ("B", 0L, 50.0, 50.0, 50.0),
      ("B", 1L, 50.0, 50.0, 50.0))
      .toDF("vid", "frame_idx", "mean_r", "mean_g", "mean_b")
    val out = Multimodal.sceneCuts(stats, "vid")
      .select($"vid", $"frame_idx", $"is_cut")
      .as[(String, Long, Boolean)].collect().toSet
    assert(out == Set(
      ("A", 0L, false), ("A", 1L, false), ("A", 2L, true),
      ("B", 0L, false), ("B", 1L, false)))
    // synthetic wraps: every flagged cut in the synthesized corpus
    // corresponds to a modular base wrap (|delta| >= 50.16)
    val vids = Multimodal.synthesizeVideo((0L until 128L).toDF("id"), "id")
    val dec = Multimodal.decodeImage(
      Multimodal.sampleFrames(vids, "payload").drop("payload"), "frame")
    val flagged = Multimodal.sceneCuts(dec, "id")
      .where($"is_cut").count()
    assert(flagged > 0, "the 128-id sweep must contain real wraps")
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

  test("dHash: matches independent closed-form bits; null/corrupt payloads -> null") {
    import graft.multimodal.Multimodal
    val ids = (0L to 40L) ++ Seq(81L, 1234L, 99999L)
    val out = Multimodal.dHash(
      Multimodal.synthesizePng(ids.toDF("id"), "id"), "payload")
      .select($"id", $"dhash").as[(Long, String)].collect().toMap
    // independent recomputation straight from the pixel formula
    // (no ImageIO anywhere on this side)
    def expected(id: Long): String = {
      val (w, h) = Multimodal.imageGeometry(id)
      var hi = 0L; var lo = 0L
      for (y <- 0 until 8) {
        val sy = y * h / 8
        var prev = 0
        for (x <- 0 until 9) {
          val sx = x * w / 9
          val (r, g, b) = Multimodal.pixel(id, sx, sy)
          val lum = (299 * r + 587 * g + 114 * b) / 1000
          if (x > 0 && lum > prev) {
            val i = y * 8 + (x - 1)
            if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
          }
          prev = lum
        }
      }
      f"$hi%08x$lo%08x"
    }
    ids.foreach(id => assert(out(id) == expected(id), s"id=$id"))
    assert(out.values.forall(_.length == 16))
    // same id -> same code (determinism through the real codec)
    val again = Multimodal.dHash(
      Multimodal.synthesizePng(Seq(7L).toDF("id"), "id"), "payload")
      .select($"dhash").as[String].head()
    assert(again == expected(7L))
    // null and corrupt payloads
    val junk = Seq(
      (1L, null.asInstanceOf[Array[Byte]]),
      (2L, Array[Byte](1, 2, 3))).toDF("id", "payload")
    val nulls = Multimodal.dHash(junk, "payload")
      .select($"dhash").collect().map(_.isNullAt(0)).toSeq
    assert(nulls == Seq(true, true))
  }

  test("synthesizePngDiverse: 3-id near-dup groups, scaling hash diversity") {
    import graft.multimodal.Multimodal
    val ids = (0L until 120L).toDF("id")
    val codes = Multimodal.dHash(
      Multimodal.synthesizePngDiverse(ids, "id"), "payload")
      .select($"id", $"dhash").as[(Long, String)].collect().toMap
    // ids in the same div-3 group are byte-identical -> same code
    (0L until 120L by 3).foreach { g =>
      assert(codes(g) == codes(g + 1) && codes(g) == codes(g + 2), s"group $g")
    }
    // across groups codes diversify (the smooth pattern gives <= 9
    // distinct codes on any id range; diverse must beat that easily)
    val distinct = (0L until 120L by 3).map(codes).toSet
    assert(distinct.size > 20, s"only ${distinct.size} distinct codes")
  }

  test("aHash: matches independent closed-form bits; edge payloads -> null") {
    import graft.multimodal.Multimodal
    val ids = (0L to 40L) ++ Seq(98L, 127L, 255L, 1280L, 99999L)
    val out = Multimodal.aHash(
      Multimodal.synthesizeWav(ids.toDF("id"), "id"), "payload")
      .select($"id", $"ahash").as[(Long, String)].collect().toMap
    // independent recomputation straight from the sample formula
    // (no javax.sound anywhere on this side)
    def expected(id: Long): String = {
      val n = Multimodal.sampleCount(id)
      val sums = new Array[Long](64)
      val cnts = new Array[Long](64)
      var total = 0L
      for (i <- 0 until n) {
        val a = math.abs(Multimodal.sampleAt(id, i)).toLong
        val w = (i.toLong * 64 / n).toInt
        sums(w) += a; cnts(w) += 1; total += a
      }
      var hi = 0L; var lo = 0L
      for (j <- 0 until 64 if sums(j) * n > total * cnts(j)) {
        if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
      }
      f"$hi%08x$lo%08x"
    }
    ids.foreach(id => assert(out(id) == expected(id), s"id=$id"))
    assert(out.values.forall(_.length == 16))
    // signal classes repeat every 1280 ids -> identical hash
    assert(out(0L) == out(1280L))
    // not all codes degenerate to one value (pairing has real work)
    assert(out.values.toSet.size > 1)
    // null and corrupt payloads
    val junk = Seq(
      (1L, null.asInstanceOf[Array[Byte]]),
      (2L, Array[Byte](82, 73, 70, 70))).toDF("id", "payload")
    val nulls = Multimodal.aHash(junk, "payload")
      .select($"ahash").collect().map(_.isNullAt(0)).toSeq
    assert(nulls == Seq(true, true))
  }

  test("resampleWav: exact integer linear interpolation, real WAV out") {
    import graft.multimodal.Multimodal
    val ids = Seq(0L, 1L, 4L, 255L, 256L, 999L)
    val tr = 12000
    val out = Multimodal.decodeWav(
      Multimodal.resampleWav(
        Multimodal.synthesizeWav(ids.toDF("id"), "id"), "payload",
        targetRate = tr, batchSize = 2), "resampled")
      .select($"id", $"n_samples", $"sample_rate", $"mean_amp")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // independent recomputation straight from the synth formula
    ids.foreach { id =>
      val n = Multimodal.sampleCount(id)
      val m = ((n.toLong * tr + 8000 - 1) / 8000).toInt
      val vals = (0 until m).map { j =>
        val num = j.toLong * 8000
        val i0 = (num / tr).toInt
        val fr = num % tr
        if (i0 >= n - 1) Multimodal.sampleAt(id, n - 1).toLong
        else Multimodal.sampleAt(id, i0) + Math.floorDiv(
          (Multimodal.sampleAt(id, i0 + 1) - Multimodal.sampleAt(id, i0)).toLong * fr, tr)
      }
      val (gn, rate, mean) = out(id)
      assert(gn == m.toLong, s"n_samples for $id")
      assert(rate == tr.toDouble, s"rate for $id")
      assert(mean == vals.sum.toDouble / m, s"mean_amp for $id")
    }
    // null and corrupt payloads pass through null
    val junk = Seq(
      (1L, null.asInstanceOf[Array[Byte]]),
      (2L, Array[Byte](82, 73, 70, 70))).toDF("id", "payload")
    val nulls = Multimodal.resampleWav(junk, "payload")
      .select($"resampled").collect().map(_.isNullAt(0)).toSeq
    assert(nulls == Seq(true, true))
  }

  test("WAV fast path is total: lying chunk sizes degrade to null, never throw") {
    import graft.multimodal.Multimodal
    // valid RIFF/WAVE magic, then a chunk whose declared size is
    // ~4 GB — the lock-free parser must reject it (and the javax
    // fallback's failure must surface as null stats, not a crash)
    val evil = new Array[Byte](32)
    "RIFF".getBytes.copyToArray(evil, 0)
    "WAVE".getBytes.copyToArray(evil, 8)
    "fmt ".getBytes.copyToArray(evil, 12)
    evil(16) = 0xf0.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0xff.toByte
    val df = Seq((1L, evil)).toDF("id", "payload")
    assert(Multimodal.decodeWav(df, "payload").select($"n_samples").head().isNullAt(0))
    assert(Multimodal.aHash(df, "payload").select($"ahash").head().isNullAt(0))
    assert(Multimodal.resampleWav(df, "payload").select($"resampled").head().isNullAt(0))

    // an otherwise-canonical container claiming SAMPLE RATE 0 must
    // degrade to null too, not divide the resampler by zero
    val rate0 = Multimodal.wavBytes(7L).clone()
    rate0(24) = 0; rate0(25) = 0; rate0(26) = 0; rate0(27) = 0
    val df0 = Seq((1L, rate0)).toDF("id", "payload")
    assert(Multimodal.resampleWav(df0, "payload").select($"resampled").head().isNullAt(0))
    assert(Multimodal.peakNormalizeWav(df0, "payload").select($"normalized").head().isNullAt(0))
  }

  test("peakNormalizeWav: loudest sample lands on ±target, floor-div scaling") {
    import graft.multimodal.Multimodal
    val ids = Seq(0L, 1L, 128L, 255L, 256L, 999L)
    val target = 30000
    val out = Multimodal.decodeWav(
      Multimodal.peakNormalizeWav(
        Multimodal.synthesizeWav(ids.toDF("id"), "id"), "payload",
        targetPeak = target, batchSize = 2), "normalized")
      .select($"id", $"n_samples", $"sample_rate", $"mean_amp")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    ids.foreach { id =>
      val n = Multimodal.sampleCount(id)
      val src = (0 until n).map(Multimodal.sampleAt(id, _))
      val peak = src.map(math.abs).max
      val vals = src.map(s => Math.floorDiv(s.toLong * target, peak.toLong))
      val (gn, rate, mean) = out(id)
      assert(gn == n.toLong, s"n preserved for $id")
      assert(rate == 8000.0, s"rate preserved for $id")
      assert(mean == vals.sum.toDouble / n, s"mean_amp for $id")
      assert(vals.map(math.abs).max == target.toLong, s"peak hits target for $id")
    }
  }

  test("lumaStats: exact S/Q model, flat solid image flagged, null payload") {
    import graft.multimodal.Multimodal
    val ids = Seq(0L, 7L, 40L, 123L).toDF("doc_id")
    val out = Multimodal.lumaStats(
      Multimodal.synthesizePng(ids, "doc_id"), "payload")
      .select("doc_id", "width", "height", "mean_luma", "var_luma", "is_flat")
      .as[(Long, Long, Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (id <- Seq(0L, 7L, 40L, 123L)) {
      val w = (8 + id % 9).toInt; val h = (8 + (id / 9) % 9).toInt
      var sS = 0L; var sQ = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val lum = (299 * (id % 128 + 3 * x + 5 * y) +
          587 * (3 * id % 100 + 2 * x + 4 * y) +
          114 * (5 * id % 150 + x + y)) / 1000
        sS += lum; sQ += lum * lum
      }
      val n = w.toLong * h
      val got = out(id)
      assert(got._2 == w && got._3 == h)
      assert(got._4 == r6(sS.toDouble / n), s"mean for $id")
      assert(got._5 == r6((n * sQ - sS * sS).toDouble / (n.toDouble * n)),
        s"var for $id")
      assert(!got._6, s"gradient image must not flag flat: $id")
    }
    // a SOLID image has zero variance -> flagged flat
    val img = new java.awt.image.BufferedImage(
      10, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 10) img.setRGB(x, y, 0x808080)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val solid = Seq((1L, bos.toByteArray), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
    val f = Multimodal.lumaStats(solid, "payload")
      .select("id", "var_luma", "is_flat")
      .as[(Long, Option[Double], Option[Boolean])].collect()
      .map(r => r._1 -> r).toMap
    assert(f(1L)._2.contains(0.0) && f(1L)._3.contains(true))
    assert(f(2L)._2.isEmpty && f(2L)._3.isEmpty, "null payload -> null stats")
  }

  test("audioStats: exact counts against the sample model, null and garbage degrade") {
    import graft.multimodal.Multimodal
    val ids = Seq(0L, 1L, 128L, 255L, 999L)
    val out = Multimodal.audioStats(
      Multimodal.synthesizeWav(ids.toDF("id"), "id"), "payload",
      silenceThreshold = 32, clipThreshold = 500, batchSize = 2)
      .select($"id", $"n_samples", $"peak", $"silence_ratio", $"clip_ratio", $"rms")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    ids.foreach { id =>
      val n = Multimodal.sampleCount(id)
      val src = (0 until n).map(Multimodal.sampleAt(id, _))
      val want = (
        n.toLong,
        src.map(math.abs).max.toLong,
        math.rint(src.count(s => math.abs(s) <= 32) / n.toDouble * 1e6) / 1e6,
        math.rint(src.count(s => math.abs(s) >= 500) / n.toDouble * 1e6) / 1e6,
        math.rint(math.sqrt(src.map(s => s.toLong * s).sum.toDouble / n) * 1e6) / 1e6)
      assert(out(id) == want, s"id=$id")
    }
    // id 128: base = 0 — the all-but-silent clip; sanity that branches fire
    assert(out(128L)._3 > 0.0, "silence branch counts real samples")
    assert(out(255L)._4 > 0.0, "clip branch counts real samples")
    // null payload and garbage bytes degrade to null stats
    val bad = Seq((1L, null.asInstanceOf[Array[Byte]]),
      (2L, Array[Byte](1, 2, 3))).toDF("id", "payload")
    val b = Multimodal.audioStats(bad, "payload").select($"n_samples").collect()
    assert(b.forall(_.isNullAt(0)))
  }
}
