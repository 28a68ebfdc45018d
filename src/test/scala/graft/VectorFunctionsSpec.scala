package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("dotProduct / l2Norm / cosineSimilarity basics") {
    val df = Seq((Seq(1.0f, 2.0f, 2.0f), Seq(2.0f, 0.0f, 0.0f))).toDF("a", "b")
    val (dot, na, cos) = df
      .select(
        dotProduct($"a", $"b").as("d"),
        l2Norm($"a").as("n"),
        cosineSimilarity($"a", $"b").as("c"))
      .as[(Double, Double, Double)]
      .head()
    assert(dot == 2.0)
    assert(na == 3.0)
    assert(math.abs(cos - 2.0 / (3.0 * 2.0)) < 1e-12)
  }

  test("cosineSimilarity: null on zero vector (no NaN)") {
    val df = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
    val row = df.select(cosineSimilarity($"a", $"b").as("c")).collect()(0)
    assert(row.isNullAt(0))
  }

  test("squaredL2Distance") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(4.0f, 6.0f))).toDF("a", "b")
    val d = df.select(squaredL2Distance($"a", $"b").as("d")).as[Double].head()
    assert(d == 9.0 + 16.0)
  }

  test("planeSigns: deterministic ±1 matrix") {
    val p1 = planeSigns(16, 4)
    val p2 = planeSigns(16, 4)
    assert(p1 == p2)
    assert(p1.flatten.forall(s => s == 1 || s == -1))
    assert(p1.length == 4 && p1.head.length == 16)
  }

  test("native expressions: bit-identical to the HOF formulations") {
    val rng = new scala.util.Random(7)
    val vecs = (0 until 200).map { i =>
      (i.toLong, Seq.fill(16)(rng.nextFloat() * 2 - 1))
    }
    val df = vecs.toDF("id", "v")
      .withColumn("w", reverse($"v"))
    val cmp = df.select(
      cosineSimilarity($"v", $"w").as("hof_cos"),
      cosineSimilarityNative($"v", $"w").as("nat_cos"),
      squaredL2Distance($"v", $"w").as("hof_l2"),
      squaredL2DistanceNative($"v", $"w").as("nat_l2"),
      hyperplaneBucket($"v", 16, 8).as("hof_b"),
      hyperplaneBucketNative($"v", 16, 8).as("nat_b"))
    val bad = cmp.where(
      $"hof_cos" =!= $"nat_cos" || $"hof_l2" =!= $"nat_l2" ||
        $"hof_b" =!= $"nat_b").count()
    assert(bad == 0)
    // native L2 null semantics match zip_with's padding: length
    // mismatch and null element both yield null
    val edge = Seq((Seq(1.0f, 2.0f), Seq(1.0f))).toDF("a", "b")
      .select(squaredL2DistanceNative($"a", $"b").as("d"),
        squaredL2Distance($"a", $"b").as("hd"))
      .collect().head
    assert(edge.isNullAt(0) && edge.isNullAt(1))
    // distribution sanity: natives produce >1 distinct bucket
    assert(cmp.select($"nat_b").distinct().count() > 1)
  }

  test("native cosine: null on zero vector and null element") {
    val df = Seq(
      (1L, Seq(0.0f, 0.0f), Seq(1.0f, 1.0f)),
      (2L, Seq(1.0f, 2.0f), Seq(1.0f, 1.0f)))
      .toDF("id", "a", "b")
      .withColumn("b2", when($"id" === 2L, $"b"))
    val rows = df.select($"id", cosineSimilarityNative($"a", $"b").as("c"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(rows(1L) && !rows(2L))
  }

  test("hyperplaneBucket: matches a driver-side model of the same planes") {
    val dim = 8
    val numPlanes = 5
    val vecs = Seq(
      Array(1.0f, -2.0f, 0.5f, 3.0f, -1.0f, 0.0f, 2.0f, -0.5f),
      Array(-1.0f, 2.0f, -0.5f, -3.0f, 1.0f, 0.0f, -2.0f, 0.5f))
    val planes = planeSigns(dim, numPlanes)
    def model(v: Array[Float]): Int =
      planes.zipWithIndex.map { case (signs, p) =>
        val dot = v.zip(signs).map { case (x, s) => x.toDouble * s }.sum
        if (dot > 0) 1 << p else 0
      }.sum
    val df = vecs.map(_.toSeq).toDF("v")
    val got = df
      .select(hyperplaneBucket($"v", dim, numPlanes).as("b"))
      .as[Int]
      .collect()
      .toSeq
    assert(got == vecs.map(model).toSeq)
  }

  test("quantize8: native == HOF twin; dequantize reconstructs within bound") {
    val rnd = new scala.util.Random(42)
    val vecs = Seq.fill(50)(Seq.fill(16)((rnd.nextFloat() - 0.5f) * 10f)) ++
      Seq(
        Seq.fill(16)(0.0f),                       // zero vector
        Seq(1.0f, -1.0f, 0.5f, -0.5f),            // exact .5 codes
        Seq(254.0f, 1.0f, -1.0f))                 // round-half boundary: 127/254 = .5
    val df = vecs.toDF("v")
    val rows = df.select(
      quantize8($"v").as("n"), quantize8Hof($"v").as("h")).collect()
    rows.foreach { r =>
      assert(r.getStruct(0) == r.getStruct(1), s"native != hof: $r")
    }
    // round-half-away: 127*1/254 = 0.5 → 1 (half-even would give 0)
    val half = Seq(Seq(254.0f, 1.0f)).toDF("v")
      .select(quantize8($"v").getField("q")).head().getSeq[Byte](0)
    assert(half == Seq[Byte](127, 1))

    // reconstruction: cosine(original, dequantized) ≈ 1 for non-zero,
    // per-component error ≤ scale/254 + float eps
    val deq = df.where(size($"v") === 16)
      .select($"v", dequantize8(quantize8($"v")).as("d"))
      .select(cosineSimilarity($"v", $"d").as("c"),
        quantize8($"v").getField("scale").as("s"),
        zip_with($"v", $"d", (a, b) => abs(a - b)).as("err"))
      .collect()
    deq.foreach { r =>
      if (!r.isNullAt(0)) assert(r.getDouble(0) > 0.999)
      val bound = r.getFloat(1) / 254.0 + 1e-4
      assert(r.getSeq[Float](2).forall(_ <= bound), s"err beyond bound: $r")
    }
  }

  test("packSignBits: agrees with the bit model; multi-word, empty, null element") {
    val rnd = new scala.util.Random(5)
    // lengths straddling the 64-bit word boundary, plus exact zeros
    val vecs = Seq(3, 63, 64, 65, 130).flatMap { n =>
      Seq.fill(10)(Seq.fill(n)(
        if (rnd.nextInt(4) == 0) 0.0f else (rnd.nextFloat() - 0.5f) * 2f))
    } :+ Seq.empty[Float]
    def model(v: Seq[Float]): Seq[Long] = {
      val w = new Array[Long]((v.length + 63) / 64)
      v.zipWithIndex.foreach { case (x, i) => if (x > 0) w(i >> 6) |= 1L << (i & 63) }
      w.toSeq
    }
    val got = vecs.toDF("v").select(packSignBits($"v")).collect()
      .map(_.getSeq[Long](0).toSeq).toSeq
    assert(got == vecs.map(model))
    // a null element nulls the code (same contract as quantize8)
    val withNull = Seq(Seq[java.lang.Float](1.0f, null, 2.0f)).toDF("v")
    assert(withNull.select(packSignBits($"v")).head().isNullAt(0))
  }

  test("hammingDistance: popcount of xor; word-count mismatch → null") {
    val df = Seq(
      (Seq(0L), Seq(-1L), 64),                  // all 64 bits differ
      (Seq(5L, 1L << 40), Seq(6L, 0L), 3),      // 101^110=011 → 2, +1
      (Seq(7L), Seq(7L), 0))
      .toDF("a", "b", "want")
    df.select(hammingDistance($"a", $"b").as("got"), $"want").collect()
      .foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    val mismatch = Seq((Seq(1L), Seq(1L, 2L))).toDF("a", "b")
    assert(mismatch.select(hammingDistance($"a", $"b")).head().isNullAt(0))
  }

  test("subtractMean: element-wise centering; float input widens exactly") {
    val df = Seq(Seq(1.0f, 0.5f, -0.25f)).toDF("v")
    val got = df.select(subtractMean($"v", Seq(0.5, 0.5, 0.5)).as("c"))
      .as[Seq[Double]].head()
    assert(got == Seq(0.5, 0.0, -0.75))
    // centering flips sign bits: packSignBits sees the centered view
    val code = df.select(packSignBits(subtractMean($"v", Seq(0.5, 0.5, 0.5))))
      .as[Seq[Long]].head()
    assert(code == Seq(1L)) // only element 0 stays positive
  }

  test("truncate: prefix slice; cosine of prefixes matches hand math") {
    val df = Seq((Seq(3.0f, 4.0f, 100.0f, -7.0f), Seq(4.0f, 3.0f, -50.0f, 2.0f)))
      .toDF("a", "b")
    assert(df.select(truncate($"a", 2)).as[Seq[Float]].head() == Seq(3.0f, 4.0f))
    // cos of the 2-prefix: (12+12)/(5*5) = 0.96 — scale-invariant,
    // no renorm needed
    val cos = df.select(cosineSimilarity(truncate($"a", 2), truncate($"b", 2)))
      .as[Double].head()
    assert(math.abs(cos - 0.96) < 1e-12)
    // dim beyond length degrades to the full vector (slice semantics)
    assert(df.select(truncate($"a", 99)).as[Seq[Float]].head().size == 4)
  }

  test("truncateNormalize: unit norm, zero prefix -> null") {
    val df = Seq(Seq(3.0f, 4.0f, 9.0f)).toDF("v")
    val got = df.select(truncateNormalize($"v", 2).as("u")).as[Seq[Double]].head()
    assert(got == Seq(0.6, 0.8))
    val zero = Seq(Seq(0.0f, 0.0f, 5.0f)).toDF("v")
    assert(zero.select(truncateNormalize($"v", 2)).head().isNullAt(0))
  }

  test("randomProject: matches the sign-fold reference; JL distance preservation") {
    val rnd = new scala.util.Random(7)
    val dim = 64
    val vecs = Seq.fill(30)(Seq.fill(dim)(rnd.nextFloat() * 2 - 1))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = df.select($"id", randomProject($"v", dim, 16).as("p"))
      .as[(Long, Seq[Double])].collect().toMap

    // exact reference: same signs, same left-to-right fold, one 1/√k multiply
    val signs = planeSigns(dim, 16)
    def ref(v: Seq[Float]): Seq[Double] = signs.map { row =>
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += v(i).toDouble * row(i); i += 1 }
      dot * (1.0 / math.sqrt(16.0))
    }
    vecs.zipWithIndex.foreach { case (v, i) =>
      assert(out(i.toLong) == ref(v), s"vector $i")
    }

    // JL property (loose — ε ~ √(ln n / k) is wide at k=16): every
    // pairwise squared distance survives within 3x, and the MEDIAN
    // distortion is tight
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val pairs = for (i <- 0 until 10; j <- (i + 1) until 10) yield (i, j)
    val ratios = pairs.map { case (i, j) =>
      val full = d2(vecs(i).map(_.toDouble), vecs(j).map(_.toDouble))
      val proj = d2(out(i.toLong), out(j.toLong))
      assert(proj > full / 3 && proj < full * 3,
        s"distortion $i-$j: $proj vs $full")
      proj / full
    }.sorted
    val median = ratios(ratios.size / 2)
    assert(median > 0.7 && median < 1.4, s"median distortion $median")

    // null element / length mismatch -> null; outDim validated
    val bad = Seq(
      (1L, Seq.fill(dim)(Some(1.0f)).updated(3, None)),
      (2L, Seq(Some(1.0f), Some(2.0f)))).toDF("id", "v")
    val nulls = bad.select($"id", randomProject($"v", dim, 16).as("p"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(nulls(1L) && nulls(2L))
    intercept[IllegalArgumentException] { randomProject($"v", 64, 65) }
  }
}
