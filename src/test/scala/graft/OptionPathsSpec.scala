package graft

import graft.functions.ColumnFunctions._
import graft.operators.{DataFrameOps, Dedup, Similarity, TemporalJoin, TrendLine}
import org.apache.spark.sql.functions._

/** Coverage for non-default option paths across the operator set. */
class OptionPathsSpec extends SparkSpec {
  import spark.implicits._

  test("cumulativeSum: descending order accumulates from the top") {
    val df = Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("t", "v")
    val out = df
      .select($"t", cumulativeSum($"v", $"t", ascending = false).as("cs"))
      .as[(Int, Double)].collect().toMap
    assert(out(3) == 30.0 && out(2) == 50.0 && out(1) == 60.0)
  }

  test("movingAverage: partitioned windows stay within their partition") {
    val df = Seq(("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 100.0)).toDF("k", "t", "v")
    val out = df
      .select($"k", $"t",
        movingAverage($"v", $"t", 3, "previous", 2, partitionBy = Seq($"k")).as("m"))
      .as[(String, Int, Double)].collect()
      .map { case (k, t, m) => (k, t) -> m }.toMap
    assert(out(("a", 2)) == 15.0)
    assert(out(("b", 1)) == 100.0) // not polluted by partition a
  }

  test("percent: custom rounding precision") {
    val df = Seq(1.0, 2.0).toDF("v")
    val out = df.select(percent($"v", r = 4).as("p")).as[Double].collect().sorted.toSeq
    assert(out == Seq(33.3333, 66.6667))
  }

  test("unionAll: three frames with pairwise-disjoint columns") {
    val a = Seq((1, "x")).toDF("id", "a")
    val b = Seq((2, 2.5)).toDF("id", "b")
    val c = Seq((3, true)).toDF("id", "c")
    val out = DataFrameOps.unionAll(Seq(a, b, c))
    assert(out.columns.toSet == Set("id", "a", "b", "c"))
    assert(out.count() == 3)
  }

  test("minHashLshPairs: fast (xxhash64) path finds the planted dup") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (3L, "unrelated astronomy content about jupiter moons and telescopes"))
      .toDF("id", "text")
    val pairs = Dedup
      .minHashLshPairs(docs, "text", "id", shingleK = 5, numHashes = 8,
        bands = 2, jaccardThreshold = 0.5, fast = true)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simHashPairs: wide-chunk masks (bits=48, maxHamming=0) stay correct") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "totally different words everywhere here now then"))
      .toDF("id", "text")
    // chunkBits = 48: an Int mask (1 << 48) would wrap to garbage
    val pairs = Dedup
      .simHashPairs(docs, "text", "id", bits = 48, maxHamming = 0)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("duplicateClusters: 40-doc chain converges via pointer jumping") {
    val pairs = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.duplicateClusters(pairs, maxIter = 10)
      .as[(Long, Long)].collect().toMap
    assert(labels.values.toSet == Set(1L))
  }

  test("simHashPairs: maxHamming=2 uses three chunks and still matches exact dups") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "totally different words everywhere here now then"))
      .toDF("id", "text")
    val pairs = Dedup
      .simHashPairs(docs, "text", "id", bits = 48, maxHamming = 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("lshTopK: multiProbe larger than numPlanes is capped safely") {
    val c = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f))).toDF("id", "v")
    val out = Similarity.lshTopK(c, c, "v", "id", "id", k = 2, dim = 2,
      numPlanes = 2, multiProbe = 10)
    assert(out.count() >= 2) // both find at least themselves
  }

  test("trendLine: invalid degree rejected; constant series fits flat") {
    val df = (0 until 5)
      .map(i => (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), 7.0))
      .toDF("date", "y")
    intercept[IllegalArgumentException](TrendLine.addTrendLine(df, Seq("y"), degree = 0))
    val out = TrendLine.addTrendLine(df, Seq("y"), "date")
    val t = out.select(round($"y_trendline", 6)).as[Double].collect().toSet
    assert(t == Set(7.0))
  }

  test("asOf: composite keys partition matches independently") {
    val right = Seq(("a", 1, 10L, 1.0), ("b", 1, 10L, 2.0)).toDF("k1", "k2", "rts", "px")
    val left = Seq(("a", 1, 20L), ("b", 1, 20L), ("a", 2, 20L)).toDF("k1", "k2", "lts")
    val out = TemporalJoin
      .asOf(left, right, "lts", "rts", Seq("k1", "k2"), Seq("px"), prefix = "r_")
      .select($"k1", $"k2", $"r_px").collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out(("a", 1)).contains(1.0))
    assert(out(("b", 1)).contains(2.0))
    assert(out(("a", 2)).isEmpty)
  }

  test("sessionAgg without a value column omits value_sum") {
    val df = Seq(("u", new java.sql.Timestamp(0L), 1.0)).toDF("user", "ts", "v")
    val out = graft.streaming.Sessionize.sessionAgg(df, "user", "ts")
    assert(!out.columns.contains("value_sum"))
    assert(out.columns.contains("n_events"))
  }

  test("chunkTokens: maxTokens=1 emits one chunk per token; invalid overlap rejected") {
    import graft.functions.TextAnalysis.chunkTokens
    val chunks = Seq("a b c").toDF("s")
      .select(chunkTokens($"s", 1).as("c")).head().getSeq[String](0)
    assert(chunks == Seq("a", "b", "c"))
    intercept[IllegalArgumentException] { chunkTokens($"s", 4, 4) }
    intercept[IllegalArgumentException] { chunkTokens($"s", 0) }
  }

  test("resizeImage: upscaling and invalid dims") {
    import graft.multimodal.Multimodal
    val png = Multimodal.synthesizePng(Seq(3L).toDF("id"), "id")
    // upscale PAST the source size: still exact NN (pixel replication)
    val up = Multimodal.decodeImage(
      Multimodal.resizeImage(png, "payload", targetW = 32, targetH = 2), "resized")
      .select($"width", $"height").head()
    assert(up.getLong(0) == 32L && up.getLong(1) == 2L)
    intercept[IllegalArgumentException] {
      Multimodal.resizeImage(png, "payload", targetW = 0, targetH = 4)
    }
  }

  test("rebalanceToDistribution: seed changes the kept set; bad targets rejected") {
    import graft.operators.Sampling
    val df = (1 to 400).map(i => (i.toLong, if (i % 2 == 0) "a" else "b")).toDF("id", "k")
    val t = Map("a" -> 1.0, "b" -> 3.0) // b binds (200/0.75 < 200/0.25)
    val s0 = Sampling.rebalanceToDistribution(df, "k", t, "id", seed = 0)
      .select($"id").as[Long].collect().toSet
    val s9 = Sampling.rebalanceToDistribution(df, "k", t, "id", seed = 9)
      .select($"id").as[Long].collect().toSet
    assert(s0 != s9) // different deterministic samples
    intercept[IllegalArgumentException] {
      Sampling.rebalanceToDistribution(df, "k", Map("a" -> -1.0), "id")
    }
    intercept[IllegalArgumentException] {
      Sampling.rebalanceToDistribution(df, "k", Map.empty, "id")
    }
  }

  test("quantize8: array<double> input uses full-precision scale") {
    import graft.functions.VectorFunctions._
    val df = Seq(Seq(0.5d, -1.0d, 0.25d)).toDF("v")
    val r = df.select(quantize8($"v").as("q"))
      .select($"q.scale", $"q.q").head()
    assert(r.getFloat(0) == 1.0f)
    assert(r.getSeq[Byte](1) == Seq[Byte](64, -127, 32))
  }

  test("dsirResample: k larger than the corpus returns every row") {
    import graft.operators.Selection
    val raw = Seq((1L, "aa bb"), (2L, "cc dd"), (3L, "aa cc")).toDF("doc_id", "text")
    val sel = Selection.dsirResample(raw, raw.where($"doc_id" === 1), "text", "doc_id",
      k = 100, numBuckets = 64)
    assert(sel.count() == 3)
  }

  test("nbScore: empty model (no labeled rows) scores every doc 0 with 0 grams") {
    import graft.operators.Selection
    val labeled = Seq((1L, "text here", Option.empty[Boolean])).toDF("doc_id", "text", "lbl")
    val model = Selection.nbTrain(labeled, "text", $"lbl", numBuckets = 64)
    assert(model.count() == 0)
    val out = Selection.nbScore(Seq((5L, "some words")).toDF("doc_id", "text"),
      model, "text", "doc_id", numBuckets = 64)
      .as[(Long, Double, Long)].collect().toSeq
    assert(out == Seq((5L, 0.0, 0L)))
  }

  test("mixCorpora: zero-weight sources contribute nothing; all-zero weights rejected") {
    import graft.operators.Sampling
    val a = spark.range(10).toDF("id")
    val b = spark.range(10, 20).toDF("id")
    val out = Sampling.mixCorpora(Seq((a, 0.0), (b, 1.0)), "id")
      .select($"source_idx").as[Int].collect().toSet
    assert(out == Set(1))
    intercept[IllegalArgumentException] {
      Sampling.mixCorpora(Seq((a, 0.0), (b, 0.0)), "id")
    }
  }

  test("shardAssignment: rowsPerShard beyond the corpus yields a single shard") {
    import graft.sources.ShardExport
    val out = ShardExport.shardAssignment(spark.range(5).toDF("id"), "id", 1000)
      .select($"shard", $"shard_pos").as[(Long, Long)].collect()
    assert(out.forall(_._1 == 0L))
    assert(out.map(_._2).sorted.toSeq == (0L until 5L))
  }

  test("dropNearDuplicatesBy: empty pair list keeps every row") {
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "q")
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val kept = Dedup.dropNearDuplicatesBy(df, pairs, "id", $"q")
      .select($"id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L))
  }

  test("quantilesByGroup approx: within 1% rank error of exact per group") {
    val df = (1 to 4000).map(i => (i.toLong, if (i % 2 == 0) "a" else "b",
      (i * 13 % 997).toDouble)).toDF("id", "g", "v")
    val probs = Seq(0.5, 0.9)
    val exact = graft.operators.Profile.quantilesByGroup(df, "g", Seq("v"), probs)
      .as[(String, String, Double, Double)].collect().map(r => (r._1, r._3) -> r._4).toMap
    val approx = graft.operators.Profile.quantilesByGroup(df, "g", Seq("v"), probs,
      approx = true).as[(String, String, Double, Double)].collect()
    approx.foreach { case (g, _, p, got) =>
      val grp = df.where($"g" === g)
      val n = grp.count().toDouble
      val below = grp.where($"v" < got).count() / n
      val atOrBelow = grp.where($"v" <= got).count() / n
      assert(below <= p + 0.01 && atOrBelow >= p - 0.01,
        s"group $g p=$p: approx $got bracket [$below, $atOrBelow] exact ${exact((g, p))}")
    }
  }
}
