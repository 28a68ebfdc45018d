package graft

import graft.operators.{Pq, Similarity}
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated 4-dim clusters; ids 0 and 2 are the sampled
  // centroids at stride 2
  private def tiny = Seq(
    (0L, Seq(1.0f, 0.0f, 1.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f, 0.9f, 0.1f)),
    (2L, Seq(-1.0f, 0.0f, -1.0f, 0.0f)),
    (3L, Seq(-0.9f, -0.1f, -0.9f, -0.1f)))
    .toDF("vec_id", "embedding")

  test("fitCodebooks iters=1: stride-sampled subvectors verbatim") {
    val cb = Pq.fitCodebooks(tiny, "embedding", "vec_id", dim = 4, m = 2,
      stride = 2, iters = 1)
      .as[(Int, Long, Seq[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(cb.size == 4) // 2 subspaces x ids {0, 2}
    assert(cb((0, 0L)) == Seq(1.0, 0.0))
    assert(cb((1, 2L)) == Seq(-1.0, 0.0))
  }

  test("encode: members code to their cluster's centroid in every subspace") {
    val cb = Pq.fitCodebooks(tiny, "embedding", "vec_id", dim = 4, m = 2,
      stride = 2, iters = 2)
    val codes = Pq.encode(tiny, "embedding", "vec_id", dim = 4, m = 2, cb)
      .as[(Long, Seq[Long])].collect().toMap
    assert(codes(0L) == Seq(0L, 0L) && codes(1L) == Seq(0L, 0L))
    assert(codes(2L) == Seq(2L, 2L) && codes(3L) == Seq(2L, 2L))
  }

  test("fitCodebooks iters=2: Lloyd means are the 6dp-rounded cluster averages") {
    val cb = Pq.fitCodebooks(tiny, "embedding", "vec_id", dim = 4, m = 2,
      stride = 2, iters = 2)
      .as[(Int, Long, Seq[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // cluster {0,1} subspace 0: mean of (1.0,0.0),(0.9,0.1)
    assert(cb((0, 0L)).zip(Seq(0.95, 0.05)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    assert(cb((0, 2L)).zip(Seq(-0.95, -0.05)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }

  test("pqTopK: clusters rank before the other cluster; deterministic under repartition") {
    val out = Pq.pqTopK(tiny, tiny.where($"vec_id" === 0), "embedding",
      "vec_id", "vec_id", k = 4, dim = 4, m = 2, stride = 2)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(out.map(_._2).take(2).toSet == Set(0L, 1L), s"got ${out.toSeq}")
    // ADC distance of the query's own cluster is its quantization
    // error; the far cluster is strictly farther
    assert(out(1)._3 < out(2)._3)
    val again = Pq.pqTopK(tiny.repartition(5), tiny.where($"vec_id" === 0),
      "embedding", "vec_id", "vec_id", k = 4, dim = 4, m = 2, stride = 2)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(out.toSeq == again.toSeq)
  }

  test("numCentroids bounds the codebook via autoStride; equals the explicit-stride fit") {
    val rnd = new scala.util.Random(7)
    val df = (0 until 100).map(i =>
      (i.toLong, Seq.fill(4)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    // 100 rows, numCentroids = 10 -> stride 10 -> ids 0,10,...,90
    val bounded = Pq.fitCodebooks(df, "embedding", "vec_id", dim = 4, m = 2,
      numCentroids = 10, iters = 2)
    assert(bounded.select("cid").distinct().count() == 10)
    val explicit = Pq.fitCodebooks(df, "embedding", "vec_id", dim = 4, m = 2,
      stride = Similarity.autoStride(100, 10), iters = 2)
    assert(bounded.collect().toSet == explicit.collect().toSet)
    // expectedRows skips the count job and derives the same stride
    val viaExpected = Pq.fitCodebooks(df, "embedding", "vec_id", dim = 4,
      m = 2, numCentroids = 10, iters = 2, expectedRows = 100L)
    assert(viaExpected.collect().toSet == explicit.collect().toSet)
  }

  test("pqTopK with pre-fit codebooks equals the in-flight fit; skips refitting") {
    val q = tiny.where($"vec_id" === 0)
    val inFlight = Pq.pqTopK(tiny, q, "embedding", "vec_id", "vec_id",
      k = 4, dim = 4, m = 2, stride = 2)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4).toSeq
    val books = Pq.fitCodebooks(tiny, "embedding", "vec_id", dim = 4, m = 2,
      stride = 2)
    // frozen codebooks passed in → no stride/numCentroids needed, and
    // the ranking is bit-identical to the fit-per-call path
    val frozen = Pq.pqTopK(tiny, q, "embedding", "vec_id", "vec_id",
      k = 4, dim = 4, m = 2, codebooks = books)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4).toSeq
    assert(frozen == inFlight)
  }

  test("fitCodebooks requires a stride or a centroid bound") {
    intercept[IllegalArgumentException] {
      Pq.fitCodebooks(tiny, "embedding", "vec_id", dim = 4, m = 2)
    }
  }

  test("pqTopK: reasonable recall vs brute force on structured data") {
    val rnd = new scala.util.Random(23)
    // 10 anchor directions, 20 jittered members each -> PQ with a
    // rich codebook should mostly recover exact neighbours
    val anchors = Seq.fill(10)(Seq.fill(16)(rnd.nextGaussian()))
    val rows = (0 until 200).map { i =>
      val a = anchors(i % 10)
      (i.toLong, a.map(x => (x + rnd.nextGaussian() * 0.05).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val q = df.where($"vec_id" < 3)
    val pq = Pq.pqTopK(df, q, "embedding", "vec_id", "vec_id", k = 10,
      dim = 16, m = 4, stride = 10)
    val exact = Similarity.bruteForceTopK(df, q, "embedding", "vec_id", "vec_id", k = 10)
    val recall = Similarity.annRecall(pq, exact)
      .select($"recall").as[Double].head()
    assert(recall >= 0.5, s"recall $recall")
  }

  test("persisted index: pqTopKFromIndex reproduces pqTopK exactly; fail-fast meta") {
    val rows = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(16)(j => ((i * 13 + j * 7) % 29 / 29.0f)))
    }
    val df = rows.toDF("vec_id", "embedding")
    val q = df.where($"vec_id" < 3)
    try {
      Pq.writePqIndex(df, "embedding", "vec_id", "graft_pq_t",
        dim = 16, m = 4, numCentroids = 8)
      // geometry round-trips through the table properties
      assert(Pq.readPqIndexMeta(spark, "graft_pq_t").contains((16, 4, 8, 2)))
      val fromIdx = Pq.pqTopKFromIndex(spark, "graft_pq_t", q,
        "embedding", "vec_id", k = 5)
        .as[(Long, Long, Double, Int)].collect().toSet
      val direct = Pq.pqTopK(df, q, "embedding", "vec_id", "vec_id", k = 5,
        dim = 16, m = 4, numCentroids = 8, expectedRows = 40)
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(fromIdx == direct)
      // a table without graft.pq.* properties fails fast — searching
      // with guessed geometry would return a plausible wrong ranking
      df.write.mode("overwrite").saveAsTable("graft_pq_plain")
      intercept[IllegalArgumentException] {
        Pq.pqTopKFromIndex(spark, "graft_pq_plain", q, "embedding", "vec_id", 5)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_pq_t")
      spark.sql("DROP TABLE IF EXISTS graft_pq_t__codebooks")
      spark.sql("DROP TABLE IF EXISTS graft_pq_plain")
    }
  }
}
