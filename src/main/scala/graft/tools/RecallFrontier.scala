package graft.tools

import graft.operators.{Pq, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall/latency frontier of the ANN serving stack (dev tool, the
  * round-13 verdict's HNSW-or-measured-sufficiency protocol): exact
  * brute-force ground truth for a 100-query batch, then recall@10 +
  * median-of-3 latency for IVF at nprobe 1/2/4 and the persisted-PQ
  * (ADC) path. Prints a markdown table for SURVEY §6b; the decision
  * rule is recall@10 ≥ 0.9 at the latency budget → no graph index.
  *
  * `--clustered` (round-14 verdict optional ask): instead of the
  * driver's ISOTROPIC embeddings (near-uniform on the sphere, where
  * centroid routing carries little neighborhood signal), synthesize
  * a deterministic 20k×64 corpus of 50 real clusters (unit centers
  * from a seeded Gaussian, members = normalize(center + 0.35·noise))
  * and run the identical frontier — the regime where IVF routing is
  * SUPPOSED to work, re-confirming (or overturning) the no-graph
  * decision on realistic geometry.
  */
object RecallFrontier {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val noise = args.collectFirst {
      case a if a.startsWith("--noise=") => a.stripPrefix("--noise=").toDouble
    }.getOrElse(0.35)
    val e =
      if (args.contains("--clustered")) clusteredCorpus(spark, noise)
      else spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = e.where(col("vec_id") < 100)
    val n = e.count()
    println(s"corpus rows=$n, queries=100, k=10, dir=$dir" +
      (if (args.contains("--clustered")) s", noise=$noise" else ""))

    def medianTime(df: => DataFrame): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }

    // ground truth (also the brute-force latency row)
    val exactT = medianTime(Similarity.bruteForceTopK(
      e, queries, "embedding", "vec_id", "vec_id", 10))
    val exact = Similarity.bruteForceTopK(
      e, queries, "embedding", "vec_id", "vec_id", 10).localCheckpoint()

    def recallOf(approx: DataFrame): Double =
      Similarity.annRecall(approx, exact)
        .select("recall").head().getDouble(0)

    val rows = scala.collection.mutable.ArrayBuffer[(String, Double, Double)]()
    rows += (("brute-force (exact)", exactT, 1.0))

    if (args.contains("--clustered")) {
      // the CLUSTER-COHERENCE CEILING: the fraction of exact top-10
      // neighbours that share the query's TRUE cluster (id % 50) —
      // no cluster-scoped method (IVF, k-means routing, SemDeDup
      // blocks) can exceed this recall on this geometry, whatever
      // its routing quality. Print it so the table reads honestly.
      val ceiling = exact
        .where(pmod(col("corpus_id"), lit(50)) === pmod(col("query_id"), lit(50)))
        .count().toDouble / exact.count()
      println(f"cluster-coherence ceiling (same-true-cluster fraction of exact top-10): $ceiling%.4f")
    }

    val nprobes = if (args.contains("--clustered")) Seq(1, 2, 4, 8, 16)
      else Seq(1, 2, 4)
    for (nprobe <- nprobes) {
      def run = Similarity.ivfTopK(e, queries, "embedding", "vec_id",
        "vec_id", k = 10, stride = 100, nprobe = nprobe)
      val t = medianTime(run)
      rows += ((s"IVF nprobe=$nprobe (nlist=${n / 100})", t, recallOf(run)))
    }

    // persisted-PQ serve path (the q_ann_pq configuration)
    val table = if (args.contains("--clustered"))
      "graft_recall_frontier_pq_clustered" else "graft_recall_frontier_pq"
    Pq.writePqIndex(e, "embedding", "vec_id", table, dim = 64, m = 8,
      numCentroids = 64, expectedRows = n, fitSampleStride = 4)
    def pqRun = Pq.pqTopKFromIndex(spark, table, queries,
      "embedding", "vec_id", k = 10)
    val pqT = medianTime(pqRun)
    rows += (("PQ/ADC from index (m=8, 64 centroids)", pqT, recallOf(pqRun)))

    // the production cascade: PQ shortlist 50 -> exact float rerank
    val shortlists = if (args.contains("--clustered")) Seq(50, 200, 400)
      else Seq(50)
    for (sl <- shortlists) {
      def cascade = Similarity.rerankTopK(e, queries,
        Pq.pqTopKFromIndex(spark, table, queries, "embedding", "vec_id", k = sl),
        "embedding", "vec_id", "vec_id", k = 10)
      val cT = medianTime(cascade)
      rows += ((s"PQ shortlist $sl -> exact rerank", cT, recallOf(cascade)))
    }

    // cluster-routed exact search (round-16: the tight-cluster
    // closure) — k-means routing at TRUE cluster granularity, exact
    // cosine inside the probed clusters. On the clustered corpus the
    // true count is 50; on the driver corpus use the q_kmeans bound.
    val nlist = if (args.contains("--clustered")) 50 else 200
    val crProbes = if (args.contains("--clustered")) Seq(1, 2, 4, 8) else Seq(1, 2, 4)
    for (nprobe <- crProbes) {
      def run = Similarity.clusterRoutedTopK(e, queries, "embedding",
        "vec_id", "vec_id", k = 10, nprobe = nprobe, iters = 2,
        numCentroids = nlist, expectedRows = n)
      val t = medianTime(run)
      rows += ((s"cluster-routed exact (nlist=$nlist, nprobe=$nprobe)", t,
        recallOf(run)))
    }

    println("| path | median latency (100 queries) | recall@10 |")
    println("|---|---|---|")
    rows.foreach { case (name, t, r) =>
      println(f"| $name | $t%.2f s | $r%.4f |")
    }
    val best = rows.drop(1).filter(_._3 >= 0.9)
    println(
      if (best.nonEmpty)
        f"DECISION: ${best.minBy(_._2)._1} reaches recall@10 ${best.minBy(_._2)._3}%.4f at ${best.minBy(_._2)._2}%.2f s - no graph index needed"
      else
        "DECISION: no approximate path reaches recall@10 >= 0.9 - graph index warranted")
    spark.stop()
  }

  /** Deterministic clustered synthetic corpus: 50 unit centers from
    * a seeded Gaussian; member i belongs to cluster i %% 50 with
    * normalize(center + 0.35·noise_i) — every draw seeded by index,
    * reproducible across runs/machines. Written through parquet so
    * the scan shape matches the real-embedding path exactly.
    */
  private def clusteredCorpus(spark: SparkSession, noise: Double): DataFrame = {
    val k = 50
    val dim = 64
    val nRows = 20000
    def unit(v: Array[Double]): Array[Float] = {
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / nrm).toFloat)
    }
    val centers = (0 until k).map { c =>
      val r = new scala.util.Random(7000 + c)
      unit(Array.fill(dim)(r.nextGaussian()))
    }
    // NOTE the geometry knob: per-component noise σ acts across all
    // 64 dims, so ||noise|| ≈ 8σ vs ||center|| = 1. σ=0.35 (the
    // round-15 corpus) is NOISE-DOMINATED — cos(member, center) ≈
    // 0.34 and true neighbours frequently cross cluster boundaries
    // (see the printed coherence ceiling); σ=0.15 is genuinely tight
    // clusters, the regime cluster routing is for.
    val rows = (0 until nRows).map { i =>
      val c = centers(i % k)
      val r = new scala.util.Random(100000 + i)
      val v = unit(c.map(_.toDouble).zip(
        Array.fill(dim)(r.nextGaussian() * noise)).map { case (a, b) => a + b })
      (i.toLong, v.toSeq)
    }
    import spark.implicits._
    val out = sys.props("java.io.tmpdir") +
      s"/graft_clustered_frontier_$noise".replace('.', '_')
    rows.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding")
      .write.mode("overwrite").parquet(out)
    spark.read.parquet(out)
  }
}
