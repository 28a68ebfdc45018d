package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("meanVector: per-position means, null elements skipped, ragged ok") {
    val df = Seq(
      Seq[java.lang.Float](1.0f, 2.0f),
      Seq[java.lang.Float](3.0f, null),
      Seq[java.lang.Float](5.0f, 4.0f, 9.0f))
      .toDF("v")
    val m = Similarity.meanVector(df.repartition(3), "v")
    assert(m.toSeq == Seq(3.0, 3.0, 9.0))
    intercept[IllegalArgumentException] {
      Similarity.meanVector(df.where(lit(false)), "v")
    }
  }

  // Small corpus with a planted near-duplicate of vector 1.
  private def corpus = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Seq(0.99f, 0.1f, 0.0f, 0.0f)), // near-dup of 1
    (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
    (5L, Seq(-1.0f, 0.0f, 0.0f, 0.0f)))
    .toDF("id", "vec")

  test("bruteForceTopK: rank 1 is the vector itself, rank 2 the planted near-dup") {
    val q = corpus.where($"id" === 1L)
    val out = Similarity
      .bruteForceTopK(corpus, q, "vec", "id", "id", k = 3)
      .select($"corpus_id", $"rank")
      .as[(Long, Int)]
      .collect()
      .toMap
    assert(out.size == 3)
    // invert: rank -> corpus
    val byRank = out.map(_.swap)
    assert(byRank(1) == 1L)
    assert(byRank(2) == 2L)
  }

  test("filteredTopK: candidates never cross the match column; sparse groups under-fill") {
    // two tenants: A = {1, 2, 3}, B = {4}; vec 2 is vec 1's near-dup
    val tagged = corpus.withColumn("tenant",
      when($"id" <= 3L, "A").when($"id" === 4L, "B").otherwise("C"))
    val q = tagged.where($"id" === 1L || $"id" === 4L)
    val out = Similarity
      .filteredTopK(tagged, q, "vec", "id", "id", k = 3, matchCols = Seq("tenant"))
      .select($"query_id", $"corpus_id", $"rank")
      .as[(Long, Long, Int)].collect()
    val byQuery = out.groupBy(_._1)
    // query 1 ranks ONLY tenant-A rows: self first, near-dup second
    assert(byQuery(1L).map(_._2).toSet.subsetOf(Set(1L, 2L, 3L)))
    assert(byQuery(1L).find(_._3 == 1).get._2 == 1L)
    assert(byQuery(1L).find(_._3 == 2).get._2 == 2L)
    // query 4's tenant has one row — the result UNDER-FILLS to 1
    // (a post-filtered global top-k would have dropped it entirely)
    assert(byQuery(4L).map(_._2).toSeq == Seq(4L))
  }

  test("lshTopK: self and near-dup land in the query's bucket") {
    val q = corpus.where($"id" === 1L)
    val out = Similarity
      .lshTopK(corpus, q, "vec", "id", "id", k = 5, dim = 4, numPlanes = 3)
      .select($"corpus_id", $"rank")
      .as[(Long, Int)]
      .collect()
      .toMap
      .map(_.swap)
    assert(out(1) == 1L) // the vector itself always shares its own bucket
    // near-dup's tiny angular distance keeps it in the same bucket
    assert(out.values.toSet.contains(2L))
  }

  test("lshTopK multi-probe: recovers neighbours one bucket-bit away") {
    val q = corpus.where($"id" === 1L)
    val noProbe = Similarity
      .lshTopK(corpus, q, "vec", "id", "id", k = 5, dim = 4, numPlanes = 3)
      .count()
    val probed = Similarity
      .lshTopK(corpus, q, "vec", "id", "id", k = 5, dim = 4, numPlanes = 3,
        multiProbe = 3)
      .count()
    assert(probed >= noProbe) // extra buckets can only add candidates
  }

  test("lshTopK directed multi-probe: near-identical neighbour recovered across the straddled plane") {
    import org.apache.spark.sql.functions._
    // 40 deterministic pseudo-random vectors; queries are tiny
    // perturbations of corpus vectors 5, 17, 29. A perturbed query
    // whose bucket flipped did so on a plane it nearly straddles —
    // exactly the plane directed probing flips first.
    def vec(id: Long): Seq[Float] =
      (1 to 8).map(j => (math.sin(id * 7.3 + j * 1.7) * 2 - 1).toFloat)
    val corpus = (0L until 40L).map(i => (i, vec(i))).toDF("id", "vec")
    val queries = Seq(5L, 17L, 29L)
      .map(i => (i + 1000, vec(i).zipWithIndex.map { case (x, j) =>
        if (j == 0) x + 1e-4f else x }.toSeq))
      .toDF("id", "vec")
    val found = Similarity
      .lshTopK(corpus, queries, "vec", "id", "id", k = 3, dim = 8,
        numPlanes = 5, multiProbe = 2)
      .where(col("rank") === 1)
      .select(col("query_id"), col("corpus_id"))
      .as[(Long, Long)].collect().toMap
    Seq(5L, 17L, 29L).foreach { i =>
      assert(found.get(i + 1000).contains(i), s"query ${i + 1000} missed $i")
    }
  }

  test("ivfTopK: probes the right partition; self is rank 1") {
    // ids 0 and 3 are centroids (stride 3); query 1 should find itself
    val c = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Seq(0.95f, 0.05f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Seq(0.0f, 0.9f, 0.1f, 0.0f)))
      .toDF("id", "vec")
    val q = c.where($"id" === 1L)
    val out = Similarity
      .ivfTopK(c, q, "vec", "id", "id", k = 3, stride = 3, nprobe = 1)
      .select($"corpus_id", $"rank")
      .as[(Long, Int)]
      .collect()
      .toMap
      .map(_.swap)
    assert(out(1) == 1L) // itself
    // probe covers only the x-axis centroid's partition: 0,1,2
    assert(out.values.toSet.subsetOf(Set(0L, 1L, 2L)))
  }

  test("clusterRoutedTopK: probing every cluster equals brute force") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 60L).map(i => (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    val c = vecs.toDF("id", "vec")
    val q = c.where($"id" < 3)
    // stride 10 → ≤ 6 seed centroids; nprobe 6 covers them all, so
    // the ONLY approximation (routing) is removed and the result must
    // be bit-identical to the exact path.
    val routed = Similarity.clusterRoutedTopK(c, q, "vec", "id", "id",
      k = 5, nprobe = 6, stride = 10, iters = 2)
    val exact = Similarity.bruteForceTopK(c, q, "vec", "id", "id", k = 5)
    assert(routed.sort("query_id", "rank").collect().toSeq ==
      exact.sort("query_id", "rank").collect().toSeq)
  }

  test("clusterRoutedTopK: tight clusters — exact ranking within the routed cluster") {
    // Three razor-margin clusters around orthogonal axes (the §6b
    // geometry where quantizer paths saturate): Lloyd routing sends
    // each query to its true cluster, and within-cluster distances
    // are exact, so recall@k vs brute force is 1.0.
    val rnd = new scala.util.Random(13)
    def member(axis: Int, i: Long): (Long, Seq[Float]) = {
      val base = Array.fill(12)(rnd.nextGaussian() * 0.05)
      base(axis) += 1.0
      val n = math.sqrt(base.map(x => x * x).sum)
      (i, base.map(x => (x / n).toFloat).toSeq)
    }
    val c = (0L until 90L).map(i => member((i % 3).toInt, i)).toDF("id", "vec")
    val q = c.where($"id" < 3)
    val routed = Similarity.clusterRoutedTopK(c, q, "vec", "id", "id",
      k = 8, nprobe = 2, stride = 30, iters = 2)
    val exact = Similarity.bruteForceTopK(c, q, "vec", "id", "id", k = 8)
    val recall = Similarity.annRecall(routed, exact)
      .select("recall").head().getDouble(0)
    assert(recall == 1.0, s"tight-cluster recall@8 was $recall")
    // and the neighbours really are same-cluster siblings
    val byQ = routed.select($"query_id", $"corpus_id")
      .as[(Long, Long)].collect()
    byQ.foreach { case (qid, cid) => assert(cid % 3 == qid % 3) }
  }

  test("kmeans index: from-index equals from-scratch; append freezes centroids; compact preserves") {
    val rnd = new scala.util.Random(17)
    val vecs = (0L until 80L).map(i => (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    val all = vecs.toDF("id", "vec")
    val q = all.where($"id" < 3)
    val table = "graft_km_spec"
    try {
      Similarity.writeKmeansIndex(all, "vec", "id", table,
        stride = 10, iters = 2, numBuckets = 4)
      val direct = Similarity.clusterRoutedTopK(all, q, "vec", "id", "id",
        k = 5, nprobe = 3, stride = 10, iters = 2)
        .sort("query_id", "rank").collect().toSeq
      val fromIdx = Similarity.clusterRoutedTopKFromIndex(spark, table, q,
        "vec", "id", k = 5, nprobe = 3)
      assert(fromIdx.sort("query_id", "rank").collect().toSeq == direct)
      // a centroid marker row shares its seed's corpus id — candidates
      // must still be unique per (query, corpus) (markers excluded)
      assert(fromIdx.groupBy($"query_id", $"corpus_id").count()
        .agg(max($"count")).head().getLong(0) == 1L)

      // rebuild on 4/5 of the corpus, append the seed-ELIGIBLE rest:
      // the centroid set must stay the build-time fit
      val base = all.where($"id" % 5 =!= 0)
      Similarity.writeKmeansIndex(base, "vec", "id", table,
        stride = 10, iters = 2, numBuckets = 4)
      val cenBefore = spark.table(table).where($"__cen")
        .select($"__cid").as[Long].collect().toSet
      Similarity.appendKmeansIndex(all.where($"id" % 5 === 0), "vec", "id", table)
      val cenAfter = spark.table(table).where($"__cen")
        .select($"__cid").as[Long].collect().toSet
      assert(cenAfter == cenBefore, "append must never grow the centroid set")
      // appended rows are searchable: full-coverage probes find id 0
      // (an appended row) as its own rank-1 neighbour
      val nCen = cenBefore.size
      val found = Similarity.clusterRoutedTopKFromIndex(spark, table,
        all.where($"id" === 0), "vec", "id", k = 1, nprobe = nCen)
        .select($"corpus_id").as[Long].head()
      assert(found == 0L)
      // compaction folds files, results unchanged
      val before = Similarity.clusterRoutedTopKFromIndex(spark, table, q,
        "vec", "id", k = 5, nprobe = 3).sort("query_id", "rank").collect().toSeq
      Similarity.compactKmeansIndex(spark, table)
      val after = Similarity.clusterRoutedTopKFromIndex(spark, table, q,
        "vec", "id", k = 5, nprobe = 3).sort("query_id", "rank").collect().toSeq
      assert(after == before)
      // a real table WITHOUT the kmeans properties is rejected
      all.write.mode("overwrite").saveAsTable("graft_not_an_index")
      intercept[IllegalArgumentException] {
        Similarity.clusterRoutedTopKFromIndex(spark, "graft_not_an_index",
          q, "vec", "id", 5)
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql("DROP TABLE IF EXISTS graft_not_an_index")
    }
  }

  test("clusterRoutedTopK: validation") {
    val c = Seq((0L, Seq(1.0f, 0.0f))).toDF("id", "vec")
    intercept[IllegalArgumentException] {
      Similarity.clusterRoutedTopK(c, c, "vec", "id", "id", k = 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.clusterRoutedTopK(c, c, "vec", "id", "id", k = 1, nprobe = 0)
    }
  }

  test("bruteForceTopKInt8: self is rank 1; high recall vs the float path") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 200L).map(i => (i, Seq.fill(32)(rnd.nextFloat() * 2 - 1)))
    val c = vecs.toDF("id", "vec")
    val q = c.where($"id" < 10)
    def topSet(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"corpus_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val f = topSet(Similarity.bruteForceTopK(c, q, "vec", "id", "id", k = 10))
    val i8 = topSet(Similarity.bruteForceTopKInt8(c, q, "vec", "id", "id", k = 10))
    // exact self-match survives quantization at rank 1
    val ranks1 = Similarity.bruteForceTopKInt8(c, q, "vec", "id", "id", k = 1)
      .select($"query_id", $"corpus_id").as[(Long, Long)].collect()
    ranks1.foreach { case (qid, cid) => assert(qid == cid, s"self not rank1 for $qid") }
    // overlap@10 ≥ 0.8 averaged over queries (quantization reorders
    // only near-ties)
    val overlap = f.keys.toSeq.map(k => (f(k) & i8(k)).size / 10.0).sum / f.size
    assert(overlap >= 0.8, s"overlap@10 = $overlap")
  }

  test("bruteForceTopKHamming: self at distance 0 rank 1; tracks the float ordering") {
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 200L).map(i => (i, Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val c = vecs.toDF("id", "vec")
    val q = c.where($"id" < 10)
    val out = Similarity.bruteForceTopKHamming(c, q, "vec", "id", "id", k = 10)
    val r1 = out.where($"rank" === 1)
      .select($"query_id", $"corpus_id", $"hamming").as[(Long, Long, Int)].collect()
    r1.foreach { case (qid, cid, h) =>
      assert(qid == cid && h == 0, s"self not rank-1/zero for $qid")
    }
    // sign codes are coarse but must still correlate with the exact
    // ordering: hamming-top10 overlaps float-top10 well above chance
    // (chance ≈ 10/200)
    def topSet(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"corpus_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val f = topSet(Similarity.bruteForceTopK(c, q, "vec", "id", "id", k = 10))
    val h = topSet(out)
    val overlap = f.keys.toSeq.map(k => (f(k) & h(k)).size / 10.0).sum / f.size
    assert(overlap >= 0.3, s"overlap@10 = $overlap")
    // deterministic under repartitioning
    val again = Similarity.bruteForceTopKHamming(
      c.repartition(7), q, "vec", "id", "id", k = 10)
    assert(topSet(again) == h)
  }

  test("cascadeTopK: recall >= the straight int8 path; generous shortlist is exact") {
    val rnd = new scala.util.Random(23)
    val c = (0L until 200L).map(i => (i, Seq.fill(32)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "vec")
    val q = c.where($"id" < 6)
    def topSet(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"corpus_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val exact = topSet(Similarity.bruteForceTopK(c, q, "vec", "id", "id", k = 10))
    def recall(m: Map[Long, Set[Long]]) =
      exact.keys.toSeq.map(k => (exact(k) & m(k)).size / 10.0).sum / exact.size
    val int8Recall = recall(topSet(
      Similarity.bruteForceTopKInt8(c, q, "vec", "id", "id", k = 10)))
    val cascadeRecall = recall(topSet(Similarity.cascadeTopK(
      c, q, "vec", "id", "id", k = 10, shortlist = 120, rerank = 60)))
    assert(cascadeRecall >= int8Recall,
      s"cascade $cascadeRecall < int8 $int8Recall")
    // shortlist = corpus → tier 1 prunes nothing, rerank = shortlist →
    // tier 2 prunes nothing: the cascade degenerates to the exact scan
    val full = topSet(Similarity.cascadeTopK(
      c, q, "vec", "id", "id", k = 10, shortlist = 200, rerank = 200))
    assert(full == exact)
    // deterministic under repartitioning
    val again = topSet(Similarity.cascadeTopK(
      c.repartition(7), q, "vec", "id", "id", k = 10, shortlist = 120, rerank = 60))
    assert(again == topSet(Similarity.cascadeTopK(
      c, q, "vec", "id", "id", k = 10, shortlist = 120, rerank = 60)))
    // parameter validation
    intercept[IllegalArgumentException] {
      Similarity.cascadeTopK(c, q, "vec", "id", "id", k = 10, shortlist = 5)
    }
  }

  test("centroidSimilarity: orthogonal 0, parallel 1, zero-norm null, bounded grid") {
    val df = Seq(
      ("a", Seq(1.0f, 0.0f)), ("a", Seq(3.0f, 0.0f)), // centroid (2, 0)
      ("b", Seq(0.0f, 2.0f)),                         // centroid (0, 2)
      ("c", Seq(4.0f, 0.0f)),                         // centroid (4, 0) ∥ a
      ("z", Seq(0.0f, 0.0f)))                         // zero norm
      .toDF("g", "vec")
    val out = Similarity.centroidSimilarity(df, "vec", "g")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out.size == 6) // all unordered pairs of 4 groups
    assert(out(("a", "b")) == Some(0.0))
    assert(out(("a", "c")) == Some(1.0))
    assert(out(("b", "c")) == Some(0.0))
    assert(out(("a", "z")) == None && out(("b", "z")) == None)
    // null group rows drop; repartition-deterministic
    val withNull = df.unionAll(
      Seq((null.asInstanceOf[String], Seq(9.0f, 9.0f))).toDF("g", "vec"))
    assert(Similarity.centroidSimilarity(withNull.repartition(7), "vec", "g")
      .collect().toSet ==
      Similarity.centroidSimilarity(df, "vec", "g").collect().toSet)
  }

  test("rerankTopK: covering shortlist reproduces brute force; restricted shortlist is respected") {
    val q = corpus.where($"id" === 1L)
    val exact = Similarity.bruteForceTopK(corpus, q, "vec", "id", "id", k = 3)
    // a shortlist that covers the true top-3 (here: everything)
    val full = Similarity.bruteForceTopK(corpus, q, "vec", "id", "id", k = 5)
    val rr = Similarity.rerankTopK(corpus, q, full, "vec", "id", "id", k = 3)
    assert(rr.collect().toSet == exact.collect().toSet)
    // a shortlist MISSING the near-dup: rerank can only rank survivors
    val sl = Seq((1L, 1L), (1L, 3L)).toDF("query_id", "corpus_id")
    val restricted = Similarity.rerankTopK(corpus, q, sl, "vec", "id", "id", k = 3)
      .select($"corpus_id", $"rank").as[(Long, Int)].collect().toMap.map(_.swap)
    assert(restricted == Map(1 -> 1L, 2 -> 3L))
    intercept[IllegalArgumentException] {
      Similarity.rerankTopK(corpus, q, sl, "vec", "id", "id", k = 0)
    }
  }

  test("annRecall: hand-checkable counts; degenerate cascade scores 1.0; empty exact is null") {
    val rnd = new scala.util.Random(29)
    val c = (0L until 150L).map(i => (i, Seq.fill(32)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "vec")
    val q = c.where($"id" < 4)
    val exact = Similarity.bruteForceTopK(c, q, "vec", "id", "id", k = 8)
    // identical inputs → full recall, counts = queries × k
    val self = Similarity.annRecall(exact, exact)
      .as[(Long, Long, Long, Double)].head()
    assert(self == ((4L, 32L, 32L, 1.0)))
    // prune-nothing cascade degenerates to the exact scan → 1.0
    val full = Similarity.cascadeTopK(
      c, q, "vec", "id", "id", k = 8, shortlist = 150, rerank = 150)
    assert(Similarity.annRecall(full, exact)
      .select($"recall").as[Double].head() == 1.0)
    // int8 tier: imperfect but measured — in (0, 1]
    val int8 = Similarity.bruteForceTopKInt8(c, q, "vec", "id", "id", k = 8)
    val r8 = Similarity.annRecall(int8, exact)
      .as[(Long, Long, Long, Double)].head()
    assert(r8._1 == 4L && r8._2 == 32L)
    assert(r8._3 >= 1L && r8._3 <= 32L && r8._4 == r8._3 / 32.0)
    // no exact rows → null recall, zero counts
    val empty = Similarity.annRecall(exact, exact.where(lit(false)))
    val row = empty.select($"n_exact", $"recall").collect().head
    assert(row.getLong(0) == 0L && row.isNullAt(1))
  }

  test("annRecallByQuery: one row per query, counts match annRecall's totals") {
    val rnd = new scala.util.Random(31)
    val c = (0L until 120L).map(i => (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "vec")
    val q = c.where($"id" < 4)
    val exact = Similarity.bruteForceTopK(c, q, "vec", "id", "id", k = 6)
    // identical inputs → recall 1.0 per query
    val self = Similarity.annRecallByQuery(exact, exact)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(self.map(_._1) == Seq(0L, 1L, 2L, 3L))
    assert(self.forall(r => r._2 == 6L && r._3 == 6L && r._4 == 1.0))
    // an imperfect ranker: per-query matched sums to annRecall's total
    val int8 = Similarity.bruteForceTopKInt8(c, q, "vec", "id", "id", k = 6)
    val perQ = Similarity.annRecallByQuery(int8, exact)
      .as[(Long, Long, Long, Double)].collect()
    val total = Similarity.annRecall(int8, exact)
      .as[(Long, Long, Long, Double)].head()
    assert(perQ.length == 4 && perQ.map(_._2).sum == total._2 &&
      perQ.map(_._3).sum == total._3)
    assert(perQ.forall(r => r._4 == r._3.toDouble / r._2))
  }

  test("ivfTopKFromIndex: identical results to ivfTopK, corpus side shuffle-free") {
    val rnd = new scala.util.Random(11)
    val c = (0L until 300L).map(i => (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "vec")
    val q = c.where($"id" < 5)
    val direct = Similarity.ivfTopK(c, q, "vec", "id", "id", k = 5, stride = 30, nprobe = 2)
      .collect().map(_.toSeq).toSet
    Similarity.writeIvfIndex(c, "vec", "id", "graft_ivf_test", stride = 30, numBuckets = 4)
    val fromIndex = Similarity.ivfTopKFromIndex(
      spark, "graft_ivf_test", q, "vec", "id", k = 5, stride = 30, nprobe = 2)
    assert(fromIndex.collect().map(_.toSeq).toSet == direct)
    // the indexed search plan needs strictly fewer exchanges than the
    // direct path (no assignment agg, no corpus-side join shuffle)
    val directPlan = Similarity.ivfTopK(c, q, "vec", "id", "id", 5, 30, 2)
    assert(graft.sources.Bucketing.exchangeCount(fromIndex) <
      graft.sources.Bucketing.exchangeCount(directPlan))
    // the index is self-describing: build params live in table props…
    assert(Similarity.readIvfIndexMeta(spark, "graft_ivf_test")
      .contains((30, 4)))
    // …the stride-less call reads them and reproduces the same result…
    val noStride = Similarity.ivfTopKFromIndex(
      spark, "graft_ivf_test", q, "vec", "id", k = 5, nprobe = 2)
    assert(noStride.collect().map(_.toSeq).toSet == direct)
    // …and a mismatched caller stride fails fast instead of silently
    // searching the wrong buckets
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfTopKFromIndex(
        spark, "graft_ivf_test", q, "vec", "id", k = 5, stride = 31, nprobe = 2)
    }
    assert(ex.getMessage.contains("graft.ivf.stride"))
  }

  test("filteredTopKFromIndex: bucket∩label candidates, model-exact, fewer scanned rows") {
    val rnd = new scala.util.Random(31)
    val rows = (0L until 240L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1), s"t${i % 3}"))
    val c = rows.toDF("id", "vec", "tenant")
    val q = c.where($"id" < 6)
    Similarity.writeIvfIndex(c, "vec", "id", "graft_ivf_filt",
      stride = 24, numBuckets = 4, matchCols = Seq("tenant"))
    val got = Similarity.filteredTopKFromIndex(
      spark, "graft_ivf_filt", q, "vec", "id", k = 4,
      matchCols = Seq("tenant"), nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet

    // driver-side model: global stride centroids, per-row global
    // argmax assignment, global top-2 probes, candidates =
    // probed-bucket ∩ same-tenant, rank by (cos desc, id)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val cen = rows.filter(_._1 % 24 == 0)
    def assign(v: Seq[Float]): Long =
      cen.map(ct => (cos(v, ct._2), -ct._1)).max match {
        case (_, negId) => -negId
      }
    val assigned = rows.map(r => (r._1, assign(r._2)))
    val want = rows.filter(_._1 < 6).flatMap { qr =>
      val probes = cen.map(ct => (cos(qr._2, ct._2), -ct._1))
        .sorted(Ordering[(Double, Long)].reverse).take(2).map(-_._2).toSet
      rows
        .filter(cr => probes.contains(assigned.find(_._1 == cr._1).get._2) &&
          cr._3 == qr._3)
        .map(cr => (cr._1,
          BigDecimal(cos(cr._2, qr._2)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble))
        .sortBy { case (cid, cs) => (-cs, cid) }
        .take(4).zipWithIndex
        .map { case ((cid, cs), i) => (qr._1, cid, cs, i + 1) }
    }.toSet
    assert(got == want)
    // every neighbour shares the query's tenant
    val tenantOf = rows.map(r => r._1 -> r._3).toMap
    assert(got.forall { case (qid, cid, _, _) => tenantOf(qid) == tenantOf(cid) })

    // the scale claim: the bucket∩label candidate space is strictly
    // smaller than the exact path's full same-label partition scan
    val idx = spark.table("graft_ivf_filt")
    val probeSet = rows.filter(_._1 < 6).flatMap { qr =>
      cen.map(ct => (cos(qr._2, ct._2), -ct._1))
        .sorted(Ordering[(Double, Long)].reverse).take(2)
        .map(p => (qr._1, -p._2, qr._3))
    }.toDF("query_id", "__cid", "tenant")
    val bucketAndLabel = idx.join(probeSet, Seq("__cid", "tenant")).count()
    val labelOnly = idx.join(probeSet.select("query_id", "tenant").distinct(),
      Seq("tenant")).count()
    assert(bucketAndLabel < labelOnly,
      s"expected bucket∩label ($bucketAndLabel) < label-only ($labelOnly)")

    // an index built WITHOUT the column refuses filtered search
    Similarity.writeIvfIndex(c, "vec", "id", "graft_ivf_nofilt",
      stride = 24, numBuckets = 4)
    val ex = intercept[IllegalArgumentException] {
      Similarity.filteredTopKFromIndex(
        spark, "graft_ivf_nofilt", q, "vec", "id", k = 4,
        matchCols = Seq("tenant"), nprobe = 2)
    }
    assert(ex.getMessage.contains("tenant"))
  }

  test("appendIvfIndex: carries matchCols columns; refuses a batch lacking them") {
    val rnd = new scala.util.Random(37)
    def mk(ids: Seq[Long]) =
      ids.map(i => (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1), s"t${i % 2}"))
        .toDF("id", "vec", "tenant")
    val build = mk(0L until 96L)
    val batch = mk(200L until 210L)
    Similarity.writeIvfIndex(build, "vec", "id", "graft_ivf_filt_app",
      stride = 24, numBuckets = 4, matchCols = Seq("tenant"))
    Similarity.appendIvfIndex(batch, "vec", "id", "graft_ivf_filt_app")
    // appended rows are filter-searchable: self-query finds itself
    val self = Similarity.filteredTopKFromIndex(
      spark, "graft_ivf_filt_app", batch.where($"id" === 200L),
      "vec", "id", k = 1, matchCols = Seq("tenant"), nprobe = 1).collect()
    assert(self.length == 1 && self.head.getLong(1) == 200L)
    // a batch without the carried column fails fast, not at write time
    val bare = batch.drop("tenant")
    val ex = intercept[IllegalArgumentException] {
      Similarity.appendIvfIndex(bare, "vec", "id", "graft_ivf_filt_app")
    }
    assert(ex.getMessage.contains("tenant"))
  }

  test("appendIvfIndex: build+append == fresh full build; centroid set frozen") {
    val rnd = new scala.util.Random(23)
    val all = (0L until 300L).map(i => (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "vec")
    // batch ids avoid the stride grid (none ≡ 0 mod 30), so a fresh
    // full build has the SAME centroid set and must agree exactly
    val batch = all.where($"id" % 10 === 7)
    val build = all.where($"id" % 10 =!= 7)
    val q = all.where($"id" < 5)
    try {
      Similarity.writeIvfIndex(build, "vec", "id", "graft_ivf_app", stride = 30, numBuckets = 4)
      Similarity.appendIvfIndex(batch, "vec", "id", "graft_ivf_app")
      val appended = Similarity.ivfTopKFromIndex(
        spark, "graft_ivf_app", q, "vec", "id", k = 5, nprobe = 2)
        .collect().map(_.toSeq).toSet
      Similarity.writeIvfIndex(all, "vec", "id", "graft_ivf_full", stride = 30, numBuckets = 4)
      val fresh = Similarity.ivfTopKFromIndex(
        spark, "graft_ivf_full", q, "vec", "id", k = 5, nprobe = 2)
        .collect().map(_.toSeq).toSet
      assert(appended == fresh)
      // properties unchanged by the append
      assert(Similarity.readIvfIndexMeta(spark, "graft_ivf_app").contains((30, 4)))
      // a batch whose ids DO satisfy the stride filter must still not
      // join the centroid set: the __cen marker freezes it
      val gridBatch = (1000L to 1090L by 30L)
        .map(i => (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1))).toDF("id", "vec")
      val cenBefore = spark.table("graft_ivf_app").where($"__cen").count()
      Similarity.appendIvfIndex(gridBatch, "vec", "id", "graft_ivf_app")
      assert(spark.table("graft_ivf_app").where($"__cen").count() == cenBefore)
      // …while its rows are searchable (self-query finds itself at rank 1)
      val self = Similarity.ivfTopKFromIndex(
        spark, "graft_ivf_app", gridBatch.where($"id" === 1000L), "vec", "id",
        k = 1, nprobe = 1).collect()
      assert(self.length == 1 && self.head.getLong(1) == 1000L)
      // an index without the marker refuses appends
      spark.table("graft_ivf_app").drop("__cen").write
        .mode("overwrite").saveAsTable("graft_ivf_old")
      spark.sql("ALTER TABLE graft_ivf_old SET TBLPROPERTIES (" +
        "'graft.ivf.stride' = '30', 'graft.ivf.numBuckets' = '4')")
      val ex = intercept[IllegalArgumentException] {
        Similarity.appendIvfIndex(batch, "vec", "id", "graft_ivf_old")
      }
      assert(ex.getMessage.contains("__cen"))
    } finally {
      Seq("graft_ivf_app", "graft_ivf_full", "graft_ivf_old")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("compactIvfIndex: append file growth folded, results/meta/markers intact") {
    val rnd = new scala.util.Random(31)
    def vecs(ids: Range) = ids.map(i => (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "vec")
    val q = vecs(0 until 3)
    try {
      Similarity.writeIvfIndex(vecs(0 until 120), "vec", "id", "graft_ivf_cmp",
        stride = 30, numBuckets = 4)
      Similarity.appendIvfIndex(vecs(200 until 260), "vec", "id", "graft_ivf_cmp")
      Similarity.appendIvfIndex(vecs(300 until 360), "vec", "id", "graft_ivf_cmp")
      val before = Similarity.ivfTopKFromIndex(
        spark, "graft_ivf_cmp", q, "vec", "id", k = 5, nprobe = 2)
        .collect().map(_.toSeq).toSet
      val filesBefore = spark.table("graft_ivf_cmp").inputFiles.length
      val cenBefore = spark.table("graft_ivf_cmp").where($"__cen").count()
      Similarity.compactIvfIndex(spark, "graft_ivf_cmp")
      assert(spark.table("graft_ivf_cmp").inputFiles.length < filesBefore)
      assert(spark.table("graft_ivf_cmp").where($"__cen").count() == cenBefore)
      assert(Similarity.readIvfIndexMeta(spark, "graft_ivf_cmp").contains((30, 4)))
      val after = Similarity.ivfTopKFromIndex(
        spark, "graft_ivf_cmp", q, "vec", "id", k = 5, nprobe = 2)
        .collect().map(_.toSeq).toSet
      assert(after == before)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_ivf_cmp")
      spark.sql("DROP TABLE IF EXISTS graft_ivf_cmp__compact")
    }
  }

  test("autoStride: nlist stays bounded by the target across 3 orders of n") {
    val target = 64
    Seq(1000L, 100000L, 10000000L).foreach { n =>
      val stride = Similarity.autoStride(n, target)
      // actual centroid count over dense ids (the sampling predicate
      // ivfTopK uses: id % stride == 0)
      val nlist = spark.range(n)
        .where(org.apache.spark.sql.functions.pmod($"id",
          org.apache.spark.sql.functions.lit(stride)) === 0)
        .count()
      assert(nlist <= target, s"n=$n stride=$stride nlist=$nlist")
      assert(nlist >= target / 2, s"n=$n under-sampled: nlist=$nlist")
    }
    assert(Similarity.autoStride(0L, 10) == 1) // degenerate corpus
  }

  test("ivfTopK: numCentroids derives the stride (same results as the explicit stride)") {
    val c = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Seq(0.95f, 0.05f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Seq(0.0f, 0.9f, 0.1f, 0.0f)))
      .toDF("id", "vec")
    val q = c.where($"id" === 1L)
    // n=5, numCentroids=2 → stride = ⌈5/2⌉ = 3, identical to stride=3
    val viaCount = Similarity
      .ivfTopK(c, q, "vec", "id", "id", k = 3, nprobe = 1, numCentroids = 2)
      .select($"corpus_id", $"rank").as[(Long, Int)].collect().toSet
    val viaExpected = Similarity
      .ivfTopK(c, q, "vec", "id", "id", k = 3, nprobe = 1,
        numCentroids = 2, expectedRows = 5L)
      .select($"corpus_id", $"rank").as[(Long, Int)].collect().toSet
    val explicit = Similarity
      .ivfTopK(c, q, "vec", "id", "id", k = 3, stride = 3, nprobe = 1)
      .select($"corpus_id", $"rank").as[(Long, Int)].collect().toSet
    assert(viaCount == explicit)
    assert(viaExpected == explicit)
  }

  test("nearDupPairs: finds the planted pair only") {
    val pairs = Similarity
      .nearDupPairs(corpus, "vec", "id", dim = 4, threshold = 0.95, numPlanes = 3)
      .select($"id_a", $"id_b", $"cosine")
      .as[(Long, Long, Double)]
      .collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 > 0.99)
  }

  test("nearDupPairs: extra tables only add candidate pairs (OR-amplification)") {
    // Many planes → low per-table collision probability; banding with
    // more tables must recover at least the single-table pairs.
    val one = Similarity
      .nearDupPairs(corpus, "vec", "id", dim = 4, threshold = 0.95,
        numPlanes = 8, numTables = 1)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val four = Similarity
      .nearDupPairs(corpus, "vec", "id", dim = 4, threshold = 0.95,
        numPlanes = 8, numTables = 4)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(one.subsetOf(four))
    // identical vectors collide in every table — the planted pair is found
    assert(four.contains((1L, 2L)))
  }

  test("nearDupPairs: maxBucket drops degenerate buckets") {
    // 40 copies of the same vector → one bucket with 40 members in
    // every table; capping below that suppresses all its pairs.
    val clones = (1L to 40L).map(i => (i, Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "vec")
    val uncapped = Similarity
      .nearDupPairs(clones, "vec", "id", dim = 4, threshold = 0.9, numPlanes = 4)
      .count()
    val capped = Similarity
      .nearDupPairs(clones, "vec", "id", dim = 4, threshold = 0.9, numPlanes = 4,
        maxBucket = 10)
      .count()
    assert(uncapped == 40L * 39 / 2)
    assert(capped == 0L)
  }

  test("nearDupPairs: auto planes (numPlanes<=0) resolves and still finds the pair") {
    val pairs = Similarity
      .nearDupPairs(corpus, "vec", "id", dim = 4, threshold = 0.95)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("autoTables: OR-amplification sized for the recall target") {
    // s = 1 − arccos(0.9)/π ≈ 0.8564
    assert(Similarity.autoTables(1, 0.9) == 2) // s > 0.9 is false → 2 tables
    assert(Similarity.autoTables(8, 0.9) == 7) // s^8 ≈ 0.289 → 7 tables for R=0.9
    assert(Similarity.autoTables(24, 0.9) == 64) // cap binds: honest low-recall signal
    // higher per-table collision (lower planes or threshold→1) → fewer tables
    assert(Similarity.autoTables(2, 0.999) == 1)
  }

  test("autoPlanes: grows with log2(n), clamped to [8, 28]") {
    assert(Similarity.autoPlanes(1L) == 8)
    assert(Similarity.autoPlanes(1000L) == 8)
    assert(Similarity.autoPlanes(32L << 20) == 20) // 2^20 buckets for 32M rows
    // +8x rows → +3 planes: occupancy stays constant
    assert(Similarity.autoPlanes((32L << 20) * 8) == 23)
    assert(Similarity.autoPlanes(Long.MaxValue / 2) == 28)
  }

  // Two tight angular clusters around orthogonal axes; ids 0 and 3
  // are the stride-3 seeds, one per cluster.
  private def twoClusters = Seq(
    (0L, Seq(1.0f, 0.05f, 0.0f, 0.0f)),
    (1L, Seq(1.0f, -0.05f, 0.0f, 0.0f)),
    (2L, Seq(0.98f, 0.02f, 0.0f, 0.0f)),
    (3L, Seq(0.0f, 0.0f, 1.0f, 0.05f)),
    (4L, Seq(0.0f, 0.0f, 0.97f, -0.03f)),
    (5L, Seq(0.05f, 0.0f, 1.0f, 0.0f)))
    .toDF("id", "vec")

  test("kmeansAssignments: stride seeds, Lloyd pass, stable cluster ids") {
    val out = Similarity
      .kmeansAssignments(twoClusters, "vec", "id", stride = 3, iters = 2)
      .select($"id", $"cluster").as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L, 5L -> 3L))
    // iters=1 (pure assignment, no update) agrees here — the seeds
    // already sit inside their clusters
    val one = Similarity
      .kmeansAssignments(twoClusters, "vec", "id", stride = 3, iters = 1)
      .select($"id", $"cluster").as[(Long, Long)].collect().toMap
    assert(one == out)
    // cosine to the final centroid is high within a tight cluster
    val cos = Similarity
      .kmeansAssignments(twoClusters, "vec", "id", stride = 3, iters = 2)
      .select($"cosine").as[Double].collect()
    assert(cos.forall(_ > 0.99))
  }

  test("kmeansAssignments: the update step moves a misassigned point over") {
    // Seed 0 sits BETWEEN the x-cluster and a lone y-outlier; seed 4
    // anchors the z-cluster. After one update the x-members pull
    // centroid 0 toward x, keeping membership; z stays put.
    val drift = Seq(
      (0L, Seq(0.7f, 0.7f, 0.0f)), // seed A: x/y diagonal
      (1L, Seq(1.0f, 0.1f, 0.0f)),
      (2L, Seq(1.0f, -0.1f, 0.0f)),
      (3L, Seq(0.95f, 0.0f, 0.0f)),
      (4L, Seq(0.0f, 0.0f, 1.0f)), // seed B: z axis
      (5L, Seq(0.0f, 0.1f, 0.9f)))
      .toDF("id", "vec")
    val out = Similarity
      .kmeansAssignments(drift, "vec", "id", stride = 4, iters = 2)
      .select($"id", $"cluster").as[(Long, Long)].collect().toMap
    assert(out.values.toSet == Set(0L, 4L))
    assert(Seq(1L, 2L, 3L).forall(out(_) == 0L))
    assert(out(5L) == 4L)
  }

  test("kmeansAssignments: numCentroids bounds k across corpus growth") {
    def corpusN(n: Int) = (0L until n.toLong)
      .map(i => (i, Seq((i % 7).toFloat + 1, (i % 3).toFloat, 1.0f)))
      .toDF("id", "vec")
    // k stays ≤ target as n grows 16×; fixed stride would grow k 16×
    Seq(64, 256, 1024).foreach { n =>
      val k = Similarity
        .kmeansAssignments(corpusN(n), "vec", "id", iters = 1, numCentroids = 8)
        .select($"cluster").distinct().count()
      assert(k <= 8, s"n=$n k=$k")
    }
    // expectedRows skips the count job and matches the counted path
    val a = Similarity.kmeansAssignments(corpusN(100), "vec", "id",
      iters = 1, numCentroids = 8)
    val b = Similarity.kmeansAssignments(corpusN(100), "vec", "id",
      iters = 1, numCentroids = 8, expectedRows = 100)
    assert(a.collect().toSet == b.collect().toSet)
  }

  test("semanticNearDupPairs: finds within-cluster pairs, respects maxCluster") {
    // near-dup pair (1,2) lives in the x-cluster; nothing in z is close
    val pairs = Similarity
      .semanticNearDupPairs(twoClusters, "vec", "id", threshold = 0.999,
        stride = 3, iters = 1)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 2L)) || pairs.contains((0L, 2L)))
    assert(pairs.forall { case (a, b) => a < 3 == b < 3 }) // never cross-cluster
    // a cap below the cluster size suppresses its pairs entirely
    val capped = Similarity
      .semanticNearDupPairs(twoClusters, "vec", "id", threshold = 0.9,
        stride = 3, iters = 1, maxCluster = 2)
      .count()
    assert(capped == 0L)
  }

  test("marginMine: hub-corrected best pair per source, thresholded") {
    // src 10 has a clean match (20); src 11 is a "hub-ish" vector
    // whose best cosine matches its whole neighborhood -> margin ~1.
    val src = Seq(
      (10L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (11L, Seq(0.5f, 0.5f, 0.5f, 0.5f)))
      .toDF("id", "vec")
    val tgt = Seq(
      (20L, Seq(0.99f, 0.05f, 0.0f, 0.0f)), // clean match for 10
      (21L, Seq(0.4f, 0.45f, 0.5f, 0.55f)),
      (22L, Seq(0.45f, 0.5f, 0.55f, 0.4f)),
      (23L, Seq(0.5f, 0.55f, 0.4f, 0.45f)))
      .toDF("id", "vec")
    val out = Similarity
      .marginMine(src, tgt, "vec", "id", "id", k = 3, minMargin = 0.0)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // exactly one row per source (rank-1 by margin)
    assert(out.size == 2)
    assert(out(10L)._2 == 20L)
    // 10's match stands far above its neighborhood -> margin > 1;
    // 11's neighborhood is uniformly similar -> margin stays ~1
    assert(out(10L)._4 > out(11L)._4)
    assert(out(10L)._4 > 1.05)
    assert(math.abs(out(11L)._4 - 1.0) < 0.2)
    // thresholding drops the hub row
    val mined = Similarity
      .marginMine(src, tgt, "vec", "id", "id", k = 3,
        minMargin = (out(11L)._4 + out(10L)._4) / 2)
      .as[(Long, Long, Double, Double)].collect()
    assert(mined.map(_._1).toSeq == Seq(10L))
  }

  test("marginMine: deterministic under repartitioning") {
    val vecs = (0 until 40).map { i =>
      (i.toLong, Seq.tabulate(8)(j => math.sin(i * 7 + j * 3).toFloat))
    }.toDF("id", "vec")
    val src = vecs.where($"id" % 5 === 0)
    val tgt = vecs.where($"id" % 5 =!= 0)
    val a = Similarity.marginMine(src, tgt, "vec", "id", "id", k = 4)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    val b = Similarity
      .marginMine(src.repartition(7), tgt.repartition(5), "vec", "id", "id", k = 4)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("hardNegatives: positives and self excluded, hardest-first, underfill is honest") {
    // anchor 0 at e1; 1,2 near it (2 is a declared positive); 3 far
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.95f, 0.3f, 0.0f, 0.0f)),
      (2L, Seq(0.99f, 0.1f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
      (4L, Seq(0.9f, 0.4f, 0.1f, 0.0f)))
      .toDF("id", "vec")
    val anchors = vecs.where($"id" === 0)
    val pos = Seq((0L, 2L)).toDF("aid", "pid")
    // stride=1/nprobe=5 -> exhaustive candidates; exclusion is the test
    val out = Similarity.hardNegatives(vecs, anchors, pos,
      "vec", "id", "id", "aid", "pid", k = 2, fetchK = 5,
      stride = 1, nprobe = 5)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(out.map(_._2).toSeq == Seq(1L, 4L), out.mkString(","))
    assert(out.map(_._4).toSeq == Seq(1, 2))
    // all-positive shortlist -> fewer than k rows, never padded
    val allPos = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("aid", "pid")
    assert(Similarity.hardNegatives(vecs, anchors, allPos,
      "vec", "id", "id", "aid", "pid", k = 2, fetchK = 5,
      stride = 1, nprobe = 5).count() == 0)
    // determinism under repartitioning
    val a = Similarity.hardNegatives(vecs.repartition(3), anchors, pos,
      "vec", "id", "id", "aid", "pid", k = 2, fetchK = 5,
      stride = 1, nprobe = 5)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4).toSeq
    assert(a == out.toSeq)
    intercept[IllegalArgumentException] {
      Similarity.hardNegatives(vecs, anchors, pos, "vec", "id", "id",
        "aid", "pid", k = 10, fetchK = 5)
    }
  }

  test("marginMineTopK: IVF-candidate mining matches brute force when IVF is exhaustive") {
    // With every corpus vector a centroid (stride=1) and nprobe
    // covering all buckets, the IVF candidate set IS the brute-force
    // top-k, so the margin algebra must produce identical rows.
    val vecs = (0 until 60).map { i =>
      (i.toLong, Seq.tabulate(8)(j => math.cos(i * 5 + j * 2).toFloat))
    }.toDF("id", "vec")
    val src = vecs.where($"id" < 30)
    val tgt = vecs.where($"id" >= 30)
    val bf = Similarity.marginMine(src, tgt, "vec", "id", "id", k = 4)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    val ivf = Similarity.marginMineTopK(src, tgt, "vec", "id", "id", k = 4,
      stride = 1, nprobe = 30)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(ivf == bf && ivf.nonEmpty)
  }

  test("marginMineTopK: deterministic under repartitioning at sparse nprobe") {
    val vecs = (0 until 80).map { i =>
      (i.toLong, Seq.tabulate(8)(j => math.sin(i * 11 + j * 3).toFloat))
    }.toDF("id", "vec")
    val src = vecs.where($"id" < 40)
    val tgt = vecs.where($"id" >= 40)
    val a = Similarity.marginMineTopK(src, tgt, "vec", "id", "id", k = 4,
      stride = 10, nprobe = 2)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    val b = Similarity.marginMineTopK(src.repartition(7), tgt.repartition(5),
      "vec", "id", "id", k = 4, stride = 10, nprobe = 2)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(a == b && a.nonEmpty)
    // every surviving pair respects the margin threshold and is
    // unique per source
    assert(a.map(_._1).distinct.size == a.size)
    assert(a.forall(_._4 >= 1.0))
  }
}
