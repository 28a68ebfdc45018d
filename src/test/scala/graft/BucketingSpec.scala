package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed minhash signatures: identical pairs, shuffle-free candidate aggregation") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (4L, "completely different content about astronomy and the moons of jupiter"))
      .toDF("id", "text")
    try {
      Dedup.writeMinHashSignatures(docs, "text", "id", "graft_b_sigs", numBuckets = 4)
      val fromSigs = Dedup.minHashLshPairsFromSignatures(docs, "graft_b_sigs", "text", "id")
      val direct = Dedup.minHashLshPairs(docs, "text", "id")
      assert(fromSigs.as[(Long, Long, Double)].collect().toSet ==
        direct.as[(Long, Long, Double)].collect().toSet)
      // the bucketed path spends strictly fewer exchanges: the band
      // aggregation reads pre-clustered buckets instead of shuffling
      fromSigs.count(); direct.count()
      assert(Bucketing.exchangeCount(fromSigs) < Bucketing.exchangeCount(direct))
    } finally spark.sql("DROP TABLE IF EXISTS graft_b_sigs")
  }

  test("compactMinHashSignatures: replay growth collapsed, meta and results intact") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (3L, "completely different content about astronomy and the moons of jupiter"))
      .toDF("id", "text")
    val batch = Seq(
      (101L, "a brand new document about sailing across the southern ocean alone"))
      .toDF("id", "text")
    try {
      Dedup.writeMinHashSignatures(docs, "text", "id", "graft_b_cmp", numBuckets = 4)
      spark.sql(
        "ALTER TABLE graft_b_cmp SET TBLPROPERTIES ('graft.verify.srcDir' = '/x')")
      Dedup.appendMinHashSignatures(batch, "text", "id", "graft_b_cmp")
      val clean = spark.table("graft_b_cmp").count()
      // a REPLAYED append duplicates its rows exactly
      Dedup.appendMinHashSignatures(batch, "text", "id", "graft_b_cmp")
      assert(spark.table("graft_b_cmp").count() > clean)
      Dedup.compactMinHashSignatures(spark, "graft_b_cmp")
      assert(spark.table("graft_b_cmp").count() == clean)
      // meta (incl. bucket spec) and extra graft.* properties survive
      assert(Dedup.readMinHashSignatureMeta(spark, "graft_b_cmp")
        .contains(Dedup.MinHashSignatureMeta(5, 8, 2, false, 4)))
      val props = spark.sql("SHOW TBLPROPERTIES graft_b_cmp")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("graft.verify.srcDir").contains("/x"))
      // the compacted table still serves dedup, shuffle-free
      val corpus = docs.unionByName(batch)
      val pairs = Dedup
        .minHashLshPairsFromSignatures(corpus, "graft_b_cmp", "text", "id")
        .as[(Long, Long, Double)].collect().toSet
      assert(pairs == Dedup.minHashLshPairs(corpus, "text", "id")
        .as[(Long, Long, Double)].collect().toSet)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_b_cmp")
      spark.sql("DROP TABLE IF EXISTS graft_b_cmp__compact")
    }
  }

  test("incremental pairs: batch-vs-history from the signature table, fail-fast meta") {
    import graft.operators.Dedup
    val hist = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "completely different content about astronomy and the moons of jupiter"),
      (3L, "a third history document about cooking pasta with garlic and olive oil"))
      .toDF("id", "text")
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the river bank today"), // dup of 1
      (102L, "a brand new document about sailing across the southern ocean alone"))
      .toDF("id", "text")
    try {
      Dedup.writeMinHashSignatures(hist, "text", "id", "graft_b_hist", numBuckets = 4)
      // recorded build parameters round-trip
      assert(Dedup.readMinHashSignatureMeta(spark, "graft_b_hist")
        .contains(Dedup.MinHashSignatureMeta(5, 8, 2, false, 4)))
      val pairs = Dedup
        .minHashLshPairsIncremental(batch, hist, "graft_b_hist", "text", "id")
        .as[(Long, Long, Double)].collect().toSet
      assert(pairs == Set((1L, 101L, 1.0))) // dup found, novel doc clean
      // a table without graft.minhash.* properties fails fast
      hist.write.mode("overwrite").saveAsTable("graft_b_plain")
      intercept[IllegalArgumentException] {
        Dedup.minHashLshPairsIncremental(batch, hist, "graft_b_plain", "text", "id")
      }
      // a drifted caller configuration on the read path fails fast too
      intercept[IllegalArgumentException] {
        Dedup.minHashLshPairsFromSignatures(hist, "graft_b_hist", "text", "id",
          shingleK = 7)
      }
      // a table missing ONLY numBuckets must not default-guess: an
      // append bucketed with a guessed spec corrupts the clustering
      // contract, so the meta read treats it like any missing property
      spark.sql("ALTER TABLE graft_b_hist UNSET TBLPROPERTIES ('graft.minhash.numBuckets')")
      assert(Dedup.readMinHashSignatureMeta(spark, "graft_b_hist").isEmpty)
      intercept[IllegalArgumentException] {
        Dedup.appendMinHashSignatures(batch, "text", "id", "graft_b_hist")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_b_hist")
      spark.sql("DROP TABLE IF EXISTS graft_b_plain")
    }
  }

  test("incremental pairs: the history side joins shuffle-free from its buckets") {
    import graft.operators.Dedup
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val hist = (1L to 40L)
      .map(i => (i, s"history document number $i about topic ${i % 7} with enough words"))
      .toDF("id", "text")
    val batch = Seq(
      (101L, "history document number 3 about topic 3 with enough words"))
      .toDF("id", "text")
    // walk through every AQE wrapper so subtree checks see real nodes
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: nodes(a.executedPlan)
      case q: QueryStageExec => p +: nodes(q.plan)
      case r: ReusedExchangeExec => p +: nodes(r.child)
      case o => p +: o.children.flatMap(nodes)
    }
    try {
      Dedup.writeMinHashSignatures(hist, "text", "id", "graft_b_sf", numBuckets = 4)
      val pairs = Dedup
        .minHashLshPairsIncremental(batch, hist, "graft_b_sf", "text", "id")
      pairs.count() // finalize the adaptive plan
      val all = nodes(pairs.queryExecution.executedPlan)
      assert(all.exists(n => n.children.isEmpty && n.toString.contains("graft_b_sf")),
        "sig-table scan not found in plan")
      // VIOLATION = an exchange with a PATH down to the sig-table
      // scan that never passes a join: that would mean the candidate
      // join re-shuffled the bucketed history side — the exact cost
      // the bucketing exists to avoid at a 100 TB history
      def reachesScanNoJoin(p: SparkPlan): Boolean = p match {
        case _: BaseJoinExec => false
        case a: AdaptiveSparkPlanExec => reachesScanNoJoin(a.executedPlan)
        case q: QueryStageExec => reachesScanNoJoin(q.plan)
        case r: ReusedExchangeExec => reachesScanNoJoin(r.child)
        case o if o.children.isEmpty => o.toString.contains("graft_b_sf")
        case o => o.children.exists(reachesScanNoJoin)
      }
      val violations = all.collect {
        case e: ShuffleExchangeLike if e.children.exists(reachesScanNoJoin) => e
      }
      assert(violations.isEmpty,
        s"history side shuffled before its first join:\n${violations.headOption}")
    } finally spark.sql("DROP TABLE IF EXISTS graft_b_sf")
  }

  test("incremental pairs: maxBucket drops degenerate index buckets") {
    import graft.operators.Dedup
    // 30 identical history docs → every band bucket has 30 members
    val hist = (1L to 30L)
      .map(i => (i, "same boilerplate text repeated across the whole history corpus"))
      .toDF("id", "text")
    val batch = Seq(
      (101L, "same boilerplate text repeated across the whole history corpus"))
      .toDF("id", "text")
    try {
      Dedup.writeMinHashSignatures(hist, "text", "id", "graft_b_deg", numBuckets = 4)
      val uncapped = Dedup
        .minHashLshPairsIncremental(batch, hist, "graft_b_deg", "text", "id")
        .count()
      val capped = Dedup
        .minHashLshPairsIncremental(batch, hist, "graft_b_deg", "text", "id",
          maxBucket = 10)
        .count()
      assert(uncapped == 30L)
      assert(capped == 0L)
    } finally spark.sql("DROP TABLE IF EXISTS graft_b_deg")
  }

  test("co-bucketed join plans without a shuffle exchange") {
    val facts = (1 to 1000).map(i => (i.toLong % 50, s"f$i")).toDF("k", "fv")
    val dims = (0 until 50).map(i => (i.toLong, s"d$i")).toDF("k", "dv")
    Bucketing.writeBucketed(facts, "graft_b_facts", Seq("k"), 8, sortCols = Seq("k"))
    Bucketing.writeBucketed(dims, "graft_b_dims", Seq("k"), 8, sortCols = Seq("k"))
    // disable broadcast so the join would otherwise shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "graft_b_facts", "graft_b_dims", Seq("k"))
      assert(joined.count() == 1000)
      assert(Bucketing.exchangeCount(joined) == 0)

      // control: the same join over non-bucketed data shuffles
      val plain = facts.join(dims, Seq("k"))
      plain.count()
      assert(Bucketing.exchangeCount(plain) > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_b_facts")
      spark.sql("DROP TABLE IF EXISTS graft_b_dims")
    }
  }
}
