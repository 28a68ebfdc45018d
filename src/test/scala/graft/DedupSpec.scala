package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup
    (4L, "completely different content about astronomy and the moons of jupiter"))
    .toDF("id", "text")

  test("exact: keeps the smallest id per identical content") {
    val out = Dedup.exact(docs, Seq("text"), "id")
    val ids = out.select($"id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 3L, 4L))
  }

  test("exact: multi-column keys distinguish nulls from missing values") {
    val df = Seq(
      (1L, Some("a"), Some("b")),
      (2L, Some("a"), None), // NOT a duplicate of ("a", "b") or ("a")
      (3L, Some("a"), None)) // duplicate of 2
      .toDF("id", "x", "y")
    val kept = Dedup.exact(df, Seq("x", "y"), "id")
      .select($"id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L))
  }

  test("exactStats: group sizes per content key") {
    val out = Dedup
      .exactStats(docs, Seq("text"), "id")
      .select($"keep_id", $"dup_count")
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(out(1L) == 2L && out(3L) == 1L && out(4L) == 1L)
  }

  test("charShingles: distinct k-grams; short text falls back to whole string") {
    val df = Seq("abcd", "ab").toDF("s")
    val out = df.select(Dedup.charShingles($"s", 3).as("sh")).collect()
    assert(out(0).getSeq[String](0).toSet == Set("abc", "bcd"))
    assert(out(1).getSeq[String](0) == Seq("ab"))
  }

  test("wordShingles: distinct word n-grams") {
    val df = Seq("a b c d").toDF("s")
    val out = df.select(Dedup.wordShingles($"s", 2).as("sh")).collect()
    assert(out(0).getSeq[String](0).toSet == Set("a b", "b c", "c d"))
  }

  test("minHash signatures: identical sets → identical signatures") {
    val df = Seq("abcdefgh", "abcdefgh", "zyxwvuts").toDF("s")
    val sh = Dedup.charShingles($"s", 3)
    val sigs = df.select(Dedup.minHashSignature(sh, 6).as("sig")).collect()
    assert(sigs(0).getSeq[String](0) == sigs(1).getSeq[String](0))
    assert(sigs(0).getSeq[String](0) != sigs(2).getSeq[String](0))
    val fast = df.select(Dedup.minHashSignatureFast(sh, 6).as("sig")).collect()
    assert(fast(0).getSeq[Long](0) == fast(1).getSeq[Long](0))
    assert(fast(0).getSeq[Long](0) != fast(2).getSeq[Long](0))
  }

  test("minHashLshPairs: finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup
      .minHashLshPairs(docs, "text", "id", shingleK = 5, numHashes = 8, bands = 4,
        jaccardThreshold = 0.5)
      .select($"id_a", $"id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simHash: deterministic; near-identical texts within small hamming") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "the quick brown fox jumps over the lazy dog near the river"),
      (3L, "astronomy jupiter moons telescope galaxy cluster nebula"))
      .toDF("id", "text")
    val sigs = df
      .select($"id", Dedup.simHash($"text", 28, 2).as("sig"))
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("simHash: 60-bit signatures use the high nibbles") {
    val df = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("id", "text")
    val (s28, s60) = df.select(
      Dedup.simHash($"text", 28, 2).as("a"),
      Dedup.simHash($"text", 60, 2).as("b"))
      .as[(Long, Long)].head()
    assert(s60 != s28) // different nibble base → different bit values
    assert(s60 >= 0L && s60 < (1L << 60))
  }

  test("simHashPairs: identical docs matched, unrelated docs not") {
    val pairs = Dedup
      .simHashPairs(docs, "text", "id", bits = 28, maxHamming = 2, ngram = 2)
      .select($"id_a", $"id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simHashPairs: maxBucket drops degenerate chunk buckets") {
    // 30 identical docs: every chunk bucket holds all 30 signatures.
    val clones = (1L to 30L).map(i => (i, "the same boilerplate text again and again"))
      .toDF("id", "text")
    val uncapped = Dedup
      .simHashPairs(clones, "text", "id", bits = 28, maxHamming = 1)
      .count()
    val capped = Dedup
      .simHashPairs(clones, "text", "id", bits = 28, maxHamming = 1, maxBucket = 10)
      .count()
    assert(uncapped == 30L * 29 / 2)
    assert(capped == 0L)
  }

  test("simHashPairs defaults (bits=48, maxBucket=1000): scale config still finds near-dups") {
    // defaults are the at-scale configuration; verify the 48-bit
    // chunk-blocked path end-to-end with no explicit overrides
    val pairs = Dedup
      .simHashPairs(docs, "text", "id", maxHamming = 2, ngram = 2)
      .select($"id_a", $"id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
    // 48-bit signatures genuinely use the upper bit range
    val sigs = docs.select(Dedup.simHash($"text").as("sig")).as[Long].collect()
    assert(sigs.forall(s => s >= 0L && s < (1L << 48)))
    assert(sigs.exists(_ >= (1L << 28)))
  }

  test("fast family: hashed-long verification matches the md5 family exactly") {
    val md5Pairs = Dedup.minHashLshPairs(docs, "text", "id")
      .as[(Long, Long, Double)].collect().toSet
    val fastPairs = Dedup.minHashLshPairs(docs, "text", "id", fast = true)
      .as[(Long, Long, Double)].collect().toSet
    // same candidate semantics, same jaccard values: hashing the
    // shingles to longs preserves set cardinalities
    assert(fastPairs == md5Pairs)
    assert(md5Pairs.map(p => (p._1, p._2)).contains((1L, 2L)))
  }

  test("jaccardSimLong: merge-count equals the string-set kernel") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d", "e"))).toDF("x", "y")
    val s = df.select(Dedup.jaccardSim($"x", $"y")).as[Double].head()
    val l = df.select(Dedup.jaccardSimLong(
      transform($"x", xxhash64(_)), transform($"y", xxhash64(_)))).as[Double].head()
    assert(s == l && s == 2.0 / 5.0)
  }

  test("minHashLshPairs: maxBucket (window-count path) drops degenerate band buckets") {
    // 25 identical docs: both band buckets hold all 25 ids.
    val clones = (1L to 25L).map(i => (i, "identical boilerplate body for every clone row"))
      .toDF("id", "text")
    val uncapped = Dedup.minHashLshPairs(clones, "text", "id").count()
    val capped = Dedup.minHashLshPairs(clones, "text", "id", maxBucket = 10).count()
    assert(uncapped == 25L * 24 / 2)
    assert(capped == 0L)
    // cap above the bucket size changes nothing
    val roomy = Dedup.minHashLshPairs(clones, "text", "id", maxBucket = 100).count()
    assert(roomy == uncapped)
  }

  test("duplicateClustersStar: identical components to min-label propagation") {
    val rnd = new scala.util.Random(42)
    val fixtures = Seq(
      // long chain: diameter stresses both algorithms
      (0L until 60L).sliding(2).map(w => (w(0), w(1))).toSeq,
      // star with the max id at the centre
      (0L until 20L).map(i => (99L, i)),
      // two cliques bridged by one edge
      (for (a <- 0L until 8L; b <- 0L until 8L if a < b) yield (a, b)) ++
        (for (a <- 100L until 108L; b <- 100L until 108L if a < b) yield (a, b)) ++
        Seq((7L, 100L)),
      // random graph
      (1 to 80).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b })
    fixtures.zipWithIndex.foreach { case (edges, i) =>
      val pairs = edges.toDF("id_a", "id_b")
      val want = Dedup.duplicateClusters(pairs)
        .as[(Long, Long)].collect().toMap
      val got = Dedup.duplicateClustersStar(pairs)
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"fixture $i")
    }
  }

  test("minHashLshDedup: end-to-end keeps one representative per dup cluster") {
    val kept = Dedup.minHashLshDedup(docs, "text", "id")
      .select($"id").as[Long].collect().sorted.toSeq
    // 1 and 2 are exact dups → keep 1; 3 and 4 unique enough to survive
    assert(kept.contains(1L) && !kept.contains(2L) && kept.contains(4L))
  }

  test("one-call wrappers default to the star components and agree with the fixpoint") {
    // the convenience paths must ride the diameter-bounded star CC by
    // default; both component implementations label identically, so
    // the mode flag can never change the result
    val starKept = Dedup.minHashLshDedup(docs, "text", "id")
      .select($"id").as[Long].collect().sorted.toSeq
    val fixKept = Dedup.minHashLshDedup(docs, "text", "id", star = false)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(starKept == fixKept && starKept.nonEmpty)
    val df = Seq((1L, 10.0), (2L, 30.0), (3L, 20.0), (7L, 5.0), (9L, 5.0))
      .toDF("id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val a = Dedup.dropNearDuplicatesBy(df, pairs, "id", $"quality")
      .select($"id").as[Long].collect().sorted.toSeq
    val b = Dedup.dropNearDuplicatesBy(df, pairs, "id", $"quality", star = false)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(a == b && a == Seq(2L, 7L))
  }

  test("containmentPairs: finds the quote Jaccard misses; prefix filter loses nothing") {
    val big = (1 to 20).map(i => s"w$i").mkString(" ")    // 18 shingles
    val quote = (1 to 8).map(i => s"w$i").mkString(" ")   // 6 shingles, all in big
    val other = (100 to 120).map(i => s"x$i").mkString(" ")
    val df = Seq((1L, big), (2L, quote), (3L, other), (4L, ""))
      .toDF("id", "text")
    val out = Dedup.containmentPairs(df, "text", "id", n = 3, threshold = 0.9)
      .as[(Long, Long, Double, Long)].collect()
    assert(out.toSeq == Seq((1L, 2L, 1.0, 2L)))
    // the same pair under Jaccard: 6/18 = 0.33 — below any sane
    // near-dup threshold; containment is the operator that sees it
    val jac = Dedup.ngramJaccardPairs(df.where($"id" <= 2), "text", "id",
      n = 3, threshold = 0.5, allowBruteForce = true).count()
    assert(jac == 0)
    // prefix filtering vs exhaustive verification: identical results
    // on a corpus with overlapping chunks
    val docs2 = (0 until 30).map { i =>
      val words = (i until i + 12).map(j => s"t${j % 17}")
      (i.toLong, words.mkString(" "))
    }.toDF("id", "text")
    val fast = Dedup.containmentPairs(docs2, "text", "id", n = 3, threshold = 0.6)
      .as[(Long, Long, Double, Long)].collect().toSet
    // exhaustive reference: verify every pair
    val sets = (0 until 30).map { i =>
      val words = (i until i + 12).map(j => s"t${j % 17}")
      i.toLong -> words.sliding(3).map(_.mkString(" ")).toSet
    }.toMap
    val brute = (for {
      a <- 0L until 30L; b <- (a + 1) until 30L
      inter = (sets(a) & sets(b)).size
      c = inter.toDouble / math.min(sets(a).size, sets(b).size)
      if BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble >= 0.6
    } yield (a, b)).toSet
    assert(fast.map(p => (p._1, p._2)) == brute,
      s"fast ${fast.size} vs brute ${brute.size}")
    // determinism under repartitioning
    val again = Dedup.containmentPairs(docs2.repartition(7), "text", "id",
      n = 3, threshold = 0.6).as[(Long, Long, Double, Long)].collect().toSet
    assert(again == fast)
  }

  test("containmentPairs: verifyFiltered scores over the same df-capped sets as candidacy") {
    // df("common") = 5 > maxShingleDocs = 3 → dropped from index AND
    // probe; "x" (df 2) survives and links docs 1-2. Default scoring
    // counts the stop-shingle ({x,common}∩ / min-size-3 = 0.6667);
    // verifyFiltered scores the capped sets ({x}∩ / min-size-2 = 0.5)
    // so recall guarantee and score semantics agree.
    val docs5 = Seq(
      (1L, "x common p"),
      (2L, "x common z w"),
      (3L, "common c1 c2"),
      (4L, "common d1 d2"),
      (5L, "common e1 e2")).toDF("id", "text")
    val unf = Dedup.containmentPairs(docs5, "text", "id", n = 1,
      threshold = 0.5, maxShingleDocs = 3)
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(unf == Seq((1L, 2L, 0.6667, 1L)))
    val filt = Dedup.containmentPairs(docs5, "text", "id", n = 1,
      threshold = 0.5, maxShingleDocs = 3, verifyFiltered = true)
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(filt == Seq((1L, 2L, 0.5, 1L)))
  }

  test("dropNearDuplicates: removes the larger id of each pair") {
    val pairs = Seq((1L, 2L, 1.0)).toDF("id_a", "id_b", "jaccard")
    val kept = Dedup.dropNearDuplicates(docs, pairs, "id")
      .select($"id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L, 4L))
  }

  test("dropNearDuplicatesBy: keeps the best-ranked row per cluster; singletons survive") {
    // cluster {1,2,3} via chain; {7,9}; 4 and 5 untouched
    val df = Seq(
      (1L, 10.0), (2L, 30.0), (3L, 20.0),
      (4L, 1.0), (5L, 99.0),
      (7L, 5.0), (9L, 5.0)).toDF("id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val best = Dedup.dropNearDuplicatesBy(df, pairs, "id", $"quality")
      .select($"id").as[Long].collect().sorted.toSeq
    // {1,2,3} -> 2 (max quality); {7,9} -> 7 (tie, smaller id); singletons kept
    assert(best == Seq(2L, 4L, 5L, 7L))
    val worst = Dedup.dropNearDuplicatesBy(df, pairs, "id", $"quality", keepHighest = false)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(worst == Seq(1L, 4L, 5L, 7L))
    // per-cluster argmax pre-prunes map-side (WindowGroupLimit)
    val plan = Dedup.dropNearDuplicatesBy(df, pairs, "id", $"quality")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("duplicateClusters: min-label propagation over pair chains") {
    // chain 1-2, 2-3 plus isolated pair 7-9: clusters {1,2,3}->1, {7,9}->7
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val labels = Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("duplicateClusters: long chain converges to the global min") {
    val pairs = (1L until 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.duplicateClusters(pairs).as[(Long, Long)].collect().toMap
    assert(labels.values.toSet == Set(1L))
    assert(labels.keySet == (1L to 8L).toSet)
  }

  test("ngramJaccardPairs: unblocked all-pairs baseline requires explicit opt-in") {
    val tiny = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "x y z w")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPairs(tiny, "text", "id", n = 2)
    }
    val pairs = Dedup
      .ngramJaccardPairs(tiny, "text", "id", n = 2, allowBruteForce = true)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("ngramJaccardPairs: blocked pairs above threshold") {
    val blocked = docs.withColumn("blk", lit(1))
    val pairs = Dedup
      .ngramJaccardPairs(blocked, "text", "id", n = 3, threshold = 0.5, blockBy = Seq("blk"))
      .select($"id_a", $"id_b", $"jaccard")
      .as[(Long, Long, Double)]
      .collect()
    val byPair = pairs.map { case (a, b, j) => (a, b) -> j }.toMap
    assert(byPair((1L, 2L)) == 1.0)
    assert(byPair.contains((1L, 3L))) // one-word difference, high n-gram overlap
    assert(!byPair.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("hammingPairs64: chunk-blocked pairing, exact distances, caps and nulls") {
    // codes: a == b (hamming 0), c = a with 1 low bit flipped,
    // d = a with 3 bits flipped (beyond maxHamming=2),
    // e = far from everything, f = null (undecodable)
    val codes = Seq(
      (1L, "00000000000000ff"), // a
      (2L, "00000000000000ff"), // b == a
      (3L, "00000000000000fe"), // c: 1 bit from a
      (4L, "00000000000000f8"), // d: 3 bits from a (f8 vs ff)
      (5L, "ffffffff00000000"), // e: far
      (6L, null.asInstanceOf[String])).toDF("id", "code")
    val pairs = Dedup.hammingPairs64(codes, "code", "id", maxHamming = 2)
      .as[(Long, Long, Int)].collect().toSet
    // ff↔fe = 1 bit, ff↔f8 = 3 bits (excluded), fe↔f8 = 2 bits
    assert(pairs == Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1), (3L, 4L, 2)))
    // maxHamming=3 admits d's remaining pairs too
    val p3 = Dedup.hammingPairs64(codes, "code", "id", maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(p3 == pairs ++ Set((1L, 4L, 3), (2L, 4L, 3)))
    // degenerate-bucket cap: many identical codes beyond the cap are
    // dropped rather than exploding into O(k^2) pairs
    val flood = (1 to 50).map(i => (i.toLong, "0000000000000001")).toDF("id", "code")
    assert(Dedup.hammingPairs64(flood, "code", "id", maxBucket = 10).count() == 0)
    assert(Dedup.hammingPairs64(flood, "code", "id", maxBucket = 0).count() == 50L * 49 / 2)
    // pigeonhole recall guarantee: ANY 2-bit perturbation of a base
    // code is always found (bits spread across halves included)
    val base = java.lang.Long.parseUnsignedLong("123456789abcdef0", 16)
    val perturbed = Seq(0, 17, 33, 48, 63).combinations(2).zipWithIndex.map {
      case (bits, i) =>
        val v = bits.foldLeft(base)((acc, b) => acc ^ (1L << b))
        (100L + i, f"$v%016x")
    }.toSeq :+ (99L, f"$base%016x")
    val found = Dedup.hammingPairs64(perturbed.toDF("id", "code"), "code", "id",
      maxHamming = 2).where($"id_a" === 99L || $"id_b" === 99L).count()
    assert(found == 10, s"pigeonhole recall: $found of 10")
  }

  test("alignedSignaturePairs: positioned matches, frac over the longer side, cap") {
    // A/B: 4 frames, 3 equal at the same position + one mismatch ->
    // 0.75; C: A's signatures SHUFFLED in position -> no pair (the
    // temporal-alignment contract); D: 2-frame clip = A's prefix ->
    // frac 2/4 = 0.5 over the LONGER side (boundary kept)
    val sigs = Seq(
      ("A", 0L, "h0"), ("A", 1L, "h1"), ("A", 2L, "h2"), ("A", 3L, "h3"),
      ("B", 0L, "h0"), ("B", 1L, "h1"), ("B", 2L, "h2"), ("B", 3L, "hX"),
      ("C", 0L, "h1"), ("C", 1L, "h2"), ("C", 2L, "h3"), ("C", 3L, "h0"),
      ("D", 0L, "h0"), ("D", 1L, "h1"),
      ("E", 0L, null.asInstanceOf[String]))
      .toDF("vid", "f", "sig")
    val out = Dedup.alignedSignaturePairs(sigs, "vid", "f", "sig", 0.5)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out.keySet == Set(("A", "B"), ("A", "D"), ("B", "D")))
    assert(out(("A", "B")) == ("A", "B", 4L, 4L, 3L, 0.75))
    assert(out(("A", "D")) == ("A", "D", 4L, 2L, 2L, 0.5), "frac over the longer side")
    // raise the threshold past the boundary: only A-B survives
    val strict = Dedup.alignedSignaturePairs(sigs, "vid", "f", "sig", 0.6)
      .select($"id_a", $"id_b").as[(String, String)].collect().toSet
    assert(strict == Set(("A", "B")))
    // degenerate bucket (one signature shared by 50 videos at pos 0)
    // is dropped wholesale under the cap
    val flood = (1 to 50).flatMap(i => Seq((s"v$i", 0L, "same"), (s"v$i", 1L, s"u$i")))
      .toDF("vid", "f", "sig")
    assert(Dedup.alignedSignaturePairs(flood, "vid", "f", "sig", 0.5, maxBucket = 10)
      .count() == 0)
    intercept[IllegalArgumentException] {
      Dedup.alignedSignaturePairs(sigs, "vid", "f", "sig", 0.0)
    }
  }

  test("minHashEstimatePairs: clones estimate 1.0; estimate = matching fraction") {
    import org.apache.spark.sql.functions.col
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base),
      (2L, base),                                  // exact clone of 1
      (3L, base + " with a small tail change"),    // near-dup of 1
      (4L, "completely different content that shares nothing at all xyzzy"))
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup
      .minHashEstimatePairs(docs, "text", "doc_id", shingleK = 5,
        numHashes = 8, bands = 2)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // exact clones: every component matches, exact jaccard 1.0, no error
    assert(out((1L, 2L)) == ((1.0, 1.0, 0.0)))
    // every pair's estimate is a multiple of 1/8 in [0, 1], and the
    // error column is |est - exact| rounded
    out.values.foreach { case (est, jac, err) =>
      assert(est >= 0.0 && est <= 1.0 && (est * 8) == math.round(est * 8).toDouble)
      assert(math.abs(err - BigDecimal(math.abs(est - jac))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
    // independent recomputation of every pair's estimate from the
    // public signature primitive
    val sigs = docs
      .select(col("doc_id"), graft.operators.Dedup.minHashSignature(
        graft.operators.Dedup.charShingles(col("text"), 5), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    out.foreach { case ((a, b), (est, _, _)) =>
      val matches = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }
      assert(est == matches.toDouble / 8, s"pair ($a,$b)")
    }
    // bands=8 (one row per band): ANY matching component makes a
    // candidate, so the near-dup pair (1,3) must surface too
    val loose = graft.operators.Dedup
      .minHashEstimatePairs(docs, "text", "doc_id", shingleK = 5,
        numHashes = 8, bands = 8)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val matches13 = sigs(1L).zip(sigs(3L)).count { case (x, y) => x == y }
    if (matches13 > 0) assert(loose((1L, 3L)) == matches13.toDouble / 8)
  }

  test("lshPlan: the MMDS s-curve arithmetic, ordering, and extremes") {
    val plans = graft.operators.Dedup.lshPlan(128, target = 0.8, nuisance = 0.3)
    // every divisor split enumerated, bands * rows == numHashes
    assert(plans.map(_.bands).sorted ==
      (1 to 128).filter(128 % _ == 0).sorted)
    assert(plans.forall(p => p.bands * p.rows == 128))
    // hand-check one banding: b=16, r=8 at s: 1 - (1 - s^8)^16
    val p16 = plans.find(_.bands == 16).get
    def collide(s: Double) = 1.0 - math.pow(1.0 - math.pow(s, 8.0), 16.0)
    assert(math.abs(p16.fnAtTarget - (1.0 - collide(0.8))) < 1e-12)
    assert(math.abs(p16.fpAtLow - collide(0.3)) < 1e-12)
    assert(math.abs(collide(p16.threshold50) - 0.5) < 1e-9)
    // sorted best-first by fn + fp
    val scores = plans.map(p => p.fnAtTarget + p.fpAtLow)
    assert(scores == scores.sorted)
    // extremes are bad plans: one band of 128 rows misses nearly
    // everything at 0.8; 128 bands of 1 row floods candidates at 0.3
    assert(plans.find(_.bands == 1).get.fnAtTarget > 0.9)
    assert(plans.find(_.bands == 128).get.fpAtLow > 0.9)
    // the winner actually separates: catches 0.8s, starves 0.3s
    assert(plans.head.fnAtTarget < 0.1 && plans.head.fpAtLow < 0.1)
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.lshPlan(128, target = 0.5, nuisance = 0.6)
    }
  }
}
