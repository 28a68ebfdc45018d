package graft.operators

import graft.functions.{ChunkMinHash, JaccardSim, JaccardSimLong, SimHash => SimHashExpr, CharShingles => CharShinglesExpr, WordNgrams}
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines: exact,
  * MinHash+LSH (Broder, "On the resemblance and containment of
  * documents", 1997; banding per Leskovec/Rajaraman/Ullman, Mining of
  * Massive Datasets ch. 3), SimHash (Charikar, "Similarity estimation
  * techniques from rounding algorithms", STOC 2002; Hamming-chunk
  * blocking per Manku et al., "Detecting near-duplicates for web
  * crawling", WWW 2007), n-gram Jaccard.
  *
  * Scale posture: every near-dup operator is LSH-first — candidate
  * pairs come from equality joins on band/bucket keys (shuffle rows
  * O(n·bands), never O(n²)); expensive verification (Jaccard /
  * Hamming) runs only inside buckets. Two hash families are provided:
  *
  *  - `md5`-string variants: portable bit-for-bit across engines
  *    (used by the DuckDB-oracle-checked queries);
  *  - `xxhash64` variants (`*Fast`): ~an order of magnitude cheaper
  *    per shingle, the ones to use at 100 TB.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup: keep the row with the smallest `keepCol` per
    * distinct combination of `cols`. One hash-shuffle on the md5 of
    * the content columns (tiny keys, not full text, on the wire).
    */
  /** Content key: single column hashes directly; multiple columns
    * hash their JSON struct encoding, which preserves column
    * boundaries and nulls (concat_ws would skip null columns,
    * conflating ("a", null) with ("a")).
    */
  private[graft] def contentKey(cols: Seq[String]): Column =
    if (cols.sizeIs == 1) md5(col(cols.head))
    else md5(to_json(struct(cols.map(col): _*)))

  def exact(df: DataFrame, cols: Seq[String], keepCol: String): DataFrame = {
    val w = Window.partitionBy(contentKey(cols)).orderBy(col(keepCol))
    val rn = graft.Cols.unique("__rn", df)
    df.withColumn(rn, row_number().over(w))
      .where(col(rn) === 1)
      .drop(rn)
  }

  /** Exact-dup group stats: (kept id, group size) per distinct
    * content — the aggregate view of [[exact]].
    */
  def exactStats(df: DataFrame, cols: Seq[String], idCol: String): DataFrame =
    df.groupBy(contentKey(cols).as("content_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  // -------------------------------------------------------------- minhash

  /** MinHash signature as `numHashes` lexicographic minima of
    * md5(shingle + seed) — min-wise hashing over the md5 string
    * order. Portable across engines (md5 is standardized).
    */
  def minHashSignature(shingleArr: Column, numHashes: Int): Column =
    array((0 until numHashes).map { h =>
      array_min(transform(shingleArr, s => md5(concat_ws("#", s, lit(h)))))
    }: _*)

  /** The h-th chunk minhash over a PRE-HASHED shingle array (each
    * element a 32-hex-char md5): hash function h = hex chars
    * [4h+1, 4h+4] of the digest, so up to 8 independent 16-bit hash
    * functions come from ONE md5 per shingle. An order of magnitude
    * cheaper than seeded re-hashing; identical banding quality (the
    * LSH only needs hash-family independence, and verification is
    * exact-Jaccard anyway).
    */
  def chunkMin(md5Arr: Column, h: Int): Column =
    array_min(transform(md5Arr, x => substring(x, h * 4 + 1, 4)))

  /** Native one-pass chunk minhash: all `numHashes` minima from one
    * md5 per token (see [[graft.functions.ChunkMinHash]]).
    */
  def chunkMinsNative(tokens: Column, numHashes: Int): Column =
    GraftSqlBridge.column(
      ChunkMinHash(GraftSqlBridge.expression(tokens), numHashes))

  /** Native Jaccard of two distinct string arrays — the value of
    * `size(array_intersect)/size(array_union)` as a tight hash-set
    * loop.
    */
  def jaccardSim(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      JaccardSim(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Native Jaccard of two distinct LONG arrays (hashed feature sets,
    * the `fast` family's verification payload) — sort + merge-count,
    * no boxing.
    */
  def jaccardSimLong(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      JaccardSimLong(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** MinHash signature via xxhash64 — the cheap hash for real scale
    * (not DuckDB-portable; verified by ScalaTest instead).
    */
  def minHashSignatureFast(shingleArr: Column, numHashes: Int): Column =
    array((0 until numHashes).map { h =>
      array_min(transform(shingleArr, s => xxhash64(s, lit(h))))
    }: _*)

  /** One candidate banding plan: with `bands` bands of `rows` hashes,
    * a pair at Jaccard s collides with probability
    * 1 − (1 − s^rows)^bands; `threshold50` is the s where that curve
    * crosses 0.5 (≈ (1/bands)^(1/rows)), `fnAtTarget`/`fpAtLow` the
    * miss rate at the caller's target similarity and the false-
    * candidate rate at the nuisance similarity.
    */
  case class LshPlan(
      bands: Int,
      rows: Int,
      threshold50: Double,
      fnAtTarget: Double,
      fpAtLow: Double)

  /** Driver-side LSH parameter planner — answers "how many bands for
    * THIS dedup?" before anyone burns a cluster run finding out the
    * s-curve was in the wrong place (the standard MMDS §3.4 analysis,
    * done for you). Enumerates every divisor split of `numHashes`,
    * scores each banding's collision curve at the target and
    * nuisance similarities, and returns the plans sorted by
    * fn + fp (best first). Pure arithmetic, no Spark job —
    * feed the winner's `bands` straight into [[bandKeys]] /
    * [[minhashPairs]].
    *
    * @param target   similarity the dedup MUST catch (fn scored here)
    * @param nuisance similarity it must NOT flood candidates with
    */
  def lshPlan(
      numHashes: Int,
      target: Double,
      nuisance: Double): Seq[LshPlan] = {
    require(numHashes >= 2, "need at least 2 hashes")
    require(target > 0 && target < 1, "target must be in (0, 1)")
    require(nuisance >= 0 && nuisance < target,
      "nuisance must be in [0, target)")
    def collide(s: Double, bands: Int, rows: Int): Double =
      1.0 - math.pow(1.0 - math.pow(s, rows.toDouble), bands.toDouble)
    (1 to numHashes)
      .filter(numHashes % _ == 0)
      .map { bands =>
        val rows = numHashes / bands
        LshPlan(
          bands, rows,
          threshold50 = math.pow(1.0 - math.pow(0.5, 1.0 / bands), 1.0 / rows),
          fnAtTarget = 1.0 - collide(target, bands, rows),
          fpAtLow = collide(nuisance, bands, rows))
      }
      .sortBy(p => p.fnAtTarget + p.fpAtLow)
  }

  /** LSH band keys from a signature: `bands` hashes, each over
    * `numHashes / bands` consecutive signature entries.
    */
  def bandKeys(sig: Column, numHashes: Int, bands: Int): Column = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    array((0 until bands).map { b =>
      md5(concat_ws("|", (0 until rows).map(r => element_at(sig, b * rows + r + 1)): _*))
    }: _*)
  }

  /** Near-duplicate pairs via MinHash+LSH, verified with exact
    * shingle-set Jaccard.
    *
    * Two-pass plan, sized for a corpus where shingle sets are ~5× the
    * text volume and bands multiply that again:
    *
    *  1. CANDIDATES — shingle+hash+sign each doc once (each expensive
    *     expression staged as a real column), explode band keys, and
    *     shuffle ONLY (id, band key) rows into buckets; emit
    *     within-bucket id pairs (two nested explodes, never a
    *     self-join) and `distinct` them so cross-band duplicates are
    *     verified once. Shuffle volume: O(n·bands) id-sized rows —
    *     shingle payloads never reach the wire.
    *  2. VERIFY — join the (tiny relative to the corpus) pair list
    *     back to the source, recompute shingle sets for candidate
    *     rows only (the projection sits ABOVE the join, so only
    *     joined rows pay the kernel), and run the exact Jaccard.
    *     Spark's runtime bloom-filter / broadcast join keeps the
    *     probe-side shuffle at candidate volume.
    *
    * Detection probability of a pair with Jaccard J is
    * 1 - (1 - J^(numHashes/bands))^bands — tune bands DOWN (longer
    * bands) when the corpus has high baseline similarity, or the
    * candidate volume explodes (E[candidates] ∝ n²·E[J^rows]).
    *
    * `maxBucket` drops band buckets larger than the cap (0 = no cap):
    * at 100 TB a bucket with thousands of members is a degenerate
    * shingle pattern, not a useful near-dup signal, and its K² pair
    * blow-up dominates the job.
    *
    * Ids must be unique (the verification join fans out otherwise).
    * The source lineage is computed twice (candidates + verify) — a
    * caller whose `df` is an expensive derivation should persist it
    * first; for a plain scan the second pass is a column-pruned read.
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minHashLshPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleK: Int = 5,
      numHashes: Int = 8,
      bands: Int = 2,
      jaccardThreshold: Double = 0.5,
      fast: Boolean = false,
      maxBucket: Int = 0): DataFrame = {
    val src = Parallelism.spread(df)
    verifyCandidates(
      candidatePairs(
        bandedSignatures(src, textCol, idCol, shingleK, numHashes, bands, fast),
        jaccardThreshold, maxBucket),
      src, textCol, idCol, shingleK, jaccardThreshold, fast)
  }

  /** The banded signature rows of [[minHashLshPairs]]'s candidate
    * pass: (`__id`, `__sz` shingle-set size, `__bpos` band index,
    * `__bkey` band key) — one row per (doc, band), id-sized.
    */
  private[operators] def bandedSignatures(
      src: DataFrame,
      textCol: String,
      idCol: String,
      shingleK: Int,
      numHashes: Int,
      bands: Int,
      fast: Boolean): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    require(fast || numHashes <= 8, "portable (md5-chunk) minhash supports ≤ 8 hashes")
    val shingled = src.select(col(idCol).as("__id"),
      charShingles(col(textCol), shingleK).as("__sh"))
    val minned =
      if (fast)
        shingled.withColumn("__mins",
          array((0 until numHashes).map(h =>
            array_min(transform(col("__sh"), s => xxhash64(s, lit(h)))).cast("string")): _*))
      else
        shingled.withColumn("__mins", chunkMinsNative(col("__sh"), numHashes))
    minned.select(col("__id"), size(col("__sh")).as("__sz"),
      posexplode(bandKeys(col("__mins"), numHashes, bands))
        .as(Seq("__bpos", "__bkey")))
  }

  /** Candidates carry their set SIZE (one int) so two prunes run
    * BEFORE any set payload moves: `distinct` collapses cross-band
    * duplicates, and the size-ratio prefilter (jaccard ≤ min/max of
    * the sizes — result-preserving) drops size-skewed pairs. On a
    * duplicate-heavy corpus the candidate list is the big list, so
    * pruning it while it is still id-sized is what keeps the
    * verification shuffle at true-candidate volume.
    */
  private def candidatePairs(
      exploded: DataFrame,
      jaccardThreshold: Double,
      maxBucket: Int): DataFrame =
    bucketPairs(exploded, struct(col("__id"), col("__sz")), maxBucket)
      .where(col("__a.__id") < col("__b.__id"))
      .select(
        col("__a.__id").as("id_a"), col("__a.__sz").as("__sza"),
        col("__b.__id").as("id_b"), col("__b.__sz").as("__szb"))
      .where(
        least(col("__sza"), col("__szb")).cast("double") >=
          lit(jaccardThreshold) * greatest(col("__sza"), col("__szb")))
      .select(col("id_a"), col("id_b"))
      .distinct()

  private def verifyCandidates(
      cands: DataFrame,
      src: DataFrame,
      textCol: String,
      idCol: String,
      shingleK: Int,
      jaccardThreshold: Double,
      fast: Boolean): DataFrame = {
    // fast family: verification sets are xxhash64-hashed longs — same
    // cardinalities, so identical jaccard values (modulo 64-bit hash
    // collisions), at ~3× less payload through the attach joins and a
    // boxing-free merge-count intersection.
    val mkSet: Column => Column =
      if (fast) c => transform(charShingles(c, shingleK), xxhash64(_))
      else charShingles(_, shingleK)
    // prefilter = false: candidatePairs already applied the size-ratio
    // prune on the exact same |shingle set| values.
    jaccardVerify(
      attachSets(cands, src, idCol, textCol, mkSet),
      jaccardThreshold,
      if (fast) jaccardSimLong else jaccardSim,
      sizePrefilter = false)
  }

  /** Persist the banded signature rows as a catalog table bucketed
    * (and sorted) by the band grouping keys. Signature computation is
    * the full-corpus pass of the dedup pipeline; repeated or
    * incremental dedup over the same snapshot — re-tuned thresholds,
    * different caps, downstream [[duplicateClusters]] runs — then
    * regenerates candidates SHUFFLE-FREE: the bucketed scan already
    * satisfies the (`__bpos`, `__bkey`) clustering that
    * `bucketPairs`'s aggregation needs.
    */
  def writeMinHashSignatures(
      df: DataFrame,
      textCol: String,
      idCol: String,
      table: String,
      shingleK: Int = 5,
      numHashes: Int = 8,
      bands: Int = 2,
      fast: Boolean = false,
      numBuckets: Int = 64): Unit = {
    ManagedTables.dropAndClearOrphan(df.sparkSession, table)
    graft.sources.Bucketing.clusterForBuckets(
      bandedSignatures(Parallelism.spread(df), textCol, idCol,
        shingleK, numHashes, bands, fast),
      Seq("__bpos", "__bkey"), numBuckets)
      .write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, "__bpos", "__bkey")
      .sortBy("__bpos", "__bkey")
      .saveAsTable(table)
    // Self-describing signatures (same discipline as writeIvfIndex):
    // the build parameters ride in the table properties so read paths
    // can fail fast instead of silently verifying with a mismatched
    // shingle size or hashing family.
    df.sparkSession.sql(
      s"ALTER TABLE `$table` SET TBLPROPERTIES (" +
        s"'graft.minhash.shingleK' = '$shingleK', " +
        s"'graft.minhash.numHashes' = '$numHashes', " +
        s"'graft.minhash.bands' = '$bands', " +
        s"'graft.minhash.fast' = '$fast', " +
        s"'graft.minhash.numBuckets' = '$numBuckets')")
  }

  /** Append a new batch's signatures to an existing signature table,
    * with every build parameter (including the bucket spec) read from
    * the table's own properties — the growth step of an incremental
    * dedup pipeline: after [[minHashLshPairsIncremental]] filters a
    * batch against history, appending the survivors' signatures makes
    * them part of the history the NEXT batch dedups against. Each
    * append writes its own bucketed files; the table's clustering
    * contract is preserved, so candidate generation stays
    * shuffle-free on the history side.
    */
  def appendMinHashSignatures(
      df: DataFrame,
      textCol: String,
      idCol: String,
      table: String): Unit = {
    val spark = df.sparkSession
    val m = readMinHashSignatureMeta(spark, table).getOrElse(
      throw new IllegalArgumentException(
        s"appendMinHashSignatures: `$table` records no graft.minhash.* " +
          "table properties — create it with writeMinHashSignatures"))
    graft.sources.Bucketing.clusterForBuckets(
      bandedSignatures(Parallelism.spread(df), textCol, idCol,
        m.shingleK, m.numHashes, m.bands, m.fast),
      Seq("__bpos", "__bkey"), m.numBuckets)
      .write.mode("append").format("parquet")
      .bucketBy(m.numBuckets, "__bpos", "__bkey")
      .sortBy("__bpos", "__bkey")
      .saveAsTable(table)
  }

  /** Compact a signature table in place: collapse exactly-duplicated
    * rows (the growth left behind by replayed appends — a recovered
    * [[graft.streaming.StreamDedup.incrementalToParquet]] micro-batch
    * re-appends its signature rows) while preserving the bucket spec,
    * the sort order, and every `graft.*` table property.
    *
    * Safe rewrite shape: the distinct rows land in a sibling bucketed
    * table first, properties are copied, and only then is the
    * original dropped and the sibling renamed over it — the source is
    * never read-and-overwritten in one job, and a crash mid-compact
    * leaves either the original or a complete sibling, never a
    * half-written table. The distinct is bucket-local-able (the scan
    * is already clustered by the bucket keys) and the rewrite
    * re-buckets with the SAME spec, so repeat dedup stays
    * candidate-shuffle-free afterwards.
    */
  def compactMinHashSignatures(
      spark: org.apache.spark.sql.SparkSession,
      table: String): Unit = {
    val m = readMinHashSignatureMeta(spark, table).getOrElse(
      throw new IllegalArgumentException(
        s"compactMinHashSignatures: `$table` records no graft.minhash.* " +
          "table properties — not a graft signature table"))
    ManagedTables.rewriteBucketed(spark, table,
      spark.table(table).distinct(), m.numBuckets, Seq("__bpos", "__bkey"))
  }

  /** Build parameters recorded by [[writeMinHashSignatures]], or None
    * for a table without them (not a graft signature table, or built
    * before the properties existed).
    */
  def readMinHashSignatureMeta(
      spark: org.apache.spark.sql.SparkSession,
      table: String): Option[MinHashSignatureMeta] = {
    val props = spark.sql(s"SHOW TBLPROPERTIES `$table`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // numBuckets is as load-bearing as the hash parameters: guessing a
    // default here would let appendMinHashSignatures write files
    // bucketed with the WRONG spec into the table, silently corrupting
    // the shuffle-free clustering contract. Missing ⇒ None, like the
    // other properties.
    for {
      k <- props.get("graft.minhash.shingleK")
      h <- props.get("graft.minhash.numHashes")
      b <- props.get("graft.minhash.bands")
      f <- props.get("graft.minhash.fast")
      nb <- props.get("graft.minhash.numBuckets")
    } yield MinHashSignatureMeta(k.toInt, h.toInt, b.toInt, f.toBoolean, nb.toInt)
  }

  /** Build parameters of a persisted signature table (see
    * [[writeMinHashSignatures]]).
    */
  case class MinHashSignatureMeta(
      shingleK: Int, numHashes: Int, bands: Int, fast: Boolean, numBuckets: Int)

  /** [[minHashLshPairs]] over a pre-bucketed signature table (see
    * [[writeMinHashSignatures]]): skips the signature pass AND the
    * candidate shuffle; only the (candidate-volume) verification
    * touches `df`, which must be the same corpus the table was built
    * from, with the same `shingleK` (the verification recomputes
    * shingle sets from text).
    */
  def minHashLshPairsFromSignatures(
      df: DataFrame,
      sigTable: String,
      textCol: String,
      idCol: String,
      shingleK: Int = 5,
      jaccardThreshold: Double = 0.5,
      fast: Boolean = false,
      maxBucket: Int = 0): DataFrame = {
    readMinHashSignatureMeta(df.sparkSession, sigTable).foreach { m =>
      require(m.shingleK == shingleK && m.fast == fast,
        s"minHashLshPairsFromSignatures: caller (shingleK=$shingleK, " +
          s"fast=$fast) != (shingleK=${m.shingleK}, fast=${m.fast}) recorded " +
          s"in `$sigTable` table properties — verification would recompute " +
          "different sets")
    }
    val exploded = df.sparkSession.table(sigTable)
    verifyCandidates(
      candidatePairs(exploded, jaccardThreshold, maxBucket),
      Parallelism.spread(df), textCol, idCol, shingleK, jaccardThreshold, fast)
  }

  /** Incremental dedup: near-dup pairs between a NEW batch and an
    * already-signed corpus (see [[writeMinHashSignatures]]) — the
    * daily-crawl-vs-history shape. Only the new batch pays the
    * signature pass; candidates come from joining its band rows
    * against the bucketed signature table, whose clustering already
    * satisfies the join — the indexed corpus never shuffles, and at
    * a 100 TB history that is the whole game. Build parameters
    * (shingle size, hash count, bands, hash family) are read from
    * the table's own properties, so a drifted caller configuration
    * cannot silently verify with different sets.
    *
    * `maxBucket` drops candidates from degenerate INDEX buckets
    * (computed bucket-local on the clustered scan — no extra
    * shuffle). Verification joins raw text back from `corpus` (the
    * frame the table was built from) and `newDf`, exactly like the
    * in-corpus paths. New-batch-internal pairs are out of scope by
    * contract — run [[minHashLshPairs]] on the batch for those.
    *
    * @return (id_a, id_b, jaccard): id_a from the indexed corpus,
    *         id_b from the new batch, jaccard ≥ threshold (4 dp).
    */
  def minHashLshPairsIncremental(
      newDf: DataFrame,
      corpus: DataFrame,
      sigTable: String,
      textCol: String,
      idCol: String,
      jaccardThreshold: Double = 0.5,
      maxBucket: Int = 0): DataFrame = {
    val spark = newDf.sparkSession
    val meta = readMinHashSignatureMeta(spark, sigTable).getOrElse(
      throw new IllegalArgumentException(
        s"minHashLshPairsIncremental: `$sigTable` records no " +
          "graft.minhash.* table properties — rebuild it with " +
          "writeMinHashSignatures"))
    val (shingleK, numHashes, bands, fast) =
      (meta.shingleK, meta.numHashes, meta.bands, meta.fast)
    val old0 = spark.table(sigTable)
    val old =
      if (maxBucket > 0) {
        // bucket sizes aggregate on the table's own (__bpos, __bkey)
        // clustering — zero exchange on the bucketed scan
        val counts = old0.groupBy(col("__bpos"), col("__bkey"))
          .agg(count(lit(1)).as("__bc"))
          .where(col("__bc") <= maxBucket)
          .select(col("__bpos"), col("__bkey"))
        old0.join(counts, Seq("__bpos", "__bkey"))
      } else old0
    val newBands = bandedSignatures(Parallelism.spread(newDf), textCol, idCol,
      shingleK, numHashes, bands, fast)
    val cands = old
      .select(col("__bpos"), col("__bkey"),
        col("__id").as("id_a"), col("__sz").as("__sza"))
      .join(newBands.select(col("__bpos"), col("__bkey"),
        col("__id").as("id_b"), col("__sz").as("__szb")),
        Seq("__bpos", "__bkey"))
      .where(col("id_a") =!= col("id_b"))
      .where(
        least(col("__sza"), col("__szb")).cast("double") >=
          lit(jaccardThreshold) * greatest(col("__sza"), col("__szb")))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val mkSet: Column => Column =
      if (fast) c => transform(charShingles(c, shingleK), xxhash64(_))
      else charShingles(_, shingleK)
    val withSets = pushdownBarrier(cands
      .repartition(cands.sparkSession.sparkContext.defaultParallelism)
      .join(corpus.select(col(idCol).as("id_a"), col(textCol).as("__ta")), Seq("id_a"))
      .join(newDf.select(col(idCol).as("id_b"), col(textCol).as("__tb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        mkSet(col("__ta")).as("__set_a"), mkSet(col("__tb")).as("__set_b")))
    jaccardVerify(withSets, jaccardThreshold,
      if (fast) jaccardSimLong else jaccardSim, sizePrefilter = false)
  }

  /** Within-bucket pair generation: group the (`__bpos`, `__bkey`)
    * rows of `exploded` into member lists, then emit the K² ordered
    * member pairs per bucket with two nested explodes. One shuffle of
    * the member payloads, ONE computation of the upstream lineage —
    * the self-join alternative computes it twice (column-renamed
    * sides defeat exchange reuse).
    *
    * With `maxBucket > 0` the cap is enforced BEFORE any bucket is
    * materialized: a window count over (`__bpos`, `__bkey`) — same
    * hash partitioning the aggregation needs, so still one shuffle —
    * filters oversized buckets row-by-row (WindowExec buffers spill),
    * so a degenerate million-member bucket never becomes one giant
    * collect_list row.
    */
  private[operators] def bucketPairs(
      exploded: DataFrame,
      member: Column,
      maxBucket: Int): DataFrame = {
    val grouped =
      if (maxBucket > 0) {
        val w = Window.partitionBy(col("__bpos"), col("__bkey"))
        exploded
          .withColumn("__bc", count(lit(1)).over(w))
          .where(col("__bc") >= 2 && col("__bc") <= maxBucket)
          .groupBy(col("__bpos"), col("__bkey"))
          .agg(collect_list(member).as("__ms"))
      } else {
        exploded
          .groupBy(col("__bpos"), col("__bkey"))
          .agg(collect_list(member).as("__ms"))
          .where(size(col("__ms")) >= 2)
      }
    grouped
      .select(explode(col("__ms")).as("__a"), col("__ms"))
      .select(col("__a"), explode(col("__ms")).as("__b"))
  }

  /** Verification join-back: attach each candidate pair's two feature
    * sets with one join per side, computing `mkSet` ONLY for rows
    * that joined (the projection sits above each join, so just that
    * side's candidate rows pay the kernel). Two scans of `src`'s
    * id+text projection — deliberate: the aggregate alternative
    * (explode pair → one join → fold sides back with first(when))
    * needs an ObjectHashAggregate over array payloads, which falls
    * back to sort-based aggregation at 128 in-memory keys and then
    * sorts the full payload volume. Plain joins keep the payload out
    * of any sort and let AQE broadcast the (small) pair list.
    */
  /** See [[Parallelism.pushdownBarrier]]. Without the barrier the
    * downstream jaccard filter is substituted all the way into the
    * verification JOIN CONDITION, where its four `size`/`jaccard`
    * references each re-evaluate `char_shingles(text)` — eight
    * shingle computations per joined row, measured at 8× wall time
    * on a candidate-heavy corpus.
    */
  private[operators] def pushdownBarrier(df: DataFrame): DataFrame =
    Parallelism.pushdownBarrier(df)

  private val ckptObsCounter = new java.util.concurrent.atomic.AtomicLong()

  /** Eager localCheckpoint that collects aggregate metrics IN THE SAME
    * materialization job via a `CollectMetrics` (observe) node — the
    * fixpoint loops' per-round bookkeeping (convergence flags, edge-set
    * signatures) then costs no separate scan job over the checkpointed
    * blocks (round-17; the driver loops were job-count-bound). The
    * metrics row is read synchronously from the observed frame's own
    * QueryExecution after the eager materialization, so no listener
    * race; fails loudly if the metrics did not populate (a Spark
    * behavior change must not silently disable convergence checks).
    * Returns the checkpointed frame (metrics node NOT in its plan) and
    * the observed row.
    */
  private def checkpointObserved(
      df: DataFrame, aggs: Column*): (DataFrame, org.apache.spark.sql.Row) = {
    val name = s"graft_ckpt_obs_${ckptObsCounter.incrementAndGet()}"
    val obs = df.observe(name, aggs.head, aggs.tail: _*)
    val ck = obs.localCheckpoint(true)
    val row = obs.queryExecution.observedMetrics.getOrElse(name,
      throw new IllegalStateException(
        "checkpointObserved: observed metrics missing after eager " +
          "localCheckpoint - Spark no longer materializes CollectMetrics " +
          "on the checkpoint action; restore the separate convergence scan"))
    (ck, row)
  }

  private[operators] def attachSets(
      cands: DataFrame,
      src: DataFrame,
      idCol: String,
      textCol: String,
      mkSet: Column => Column): DataFrame =
    pushdownBarrier(cands
      // The pair list is bytes-tiny but each row costs two shingle
      // kernels + a jaccard downstream — work AQE cannot see, so it
      // would coalesce these few MB to one partition and serialize
      // the whole verification. The explicit repartition pins the
      // stage at full parallelism (REPARTITION_BY_NUM is exempt from
      // AQE coalescing).
      .repartition(cands.sparkSession.sparkContext.defaultParallelism)
      // Both joins move RAW TEXT (~300 B/row), and the sets are
      // computed in one projection after the LAST join: if AQE picks
      // a sort-merge join (the corpus side is never broadcast-safe at
      // scale), the sort buffers text rows, not ~20×-larger shingle
      // sets.
      .join(src.select(col(idCol).as("id_a"), col(textCol).as("__ta")), Seq("id_a"))
      .join(src.select(col(idCol).as("id_b"), col(textCol).as("__tb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        mkSet(col("__ta")).as("__set_a"), mkSet(col("__tb")).as("__set_b")))

  /** Exact-Jaccard verification over attached set pairs, with the
    * result-preserving size prefilter (jaccard ≤ min/max of the set
    * sizes, so size-skewed pairs skip the intersection).
    */
  private[operators] def jaccardVerify(
      withSets: DataFrame,
      threshold: Double,
      sim: (Column, Column) => Column = jaccardSim,
      sizePrefilter: Boolean = true): DataFrame =
    (if (sizePrefilter)
      withSets.where(
        least(size(col("__set_a")), size(col("__set_b"))).cast("double") >=
          lit(threshold) * greatest(size(col("__set_a")), size(col("__set_b"))))
    else withSets)
      .withColumn("jaccard", sim(col("__set_a"), col("__set_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))

  /** End-to-end near-dedup in one call: MinHash-LSH pairs →
    * connected-component clusters → keep only each cluster's
    * smallest id. Transitive, unlike the greedy
    * [[dropNearDuplicates]]: in a chain a~b~c (a<b<c) exactly `a`
    * survives even though (a,c) was never a direct pair.
    *
    * The one-call path defaults to the bounded-rounds
    * [[duplicateClustersStar]] components (`star = true`): a caller
    * who reaches for the convenience wrapper has not inspected their
    * dup-graph shape, and the star rounds stay bounded on the
    * pathological chain/high-diameter graphs where the min-label
    * fixpoint's round count grows with diameter (the round-11 sf1
    * gate measured the fixpoint at 8.1x for 10x data on chain-heavy
    * testdata vs 3.3x for star). Both produce identical labels (a
    * property spec holds them equal over chains, cliques, stars,
    * random graphs); pass `star = false` to pick the fixpoint when
    * the graph is known to be shallow.
    */
  def minHashLshDedup(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleK: Int = 5,
      numHashes: Int = 8,
      bands: Int = 2,
      jaccardThreshold: Double = 0.5,
      fast: Boolean = false,
      maxBucket: Int = 0,
      star: Boolean = true): DataFrame = {
    val pairs = minHashLshPairs(df, textCol, idCol, shingleK, numHashes,
      bands, jaccardThreshold, fast, maxBucket)
    val clusters =
      if (star) duplicateClustersStar(pairs) else duplicateClusters(pairs)
    val losers = clusters
      .where(col("id") =!= col("label"))
      .select(col("id").as(idCol))
    // No broadcast hint: the loser set grows with the corpus (billions
    // of ids at 100 TB with a 30% dup rate would OOM the driver). AQE
    // sees the real size at runtime and picks broadcast when it fits.
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Drop near-duplicates greedily: remove every row whose id appears
    * as the LARGER member of a near-dup pair (pairs carry id_a <
    * id_b), keeping the smallest id of each pairwise-connected group
    * that is directly paired with it. One left-anti join against the
    * pair list — unhinted: the dup-id set scales with the corpus, so
    * AQE decides at runtime whether it fits a broadcast.
    */
  def dropNearDuplicates(df: DataFrame, pairs: DataFrame, idCol: String): DataFrame =
    df.join(
      pairs.select(col("id_b").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** Quality-ranked dedup apply: keep the BEST row of every duplicate
    * cluster by `rank` (highest by default; ties break to the
    * smallest id) instead of [[dropNearDuplicates]]'s keep-smallest-
    * id — what a curation pipeline actually wants ("keep the longest
    * / highest-quality copy"). Clusters come from
    * [[duplicateClusters]] over the pair list; rows in no pair are
    * their own cluster and always survive. The per-cluster argmax is
    * a `row_number() = 1` filter, which compiles to
    * `WindowGroupLimit`: each task pre-prunes to one row per cluster
    * BEFORE the shuffle, so even a degenerate million-doc boilerplate
    * cluster never lands whole on one executor.
    */
  def dropNearDuplicatesBy(
      df: DataFrame,
      pairs: DataFrame,
      idCol: String,
      rank: Column,
      keepHighest: Boolean = true,
      star: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ckCol = graft.Cols.unique("__ck", df)
    val rnCol = graft.Cols.unique("__rn", df)
    // Same default as minHashLshDedup: the convenience path takes the
    // diameter-bounded star components.
    val clusterOf =
      if (star) duplicateClustersStar(pairs) else duplicateClusters(pairs)
    val clusters = clusterOf
      .select(col("id").as(idCol), col("label").as(ckCol))
    val member = df.join(clusters, Seq(idCol), "left")
      .withColumn(ckCol, coalesce(col(ckCol), col(idCol)))
    val ord = if (keepHighest) rank.desc else rank.asc
    val w = Window.partitionBy(col(ckCol)).orderBy(ord, col(idCol))
    member.withColumn(rnCol, row_number().over(w))
      .where(col(rnCol) === 1)
      .drop(rnCol, ckCol)
  }

  /** Duplicate clusters from a near-dup pair list: (id, cluster_id)
    * where cluster_id is the minimum id in the pair-connected
    * component. Iterative min-label propagation run to fixpoint (the
    * driver loop checks convergence; `localCheckpoint` cuts lineage
    * each round). Iteration count is the cluster diameter — tiny for
    * dedup graphs; each round is one shuffle join + one aggregation,
    * so this scales to billions of edges.
    */
  def duplicateClusters(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      maxIter: Int = 20): DataFrame = {
    // Checkpoint the pair list BEFORE symmetrizing: the union
    // references it twice, and without materialization the (multi-
    // shuffle) pair pipeline would execute once per branch.
    val e0 = pairs
      .select(col(idA).as("src"), col(idB).as("dst"))
      .localCheckpoint(true)
    val edges = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
    // Seed with min(self, direct neighbours) — one aggregation. Pair
    // and star graphs (the bulk of dedup graphs) converge right here,
    // so the loop usually runs a single confirmation round.
    var labels = edges
      .groupBy(col("src").as("id"))
      .agg(least(col("src"), min(col("dst"))).as("label"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // One-hop min propagation, with the change flag computed INSIDE
      // the same job and COUNTED during the checkpoint materialization
      // itself ([[checkpointObserved]]) — no separate convergence-scan
      // job per round (round-17).
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("label").as("__dl")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("__dl")).as("__nl"))
      val (stepped, chg) = checkpointObserved(
        labels
          .join(nbrMin, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("__nl"), col("label"))).as("label"),
            (col("__nl") < col("label")).as("__chg")),
        count(when(col("__chg"), lit(1))).as("__n_chg"))
      // A step fixpoint is a global fixpoint: no label change on any
      // edge means labels are constant per component, so pointer
      // jumping is skipped on the (usual) final confirmation round.
      converged = chg.getLong(0) == 0L
      labels =
        if (converged) stepped.select(col("id"), col("label"))
        else {
          // Pointer jumping: follow label -> label(label) so the min
          // label doubles its reach per round — O(log diameter)
          // rounds instead of O(diameter) for chain components.
          val s = stepped.select(col("id"), col("label"))
          s.join(s.select(col("id").as("label"), col("label").as("__ll")),
              Seq("label"), "left")
            .select(col("id"),
              least(col("label"), coalesce(col("__ll"), col("label"))).as("label"))
            .localCheckpoint(true)
        }
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"duplicateClusters did not converge in $maxIter rounds — " +
        "component diameter exceeds 2^maxIter; raise maxIter")
    labels.select(col("id"), col("label"))
  }

  /** Connected components via alternating large-star / small-star
    * rounds (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC 2014) — the variant to use when components are
    * pathological: per-round shuffle volume stays bounded by the
    * (shrinking) edge list regardless of component diameter or degree
    * skew, and convergence is O(log²) rounds. For ordinary dedup
    * graphs (stars and short chains) [[duplicateClusters]]'s seeded
    * min-label propagation converges in fewer, cheaper rounds — a
    * property spec holds the two implementations identical over
    * chains, cliques, stars and random graphs.
    *
    * Same contract as [[duplicateClusters]]: (id, label) with label =
    * component minimum, one row per id appearing in `pairs`.
    */
  def duplicateClustersStar(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      maxIter: Int = 50): DataFrame = {
    // allIds comes from the RAW pairs (before the self-loop filter) so
    // an id appearing only in (x, x) pairs still gets its (x, x) row —
    // the same contract as duplicateClusters.
    val p0 = pairs
      .select(col(idA).as("src"), col(idB).as("dst"))
      .localCheckpoint(true)
    // No checkpoint on allIds: it is consumed exactly once (the final
    // left join) and derives from the already-checkpointed p0 — the
    // materialization was a pure extra job (round-17).
    val allIds = p0.select(col("src").as("id"))
      .unionByName(p0.select(col("dst").as("id")))
      .distinct()
    // Order-independent edge-set signature (count + bit_xor of the
    // edge hashes: order-independent and overflow-free — edges are
    // distinct, so xor cancellation can't collide legitimately),
    // collected DURING each checkpoint's materialization job
    // ([[checkpointObserved]]) instead of a separate per-round
    // aggregation scan (round-17). Stop when a full LS+SS round
    // leaves the edge list unchanged.
    val sigAggs = Seq(
      count(lit(1)).as("__sig_n"),
      coalesce(bit_xor(xxhash64(col("src"), col("dst"))), lit(0L)).as("__sig_x"))
    def sigOf(r: org.apache.spark.sql.Row): (Long, Long) =
      (r.getLong(0), r.getLong(1))
    val (e0, e0Sig) = checkpointObserved(
      p0.where(col("src") =!= col("dst")).distinct(), sigAggs: _*)
    var e = e0
    var sig = sigOf(e0Sig)
    var iter = 0
    var stable = false
    while (!stable && iter < maxIter) {
      // The inner (large-star) round skips its trailing distinct: the
      // small-star round's min aggregations are duplicate-insensitive
      // and ITS trailing distinct dedups the attach edges, so the set
      // is identical — one fewer exchange per round (round-17).
      val (next, nextSigRow) = checkpointObserved(
        starRound(starRound(e, large = true, dedup = false), large = false),
        sigAggs: _*)
      val nextSig = sigOf(nextSigRow)
      // The signature is a fast filter, not proof: two DISTINCT edge
      // sets with equal (count, xor) — a hash collision or xor
      // cancellation across rounds — would otherwise stop iteration
      // with silently wrong labels. On the round the signature
      // stabilizes, confirm with an exact symmetric-difference check
      // (one grouped job over the small, checkpointed edge lists;
      // both sets are distinct so side-counts are 0/1 and a sum≠0
      // pinpoints any asymmetry; runs once).
      stable = nextSig == sig && {
        next.select(col("src"), col("dst"), lit(1).as("__side"))
          .unionByName(e.select(col("src"), col("dst"), lit(-1).as("__side")))
          .groupBy(col("src"), col("dst"))
          .agg(sum(col("__side")).as("__d"))
          .where(col("__d") =!= 0)
          .isEmpty
      }
      sig = nextSig
      e = next
      iter += 1
    }
    if (!stable) throw new IllegalStateException(
      s"duplicateClustersStar did not converge in $maxIter rounds")
    allIds
      .join(e.select(col("src").as("id"), col("dst").as("__l")), Seq("id"), "left")
      .select(col("id"), coalesce(col("__l"), col("id")).as("label"))
  }

  /** One star round: every node u attaches (large) its strictly
    * larger neighbours, or (small) its ≤ neighbours, to
    * m = min(relevant neighbourhood ∪ {u}); u itself attaches to m.
    */
  private def starRound(
      e: DataFrame, large: Boolean, dedup: Boolean = true): DataFrame = {
    // No distinct on nbrs: duplicate (src,dst) rows can't change a
    // min aggregation, and the round's trailing distinct() dedups the
    // attach edges — dropping it saves one full shuffle per round.
    val nbrs = e
      .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    // m(u) = min(relevant neighbourhood ∪ {u}) rides a WINDOW over
    // the one hash exchange on src (round-17): the previous
    // groupBy(src) + join-back shape shuffled nbrs TWICE per star
    // round (once into the aggregate, once into the join). The
    // conditional min is null when no neighbour qualifies and `least`
    // skips nulls, so m is total by construction; each row then emits
    // its attach edge (relevant dst → m) and its self edge (src → m)
    // in the same pass — self-edge duplicates are killed by the
    // round's trailing distinct, exactly like duplicate attach edges
    // always were.
    val relevant = if (large) col("dst")
      else when(col("dst") <= col("src"), col("dst"))
    val w = Window.partitionBy(col("src"))
    val attached = nbrs
      .withColumn("__m", least(col("src"), min(relevant).over(w)))
      .select(explode(array(
        struct(
          when(if (large) col("dst") > col("src") else col("dst") <= col("src"),
            col("dst")).as("src"),
          col("__m").as("dst")),
        struct(col("src"), col("__m").as("dst")))).as("__edge"))
      .select(col("__edge.src").as("src"), col("__edge.dst").as("dst"))
      .where(col("src").isNotNull && col("src") =!= col("dst"))
    // dedup = false when another star round consumes this one: its min
    // aggregations are duplicate-insensitive and its own trailing
    // distinct dedups the attach edges, so skipping this exchange
    // changes nothing but the per-round stage count. The duplicate
    // factor stays bounded by the (shrinking) edge list either way.
    if (dedup) attached.distinct() else attached
  }

  /** Distinct character k-shingles (code-point semantics; shorter
    * input → the whole string). Native codegen expression — the
    * declarative twin (`array_distinct` over `transform(sequence)` of
    * `substring`s) is interpreted and allocates three arrays per row.
    */
  def charShingles(c: Column, k: Int): Column =
    GraftSqlBridge.column(CharShinglesExpr(GraftSqlBridge.expression(c), k))

  /** Distinct word n-grams over whitespace tokens (fewer tokens than
    * n → one shingle of all tokens joined). Tokenization stays the
    * codegen'd `split`; the n-gram join + distinct is native.
    */
  def wordShingles(c: Column, n: Int): Column = {
    val toks = split(trim(c), "\\s+")
    GraftSqlBridge.column(WordNgrams(GraftSqlBridge.expression(toks), n))
  }

  // -------------------------------------------------------------- simhash

  /** SimHash over distinct word `ngram`-shingles of the lowercased
    * text, `bits` wide (multiple of 4, ≤ 60 — all bits come from the
    * first bits/4 nibbles of ONE md5 per feature; native kernel, one
    * pass). The signature bit j is the sign of the ±1 vote sum of bit
    * j across features. Use `ngram >= 2` when the corpus vocabulary
    * is small — unigram features stop discriminating. The default 48
    * bits is the at-scale configuration: Hamming-chunk blocking keys
    * (width bits/(maxHamming+1)) keep enough entropy at billion-doc
    * corpora; drop to 28 only for small-corpus experiments where
    * oracle portability of 7-nibble signatures matters more.
    */
  def simHash(c: Column, bits: Int = 48, ngram: Int = 2): Column = {
    require(bits >= 4 && bits <= 60 && bits % 4 == 0,
      "simHash bits must be a multiple of 4, between 4 and 60")
    val toks =
      if (ngram == 1) array_distinct(split(trim(lower(c)), "\\s+"))
      else wordShingles(lower(c), ngram)
    GraftSqlBridge.column(
      SimHashExpr(GraftSqlBridge.expression(toks), bits))
  }

  /** SimHash near-dup pairs: docs whose signatures differ in ≤
    * `maxHamming` bits, blocked by signature bytes (an LSH on the
    * simhash itself: two sigs within Hamming r share at least one of
    * r+1 disjoint chunks — pigeonhole — so the join is equality on
    * chunks, never all-pairs).
    *
    * Defaults are the AT-SCALE configuration (round-3 verdict: the
    * small-corpus defaults were the trap): `bits = 48` keeps the
    * chunk keys (width bits/(maxHamming+1)) entropic at billion-doc
    * corpora, and `maxBucket = 1000` drops degenerate chunk buckets
    * (boilerplate / near-empty docs that share a chunk with
    * everything) instead of letting one bucket emit O(members²)
    * pairs. Set `maxBucket = 0` only when exhaustive pairs are
    * required AND the corpus is known skew-free.
    */
  def simHashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      bits: Int = 48,
      maxHamming: Int = 1,
      ngram: Int = 2,
      maxBucket: Int = 1000): DataFrame = {
    val chunks = maxHamming + 1
    val chunkBits = math.max(bits / chunks, 1)
    val sigged = Parallelism.spread(df)
      .select(col(idCol).as("__id"), simHash(col(textCol), bits, ngram).as("__sig"))

    val chunked = sigged.select(
      col("__id"),
      col("__sig"),
      posexplode(array((0 until chunks).map { ci =>
        shiftright(col("__sig"), ci * chunkBits)
          .bitwiseAND((1L << chunkBits) - 1)
          .as(s"c$ci")
      }: _*)).as(Seq("__bpos", "__bkey")))

    bucketPairs(chunked, struct(col("__id"), col("__sig")), maxBucket)
      .select(
        col("__a.__id").as("id_a"), col("__a.__sig").as("sig_a"),
        col("__b.__id").as("id_b"), col("__b.__sig").as("sig_b"))
      .where(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .distinct()
  }

  /** Hamming near-dup pairs over 64-bit hex CODES — the pairing step
    * for [[graft.multimodal.Multimodal.dHash]] image codes (or any
    * 16-hex-char binary sketch): emits pairs whose codes differ in ≤
    * `maxHamming` bits, blocked by the code's four disjoint 16-bit
    * chunks (pigeonhole: two codes within Hamming 3 share at least
    * one chunk — so the join is chunk equality, never all-pairs; the
    * same LSH-on-the-signature device as [[simHashPairs]]). The code
    * is handled as two 32-bit halves, so no signed 64-bit arithmetic
    * appears on either engine (matching the dHash emitter), and
    * `maxBucket` drops degenerate chunk buckets (flat images share
    * chunks with everything) exactly like the text signatures. Null
    * codes (undecodable payloads) drop out before pairing.
    */
  def hammingPairs64(
      df: DataFrame,
      codeCol: String,
      idCol: String,
      maxHamming: Int = 2,
      maxBucket: Int = 1000): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 3,
      "maxHamming must be in [1, 3]: the 4×16-bit chunk blocking " +
        "guarantees recall only up to Hamming 3")
    val src = Parallelism.spread(df)
      .where(col(codeCol).isNotNull)
      .select(col(idCol).as("__id"),
        conv(substring(col(codeCol), 1, 8), 16, 10).cast("long").as("__hi"),
        conv(substring(col(codeCol), 9, 8), 16, 10).cast("long").as("__lo"))
    val chunked = src.select(
      col("__id"), col("__hi"), col("__lo"),
      posexplode(array(
        col("__lo").bitwiseAND(0xffffL),
        shiftright(col("__lo"), 16).bitwiseAND(0xffffL),
        col("__hi").bitwiseAND(0xffffL),
        shiftright(col("__hi"), 16).bitwiseAND(0xffffL)))
        .as(Seq("__bpos", "__bkey")))
    bucketPairs(chunked, struct(col("__id"), col("__hi"), col("__lo")), maxBucket)
      .select(
        col("__a.__id").as("id_a"), col("__a.__hi").as("__ha"),
        col("__a.__lo").as("__la"),
        col("__b.__id").as("id_b"), col("__b.__hi").as("__hb"),
        col("__b.__lo").as("__lb"))
      .where(col("id_a") < col("id_b"))
      .withColumn("hamming",
        (bit_count(col("__ha").bitwiseXOR(col("__hb"))) +
          bit_count(col("__la").bitwiseXOR(col("__lb")))).cast("int"))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .distinct()
  }


  /** Position-ALIGNED signature pairing — near-dup detection over
    * per-position perceptual signatures (video frame dHashes, audio
    * chunk aHashes, any (id, position, signature) sequence): two ids
    * pair when ≥ `minMatchFrac` of their positions carry the SAME
    * signature at the SAME position (temporal alignment — a shuffled
    * frame set is a different video). This is how video dedup
    * composes from the image path: sampleFrames → dHash → one
    * positioned pairing.
    *
    * Scale shape: candidates come from (position, signature) buckets
    * — the [[bucketPairs]] grouped-bucket device, never a self-join;
    * a pair is emitted once per matched position, so ONE
    * map-side-combined count over the candidate rows IS the match
    * count (no verification join); per-id position counts ride the
    * bucket rows as struct payload (no join-back). `maxBucket` drops
    * degenerate buckets (an all-black frame shared by everything)
    * deterministically.
    *
    * @return (id_a, id_b, n_a, n_b, matched, match_frac 4 dp) for
    *         pairs at match_frac ≥ minMatchFrac; frac is over the
    *         LARGER sequence (a short clip inside a long video does
    *         not pair at frac 1).
    */
  def alignedSignaturePairs(
      df: DataFrame,
      idCol: String,
      posCol: String,
      sigCol: String,
      minMatchFrac: Double = 0.5,
      maxBucket: Int = 1000): DataFrame = {
    require(minMatchFrac > 0.0 && minMatchFrac <= 1.0,
      s"minMatchFrac must be in (0, 1], got $minMatchFrac")
    val w = Window.partitionBy(col("__id"))
    val sigs = Parallelism.spread(df)
      .where(col(sigCol).isNotNull && col(posCol).isNotNull)
      .select(col(idCol).as("__id"), col(posCol).as("__bpos"),
        col(sigCol).as("__bkey"))
      // One signature per (id, position), enforced deterministically
      // (min signature wins): an input carrying several signatures at
      // the same position would otherwise inflate both the per-id
      // counts and `matched` with (position, signature) pairs, bending
      // the "frac of POSITIONS matched" contract the minMatchFrac gate
      // assumes. Single-signature inputs (the video/image hash paths)
      // pass through unchanged.
      .groupBy(col("__id"), col("__bpos"))
      .agg(min(col("__bkey")).as("__bkey"))
      // per-id position count rides each bucket row (window over the
      // bounded per-id sequence) — no join-back later
      .withColumn("__n", count(lit(1)).over(w))
    bucketPairs(sigs, struct(col("__id"), col("__n")), maxBucket)
      .where(col("__a.__id") < col("__b.__id"))
      .groupBy(
        col("__a.__id").as("id_a"), col("__b.__id").as("id_b"),
        col("__a.__n").as("n_a"), col("__b.__n").as("n_b"))
      .agg(count(lit(1)).as("matched"))
      .withColumn("match_frac",
        round(col("matched") / greatest(col("n_a"), col("n_b")), 4))
      .where(col("match_frac") >= minMatchFrac)
      .select("id_a", "id_b", "n_a", "n_b", "matched", "match_frac")
  }

  /** Banding-configuration EVAL — the dedup twin of
    * [[graft.operators.Similarity.annRecall]]: for every LSH
    * candidate pair, the signature-ESTIMATED Jaccard (fraction of
    * matching minhash components — what the banding decision is
    * implicitly thresholding) next to the exact shingle-set Jaccard
    * and the absolute error. This is the measurement that turns
    * "numHashes=8, bands=2 is probably fine" into a number before a
    * configuration is committed to the full corpus. Candidates are
    * the same chunk-blocked band buckets as [[minHashLshPairs]]
    * (never all-pairs; `maxBucket` caps degenerate buckets); the
    * estimate join moves only (id, signature) rows; the exact side
    * pays the usual verification join. No threshold is applied — the
    * whole candidate set IS the eval set.
    */
  def minHashEstimatePairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleK: Int = 5,
      numHashes: Int = 8,
      bands: Int = 2,
      fast: Boolean = false,
      maxBucket: Int = 0): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    require(fast || numHashes <= 8, "portable (md5-chunk) minhash supports ≤ 8 hashes")
    val src = Parallelism.spread(df)
    val shingled = src.select(col(idCol).as("__id"),
      charShingles(col(textCol), shingleK).as("__sh"))
    val minned =
      if (fast)
        shingled.withColumn("__mins",
          array((0 until numHashes).map(h =>
            array_min(transform(col("__sh"), s => xxhash64(s, lit(h)))).cast("string")): _*))
      else
        shingled.withColumn("__mins", chunkMinsNative(col("__sh"), numHashes))
    val sigs = minned.select(col("__id"), col("__mins"))
    val exploded = minned.select(col("__id"),
      posexplode(bandKeys(col("__mins"), numHashes, bands))
        .as(Seq("__bpos", "__bkey")))
    val cands = bucketPairs(exploded, col("__id"), maxBucket)
      .where(col("__a") < col("__b"))
      .select(col("__a").as("id_a"), col("__b").as("id_b"))
      .distinct()
    val est = cands
      .join(sigs.select(col("__id").as("id_a"), col("__mins").as("__ma")), Seq("id_a"))
      .join(sigs.select(col("__id").as("id_b"), col("__mins").as("__mb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("__ma"), col("__mb"), (x, y) => x === y),
          b => b)).cast("double") / numHashes).as("__est"))
    val mkSet: Column => Column =
      if (fast) c => transform(charShingles(c, shingleK), xxhash64(_))
      else charShingles(_, shingleK)
    val exact = jaccardVerify(
      attachSets(cands, src, idCol, textCol, mkSet),
      0.0,
      if (fast) jaccardSimLong else jaccardSim,
      sizePrefilter = false)
    est.join(exact, Seq("id_a", "id_b"))
      .select(col("id_a"), col("id_b"),
        round(col("__est"), 4).as("est_jaccard"),
        col("jaccard"),
        round(abs(col("__est") - col("jaccard")), 4).as("abs_err"))
  }

  // ------------------------------------------------------- containment

  /** Word n-gram CONTAINMENT pairs — the quote/subset detector that
    * Jaccard structurally misses: a 100-shingle quote fully inside a
    * 10,000-shingle document has Jaccard ≈ 0.01 but containment 1.0
    * (score = |A∩B| / min(|A|, |B|), the max-containment symmetric
    * form). The partial-recrawl / embedded-quotation / licensed-
    * excerpt shape every crawl corpus carries.
    *
    * Scale design — PREFIX FILTERING (the Chaudhuri/Ganti/Kaushik
    * SSJoin primitive, the PPJoin family's candidate rule): order
    * every document's shingles by GLOBAL rarity (document frequency,
    * then shingle — a total order both engines share); if
    * |A∩B| ≥ t·|A| for the smaller set A, then ANY
    * (|A| − ⌈t·|A|⌉ + 1)-subset of A intersects A∩B — so indexing
    * only each doc's that-many RAREST shingles and probing with all
    * (uncapped) shingle rows finds every qualifying pair. Candidate
    * volume rides the rare end of the frequency distribution instead
    * of K² blocks, and length-skewed pairs (the containment case) are
    * found where any length-binned blocking would separate them.
    * `maxShingleDocs` drops ultra-common shingles from index AND
    * probe deterministically (a pair sharing ONLY stop-shingles is
    * noise by contract). Verification is the [[attachSets]]
    * join-back + one exact intersection per candidate.
    *
    * Scoring vs candidacy asymmetry (deliberate, read carefully):
    * by default the emitted `containment` is scored over the FULL
    * unfiltered shingle sets — the number a user can reproduce from
    * the two texts — while candidate generation only sees shingles
    * with df ≤ `maxShingleDocs`. Consequently recall is guaranteed
    * ONLY for pairs where at least one shared shingle survives the
    * df cap; a qualifying pair whose entire overlap is stop-shingles
    * is skipped by contract (it shares nothing distinctive), yet a
    * FOUND pair's score does count those stop-shingles. Pass
    * `verifyFiltered = true` to score over the SAME df-capped sets
    * candidacy uses — then the recall guarantee and the score
    * semantics agree exactly (every pair whose FILTERED containment
    * ≥ threshold is found and scored on that same quantity), at the
    * price of a score a user cannot reproduce from the raw texts
    * without re-deriving the df table.
    *
    * @return (id_a, id_b, containment 4 dp ≥ threshold — over the
    *         UNFILTERED sets by default, the df-capped sets when
    *         `verifyFiltered` — see the asymmetry note, contained_id
    *         — the smaller-set side, ties to the smaller id).
    */
  def containmentPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      threshold: Double = 0.8,
      maxShingleDocs: Int = 100000,
      verifyFiltered: Boolean = false): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    require(maxShingleDocs >= 2, "maxShingleDocs must be >= 2")
    val src = Parallelism.spread(df)
    val rows = src
      .select(col(idCol).as("__id"), wordShingles(col(textCol), n).as("__set"))
      .where(size(col("__set")) > 0)
      .select(col("__id"), size(col("__set")).as("__sz"),
        explode(col("__set")).as("__s"))
      .localCheckpoint() // feeds freq + index + probe: shingle once
    val freq = rows.groupBy(col("__s")).agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxShingleDocs)
    val indexed = rows.join(freq, "__s")
    val wRank = Window.partitionBy(col("__id")).orderBy(col("__df"), col("__s"))
    val pre = indexed
      .withColumn("__rk", row_number().over(wRank))
      .where(col("__rk") <= col("__sz") - ceil(lit(threshold) * col("__sz")) + 1)
    val cand = pre.select(col("__s"), col("__id").as("__pid"))
      .join(indexed.select(col("__s"), col("__id").as("__qid")), "__s")
      .where(col("__pid") =!= col("__qid"))
      .select(least(col("__pid"), col("__qid")).as("id_a"),
        greatest(col("__pid"), col("__qid")).as("id_b"))
      .distinct()
    val withSets =
      if (verifyFiltered) {
        // Score over the same df-capped sets candidacy saw: rebuild
        // each doc's surviving-shingle set from the staged `indexed`
        // frame (one grouped collect over already-filtered rows —
        // bounded by the doc's own shingle count) instead of
        // re-shingling raw text. array_sort so the intersection
        // kernel sees canonical arrays.
        val fsets = indexed.groupBy(col("__id"))
          .agg(array_sort(collect_set(col("__s"))).as("__set"))
        pushdownBarrier(cand
          .repartition(cand.sparkSession.sparkContext.defaultParallelism)
          .join(fsets.select(col("__id").as("id_a"), col("__set").as("__set_a")),
            Seq("id_a"))
          .join(fsets.select(col("__id").as("id_b"), col("__set").as("__set_b")),
            Seq("id_b")))
      } else {
        // Rebuild each doc's FULL shingle set once from the staged
        // rows frame (same shape as the verifyFiltered branch, minus
        // the df cap) instead of attachSets' per-pair re-shingling —
        // a doc in k candidate pairs used to pay the wordShingles
        // kernel k times (measured 17× redundancy on the bench
        // corpus, the two dominant codegen spans of the query). The
        // set is distinct either way and only intersection/set SIZES
        // feed the score, so the ordering difference cannot change a
        // result.
        val fsets = rows.groupBy(col("__id"))
          .agg(array_sort(collect_set(col("__s"))).as("__set"))
        pushdownBarrier(cand
          .repartition(cand.sparkSession.sparkContext.defaultParallelism)
          .join(fsets.select(col("__id").as("id_a"), col("__set").as("__set_a")),
            Seq("id_a"))
          .join(fsets.select(col("__id").as("id_b"), col("__set").as("__set_b")),
            Seq("id_b")))
      }
    withSets
      .withColumn("containment",
        round(size(array_intersect(col("__set_a"), col("__set_b"))).cast("double") /
          least(size(col("__set_a")), size(col("__set_b"))), 4))
      .where(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"),
        when(size(col("__set_a")) < size(col("__set_b")), col("id_a"))
          .when(size(col("__set_b")) < size(col("__set_a")), col("id_b"))
          .otherwise(least(col("id_a"), col("id_b"))).as("contained_id"))
  }

  // ------------------------------------------------------- n-gram jaccard

  /** Word n-gram Jaccard similarity pairs within `blockBy` groups
    * (pass a cheap blocking key — language, source, length bin — to
    * bound the candidate space; use [[minHashLshPairs]] when no
    * natural key exists). With `blockBy = Nil` this is the LABELED
    * all-pairs baseline and refuses to run unless
    * `allowBruteForce = true` — a cartesian product must be an
    * explicit decision, never a default slipped into production.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      blockBy: Seq[String] = Nil,
      maxBlock: Int = 0,
      allowBruteForce: Boolean = false): DataFrame = {
    val src = Parallelism.spread(df)
    if (blockBy.nonEmpty) {
      // Blocking keys are COARSE (language, length bin …): buckets
      // hold hundreds of members and emit K² candidate pairs, so —
      // unlike the LSH operators, whose buckets hold only probable
      // near-dups — the shingle sets are computed once per doc and
      // carried through the single bucket shuffle. A verification
      // join-back here would recompute a doc's set once per pair it
      // appears in (K× per doc) and shuffle the K² pair list again.
      // Null block keys are dropped, matching SQL join equality
      // semantics.
      val exploded = src
        .where(blockBy.map(col(_).isNotNull).reduce(_ && _))
        .select(col(idCol).as("__id"), wordShingles(col(textCol), n).as("__sh"),
          lit(0).as("__bpos"), struct(blockBy.map(col): _*).as("__bkey"))
      jaccardVerify(
        bucketPairs(exploded, struct(col("__id"), col("__sh")), maxBlock)
          .select(
            col("__a.__id").as("id_a"), col("__a.__sh").as("__set_a"),
            col("__b.__id").as("id_b"), col("__b.__sh").as("__set_b"))
          .where(col("id_a") < col("id_b")),
        threshold)
    } else {
      // No blocking key: explicit brute-force baseline — an O(n²)
      // cartesian product. Guarded so the labeled baseline can't
      // silently become a production cross-join on a large frame:
      // opt in via allowBruteForce=true (and use minHashLshPairs when
      // no natural blocking key exists at scale).
      require(allowBruteForce,
        "ngramJaccardPairs with blockBy=Nil is an all-pairs cartesian baseline; " +
          "pass allowBruteForce=true for small corpora, or provide blockBy / " +
          "use minHashLshPairs at scale")
      System.err.println(
        "[graft] WARN ngramJaccardPairs running the UNBLOCKED all-pairs baseline — O(n²) compare")
      val sets = src.select(col(idCol).as("__id"), wordShingles(col(textCol), n).as("__set"))
      jaccardVerify(
        sets.toDF("id_a", "__set_a").crossJoin(sets.toDF("id_b", "__set_b"))
          .where(col("id_a") < col("id_b")),
        threshold)
    }
  }
}
