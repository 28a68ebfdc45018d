package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Random-hyperplane LSH follows Charikar (STOC 2002); multi-probe
  * follows Lv et al. (VLDB 2007); the IVF shape follows the
  * inverted-file design popularized by Jégou et al. ("Product
  * quantization for nearest neighbor search", TPAMI 2011), minus
  * quantization — exact vectors within each list.
  *
  * Two paths, same contract:
  *  - [[bruteForceTopK]]: exact cosine top-k; the query side is
  *    broadcast, so the corpus is scanned once with no shuffle of
  *    corpus rows. Correctness baseline + fine whenever |queries| is
  *    small.
  *  - [[lshTopK]] / [[nearDupPairs]]: random-hyperplane LSH buckets
  *    (deterministic Rademacher planes — no fitted model to ship);
  *    candidates meet via equality join on bucket id, so cost scales
  *    with bucket occupancy, not |corpus|×|queries|. The 100 TB path.
  */
object Similarity {

  /** Per-component mean of an embedding column — the FIT step of
    * mean-centering (see
    * [[graft.functions.VectorFunctions.subtractMean]]). One
    * `posexplode` + grouped aggregation: hash aggregation partially
    * combines per task, so the shuffle carries ≤ partitions·dim rows
    * regardless of corpus size, and only `dim` scalars reach the
    * driver. Ragged inputs average each position over the rows that
    * have it; null elements are skipped (sum/count both null-aware).
    */
  def meanVector(df: DataFrame, vecCol: String): Array[Double] = {
    val rows = df
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("__pos", "__x")))
      .groupBy(col("__pos"))
      .agg(sum(col("__x")).as("__s"), count(col("__x")).as("__n"))
      .collect()
    require(rows.nonEmpty, "meanVector of an empty/all-null column")
    val out = new Array[Double](rows.map(_.getInt(0)).max + 1)
    rows.foreach { r =>
      out(r.getInt(0)) = if (r.getLong(2) == 0) 0.0 else r.getDouble(1) / r.getLong(2)
    }
    out
  }

  /** Pairwise cosine between GROUP CENTROIDS — the corpus-mix
    * geometry view ("which languages/sources live in the same
    * embedding region", the slice-level complement of the per-vector
    * operators): per-group mean vector, then cosine over the bounded
    * group-pair grid. Feeds mixing and dedup-scope decisions — two
    * sources whose centroids read ≈ 1 are candidates for cross-source
    * semantic dedup (row 80); ≈ orthogonal slices can dedup
    * independently.
    *
    * Scale shape: ONE posexplode + map-side-combined groupBy over
    * (group, position) — the corpus is scanned once and nothing
    * bigger than (groups × dim) survives; the pair grid joins that
    * bounded frame to itself on position (groups² × dim rows — the
    * group column is categorical by contract, the crossTab rule).
    * Determinism: components cast DECIMAL(19,6) (the q_cov float
    * discipline) so position sums are exact and order-independent;
    * means round 6 dp into DECIMAL(18,6); dot/norm sums are exact
    * DECIMAL(38,12); one fixed-order double cosine at the boundary.
    * Null groups/vectors drop; a zero-norm centroid yields null.
    *
    * @return one row per unordered group pair (group_a < group_b):
    *         (group_a, group_b, cosine 6 dp).
    */
  def centroidSimilarity(
      df: DataFrame,
      vecCol: String,
      groupCol: String): DataFrame = {
    val cents = df
      .where(col(vecCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"),
        posexplode(col(vecCol)).as(Seq("__p", "__x")))
      .groupBy(col("__g"), col("__p"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__x").cast("decimal(19,6)")).as("__s"))
      .select(col("__g"), col("__p"),
        round(col("__s").cast("double") / col("__n"), 6)
          .cast("decimal(18,6)").as("__v"))
      .localCheckpoint() // bounded groups×dim; feeds both grid sides
    val a = cents.select(col("__g").as("group_a"), col("__p"),
      col("__v").as("__va"))
    val b = cents.select(col("__g").as("group_b"), col("__p"),
      col("__v").as("__vb"))
    a.join(b, Seq("__p"))
      .where(col("group_a") < col("group_b"))
      .groupBy(col("group_a"), col("group_b"))
      .agg(
        sum((col("__va") * col("__vb")).cast("decimal(38,12)")).as("__dot"),
        sum((col("__va") * col("__va")).cast("decimal(38,12)")).as("__na"),
        sum((col("__vb") * col("__vb")).cast("decimal(38,12)")).as("__nb"))
      .select(col("group_a"), col("group_b"),
        round(when(col("__na") > 0 && col("__nb") > 0,
          col("__dot").cast("double") /
            (sqrt(col("__na").cast("double")) *
              sqrt(col("__nb").cast("double")))), 6).as("cosine"))
  }

  /** Exact top-k cosine neighbours for each query vector.
    *
    * @return (query id, corpus id, cosine, rank) — rank 1..k,
    *         deterministic tie-break on corpus id.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      qIdCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("__cv"))
    val q = queries.select(col(qIdCol).as("query_id"), col(vecCol).as("__qv"))
    val scored = c
      .join(broadcast(q))
      .withColumn("cosine", round(cosineSimilarityNative(col("__cv"), col("__qv")), 6))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** FILTERED exact top-k: each query only ranks corpus rows whose
    * `matchCols` values equal the query's own — the
    * attribute-scoped search every multi-tenant / category-scoped
    * vector store needs ("nearest neighbours WITHIN my tenant /
    * label / language"). Post-filtering a global top-k instead is
    * WRONG at any scale (a selective filter can empty the window);
    * this ranks inside the filter. Plan shape: the filter IS the
    * join key — corpus scans once and hash-probes the broadcast
    * query set per row, so selectivity prunes the score product
    * before any ranking, and the per-query top-k stays a
    * WindowGroupLimit window. No shuffle of the corpus beyond the
    * rank exchange.
    *
    * @return (query id, corpus id, cosine, rank 1..k, tie-break on
    *         corpus id) — only same-`matchCols` candidates appear.
    */
  def filteredTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      qIdCol: String,
      k: Int,
      matchCols: Seq[String]): DataFrame = {
    require(k >= 1, "k must be positive")
    require(matchCols.nonEmpty, "filteredTopK needs at least one match column")
    val c = corpus.select(
      (col(idCol).as("corpus_id") +: col(vecCol).as("__cv") +:
        matchCols.map(col)): _*)
    val q = queries.select(
      (col(qIdCol).as("query_id") +: col(vecCol).as("__qv") +:
        matchCols.map(col)): _*)
    val scored = c
      .join(broadcast(q), matchCols)
      .withColumn("cosine", round(cosineSimilarityNative(col("__cv"), col("__qv")), 6))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** Exact squared-L2 top-k — the metric-matched baseline for the
    * PQ/ADC ranking ([[graft.operators.Pq.pqTopK]] scores squared
    * L2): recall against the cosine [[bruteForceTopK]] would
    * conflate L2-vs-cosine ranking disagreement (the corpus vectors
    * are not unit-norm) with quantization loss. Same plan shape:
    * broadcast queries, one corpus scan, WindowGroupLimit top-k.
    *
    * @return (query id, corpus id, dist — squared L2, 6 dp, rank
    *         1..k ascending distance, tie-break on corpus id).
    */
  def bruteForceTopKL2(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      qIdCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("__cv"))
    val q = queries.select(col(qIdCol).as("query_id"), col(vecCol).as("__qv"))
    val scored = c
      .join(broadcast(q))
      .withColumn("dist",
        round(graft.functions.VectorFunctions.squaredL2DistanceNative(col("__cv"), col("__qv")), 6))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("corpus_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "dist", "rank")
  }

  /** [[bruteForceTopK]] over int8-quantized vectors: both sides are
    * quantized ([[graft.functions.VectorFunctions.quantize8]] —
    * cosine is scale-invariant, so only the tinyint codes move) and
    * scored with the integer-accumulator kernel. At 100 TB this is
    * the memory-bandwidth-bound configuration: 4× less corpus payload
    * per scan for a ±1/254-per-component similarity error. Ranks can
    * differ from the float path only where cosines are within the
    * quantization error.
    */
  def bruteForceTopKInt8(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      qIdCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      quantize8(col(vecCol)).getField("q").as("__cq"))
    val q = queries.select(col(qIdCol).as("query_id"),
      quantize8(col(vecCol)).getField("q").as("__qq"))
    val scored = c
      .join(broadcast(q))
      .withColumn("cosine", round(cosineSimilarityInt8(col("__cq"), col("__qq")), 6))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** Exact Hamming top-k over sign-bit codes
    * ([[graft.functions.VectorFunctions.packSignBits]]): the
    * coarsest scan tier — 32× less corpus payload than float, the
    * whole distance one XOR+popcount per 64 dims. For mean-centered
    * embeddings Hamming order tracks angular order (the SimHash
    * bound), so this is the candidate-generation scan of a
    * binary → int8 → float rerank cascade at 100 TB.
    *
    * @return (query id, corpus id, hamming, rank) — rank 1..k,
    *         ascending distance, deterministic tie-break on corpus id.
    */
  def bruteForceTopKHamming(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      qIdCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      packSignBits(col(vecCol)).as("__cc"))
    val q = queries.select(col(qIdCol).as("query_id"),
      packSignBits(col(vecCol)).as("__qc"))
    val scored = c
      .join(broadcast(q))
      .withColumn("hamming", hammingDistance(col("__cc"), col("__qc")))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("corpus_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "hamming", "rank")
  }

  /** The full rerank cascade in one call: Hamming shortlist → int8
    * rerank → float verify. Centroid-free (no IVF state), so it works
    * on any corpus as-is while still scanning 32×-smaller payloads in
    * the only full-corpus pass:
    *
    *  1. sign-bit scan ([[bruteForceTopKHamming]]) keeps `shortlist`
    *     candidates per query — the ONLY tier that touches every
    *     corpus row, and it moves one bigint word per 64 dims;
    *  2. int8 rerank: the candidate id list (|queries|·shortlist rows,
    *     broadcast) joins a fresh corpus scan that projects only the
    *     tinyint codes; integer cosine keeps `rerank` per query;
    *  3. float verify: the survivors (|queries|·rerank rows,
    *     broadcast) join a float-vector scan; exact cosine picks the
    *     final k.
    *
    * Every shuffle carries ids and scalar scores — never vector
    * payloads (the payload-through-sort hazard); each tier re-reads
    * the corpus with column pruning instead of dragging wider codes
    * through the previous tier's window. Recall is bounded by tier 1:
    * size `shortlist` generously (it is cheap — scalar rows).
    *
    * @return (query id, corpus id, cosine, rank) — float cosine,
    *         rank 1..k, deterministic tie-break on corpus id.
    */
  def cascadeTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      qIdCol: String,
      k: Int,
      shortlist: Int = 200,
      rerank: Int = 0): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(shortlist >= k, "shortlist must be >= k")
    val rr = if (rerank <= 0) math.max(k, shortlist / 4) else rerank
    require(rr >= k && rr <= shortlist,
      s"rerank must be in [k, shortlist], got $rr")
    val short = bruteForceTopKHamming(
      corpus, queries, vecCol, idCol, qIdCol, shortlist)
      .select("query_id", "corpus_id")
    val cq = corpus.select(col(idCol).as("corpus_id"),
      quantize8(col(vecCol)).getField("q").as("__cq"))
    val qq = queries.select(col(qIdCol).as("query_id"),
      quantize8(col(vecCol)).getField("q").as("__qq"))
    val w8 = Window.partitionBy(col("query_id"))
      .orderBy(col("__cos8").desc, col("corpus_id").asc)
    val survivors = cq
      .join(broadcast(short), Seq("corpus_id"))
      .join(broadcast(qq), Seq("query_id"))
      .withColumn("__cos8", round(cosineSimilarityInt8(col("__cq"), col("__qq")), 6))
      .withColumn("__r8", row_number().over(w8))
      .where(col("__r8") <= rr)
      .select("query_id", "corpus_id")
    val cv = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("__cv"))
    val qv = queries.select(col(qIdCol).as("query_id"), col(vecCol).as("__qv"))
    val wF = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    cv
      .join(broadcast(survivors), Seq("corpus_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cosine", round(cosineSimilarityNative(col("__cv"), col("__qv")), 6))
      .withColumn("rank", row_number().over(wF))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** Exact float rerank of an approximate SHORTLIST — the detachable
    * final stage of every production ANN cascade: take ANY
    * (query_id, corpus_id, …) candidate frame (PQ/ADC, IVF, Hamming,
    * LSH — every `*TopK` here returns the shape) fetched at
    * `|shortlist| > k`, score the survivors exactly, keep the top k.
    * Recall@k of the composition is bounded by the shortlist's
    * recall@|shortlist| — typically FAR above its own recall@k (the
    * frontier table in SURVEY §6b measures PQ m=8: 0.82 raw → 0.98
    * after a 50→10 rerank) — while the exact kernel touches only
    * |queries|·|shortlist| rows, never the corpus.
    *
    * Plan shape: the shortlist and the query vectors are bounded by
    * the batch contract (broadcast); the corpus contributes ONE scan
    * probed by the broadcast shortlist — no corpus shuffle, same as
    * [[cascadeTopK]]'s final stage.
    *
    * @return (query_id, corpus_id, cosine 6 dp, rank 1..k, tie-break
    *         on corpus id).
    */
  def rerankTopK(
      corpus: DataFrame,
      queries: DataFrame,
      shortlist: DataFrame,
      vecCol: String,
      idCol: String,
      qIdCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val sl = shortlist.select(col("query_id"), col("corpus_id"))
    val cv = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("__cv"))
    val qv = queries.select(col(qIdCol).as("query_id"), col(vecCol).as("__qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    cv
      .join(broadcast(sl), Seq("corpus_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cosine",
        round(cosineSimilarityNative(col("__cv"), col("__qv")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** Recall@k of an approximate top-k result against the exact one —
    * the eval that turns "the LSH/IVF/cascade path is good enough"
    * from a claim into a measured number, run on a sampled query set
    * before committing an index configuration to a 100 TB corpus.
    * Both inputs are (query_id, corpus_id, …) frames as returned by
    * every `*TopK` here; the comparison joins two bounded
    * (queries × k)-row frames, so the eval costs nothing beyond the
    * two searches themselves.
    *
    * @return one row: (n_queries, n_exact, n_matched,
    *         recall = matched/exact rounded 6 dp, null if no exact
    *         rows).
    */
  def annRecall(approx: DataFrame, exact: DataFrame): DataFrame = {
    val a = approx.select(col("query_id"), col("corpus_id"))
    val e = exact.select(col("query_id"), col("corpus_id"))
    val totals = e.agg(
      countDistinct(col("query_id")).as("n_queries"),
      count(lit(1)).as("n_exact"))
    val m = e.join(a, Seq("query_id", "corpus_id"))
      .agg(count(lit(1)).as("n_matched"))
    totals.crossJoin(broadcast(m)).select(
      col("n_queries"), col("n_exact"), col("n_matched"),
      round(when(col("n_exact") > 0,
        col("n_matched") / col("n_exact").cast("double")), 6).as("recall"))
  }

  /** Per-query twin of [[annRecall]] — one (query_id, n_exact,
    * n_matched, recall) row per query instead of one corpus-wide
    * number, the shape a SAMPLED recall eval needs: rank a bounded
    * deterministic query subsample, then put an error bar on the
    * mean with [[graft.operators.Eval.bootstrapMeanCI]] over these
    * rows rather than paying the exact ranking for every query. Same
    * cost contract as [[annRecall]]: a join of two (queries × k)-row
    * frames, nothing beyond the searches themselves.
    */
  def annRecallByQuery(approx: DataFrame, exact: DataFrame): DataFrame = {
    val a = approx.select(col("query_id"), col("corpus_id"))
      .withColumn("__hit", lit(1))
    exact.select(col("query_id"), col("corpus_id"))
      .join(a, Seq("query_id", "corpus_id"), "left")
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("n_exact"),
        sum(coalesce(col("__hit"), lit(0))).as("n_matched"))
      .withColumn("recall",
        round(col("n_matched") / col("n_exact").cast("double"), 6))
  }

  /** Approximate top-k: candidates restricted to the query's
    * hyperplane bucket. Recall grows with fewer planes / multi-probe;
    * cost shrinks with more planes.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      qIdCol: String,
      k: Int,
      dim: Int,
      numPlanes: Int = 8,
      multiProbe: Int = 0): DataFrame = {
    val c = corpus.select(
      col(idCol).as("corpus_id"),
      col(vecCol).as("__cv"),
      hyperplaneBucketNative(col(vecCol), dim, numPlanes).as("__bucket"))
    val q0 = queries.select(
      col(qIdCol).as("query_id"),
      col(vecCol).as("__qv"),
      hyperplaneBucketNative(col(vecCol), dim, numPlanes).as("__bucket"))
    // Query-directed multi-probe (Lv et al., VLDB 2007): additionally
    // search the buckets at Hamming distance 1 from the query's
    // bucket, flipping the `multiProbe` planes with the SMALLEST
    // |dot| margin — the planes the query most nearly straddles, so
    // each extra probe buys the most recall. Recall without more
    // shuffle, only more broadcast rows; the margin computation runs
    // on the (small, broadcast) query side only.
    val q =
      if (multiProbe <= 0) q0
      else {
        val margins = array(
          planeSigns(dim, numPlanes).zipWithIndex.map { case (signs, p) =>
            val signArr = array(signs.map(s => lit(s.toDouble)): _*)
            struct(
              abs(dotProduct(col("__qv"), signArr)).as("m"),
              lit(p).as("p"))
          }: _*)
        val flips = slice(
          transform(array_sort(margins), x => x.getField("p")),
          1, math.min(multiProbe, numPlanes))
        q0.withColumn("__bucket",
          explode(concat(
            array(col("__bucket")),
            transform(flips, f =>
              col("__bucket").bitwiseXOR(
                call_function("shiftleft", lit(1), f))))))
      }
    // No broadcast hint: the probe side scales with |queries| ×
    // (1 + multiProbe) — unbounded by contract — so AQE decides at
    // runtime (broadcast when it fits, bucket-key shuffle join when a
    // corpus-sized query set would OOM the driver).
    val scored = c
      .join(q, Seq("__bucket"))
      .withColumn("cosine", round(cosineSimilarityNative(col("__cv"), col("__qv")), 6))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** IVF (inverted-file) approximate top-k: the corpus is assigned to
    * its nearest "centroid" (a deterministic sample of corpus vectors
    * — every `stride`-th id — so there is no trained model to ship);
    * each query probes its `nprobe` nearest centroids and scores only
    * those partitions' members.
    *
    * Scale shape: assignment is a broadcast of the (tiny) centroid
    * set against the corpus — O(n·nlist) fused scoring in one pass,
    * no shuffle of corpus rows until the per-vector argmax window;
    * search touches ~n·nprobe/nlist of the corpus per query. Raise
    * `stride` (fewer centroids) to cut assignment cost, raise
    * `nprobe` to buy recall.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      qIdCol: String,
      k: Int,
      stride: Int = 100,
      nprobe: Int = 2,
      numCentroids: Int = 0,
      expectedRows: Long = 0L): DataFrame = {
    // A FIXED stride means nlist = n/stride grows linearly with the
    // corpus, eventually breaking the hinted centroid broadcast below.
    // numCentroids > 0 bounds nlist instead: stride is derived via
    // [[autoStride]] from `expectedRows` (pass it to skip the count
    // job — same contract as nearDupPairs) or a corpus count.
    val effStride =
      if (numCentroids > 0)
        autoStride(
          if (expectedRows > 0) expectedRows else corpus.count(), numCentroids)
      else stride
    val cen = centroids(corpus, vecCol, idCol, effStride)
    ivfSearch(ivfAssign(corpus, vecCol, idCol, cen), cen, queries, vecCol,
      qIdCol, k, nprobe)
  }

  private def centroids(
      corpus: DataFrame, vecCol: String, idCol: String, stride: Int): DataFrame =
    corpus
      .where(pmod(col(idCol), lit(stride)) === 0)
      .select(col(idCol).as("__cid"), col(vecCol).as("__cvec"))

  /** One-row centroid-matrix frame: `array<struct<__cid, __cvec>>`
    * sorted ascending by the (unique) __cid — the broadcast operand
    * of the row-local argmax. Bounded by the nlist contract exactly
    * like the per-row broadcast join it replaces.
    *
    * The frame FILTERS ITSELF: an empty centroid set drops the one
    * row (so a crossJoin against it assigns nothing — the old join
    * shape's no-candidate case — and consumers need no isNotNull
    * filter on the argmax result, which predicate pushdown would
    * otherwise clone into the join condition and pay twice per row),
    * and an oversized set fails loudly instead of dying deep inside
    * the 2 GiB single-row/broadcast limits (nlist × dim is bounded
    * at 1e8 elements ≈ 800 MB of doubles).
    */
  private[operators] def centroidMatrix(cen: DataFrame): DataFrame =
    cen.agg(sort_array(
      collect_list(struct(col("__cid"), col("__cvec")))).as("__cens"))
      .where(when(
        size(col("__cens")).cast("long") *
          coalesce(size(col("__cens")(0)("__cvec")).cast("long"), lit(1L)) >
          lit(100000000L),
        raise_error(lit("centroidMatrix: nlist x dim exceeds 1e8 " +
          "elements - the single-row centroid matrix would approach " +
          "the 2 GiB row/broadcast value limit; raise the stride / " +
          "lower numCentroids")).cast("boolean"))
        .otherwise(size(col("__cens")) > 0))

  /** Corpus→centroid argmax, ROW-LOCAL: the centroid table rides as
    * one broadcast array<struct> row and [[NearestCentroid]] scans it
    * inside the corpus row. vs the previous max(struct) hash
    * aggregation: no corpus×nlist candidate fan-out and — decisive at
    * 100 TB — NO groupBy(corpus_id) exchange of the full (id, vector)
    * corpus (guide §2.4). Tie/null semantics are bit-identical (see
    * [[NearestCentroid]]): highest cos, then lowest cid, exactly the
    * ORDER BY (cos DESC, cid) the oracle uses; an empty centroid set
    * assigns nothing (the old join shape's no-candidate case).
    * @return (corpus_id, __cv vector, __cid assigned centroid)
    */
  private[operators] def ivfAssign(
      corpus: DataFrame, vecCol: String, idCol: String, cen: DataFrame,
      extraCols: Seq[String] = Nil): DataFrame = {
    val m = graft.Cols.unique("__m", corpus)
    // No isNotNull filter on the argmax: the matrix frame is already
    // empty-filtered (see [[centroidMatrix]]), and NearestCentroid is
    // null ⇔ its matrix operand is null/empty — so the filter was
    // pure overhead that pushdown cloned into the BNLJ join condition,
    // evaluating the interpreted centroid scan TWICE per corpus row
    // (round-16 verdict, What's-wrong #1).
    // The barrier stages __cid: downstream joins on __cid otherwise
    // make InferFiltersFromConstraints clone constraint filters
    // (e.g. ivfSearch's probes carry pmod(__cid, stride) = 0) down
    // INTO the BNLJ condition, re-evaluating the interpreted centroid
    // scan per corpus row — observed in the r16 q_ann_ivf plan.
    Dedup.pushdownBarrier(corpus
      .select((col(idCol).as("corpus_id") +: col(vecCol).as("__cv") +:
        extraCols.map(col)): _*)
      .crossJoin(broadcast(centroidMatrix(cen)))
      .withColumn(m, graft.functions.VectorFunctions
        .nearestCentroidNative(col("__cv"), col("__cens"), "cosine"))
      .select((col("corpus_id") +: col("__cv") +:
        col(s"$m.cid").as("__cid") +: extraCols.map(col)): _*))
  }

  private[operators] def ivfSearch(
      assigned: DataFrame,
      cen: DataFrame,
      queries: DataFrame,
      vecCol: String,
      qIdCol: String,
      k: Int,
      nprobe: Int,
      matchCols: Seq[String] = Nil): DataFrame = {
    val wProbe = Window
      .partitionBy(col("query_id"))
      .orderBy(col("__qcos").desc, col("__cid").asc)
    // matchCols narrow the CANDIDATES, not the probes: rows are
    // assigned to their globally-nearest centroid regardless of
    // attribute, so a query must probe the globally-nearest buckets
    // and apply the attribute filter inside them — probing only
    // same-attribute centroids would miss matching rows that live in
    // other buckets.
    val probes = queries
      .select((col(qIdCol).as("query_id") +: col(vecCol).as("__qv") +:
        matchCols.map(col)): _*)
      .join(broadcast(cen))
      .withColumn("__qcos", cosineSimilarityNative(col("__qv"), col("__cvec")))
      .withColumn("__rn", row_number().over(wProbe))
      .where(col("__rn") <= nprobe)
      .select((col("query_id") +: col("__qv") +: col("__cid") +:
        matchCols.map(col)): _*)

    val wRank = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    // No broadcast hint on probes: it scales with |queries| × nprobe
    // (unbounded by contract) — AQE broadcasts when it fits. The
    // centroid broadcasts above stay hinted: nlist = n/stride is
    // bounded by construction (the caller sizes stride so the
    // centroid set is cluster-memory-small; that bound is the IVF
    // design, not an optimizer guess).
    assigned
      .join(probes, "__cid" +: matchCols)
      .withColumn("cosine", round(cosineSimilarityNative(col("__cv"), col("__qv")), 6))
      .withColumn("rank", row_number().over(wRank))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** Persist the IVF assignment as a catalog table bucketed (and
    * sorted) by the centroid id — the "build the index once" step.
    * [[ivfTopK]] shuffles the full corpus twice per call (assignment
    * agg + the __cid search join); with the index persisted, repeated
    * query batches touch the corpus only through the bucketed scan,
    * whose clustering already satisfies the search join — the corpus
    * never shuffles again (same pattern as
    * [[Dedup.writeMinHashSignatures]]).
    */
  def writeIvfIndex(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      table: String,
      stride: Int = 100,
      numBuckets: Int = 64,
      matchCols: Seq[String] = Nil): Unit = {
    val spark = corpus.sparkSession
    ManagedTables.dropAndClearOrphan(spark, table)
    // __cen marks the rows whose vectors ARE the centroid set — the
    // build-time stride sample. [[appendIvfIndex]] writes false for
    // every appended row, so the centroid set is frozen structurally:
    // an appended id that happens to satisfy the stride filter can
    // never silently join the centroid set on later reads.
    // matchCols are carried as plain columns so ONE index serves both
    // unfiltered search and [[filteredTopKFromIndex]].
    graft.sources.Bucketing.clusterForBuckets(
      ivfAssign(corpus, vecCol, idCol,
        centroids(corpus, vecCol, idCol, stride), matchCols)
        .withColumn("__cen", pmod(col("corpus_id"), lit(stride)) === 0),
      Seq("__cid"), numBuckets)
      .write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, "__cid")
      .sortBy("__cid")
      .saveAsTable(table)
    // Self-describing index: the build parameters ride in the table
    // properties so the read path can't silently search with a
    // mismatched stride (wrong centroid sample → wrong buckets → a
    // plausible-looking but low-recall result).
    spark.sql(
      s"ALTER TABLE `$table` SET TBLPROPERTIES (" +
        s"'graft.ivf.stride' = '$stride', " +
        s"'graft.ivf.numBuckets' = '$numBuckets')")
  }

  /** Build parameters recorded by [[writeIvfIndex]] in the table
    * properties, or None for a table without them (not a graft IVF
    * index, or built before the properties existed).
    */
  def readIvfIndexMeta(
      spark: org.apache.spark.sql.SparkSession,
      table: String): Option[(Int, Int)] = {
    val props = spark.sql(s"SHOW TBLPROPERTIES `$table`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for {
      s <- props.get("graft.ivf.stride")
      b <- props.get("graft.ivf.numBuckets")
    } yield (s.toInt, b.toInt)
  }

  /** [[ivfTopK]] over a persisted index (see [[writeIvfIndex]]).
    * The stride is read from the index's own table properties; the
    * centroid set is re-derived from the index itself (rows whose
    * corpus_id samples the stride), so no separate centroid table is
    * needed. Passing `stride` > 0 cross-checks it against the
    * recorded value and fails fast on a mismatch — a wrong stride
    * would not error, it would silently search the wrong buckets.
    */
  /** The persisted index's (full assignment table, centroid set) with
    * the stride cross-check shared by every FromIndex read path.
    */
  private def indexAndCentroids(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      stride: Int): (DataFrame, DataFrame) = {
    val recorded = readIvfIndexMeta(spark, table).map(_._1)
    val effective = (recorded, stride) match {
      case (Some(r), s) if s > 0 =>
        require(r == s,
          s"ivfTopKFromIndex: caller stride $s != stride $r recorded " +
            s"in `$table` table properties (graft.ivf.stride)")
        r
      case (Some(r), _) => r
      case (None, s) if s > 0 => s
      case (None, _) => throw new IllegalArgumentException(
        s"ivfTopKFromIndex: `$table` records no graft.ivf.stride " +
          "property and no stride was passed — rebuild the index with " +
          "writeIvfIndex or pass the build stride explicitly")
    }
    val assigned = spark.table(table)
    // Prefer the structural __cen marker (append-safe, see
    // writeIvfIndex); fall back to the stride filter for indexes
    // written before the marker existed.
    val cen = (if (assigned.columns.contains("__cen"))
        assigned.where(col("__cen"))
      else assigned.where(pmod(col("corpus_id"), lit(effective)) === 0))
      .select(col("corpus_id").as("__cid"), col("__cv").as("__cvec"))
    (assigned, cen)
  }

  def ivfTopKFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      queries: DataFrame,
      vecCol: String,
      qIdCol: String,
      k: Int,
      stride: Int = 0,
      nprobe: Int = 2): DataFrame = {
    val (assigned, cen) = indexAndCentroids(spark, table, stride)
    ivfSearch(assigned, cen, queries, vecCol, qIdCol, k, nprobe)
  }

  /** Attribute-FILTERED top-k over a persisted IVF index — the scale
    * path for [[filteredTopK]], whose exact ranking scans every
    * corpus row sharing the query's attributes (a hot label
    * degenerates to full brute force). Here candidates must match
    * BOTH the probed centroid bucket AND the query's `matchCols`
    * values, so the scored set is the bucket∩attribute intersection:
    * the bucketed scan prunes by geometry, the attribute equi-join
    * prunes by tenancy, and neither re-shuffles the corpus. The index
    * must have been built with the same `matchCols` carried
    * ([[writeIvfIndex]]'s matchCols parameter). Approximate exactly
    * like [[ivfTopKFromIndex]]: a same-attribute neighbour outside
    * the probed buckets is missed — recall/nprobe trade as usual.
    *
    * @return (query id, corpus id, cosine, rank 1..k) — only
    *         same-`matchCols` candidates appear.
    */
  def filteredTopKFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      queries: DataFrame,
      vecCol: String,
      qIdCol: String,
      k: Int,
      matchCols: Seq[String],
      stride: Int = 0,
      nprobe: Int = 2): DataFrame = {
    require(matchCols.nonEmpty,
      "filteredTopKFromIndex needs at least one match column — " +
        "use ivfTopKFromIndex for unfiltered search")
    val (assigned, cen) = indexAndCentroids(spark, table, stride)
    val missing = matchCols.filterNot(assigned.columns.contains)
    require(missing.isEmpty,
      s"filteredTopKFromIndex: index `$table` does not carry " +
        s"column(s) ${missing.mkString(", ")} — rebuild with " +
        s"writeIvfIndex(..., matchCols = Seq(${matchCols.mkString(", ")}))")
    ivfSearch(assigned, cen, queries, vecCol, qIdCol, k, nprobe, matchCols)
  }

  /** Append a new batch of vectors to a persisted IVF index (see
    * [[writeIvfIndex]]) WITHOUT re-clustering — the growth step of an
    * embedded-corpus pipeline (mirror of
    * [[Dedup.appendMinHashSignatures]]): the batch is assigned to the
    * index's EXISTING (build-time, `__cen`-marked) centroid set and
    * its rows land as additional bucketed files under the same bucket
    * spec, so search never re-shuffles the corpus and the index never
    * re-pays the full build. Appended rows are searchable but are
    * never centroids — even when their ids satisfy the build stride
    * filter — keeping search results identical to "assign everything
    * to the original centroids".
    */
  def appendIvfIndex(
      batch: DataFrame,
      vecCol: String,
      idCol: String,
      table: String): Unit = {
    val spark = batch.sparkSession
    val (_, numBuckets) = readIvfIndexMeta(spark, table).getOrElse(
      throw new IllegalArgumentException(
        s"appendIvfIndex: `$table` records no graft.ivf.* table " +
          "properties — create it with writeIvfIndex"))
    val existing = spark.table(table)
    require(existing.columns.contains("__cen"),
      s"appendIvfIndex: `$table` predates the __cen centroid marker — " +
        "rebuild it with writeIvfIndex before appending")
    // Materialize the (bounded, broadcast-sized) centroid set BEFORE
    // the append job: the write must not lazily re-read the table it
    // is appending to.
    val cen = existing.where(col("__cen"))
      .select(col("corpus_id").as("__cid"), col("__cv").as("__cvec"))
      .localCheckpoint(true)
    // An index built with matchCols carries them as plain columns —
    // the appended batch must supply and carry the same ones or the
    // bucketed append would be a schema mismatch.
    val carried = existing.columns.toSeq
      .filterNot(Set("corpus_id", "__cv", "__cid", "__cen"))
    val missing = carried.filterNot(batch.columns.contains)
    require(missing.isEmpty,
      s"appendIvfIndex: `$table` carries column(s) " +
        s"${carried.mkString(", ")} but the batch lacks " +
        s"${missing.mkString(", ")}")
    graft.sources.Bucketing.clusterForBuckets(
      ivfAssign(batch, vecCol, idCol, cen, carried)
        .withColumn("__cen", lit(false)),
      Seq("__cid"), numBuckets)
      .write.mode("append").format("parquet")
      .bucketBy(numBuckets, "__cid")
      .sortBy("__cid")
      .saveAsTable(table)
  }

  /** Compact an IVF index after appends: every [[appendIvfIndex]]
    * call lands one more bucketed file set, and a long-lived index
    * accumulates small files per bucket (more scan tasks, more
    * footer reads). One sibling rewrite (same bucket spec, same
    * properties, same `__cen` markers — see
    * `ManagedTables.rewriteBucketed` for the crash contract) folds
    * them back to a single file set; search results are unchanged.
    */
  def compactIvfIndex(
      spark: org.apache.spark.sql.SparkSession,
      table: String): Unit = {
    val (_, numBuckets) = readIvfIndexMeta(spark, table).getOrElse(
      throw new IllegalArgumentException(
        s"compactIvfIndex: `$table` records no graft.ivf.* table " +
          "properties — create it with writeIvfIndex"))
    ManagedTables.rewriteBucketed(spark, table,
      spark.table(table), numBuckets, Seq("__cid"))
  }

  /** Persist the k-means fit behind [[clusterRoutedTopK]] as a
    * catalog table bucketed (and sorted) by the cluster id — the
    * "fit once, serve many batches" step the routed path needs in
    * production: [[clusterRoutedTopK]] re-runs the full Lloyd loop
    * (iters × corpus×nlist broadcast scans) on EVERY call, which is
    * the right shape for one-off curation but not for a serving
    * index. With the fit persisted, a query batch pays only the
    * probe ranking + the bucketed candidate scan — the corpus never
    * shuffles again (the [[writeIvfIndex]] contract, with one
    * difference: Lloyd centroids are synthetic MEAN vectors, not
    * corpus rows, so they ride the same table as `__cen = true`
    * marker rows and are excluded from search candidates on read).
    */
  def writeKmeansIndex(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      table: String,
      stride: Int = 100,
      iters: Int = 2,
      numCentroids: Int = 0,
      expectedRows: Long = 0L,
      numBuckets: Int = 64,
      scrambleSeeds: Boolean = true): Unit = {
    val spark = corpus.sparkSession
    val (assigned, cen) = kmeansFit(corpus, vecCol, idCol, stride, iters,
      numCentroids, expectedRows, stageCen = true,
      scrambleSeeds = scrambleSeeds)
    ManagedTables.dropAndClearOrphan(spark, table)
    graft.sources.Bucketing.clusterForBuckets(
      assigned
        .select(col("__id").as("corpus_id"), col("__cv"), col("__cid"),
          lit(false).as("__cen"))
        .unionByName(cen.select(col("__cid").as("corpus_id"),
          col("__cvec").as("__cv"), col("__cid"), lit(true).as("__cen"))),
      Seq("__cid"), numBuckets)
      .write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, "__cid")
      .sortBy("__cid")
      .saveAsTable(table)
    spark.sql(
      s"ALTER TABLE `$table` SET TBLPROPERTIES (" +
        s"'graft.kmeans.iters' = '$iters', " +
        s"'graft.kmeans.numBuckets' = '$numBuckets')")
  }

  /** Build parameters recorded by [[writeKmeansIndex]], or None for a
    * table without them (not a graft k-means index).
    */
  def readKmeansIndexMeta(
      spark: org.apache.spark.sql.SparkSession,
      table: String): Option[(Int, Int)] = {
    val props = spark.sql(s"SHOW TBLPROPERTIES `$table`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for {
      i <- props.get("graft.kmeans.iters")
      b <- props.get("graft.kmeans.numBuckets")
    } yield (i.toInt, b.toInt)
  }

  private def kmeansIndexParts(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      caller: String): (DataFrame, DataFrame) = {
    require(readKmeansIndexMeta(spark, table).nonEmpty,
      s"$caller: `$table` records no graft.kmeans.* table properties " +
        "— create it with writeKmeansIndex")
    val t = spark.table(table)
    val cen = t.where(col("__cen"))
      .select(col("__cid"), col("__cv").as("__cvec"))
    val assigned = t.where(!col("__cen"))
      .select(col("corpus_id"), col("__cv"), col("__cid"))
    (assigned, cen)
  }

  /** [[clusterRoutedTopK]] over a persisted index (see
    * [[writeKmeansIndex]]): identical results to the from-scratch
    * call with the same fit parameters, zero fit cost per batch, and
    * the candidate scan rides the table's `__cid` bucketing — the
    * corpus never shuffles.
    */
  def clusterRoutedTopKFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      queries: DataFrame,
      vecCol: String,
      qIdCol: String,
      k: Int,
      nprobe: Int = 4): DataFrame = {
    require(k >= 1, "k must be positive")
    require(nprobe >= 1, "nprobe must be positive")
    val (assigned, cen) =
      kmeansIndexParts(spark, table, "clusterRoutedTopKFromIndex")
    ivfSearch(assigned, cen, queries, vecCol, qIdCol, k, nprobe)
  }

  /** Append a batch to a persisted k-means index WITHOUT re-fitting:
    * the batch is assigned to the index's FROZEN Lloyd centroids
    * (`__cen` rows) and lands as additional bucketed files under the
    * same spec — the [[appendIvfIndex]] growth contract. Appended
    * rows are searchable, never centroids; search equals "assign
    * everything to the original fit", so results stay reproducible
    * until the owner chooses to re-fit (drift is measurable with
    * [[annRecall]] against a brute-force sample).
    */
  def appendKmeansIndex(
      batch: DataFrame,
      vecCol: String,
      idCol: String,
      table: String): Unit = {
    val spark = batch.sparkSession
    val (_, numBuckets) = readKmeansIndexMeta(spark, table).getOrElse(
      throw new IllegalArgumentException(
        s"appendKmeansIndex: `$table` records no graft.kmeans.* table " +
          "properties — create it with writeKmeansIndex"))
    // bounded, broadcast-sized; materialized BEFORE the append job so
    // the write never lazily re-reads the table it appends to
    val cen = spark.table(table).where(col("__cen"))
      .select(col("__cid"), col("__cv").as("__cvec"))
      .localCheckpoint(true)
    graft.sources.Bucketing.clusterForBuckets(
      ivfAssign(batch, vecCol, idCol, cen)
        .select(col("corpus_id"), col("__cv").cast("array<double>").as("__cv"),
          col("__cid"), lit(false).as("__cen")),
      Seq("__cid"), numBuckets)
      .write.mode("append").format("parquet")
      .bucketBy(numBuckets, "__cid")
      .sortBy("__cid")
      .saveAsTable(table)
  }

  /** Compact a k-means index after appends (small-file fold, same
    * crash contract as [[compactIvfIndex]]); search results are
    * unchanged.
    */
  def compactKmeansIndex(
      spark: org.apache.spark.sql.SparkSession,
      table: String): Unit = {
    val (_, numBuckets) = readKmeansIndexMeta(spark, table).getOrElse(
      throw new IllegalArgumentException(
        s"compactKmeansIndex: `$table` records no graft.kmeans.* table " +
          "properties — create it with writeKmeansIndex"))
    ManagedTables.rewriteBucketed(spark, table,
      spark.table(table), numBuckets, Seq("__cid"))
  }

  /** Spherical k-means assignments after `iters` Lloyd passes
    * (cosine argmax; the update step is the per-position mean of each
    * cluster's members). Init is the same deterministic stride sample
    * as [[ivfTopK]] — no RNG, no fitted model to ship — and cluster
    * ids are the initial centroids' corpus ids, stable across
    * iterations. The workhorse of cluster-based curation (SemDeDup
    * pre-clustering, diversity-balanced sampling, topic browsing).
    *
    * Scale shape: each pass is one broadcast of the (bounded, ≤
    * n/stride) centroid set against the corpus + one map-side-partial
    * argmax agg — corpus rows shuffle by id once per pass, vectors
    * never meet vectors. The update is a posexplode + grouped mean
    * whose shuffle carries ≤ partitions·nlist·dim scalar rows, then a
    * nlist-row regroup; nothing touches the driver. Centroid means
    * are rounded to 6 dp at each update so the assignment argmax is
    * reproducible bit-for-bit against a SQL replay (a cross-row float
    * mean has no stable bit pattern; 6 dp is far above the ~1e-13
    * summation-order jitter and far below any real angular margin).
    *
    * Empty clusters drop out (no member → no mean), matching the SQL
    * replay exactly.
    *
    * @return (id, cluster, cosine) — cosine to the final assigned
    *         centroid, rounded to 6 dp; ties break to the lowest
    *         cluster id.
    */
  def kmeansAssignments(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      stride: Int = 100,
      iters: Int = 2,
      numCentroids: Int = 0,
      expectedRows: Long = 0L): DataFrame = {
    val (assigned, _) =
      kmeansFit(df, vecCol, idCol, stride, iters, numCentroids, expectedRows)
    assigned.select(col("__id").as("id"), col("__cid").as("cluster"),
      round(col("__cos"), 6).as("cosine"))
  }

  /** The Lloyd loop behind [[kmeansAssignments]], returning BOTH the
    * final assignment (`__id, __cv, __cid, __cos`) and the centroid
    * table that assignment was scored against (`__cid, __cvec`) — the
    * fitted state [[clusterRoutedTopK]] routes queries with.
    * `stageCen` localCheckpoints the final centroid frame (bounded:
    * nlist×dim scalars) when a SECOND consumer will read it besides
    * the last assignment pass — without it the centroid-update
    * aggregation (a full corpus assignment + posexplode mean) would
    * re-execute per consumer.
    */
  private[operators] def kmeansFit(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      stride: Int = 100,
      iters: Int = 2,
      numCentroids: Int = 0,
      expectedRows: Long = 0L,
      stageCen: Boolean = false,
      scrambleSeeds: Boolean = false): (DataFrame, DataFrame) = {
    require(iters >= 1, "iters must be >= 1")
    require(stride >= 1, "stride must be >= 1")
    // A FIXED stride means k = n/stride grows with the corpus, so the
    // n·k assignment cost turns quadratic and the centroid broadcast
    // unbounded. numCentroids > 0 bounds k instead, deriving stride
    // via [[autoStride]] (pass expectedRows to skip the count job) —
    // the same contract as ivfTopK.
    val effStride =
      if (numCentroids > 0)
        autoStride(
          if (expectedRows > 0) expectedRows else df.select(idCol).count(),
          numCentroids)
      else stride
    val src = df.select(col(idCol).as("__id"), col(vecCol).cast("array<double>").as("__cv"))
    // `id % stride == 0` seed selection COLLIDES with any id-periodic
    // structure in the corpus (measured on the §6b clustered frontier:
    // cluster = id % 50 put every stride-400 seed in ONE true cluster
    // and capped routed recall at 0.42). `scrambleSeeds` decorrelates
    // with a deterministic multiplicative hash (Knuth constant mod a
    // prime) that stays engine-replayable and overflow-safe (operand
    // reduced mod p BEFORE the multiply, so the product is < 2^52).
    val seedKey =
      if (scrambleSeeds)
        pmod(pmod(col("__id"), lit(1000003L)) * lit(2654435761L), lit(1000003L))
      else col("__id")
    var cen = src
      .where(pmod(seedKey, lit(effStride)) === 0)
      .select(col("__id").as("__cid"), col("__cv").as("__cvec"))
    var assigned: DataFrame = null
    for (i <- 1 to iters) {
      if (i == iters && stageCen) cen = cen.localCheckpoint()
      // Row-local argmax against the broadcast centroid matrix — each
      // Lloyd pass used to re-shuffle the full (id, vector) corpus
      // through a groupBy(__id) max(struct) aggregation; now the
      // assignment is a narrow map (see [[ivfAssign]] /
      // [[NearestCentroid]] for the bit-equivalence contract).
      // No isNotNull filter on __m — the matrix frame is already
      // empty-filtered (see [[centroidMatrix]]; the filter would be
      // pushed into the BNLJ condition and pay the centroid scan
      // twice per row).
      assigned = src
        .crossJoin(broadcast(centroidMatrix(cen)))
        .withColumn("__m", graft.functions.VectorFunctions
          .nearestCentroidNative(col("__cv"), col("__cens"), "cosine"))
        .select(col("__id"), col("__cv"),
          col("__m.cid").as("__cid"), col("__m.score").as("__cos"))
      if (i < iters) {
        cen = assigned
          .select(col("__cid"), posexplode(col("__cv")).as(Seq("__pos", "__x")))
          .groupBy(col("__cid"), col("__pos"))
          .agg(round(avg(col("__x")), 6).as("__mv"))
          .groupBy(col("__cid"))
          .agg(transform(
            array_sort(collect_list(struct(col("__pos"), col("__mv")))),
            s => s.getField("__mv")).as("__cvec"))
      }
    }
    (assigned, cen)
  }

  /** CLUSTER-ROUTED exact top-k: route each query to its `nprobe`
    * nearest Lloyd-refined k-means centroids, exact cosine against
    * ONLY those clusters' members. The closure of the measured
    * tight-cluster frontier gap (SURVEY §6b, round 15): on
    * razor-margin clustered geometry every quantizer path saturates
    * ≤ 0.75 recall@10 — k-means routing at TRUE cluster granularity
    * with exhaustive within-cluster search is the path that reaches
    * the 0.9 bar there, because the only approximation left is the
    * routing itself (Lloyd centroids converge to the real cluster
    * centers, and `nprobe` covers a cluster split across cells;
    * distances inside are exact, so sibling margins below any
    * quantization error cost nothing).
    *
    * vs [[ivfTopK]]: identical probe/search plan shape (bounded
    * centroid broadcast, AQE-decided probe join, WindowGroupLimit
    * top-k; corpus never meets corpus) — the difference is the
    * routing table: `iters` Lloyd passes pull the stride-sampled
    * seeds onto the corpus's actual cluster structure, and
    * `numCentroids` is sized to the TRUE cluster count rather than a
    * fixed occupancy. Each Lloyd pass costs one corpus×nlist
    * broadcast scan + one bounded (nlist×dim) mean shuffle — pay it
    * when the geometry is clustered (measure with [[annRecall]]);
    * for isotropic corpora the PQ rerank cascade is cheaper at equal
    * recall.
    *
    * @return (query id, corpus id, cosine 6 dp, rank 1..k,
    *         deterministic tie-break on corpus id).
    */
  def clusterRoutedTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      qIdCol: String,
      k: Int,
      nprobe: Int = 4,
      stride: Int = 100,
      iters: Int = 2,
      numCentroids: Int = 0,
      expectedRows: Long = 0L,
      scrambleSeeds: Boolean = true): DataFrame = {
    require(k >= 1, "k must be positive")
    require(nprobe >= 1, "nprobe must be positive")
    val (assigned, cen) = kmeansFit(corpus, vecCol, idCol, stride, iters,
      numCentroids, expectedRows, stageCen = true,
      scrambleSeeds = scrambleSeeds)
    // Barrier: stages __cid so ivfSearch's join on it cannot pull an
    // inferred isnotnull(nearest_centroid(...).cid) filter down into
    // the assignment BNLJ condition (same disease as [[ivfAssign]]).
    ivfSearch(
      Dedup.pushdownBarrier(assigned
        .select(col("__id").as("corpus_id"), col("__cv"), col("__cid"))),
      cen, queries, vecCol, qIdCol, k, nprobe)
  }

  /** Cluster-scoped embedding near-duplicates (the SemDeDup shape,
    * Abbas et al. 2023: semantic dedup searches only within k-means
    * clusters). Each vector is assigned to its nearest
    * stride-sampled centroid after `iters` Lloyd passes
    * ([[kmeansAssignments]]); candidate pairs form only within a
    * cluster, then exact cosine verifies against `threshold`.
    *
    * vs [[nearDupPairs]] (hyperplane LSH): LSH candidates are
    * recall-tuned per threshold and need L tables; cluster scoping
    * gives ONE partition of the corpus (each vector scans one
    * cluster), which is what you want when the clusters are reused
    * for other curation steps anyway. `maxCluster` drops degenerate
    * clusters (a hub cluster would otherwise emit O(members²) pairs)
    * — the same cap-before-collect discipline as the LSH path; the
    * candidate shuffle carries (id, cluster) rows only, vectors
    * attach by join-back afterwards.
    *
    * @return (id_a, id_b, cosine) with id_a < id_b, cosine ≥
    *         threshold rounded to 6 dp.
    */
  def semanticNearDupPairs(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double,
      stride: Int = 100,
      iters: Int = 1,
      maxCluster: Int = 0,
      numCentroids: Int = 0,
      expectedRows: Long = 0L): DataFrame = {
    val src = Parallelism.spread(df)
    val assigned = kmeansAssignments(src, vecCol, idCol, stride, iters,
      numCentroids, expectedRows)
      .select(col("id").as("__id"), lit(0).as("__bpos"), col("cluster").as("__bkey"))
    val cands = Dedup
      .bucketPairs(assigned, col("__id"), maxCluster)
      .where(col("__a") < col("__b"))
      .select(col("__a").as("id_a"), col("__b").as("id_b"))
      .distinct()
    Dedup.pushdownBarrier(cands
      .repartition(cands.sparkSession.sparkContext.defaultParallelism)
      .join(src.select(col(idCol).as("id_a"), col(vecCol).as("__va")), Seq("id_a"))
      .join(src.select(col(idCol).as("id_b"), col(vecCol).as("__vb")), Seq("id_b")))
      .withColumn("cosine", round(cosineSimilarityNative(col("__va"), col("__vb")), 6))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Stride that keeps the deterministic centroid sample at
    * ≈`targetNlist` members regardless of corpus size:
    * stride = ⌈n / targetNlist⌉, so over dense ids the sample has
    * ⌊(n−1)/stride⌋ + 1 ≤ targetNlist members. The centroid broadcast
    * in [[ivfTopK]] then stays bounded across any corpus growth —
    * the IVF analog of [[autoPlanes]]'s occupancy-constant sizing.
    */
  def autoStride(n: Long, targetNlist: Int = 1024): Int = {
    require(targetNlist >= 1, "targetNlist must be >= 1")
    val s = (math.max(n, 1L) + targetNlist - 1) / targetNlist
    math.min(s, Int.MaxValue.toLong).toInt
  }

  /** Buckets needed so the EXPECTED bucket occupancy stays ~constant
    * as the corpus grows: planes = ⌈log₂(n / targetOccupancy)⌉. With a
    * fixed plane count the bucket universe is fixed (2^planes) and
    * within-bucket pair generation degenerates to all-pairs at scale;
    * scaling planes with log₂ n keeps per-bucket work bounded.
    */
  def autoPlanes(n: Long, targetOccupancy: Int = 32): Int = {
    val raw = math.ceil(
      math.log(math.max(n, 2L).toDouble / targetOccupancy) / math.log(2.0)).toInt
    math.min(28, math.max(8, raw)) // 28: bucket id lives in an int
  }

  /** Tables (OR-amplification) needed for `targetRecall` of pairs AT
    * the decision threshold: per-table collision is P₁ = sᵖ with
    * s = 1 − arccos(threshold)/π, so L = ⌈ln(1−R) / ln(1−sᵖ)⌉ tables
    * give 1 − (1−sᵖ)ᴸ ≥ R. Pairs above the threshold collide with
    * higher probability, so sizing at the threshold is conservative.
    * Capped at `maxTables` — if the cap binds, the configuration is
    * genuinely low-recall and the caller should lower `numPlanes` or
    * accept it.
    */
  def autoTables(
      numPlanes: Int,
      threshold: Double,
      targetRecall: Double = 0.9,
      maxTables: Int = 64): Int = {
    require(threshold > -1.0 && threshold < 1.0, "threshold must be in (-1, 1)")
    require(targetRecall > 0.0 && targetRecall < 1.0, "targetRecall must be in (0, 1)")
    val s = 1.0 - math.acos(threshold) / math.Pi
    val p1 = math.pow(s, numPlanes.toDouble)
    if (p1 >= targetRecall) 1
    else {
      val l = math.ceil(math.log1p(-targetRecall) / math.log1p(-p1)).toInt
      math.min(maxTables, math.max(1, l))
    }
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, candidates
    * from shared hyperplane buckets (self-equality-join — never
    * all-pairs), verified by joining vectors back to the candidate
    * pair list (the bucket shuffle carries only (id, bucket) rows —
    * vectors never multiply by `numTables` on the wire).
    *
    * Scale shape: `numPlanes ≤ 0` (the default) sizes the bucket
    * universe from the corpus count so expected occupancy stays ~32
    * regardless of n — a fixed plane count is a scale bug (2^planes
    * total buckets → within-bucket all-pairs at 100×). More planes
    * cut cost but also recall (P[pair collides] = sᵖ, s = 1 − θ/π);
    * `numTables ≤ 0` (the default) buys it back automatically with
    * [[autoTables]] independent plane tables (banding /
    * OR-amplification: P = 1 − (1 − sᵖ)ᴸ, sized for 0.9 recall at
    * the threshold) — candidates meet if they share a bucket in ANY
    * table. `maxBucket` drops degenerate buckets (hubs / zero-ish
    * vectors) instead of letting one bucket produce O(members²)
    * pairs.
    *
    * `expectedRows` feeds the auto-plane sizing without the extra
    * count job (pass it when the cardinality is known; `numPlanes ≤ 0`
    * with `expectedRows ≤ 0` falls back to a column-pruned count —
    * note that also re-runs `df`'s lineage, so persist an expensive
    * upstream first). Ids must be unique (the verification join fans
    * out otherwise).
    */
  def nearDupPairs(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      threshold: Double,
      numPlanes: Int = 0,
      numTables: Int = 0,
      maxBucket: Int = 0,
      expectedRows: Long = 0L): DataFrame = {
    val planes =
      if (numPlanes > 0) numPlanes
      else if (expectedRows > 0) autoPlanes(expectedRows)
      else autoPlanes(df.select(idCol).count()) // one column-pruned count job
    require(planes <= 30, "bucket id held in an int: numPlanes must be <= 30")
    val tables = if (numTables > 0) numTables else autoTables(planes, threshold)
    val src = Parallelism.spread(df)
    // Bucket-grouped pair generation (one computation of the bucket
    // lineage, one shuffle) — a column-renamed self-join would
    // recompute the hyperplane buckets on both sides. Table t uses
    // the disjoint global plane slice [t·planes, (t+1)·planes); the
    // table index rides along as __bpos so buckets of different
    // tables never join.
    val exploded = src.select(
      col(idCol).as("__id"),
      posexplode(array((0 until tables).map(tbl =>
        hyperplaneBucketNative(col(vecCol), dim, planes, tbl * planes)): _*))
        .as(Seq("__bpos", "__bkey")))
    // distinct BEFORE vectors attach: cross-table duplicate
    // candidates collapse while the rows are still id-sized.
    val cands = Dedup
      .bucketPairs(exploded, col("__id"), maxBucket)
      .where(col("__a") < col("__b"))
      .select(col("__a").as("id_a"), col("__b").as("id_b"))
      .distinct()
    // Verification join-back, one plain join per side (no aggregate:
    // an ObjectHashAggregate over array payloads falls back to
    // sort-based aggregation and sorts the full vector volume). The
    // repartition pins the cosine stage at full parallelism (AQE
    // would coalesce the bytes-tiny pair list to one task); the
    // barrier keeps the cosine filter out of the join condition.
    Dedup.pushdownBarrier(cands
      .repartition(cands.sparkSession.sparkContext.defaultParallelism)
      .join(src.select(col(idCol).as("id_a"), col(vecCol).as("__va")), Seq("id_a"))
      .join(src.select(col(idCol).as("id_b"), col(vecCol).as("__vb")), Seq("id_b")))
      .withColumn("cosine", round(cosineSimilarityNative(col("__va"), col("__vb")), 6))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Margin-based bitext / parallel-pair mining (Artetxe & Schwenk,
    * "Margin-based Parallel Corpus Mining with Multilingual Sentence
    * Embeddings", ACL 2019 — the LASER mining objective): raw cosine
    * over-pairs "hub" vectors that are close to EVERYTHING, so each
    * candidate's cosine is normalized by its two endpoints' average
    * neighborhood cosine —
    * `margin(x,y) = cos(x,y) / ((avgNN_k(x) + avgNN_k(y)) / 2)`
    * (the paper's "ratio" margin) — and each source keeps its best
    * target by margin, thresholded.
    *
    * Distributed shape: BOTH directions derive from ONE score
    * product — the corpus (Y) scans once with the bounded batch (X)
    * broadcast, and the forward top-k (per x over Y) and backward
    * top-k (per y over X) are two windows over that same join. The
    * naive alternative — a second [[bruteForceTopK]] with the roles
    * swapped — scans the |X|-row batch side, so its |X|×|Y| score
    * product and |Y|-group window sort land on however few
    * partitions hold the batch: measured 11.2 s vs 1.2 s at sf1
    * (20k vectors) purely from that serialization. Here both
    * windows ride the corpus scan's parallelism, and WindowGroupLimit
    * trims each side to ≤ k per group BEFORE its exchange. The
    * per-endpoint neighborhood sums are GROUP-SIZED frames broadcast
    * back onto the forward candidates. Nothing in the plan scales
    * with |X|×|Y| beyond the linear score product itself; at index
    * scale, swap to [[marginMineTopK]] — the margin algebra is
    * unchanged.
    *
    * Determinism/replay: candidate cosines are 6-dp-rounded, the
    * neighborhood sums accumulate those rounded values as exact
    * decimals (order-independent — double summation would be
    * partition-ordered), and the margin is one double expression on
    * the decimal sums, identical in the DuckDB oracle.
    *
    * @return one row per source with a surviving best target:
    *         (src_id, tgt_id, cosine, margin), margin ≥ `minMargin`.
    */
  def marginMine(
      src: DataFrame,
      tgt: DataFrame,
      vecCol: String,
      srcIdCol: String,
      tgtIdCol: String,
      k: Int = 8,
      minMargin: Double = 1.0): DataFrame = {
    require(k >= 1, "k must be positive")
    // One score-product SHAPE serves both directions (cosine is
    // symmetric — bit-identically so: the dot and the norm product
    // are commutative FP expressions — and both tie-breaks order by
    // the opposite-side id, so the two windows reproduce the two
    // bruteForceTopK calls exactly). `scored` is a def, so the plan
    // SUBTREE is shared but each direction evaluates its own copy —
    // deliberately: the |corpus|×|batch| product is far larger than
    // the ≤ k-per-row trimmed window outputs, so re-scoring in place
    // (both copies run in parallel over the same spread scan) is
    // preferred over materializing the product via localCheckpoint,
    // which would serialize |corpus|×|batch| rows to disk and read
    // them back. The double-evaluation design measures 0.84 s sf0.1
    // → 1.65 s sf1 = 2.0× for 10× data (tmp/ab_bitext_new_*.json).
    // spread: a small/unsplittable corpus file arrives as 1-2 scan
    // tasks, and the whole |X|x|Y| score product would run there
    // (measured 9.2 s -> sub-second at sf1); no-op on a real wide scan
    val c = Parallelism.spread(tgt)
      .select(col(tgtIdCol).as("corpus_id"), col(vecCol).as("__cv"))
    val q = src.select(col(srcIdCol).as("query_id"), col(vecCol).as("__qv"))
    def scored = c.join(broadcast(q))
      .withColumn("cosine",
        round(cosineSimilarityNative(col("__cv"), col("__qv")), 6))
      .select("query_id", "corpus_id", "cosine")
    val wF = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    val fwd = scored
      .withColumn("rank", row_number().over(wF))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
    // Backward = per CORPUS row over the batch: partitioning by
    // corpus_id keeps every group inside the map partition that
    // produced it, so the group-limit trims to ≤ k rows per corpus
    // row before anything shuffles.
    val wB = Window.partitionBy(col("corpus_id"))
      .orderBy(col("cosine").desc, col("query_id").asc)
    val bwd = scored
      .withColumn("rank", row_number().over(wB))
      .where(col("rank") <= k)
      .select(col("corpus_id").as("query_id"),
        col("query_id").as("corpus_id"), col("cosine"), col("rank"))
    // The batch contract bounds both neighborhood frames (srcNn is
    // |batch|-sized; tgtNn rows outside fwd's candidate set never
    // survive the join), so the hints are safe here.
    marginFromCandidates(fwd, bwd, minMargin, hintBroadcast = true)
  }

  /** Corpus-vs-corpus margin mining: the [[marginMine]] algebra run
    * over [[ivfTopK]] candidate sets instead of brute-force scores —
    * the at-scale composition BENCH_SF1.md's design note calls for.
    * [[marginMine]]'s batch contract makes brute force linear only
    * while ONE side is a bounded batch; mining corpus X against
    * corpus Y (the real parallel-text shape) is |X|×|Y| by
    * construction. Here each direction builds its own IVF (bounded
    * deterministic stride centroids, argmax assignment), so the
    * forward pass scores ~|X|·nprobe/nlist of Y and the backward
    * pass the mirror — linear in both corpora at fixed nlist ratio.
    *
    * Differences from the batch path, both deliberate:
    * - no broadcast hints: the neighborhood frames scale with |X|
    *   and |Y|, so AQE picks the join strategy at runtime;
    * - a pair whose endpoint has an EMPTY candidate set in the
    *   opposite direction (its probed buckets held no rows) is
    *   dropped — its margin denominator is undefined. Raise
    *   `nprobe` to shrink that set; brute force never hits it.
    *
    * Determinism/replay: identical to [[marginMine]] (6-dp candidate
    * cosines, exact-decimal neighborhood sums, one double margin
    * expression) on top of [[ivfTopK]]'s replayable candidates.
    */
  def marginMineTopK(
      src: DataFrame,
      tgt: DataFrame,
      vecCol: String,
      srcIdCol: String,
      tgtIdCol: String,
      k: Int = 8,
      minMargin: Double = 1.0,
      stride: Int = 100,
      nprobe: Int = 2,
      numCentroids: Int = 0,
      expectedSrcRows: Long = 0L,
      expectedTgtRows: Long = 0L): DataFrame = {
    require(k >= 1, "k must be positive")
    val fwd = ivfTopK(tgt, src, vecCol, tgtIdCol, srcIdCol, k,
      stride, nprobe, numCentroids, expectedTgtRows)
    val bwd = ivfTopK(src, tgt, vecCol, srcIdCol, tgtIdCol, k,
      stride, nprobe, numCentroids, expectedSrcRows)
    marginFromCandidates(fwd, bwd, minMargin, hintBroadcast = false)
  }

  /** Hard-negative mining for contrastive training (the DPR recipe,
    * Karpukhin et al., "Dense Passage Retrieval", EMNLP 2020: hard
    * negatives — close to the anchor but NOT positive — train far
    * better encoders than random negatives): for each anchor, the
    * top `k` most-similar corpus rows AFTER excluding the anchor
    * itself and its declared positives.
    *
    * Shape: [[ivfTopK]] fetches `fetchK` candidates per anchor
    * (fetch MORE than k — exclusion eats into the shortlist; fetchK
    * − k is the positive-density budget), one anti-join against the
    * distinct positive pairs, one WindowGroupLimit re-rank. Work is
    * |anchors|·fetchK candidate rows past the IVF probe — linear in
    * both corpora at fixed nlist ratio, same as the mining path.
    *
    * An anchor whose entire shortlist is positives emits fewer than
    * k rows (raise fetchK or nprobe) — silently padding with random
    * ids would poison the training signal.
    *
    * @param positives (posAnchorCol, posIdCol) pairs to exclude;
    *                  duplicates fine.
    * @return (query_id, corpus_id, cosine, rank 1..k) — the mined
    *         negatives, hardest first.
    */
  def hardNegatives(
      corpus: DataFrame,
      anchors: DataFrame,
      positives: DataFrame,
      vecCol: String,
      idCol: String,
      anchorIdCol: String,
      posAnchorCol: String,
      posIdCol: String,
      k: Int,
      fetchK: Int = 0,
      stride: Int = 100,
      nprobe: Int = 2,
      numCentroids: Int = 0,
      expectedRows: Long = 0L): DataFrame = {
    require(k >= 1, "k must be positive")
    val eff = if (fetchK > 0) fetchK else 3 * k
    require(eff >= k, s"fetchK must be >= k, got $eff < $k")
    val cand = ivfTopK(corpus, anchors, vecCol, idCol, anchorIdCol, eff,
      stride, nprobe, numCentroids, expectedRows)
    val pos = positives
      .select(col(posAnchorCol).as("query_id"), col(posIdCol).as("corpus_id"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    cand
      .where(col("query_id") =!= col("corpus_id"))
      .join(pos, Seq("query_id", "corpus_id"), "left_anti")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** The Artetxe–Schwenk ratio-margin algebra over two candidate
    * frames shaped like the top-k kernels' output — forward
    * (query = src) and backward (query = tgt) — shared by the
    * brute-force batch path and the IVF corpus path.
    */
  private def marginFromCandidates(
      fwd0: DataFrame,
      bwd: DataFrame,
      minMargin: Double,
      hintBroadcast: Boolean): DataFrame = {
    val fwd = fwd0
      .select(col("query_id").as("src_id"), col("corpus_id").as("tgt_id"),
        col("cosine"))
    val dec = (c: Column) => c.cast("decimal(10,6)")
    val srcNn = fwd.groupBy(col("src_id"))
      .agg(sum(dec(col("cosine"))).as("__ssum"), count(lit(1)).as("__sn"))
    val tgtNn = bwd.groupBy(col("query_id").as("tgt_id"))
      .agg(sum(dec(col("cosine"))).as("__tsum"), count(lit(1)).as("__tn"))
    val hint = (df: DataFrame) => if (hintBroadcast) broadcast(df) else df
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("margin").desc, col("tgt_id").asc)
    fwd
      .join(hint(srcNn), "src_id")
      .join(hint(tgtNn), "tgt_id")
      .withColumn("margin",
        round(col("cosine") /
          ((col("__ssum").cast("double") / col("__sn") +
            col("__tsum").cast("double") / col("__tn")) / lit(2.0)), 6))
      .withColumn("__rank", row_number().over(w))
      .where(col("__rank") === 1 && col("margin") >= minMargin)
      .select("src_id", "tgt_id", "cosine", "margin")
  }
}
