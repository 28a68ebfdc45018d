package graft.operators

import graft.functions.VectorFunctions.squaredL2DistanceNative
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product quantization for
  * nearest neighbor search", TPAMI 2011) — the compression half the
  * IVF design here deliberately left out ([[Similarity]] stores
  * exact vectors per list): each vector splits into `m` subvectors,
  * each subvector quantizes to its subspace's nearest codebook
  * centroid, and a vector becomes `m` small code ids. Search is
  * asymmetric distance computation (ADC): the query builds one
  * lookup table of (subspace, centroid) → exact subdistance, and a
  * corpus vector's approximate distance is the SUM of m table
  * lookups — the corpus float vectors are read exactly once (at
  * encode time), never per query.
  *
  * Scale shape: codebooks are stride-sampled then Lloyd-refined with
  * 6 dp-rounded means (the [[Similarity.kmeansAssignments]]
  * replay discipline, L2 instead of cosine) — `numCentroids` bounds
  * the per-subspace codebook via [[Similarity.autoStride]]
  * (stride = ⌈n/numCentroids⌉) so the broadcast stays ≤ m·numCentroids
  * and the n·k assignment cost stays linear in the corpus at any
  * scale; a caller-fixed `stride` is the spec/calibration path. Encoding shuffles only (id, s, cid)
  * triples (one grouped argmin with map-side partials — never a
  * window over the corpus). The ADC pass joins id-sized code rows
  * against the broadcast LUT and partial-sums map-side; per-query
  * subdistances accumulate in exact DECIMAL(18,6) (order-independent
  * — m rounded doubles summed in shuffle order would drift), and
  * the top-k is a `WindowGroupLimit`-pruned rank per query.
  */
object Pq {

  /** (id, s, subvec as array<double>) — one row per subspace. */
  private def subFrame(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      m: Int): DataFrame = {
    val subDim = dim / m
    val subs = array((0 until m).map(s =>
      slice(col(vecCol), s * subDim + 1, subDim).cast("array<double>")): _*)
    df.where(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"), posexplode(subs).as(Seq("__s", "__sub")))
  }

  /** Per-subspace argmin assignment against the broadcast codebooks:
    * min(struct(dist, cid)) = (dist asc, cid asc), a hash aggregate
    * with map-side partials. Distances round to 6 dp so the argmin
    * (and every replay) is engine-portable.
    *
    * `carrySub` keeps the subvector in the argmin struct — needed
    * ONLY by the Lloyd mean update in [[fitCodebooks]]. The encode
    * path passes false so its per-(id, s) shuffle really moves just
    * (id, s, cid) triples, not the float subvectors (`__cid` is
    * unique per codebook row, so the extra struct field never breaks
    * a tie — dropping it cannot change the argmin).
    */
  private def assign(
      sub: DataFrame,
      cen: DataFrame,
      carrySub: Boolean = true): DataFrame = {
    // Row-local argmin against the per-subspace codebook matrix
    // (array<struct<cid, cvec>>, cid-ascending) — the previous shape
    // fanned every (id, s) row out to k candidate rows and re-shuffled
    // them through a groupBy(__id, __s) min(struct) aggregation; the
    // broadcast join on __s is m rows, and NearestCentroid("l2r6")
    // reproduces min(struct(round(L2²,6), cid)) bit-for-bit (nulls
    // first, ties to the lower cid — see the expression's contract).
    // Same fail-loud bound as Similarity.centroidMatrix: one codebook
    // row must stay far below the 2 GiB row/broadcast value limits —
    // raise at the contract boundary, not deep inside the broadcast
    // build. (k × subdim per __s row; 1e8 doubles ≈ 800 MB.)
    val cenM = cen.groupBy(col("__s"))
      .agg(sort_array(
        collect_list(struct(col("__cid"), col("__cvec")))).as("__cens"))
      .where(when(
        size(col("__cens")).cast("long") *
          coalesce(size(col("__cens")(0)("__cvec")).cast("long"), lit(1L)) >
          lit(100000000L),
        raise_error(lit("pq codebook: k x subdim exceeds 1e8 elements " +
          "per subspace - the single-row codebook matrix would " +
          "approach the 2 GiB row/broadcast value limit; raise the " +
          "stride or m")).cast("boolean"))
        .otherwise(lit(true)))
    val m = sub.join(broadcast(cenM), Seq("__s"))
      .withColumn("__m", graft.functions.VectorFunctions
        .nearestCentroidNative(col("__sub"), col("__cens"), "l2r6"))
    if (carrySub)
      m.select(col("__id"), col("__s"), col("__m.cid").as("__cid"), col("__sub"))
    else
      m.select(col("__id"), col("__s"), col("__m.cid").as("__cid"))
  }

  /** Fit the m per-subspace codebooks: stride-sampled init (the same
    * sampled ids in every subspace — no fitted state to ship, any
    * engine regenerates them), then `iters − 1` Lloyd updates with
    * 6 dp-rounded means. Codebook size per subspace is n/stride —
    * the caller bounds it like IVF's nlist.
    *
    * @return (s, cid, centroid array<double>).
    */
  def fitCodebooks(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      m: Int,
      stride: Int = 0,
      iters: Int = 2,
      numCentroids: Int = 0,
      expectedRows: Long = 0L,
      fitSampleStride: Int = 1): DataFrame = {
    require(m >= 1 && dim % m == 0, "dim must divide into m subspaces")
    require(iters >= 1, "iters must be positive")
    require(stride >= 1 || numCentroids >= 1,
      "pass stride >= 1 or numCentroids >= 1")
    require(fitSampleStride >= 1, "fitSampleStride must be >= 1")
    // A FIXED stride means the per-subspace codebook (n/stride
    // centroids) grows with the corpus, so the n·k assignment cost
    // turns quadratic and the codebook broadcast unbounded.
    // numCentroids > 0 bounds k instead, deriving stride via
    // [[Similarity.autoStride]] (pass expectedRows to skip the count
    // job) — the same contract as ivfTopK / kmeansAssignments.
    val effStride =
      if (numCentroids > 0)
        Similarity.autoStride(
          if (expectedRows > 0) expectedRows
          else corpus.where(col(vecCol).isNotNull).count(),
          numCentroids)
      else stride
    val sub = subFrame(corpus, vecCol, idCol, dim, m)
    // Lloyd refinement trains on a deterministic stride SAMPLE of the
    // corpus (every fitSampleStride-th id — the kmeans-init pattern,
    // so any engine regenerates the same sample): codebook quality
    // needs a representative sample, not every vector, and the full
    // n·k assignment belongs to encode (paid once), not to iters-1
    // fit rounds (round-11 bench: the fit dominated pqTopK's wall).
    // A centroid left with no sampled assignees drops out — both
    // engines replay that identically.
    val fitSub =
      if (fitSampleStride > 1)
        sub.where(pmod(col("__id"), lit(fitSampleStride)) === 0)
      else sub
    var cen = sub.where(pmod(col("__id"), lit(effStride)) === 0)
      .select(col("__s"), col("__id").as("__cid"), col("__sub").as("__cvec"))
    for (_ <- 2 to iters) {
      cen = assign(fitSub, cen)
        .select(col("__s"), col("__cid"),
          posexplode(col("__sub")).as(Seq("__pos", "__x")))
        .groupBy(col("__s"), col("__cid"), col("__pos"))
        .agg(round(avg(col("__x")), 6).as("__mx"))
        .groupBy(col("__s"), col("__cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("__pos"), col("__mx")))),
          e => e.getField("__mx")).as("__cvec"))
    }
    cen.select(col("__s").as("s"), col("__cid").as("cid"), col("__cvec").as("centroid"))
  }

  /** Encode every vector to its m-code array (code position s =
    * nearest centroid id in subspace s). Only (id, s, cid) triples
    * shuffle; the output is one id-sized row per vector.
    *
    * @return (id, code array<long> of length m).
    */
  def encode(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      m: Int,
      codebooks: DataFrame): DataFrame = {
    val cen = codebooks.select(col("s").as("__s"), col("cid").as("__cid"),
      col("centroid").as("__cvec"))
    assign(subFrame(corpus, vecCol, idCol, dim, m), cen, carrySub = false)
      .groupBy(col("__id"))
      .agg(transform(
        array_sort(collect_list(struct(col("__s"), col("__cid")))),
        e => e.getField("__cid")).as("code"))
      .select(col("__id").as("id"), col("code"))
  }

  /** The ADC search half: per-query LUT over the broadcast
    * codebooks, LUT-sum over EXPLODED code rows (corpus_id, s, cid),
    * WindowGroupLimit top-k. Shared by [[pqTopK]] (in-flight codes)
    * and [[pqTopKFromIndex]] (persisted codes).
    */
  private def adcSearch(
      codeRows: DataFrame,
      books: DataFrame,
      queries: DataFrame,
      vecCol: String,
      qIdCol: String,
      k: Int,
      dim: Int,
      m: Int): DataFrame = {
    val lut = subFrame(queries, vecCol, qIdCol, dim, m)
      .join(broadcast(books.select(col("s").as("__s"), col("cid").as("__cid"),
        col("centroid").as("__cvec"))), Seq("__s"))
      .select(col("__id").as("query_id"), col("__s"), col("__cid"),
        round(squaredL2DistanceNative(col("__sub"), col("__cvec")), 6)
          .cast("decimal(18,6)").as("__d"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("corpus_id").asc)
    codeRows
      .join(broadcast(lut), Seq("__s", "__cid"))
      .groupBy(col("query_id"), col("corpus_id"))
      .agg(sum(col("__d")).cast("double").as("adist"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "adist", "rank")
  }

  /** ADC top-k: encode + the LUT-sum search, plus an in-flight fit
    * when no `codebooks` are passed. Approximate by construction —
    * ranks follow the quantized distances; measure with
    * [[Similarity.annRecall]] against [[Similarity.bruteForceTopKL2]].
    *
    * Prefer passing `codebooks` (the frozen output of
    * [[fitCodebooks]] or a persisted index's `table__codebooks`): at
    * scale the fit is paid once per CORPUS, not once per query batch
    * — the fit-per-call default exists as the calibration baseline,
    * and [[pqTopKFromIndex]] is the path that also skips the encode.
    *
    * @return (query_id, corpus_id, adist — approximate squared L2,
    *         6 dp, rank 1..k ascending distance).
    */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      qIdCol: String,
      k: Int,
      dim: Int,
      m: Int,
      stride: Int = 0,
      iters: Int = 2,
      numCentroids: Int = 0,
      expectedRows: Long = 0L,
      fitSampleStride: Int = 1,
      codebooks: DataFrame = null): DataFrame = {
    require(k >= 1, "k must be positive")
    val books = Option(codebooks).getOrElse(
      fitCodebooks(corpus, vecCol, idCol, dim, m, stride, iters,
        numCentroids, expectedRows, fitSampleStride)
        .localCheckpoint())
    val codes = encode(corpus, vecCol, idCol, dim, m, books)
    adcSearch(
      codes.select(col("id").as("corpus_id"),
        posexplode(col("code")).as(Seq("__s", "__cid"))),
      books, queries, vecCol, qIdCol, k, dim, m)
  }

  /** Persist a PQ index: fit + encode ONCE, store the exploded code
    * rows (corpus_id, s, cid — the only corpus-sized state; 2 ints +
    * an id per subspace, ~64× smaller than the float vectors) as
    * `table` and the bounded codebooks as `table__codebooks`. Build
    * parameters ride the table properties so the read path cannot
    * silently search with a mismatched geometry — the same
    * self-describing discipline as [[Similarity.writeIvfIndex]] and
    * the minhash signature tables. This is the index lifecycle the
    * ADC design exists for: the corpus floats are read once at build
    * time, then EVERY query batch pays only LUT-build + code-join.
    */
  def writePqIndex(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      table: String,
      dim: Int,
      m: Int,
      numCentroids: Int = 64,
      iters: Int = 2,
      expectedRows: Long = 0L,
      fitSampleStride: Int = 1): Unit = {
    val spark = corpus.sparkSession
    val books = fitCodebooks(corpus, vecCol, idCol, dim, m, stride = 0,
      iters, numCentroids, expectedRows, fitSampleStride).localCheckpoint()
    // Both tables go through the sibling-rewrite crash contract
    // (ManagedTables.rewriteTable): a rebuild over a live index keeps
    // the old one queryable until each swap, and a crash leaves whole
    // tables, never halves. The two swaps can't be atomic TOGETHER,
    // so a shared buildId ties them: a crash BETWEEN the swaps leaves
    // mismatched ids and [[pqTopKFromIndex]] fails fast instead of
    // searching new codes against old codebooks (or vice versa).
    val buildId = java.util.UUID.randomUUID().toString
    graft.operators.ManagedTables.rewriteTable(
      spark, s"${table}__codebooks", books,
      extraProps = Map("graft.pq.buildId" -> buildId))
    graft.operators.ManagedTables.rewriteTable(
      spark, table,
      encode(corpus, vecCol, idCol, dim, m, books)
        .select(col("id").as("corpus_id"),
          posexplode(col("code")).as(Seq("__s", "__cid"))),
      extraProps = Map(
        "graft.pq.dim" -> dim.toString, "graft.pq.m" -> m.toString,
        "graft.pq.numCentroids" -> numCentroids.toString,
        "graft.pq.iters" -> iters.toString,
        "graft.pq.buildId" -> buildId))
  }

  /** Build parameters recorded by [[writePqIndex]], or None for a
    * table without them.
    */
  def readPqIndexMeta(
      spark: org.apache.spark.sql.SparkSession,
      table: String): Option[(Int, Int, Int, Int)] = {
    val props = spark.sql(s"SHOW TBLPROPERTIES `$table`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for {
      d <- props.get("graft.pq.dim")
      mm <- props.get("graft.pq.m")
      c <- props.get("graft.pq.numCentroids")
      i <- props.get("graft.pq.iters")
    } yield (d.toInt, mm.toInt, c.toInt, i.toInt)
  }

  /** [[pqTopK]] over a persisted index (see [[writePqIndex]]): reads
    * the stored code rows and codebooks, so a query batch never
    * touches the corpus floats and never re-pays the fit. Geometry
    * (dim, m) comes from the index's own table properties — a
    * mismatched caller assumption fails fast instead of producing a
    * plausible-looking wrong ranking.
    */
  def pqTopKFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      queries: DataFrame,
      vecCol: String,
      qIdCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val (dim, m, _, _) = readPqIndexMeta(spark, table).getOrElse(
      throw new IllegalArgumentException(
        s"pqTopKFromIndex: `$table` records no graft.pq.* table " +
          "properties — rebuild it with writePqIndex"))
    // buildId consistency: a crash between writePqIndex's two table
    // swaps leaves codes and codebooks from different builds — a
    // silent wrong ranking if searched. Fail fast instead.
    def buildIdOf(t: String): Option[String] =
      spark.sql(s"SHOW TBLPROPERTIES `$t`")
        .collect().collectFirst {
          case r if r.getString(0) == "graft.pq.buildId" => r.getString(1)
        }
    (buildIdOf(table), buildIdOf(s"${table}__codebooks")) match {
      case (Some(a), Some(b)) if a != b =>
        throw new IllegalStateException(
          s"pqTopKFromIndex: `$table` and `${table}__codebooks` record " +
            s"different graft.pq.buildId values ($a vs $b) — an " +
            "interrupted writePqIndex left them from different builds; " +
            "rerun writePqIndex")
      case _ => ()
    }
    adcSearch(spark.table(table), spark.table(s"${table}__codebooks"),
      queries, vecCol, qIdCol, k, dim, m)
  }
}
