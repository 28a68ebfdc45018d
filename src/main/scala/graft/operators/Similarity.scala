package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
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
      numPlanes: Int = 8): DataFrame = {
    val c = corpus.select(
      col(idCol).as("corpus_id"),
      col(vecCol).as("__cv"),
      hyperplaneBucketNative(col(vecCol), dim, numPlanes).as("__bucket"))
    val q = queries.select(
      col(qIdCol).as("query_id"),
      col(vecCol).as("__qv"),
      hyperplaneBucketNative(col(vecCol), dim, numPlanes).as("__bucket"))
    val scored = c
      .join(broadcast(q), Seq("__bucket"))
      .withColumn("cosine", round(cosineSimilarityNative(col("__cv"), col("__qv")), 6))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, candidates
    * from shared hyperplane buckets (self-equality-join — never
    * all-pairs).
    */
  def nearDupPairs(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      threshold: Double,
      numPlanes: Int = 6): DataFrame = {
    val bucketed = df.select(
      col(idCol).as("__id"),
      col(vecCol).as("__v"),
      hyperplaneBucketNative(col(vecCol), dim, numPlanes).as("__bucket"))
    val a = bucketed.select(col("__id").as("id_a"), col("__v").as("__va"), col("__bucket"))
    val b = bucketed.select(col("__id").as("id_b"), col("__v").as("__vb"), col("__bucket"))
    a.join(b, Seq("__bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", round(cosineSimilarityNative(col("__va"), col("__vb")), 6))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
      .distinct()
  }
}
