package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance pair mining over a string key set.
  *
  * The naive way to find "which keys are one typo apart" is an
  * all-pairs `levenshtein` — O(V²) comparisons over the distinct
  * value set, hopeless once V is the vocabulary / URL / entity-name
  * space of a 100 TB corpus. Deletion-neighborhood blocking (the
  * FastSS / SymSpell family: Bocek et al., "Fast Similarity Search in
  * Big Data and Dictionaries", 2007) makes the candidate generation
  * LINEAR: every value emits itself plus its `len` single-character
  * deletions as blocking keys, and two strings at Levenshtein
  * distance ≤ 1 are GUARANTEED to share a key —
  *
  *  - substitution at position i: both sides share the deletion at i;
  *  - single insert/delete: the shorter string IS a deletion variant
  *    of the longer, and every value also emits itself.
  *
  * So the equi-join on the key recovers every true pair
  * (completeness), and a cheap verify filter (`levenshtein ≤ 1` on
  * the candidate, at most dist-2 by construction) removes the false
  * ones. Like the LSH operators — and unlike coarse blocking — the
  * buckets hold only near-candidates, so the join stays near-linear
  * on natural key sets; `maxBucket` drops pathological buckets (a
  * deterministic cap an oracle can mirror with `HAVING`).
  *
  * Cost shape at scale: one distinct over the value set, a linear
  * key explode (avg `len`+1 keys/value), one equi-join whose bucket
  * sizes are near-dup-bounded, one `levenshtein` per surviving
  * candidate. No cross join anywhere.
  */
object Fuzzy {

  /** All unordered pairs of DISTINCT values of `valueCol` at
    * Levenshtein distance exactly 1 (distinct values at distance 0
    * cannot exist, so `dist` is always 1; the column is kept so the
    * contract survives a future maxDist > 1 extension).
    *
    * @param minLen/maxLen value-length gate (values outside are
    *        ignored; keeps the key explode bounded and drops the
    *        degenerate 1-char space where everything matches).
    * @param maxBucket if > 0, blocking keys shared by more than
    *        `maxBucket` values are dropped entirely (deterministic —
    *        both sides of a pair see the same drop).
    * @return (a, b, dist) with a < b lexicographically.
    */
  def editDistancePairs(
      df: DataFrame,
      valueCol: String,
      minLen: Int = 2,
      maxLen: Int = 64,
      maxBucket: Int = 0): DataFrame = {
    require(minLen >= 2, "minLen must be >= 2 (1-char values block on the empty string)")
    require(maxLen >= minLen, "maxLen must be >= minLen")
    val vals = Parallelism.spread(df)
      .where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("string").as("__v"))
      .where(length(col("__v")).between(minLen, maxLen))
      .distinct()
    // {v} ∪ single-character deletions of v. Deletion at 0-based i
    // is prefix(1..i) ++ suffix(i+2..): 1-based substr arithmetic
    // identical to the oracle's.
    val v = col("__v")
    val keys = vals.select(v,
      explode(concat(
        array(v),
        transform(sequence(lit(0), length(v) - 1), i =>
          concat(v.substr(lit(1), i), v.substr(i + lit(2), length(v))))))
        .as("__key"))
    val capped =
      if (maxBucket > 0) {
        // Oversize buckets are dropped wholesale — a deterministic
        // cap (HAVING count <= maxBucket in the oracle), not a
        // per-bucket truncation that would depend on row order. The
        // count rides a window over __key, which hash-partitions the
        // frame by __key — the self-join below then needs NO further
        // exchange (filter/project preserve the partitioning).
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__key"))
        keys.withColumn("__bn", count(lit(1)).over(w))
          .where(col("__bn") <= maxBucket)
          .drop("__bn")
      } else keys
    // Verify BEFORE dedup: levenshtein is codegen'd row-local work,
    // so filtering the K² candidate stream first means the distinct
    // only shuffles TRUE pairs (a ~6× smaller exchange here).
    // THRESHOLD form (round-17): candidates are dist ≤ 2 by
    // construction but mostly dist 2 (false positives of the
    // blocking); levenshtein(l, r, 1) runs the banded O(len·1) DP
    // and early-exits to -1 past the bound instead of filling the
    // full O(len²) matrix — for kept rows it returns the exact
    // distance, so `dist` and the kept set are bit-identical
    // (dist ≥ 0 ⇔ true distance ≤ 1).
    capped.as("l").join(capped.as("r"), col("l.__key") === col("r.__key"))
      .where(col("l.__v") < col("r.__v"))
      .withColumn("dist", levenshtein(col("l.__v"), col("r.__v"), 1))
      .where(col("dist") >= 0)
      .select(col("l.__v").as("a"), col("r.__v").as("b"), col("dist"))
      .distinct() // a pair can share several keys; emit once
  }

  /** Native Jaro–Winkler similarity column (DuckDB
    * `jaro_winkler_similarity` semantics — see
    * [[graft.functions.FuzzyKernels.jaroWinkler]]): the
    * edit-distance family's GRADED cousin, weighting shared prefixes
    * — the name/title matcher (edit distance treats "jonathan" vs
    * "jonathon" and "jonathan" vs "zonathan" identically; JW does
    * not).
    */
  def jaroWinkler(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.JaroWinklerExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))

  /** Jaro–Winkler pairs within `blockBy` groups — [[editDistancePairs]]
    * has a completeness guarantee from its deletion neighborhoods;
    * JW has no such exact blocking, so candidacy is an EXPLICIT,
    * user-chosen blocking key (an extracted numeric id, a phonetic
    * key, a length band — whatever survives the expected typo class;
    * recall is scoped to pairs sharing a block, by contract). Within
    * blocks: the §5 bucket-grouped pair pattern (collect + double
    * explode, never a corpus self-join), one codegen'd JW kernel per
    * candidate, 6 dp rounding.
    *
    * @return (value_a, value_b, jw ≥ threshold, 6 dp), value_a <
    *         value_b, distinct across blocks.
    */
  def jaroWinklerPairs(
      df: DataFrame,
      valueCol: String,
      blockBy: Seq[String],
      threshold: Double = 0.9,
      maxBlock: Int = 0): DataFrame = {
    require(blockBy.nonEmpty,
      "jaroWinklerPairs needs an explicit blocking key (JW has no " +
        "exact-blocking guarantee; see editDistancePairs for typo-class joins)")
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val exploded = Parallelism.spread(df)
      .where(col(valueCol).isNotNull &&
        blockBy.map(col(_).isNotNull).reduce(_ && _))
      .select(col(valueCol).cast("string").as("__v"),
        lit(0).as("__bpos"), struct(blockBy.map(col): _*).as("__bkey"))
      .distinct()
    Dedup.bucketPairs(exploded, col("__v"), maxBlock)
      .where(col("__a") < col("__b"))
      .select(col("__a").as("value_a"), col("__b").as("value_b"))
      .distinct() // the same value pair can share several blocks
      .withColumn("jw",
        round(jaroWinkler(col("value_a"), col("value_b")), 6))
      .where(col("jw") >= threshold)
  }
}
