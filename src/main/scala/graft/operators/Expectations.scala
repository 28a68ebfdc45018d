package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the ingest-gate contract
  * check every pipeline swap should run before a snapshot goes live
  * (the Great-Expectations / dbt-test shape, re-expressed as ONE
  * Spark aggregation pass).
  *
  * Each rule reduces to a violation-indicator column; all row-local
  * rules (not-null, range, regex, foreign-key membership) are summed
  * in a SINGLE `agg` over ONE scan of the fact table — adding a rule
  * adds a codegen'd indicator, never a pass. Referential rules chain
  * a broadcast-ranged left join of the dim's distinct key set in
  * front of the same agg (AQE broadcasts the key set; the fact is
  * still scanned once). Uniqueness needs the key's distinct count —
  * expressed as `count_distinct` over a null-tagged fingerprint in
  * the same agg (Spark plans it as one expand over the shared scan).
  * The result is one bounded row per rule, unpivoted from the single
  * aggregated row with `stack` — no collect, no driver loop.
  */
object Expectations {

  /** One declarative check. `name` and `target` identify the result
    * row; `violated` flags a failing fact row (null-safe: a rule only
    * fires on the condition it owns — range/regex rules skip nulls,
    * which are [[NotNull]]'s job).
    */
  sealed trait Expectation {
    def name: String
    def target: String
  }

  /** Fails rows where `column` is null. */
  final case class NotNull(column: String) extends Expectation {
    def name = "not_null"; def target = column
  }

  /** Fails rows where the non-null numeric value falls outside
    * [lo, hi].
    */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Expectation {
    def name = "in_range"; def target = column
  }

  /** Fails rows where the non-null string value has no match for
    * `pattern` (search semantics — anchor with ^…$ for full-match;
    * keep to the regex subset Java and RE2 agree on).
    */
  final case class MatchesRegex(column: String, pattern: String)
      extends Expectation {
    def name = "regex"; def target = column
  }

  /** Fails duplicate key tuples: violations = rows − distinct keys,
    * with nulls key-tagged so (NULL) duplicates count like any other
    * repeated key.
    */
  final case class Unique(columns: Seq[String]) extends Expectation {
    def name = "unique"; def target = columns.mkString(",")
  }

  /** Fails rows whose non-null `column` value has no partner in
    * `dim`'s `dimKey` — the orphaned-foreign-key audit.
    */
  final case class RefIntegrity(column: String, dim: DataFrame, dimKey: String)
      extends Expectation {
    def name = "ref_integrity"; def target = column
  }

  /** Null-tagged fingerprint making NULL a distinct-countable key
    * value (SURVEY §4 md5-only hashing; mirrors the DuckDB
    * `md5(concat_ws(chr(1), coalesce(c::VARCHAR, chr(0)), …))`).
    */
  private def keyFp(cols: Seq[String]): Column =
    md5(concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))

  /** Validate `df` against `rules`.
    *
    * @return one row per rule:
    *         (rule, target, violations, total, pass) — bounded by the
    *         rule count, computed from one scan of `df` (plus one
    *         broadcast key-set join per [[RefIntegrity]] rule).
    */
  def validate(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "no expectations given")

    // Temp-name hygiene (the Cols.unique discipline, prefix form): the
    // marker/agg names are a generated FAMILY (__v_0, __v_1, …), so
    // pick a prefix no input column starts with — then every derived
    // name is collision-free against a fact table that happens to
    // carry e.g. a __ref_0 column.
    val pfx = Iterator.from(0)
      .map(i => if (i == 0) "__exp" else s"__exp$i")
      .find(p => !df.columns.exists(_.startsWith(p))).get
    def vCol(i: Int) = s"${pfx}_v_$i"
    val totalCol = s"${pfx}_total"

    // Chain the dim key-set joins in front of the shared agg; each
    // marker column is non-null iff the fact's fk has a dim partner.
    var staged = df
    val refMarker = scala.collection.mutable.Map.empty[Int, String]
    rules.zipWithIndex.foreach {
      case (RefIntegrity(c, dim, dimKey), i) =>
        val m = s"${pfx}_ref_$i"
        refMarker(i) = m
        staged = staged.join(
          broadcast(dim.select(col(dimKey).as(c)).distinct()
            .withColumn(m, lit(1))),
          Seq(c), "left")
      case _ => ()
    }

    val aggs: Seq[Column] = count(lit(1)).as(totalCol) +: rules.zipWithIndex.map {
      case (NotNull(c), i) =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(vCol(i))
      case (InRange(c, lo, hi), i) =>
        sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L)
          .otherwise(0L)).as(vCol(i))
      case (MatchesRegex(c, p), i) =>
        sum(when(col(c).isNotNull && !col(c).rlike(p), 1L)
          .otherwise(0L)).as(vCol(i))
      case (Unique(cs), i) =>
        (count(lit(1)) - countDistinct(keyFp(cs))).as(vCol(i))
      case (RefIntegrity(c, _, _), i) =>
        sum(when(col(c).isNotNull && col(refMarker(i)).isNull, 1L)
          .otherwise(0L)).as(vCol(i))
    }

    val one = staged.agg(aggs.head, aggs.tail: _*)
    // Unpivot the single aggregated row into one row per rule.
    val stackArgs = rules.zipWithIndex.flatMap { case (r, i) =>
      Seq(lit(r.name), lit(r.target), col(vCol(i)))
    }
    one.select(col(totalCol),
        stack(Seq(lit(rules.size)) ++ stackArgs: _*).as(Seq("rule", "target", "violations")))
      .select(col("rule"), col("target"),
        // sum over zero rows is null — an empty table violates nothing
        coalesce(col("violations").cast("long"), lit(0L)).as("violations"),
        col(totalCol).as("total"),
        coalesce(col("violations") === 0L, lit(true)).as("pass"))
  }

  /** Capped per-rule samples of OFFENDING rows — the "show me 5 bad
    * rows" ergonomic a real ingest gate pairs with [[validate]]'s
    * counts (a violation count alone sends the operator digging with
    * ad-hoc queries).
    *
    * `orderCol` should be a unique row key (SURVEY §4 window
    * discipline): samples are the `maxPerRule` LOWEST keys per rule,
    * so the result is deterministic and engine-replayable. (Exact
    * duplicate rows — the Unique-rule case — are interchangeable
    * under the cap, so key ties between them cannot change the
    * result set.)
    *
    * Scale shape: ONE scan builds every rule's violation indicator
    * (with the same broadcast dim key-set joins as [[validate]];
    * each Unique rule adds one window count over its key
    * fingerprint — the audit's irreducible shuffle), an explode
    * unpivots to (rule, row) candidates, and the per-rule cap is a
    * `row_number() <= maxPerRule` filter that compiles to
    * `WindowGroupLimit`: every task pre-prunes to maxPerRule rows
    * per rule BEFORE the shuffle, so a 100%-violating corpus still
    * moves only rules × maxPerRule × tasks rows.
    *
    * @return (rule, target, sample_rank 1..maxPerRule, sample_id =
    *         the row's `orderCol`, value = the offending column's
    *         value as string — null for NotNull violations, the key
    *         fingerprint for Unique rules)
    */
  def failingSamples(
      df: DataFrame,
      rules: Seq[Expectation],
      orderCol: String,
      maxPerRule: Int = 5): DataFrame = {
    require(rules.nonEmpty, "no expectations given")
    require(maxPerRule >= 1, "maxPerRule must be >= 1")
    import org.apache.spark.sql.expressions.Window

    val pfx = Iterator.from(0)
      .map(i => if (i == 0) "__exps" else s"__exps$i")
      .find(p => !df.columns.exists(_.startsWith(p))).get

    var staged = df
    val refMarker = scala.collection.mutable.Map.empty[Int, String]
    val uniqCount = scala.collection.mutable.Map.empty[Int, String]
    rules.zipWithIndex.foreach {
      case (RefIntegrity(c, dim, dimKey), i) =>
        val m = s"${pfx}_ref_$i"
        refMarker(i) = m
        staged = staged.join(
          broadcast(dim.select(col(dimKey).as(c)).distinct()
            .withColumn(m, lit(1))),
          Seq(c), "left")
      case (Unique(cs), i) =>
        val m = s"${pfx}_uc_$i"
        uniqCount(i) = m
        staged = staged.withColumn(m,
          count(lit(1)).over(Window.partitionBy(keyFp(cs))))
      case _ => ()
    }

    val entries = rules.zipWithIndex.map { case (r, i) =>
      val (bad, value) = r match {
        case NotNull(c) =>
          (col(c).isNull, col(c).cast("string"))
        case InRange(c, lo, hi) =>
          (col(c).isNotNull && (col(c) < lo || col(c) > hi),
            col(c).cast("string"))
        case MatchesRegex(c, p) =>
          (col(c).isNotNull && !col(c).rlike(p), col(c).cast("string"))
        case Unique(cs) =>
          (col(uniqCount(i)) > 1, keyFp(cs))
        case RefIntegrity(c, _, _) =>
          (col(c).isNotNull && col(refMarker(i)).isNull,
            col(c).cast("string"))
      }
      struct(lit(r.name).as("rule"), lit(r.target).as("target"),
        bad.as("bad"), value.as("value"))
    }

    val eCol = s"${pfx}_e"
    val w = Window.partitionBy(col("rule"), col("target"))
      .orderBy(col("sample_id"))
    staged
      .select(col(orderCol).as("sample_id"),
        explode(array(entries: _*)).as(eCol))
      .where(col(s"$eCol.bad"))
      .select(col(s"$eCol.rule").as("rule"), col(s"$eCol.target").as("target"),
        col("sample_id"), col(s"$eCol.value").as("value"))
      .withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= maxPerRule)
      .select("rule", "target", "sample_rank", "sample_id", "value")
  }
}
