package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Expression-level contract spec for [[graft.functions.NearestCentroid]]
  * (round-16 ADVICE): the row-local argmax/argmin must equal the
  * join + max/min(struct) aggregation it replaced — including the
  * branches the oracle's well-formed finite data never exercises:
  * null vectors, null centroid vectors, null struct ELEMENTS,
  * dimension mismatches, exact ties, NaN/Infinity scores, and
  * empty/singleton centroid sets.
  */
class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-round-16 reference shape: fan the corpus out to every
    * centroid row, score with the SAME native kernels, take
    * max(struct(score, -cid)) (cosine: nulls lose, ties → lowest cid)
    * or min(struct(score, cid)) (l2r6: nulls FIRST, ties → lowest
    * cid). An empty centroid set emits no row.
    */
  private def refAssign(
      corpus: DataFrame, cen: DataFrame, metric: String): DataFrame = {
    val scored = corpus.crossJoin(cen).withColumn("__s",
      if (metric == "cosine")
        VectorFunctions.cosineSimilarityNative(col("vec"), col("cvec"))
      else round(VectorFunctions.squaredL2DistanceNative(col("vec"), col("cvec")), 6))
    if (metric == "cosine")
      scored.groupBy(col("id"))
        .agg(max(struct(col("__s").as("s"), (-col("cid")).as("nc"))).as("m"))
        .select(col("id"), (-col("m.nc")).as("cid"), col("m.s").as("score"))
    else
      scored.groupBy(col("id"))
        .agg(min(struct(col("__s").as("s"), col("cid").as("c"))).as("m"))
        .select(col("id"), col("m.c").as("cid"), col("m.s").as("score"))
  }

  /** NearestCentroid over the same inputs, matrix built exactly like
    * the operators build it (sort_array ∘ collect_list).
    */
  private def exprAssign(
      corpus: DataFrame, cen: DataFrame, metric: String): DataFrame = {
    val matrix = cen.agg(sort_array(
      collect_list(struct(col("cid"), col("cvec")))).as("cens"))
      .where(size(col("cens")) > 0)
    corpus.crossJoin(matrix)
      .withColumn("m",
        VectorFunctions.nearestCentroidNative(col("vec"), col("cens"), metric))
      .select(col("id"), col("m.cid").as("cid"), col("m.score").as("score"))
  }

  private def assertSame(
      corpus: DataFrame, cen: DataFrame, metric: String, clue: String): Unit = {
    val ref = refAssign(corpus, cen, metric).orderBy("id").collect().toSeq
    val got = exprAssign(corpus, cen, metric).orderBy("id").collect().toSeq
    assert(got == ref, s"$clue [$metric]: expression != reference aggregation")
  }

  private def vecs(rows: Seq[(Long, Seq[java.lang.Double])]): DataFrame =
    rows.toDF("id", "vec").select(col("id"), col("vec").cast("array<double>"))

  private def cens(rows: Seq[(Long, Seq[java.lang.Double])]): DataFrame =
    rows.toDF("cid", "cvec").select(col("cid"), col("cvec").cast("array<double>"))

  private def D(xs: Double*): Seq[java.lang.Double] =
    xs.map(java.lang.Double.valueOf)

  test("finite vectors: winner, ties to lowest cid, both metrics") {
    val corpus = vecs(Seq(
      1L -> D(1.0, 0.0), 2L -> D(0.0, 1.0), 3L -> D(0.6, 0.8)))
    // cid 30 duplicates cid 10 → exact tie on every score; the lower
    // cid must win in both metrics.
    val cen = cens(Seq(
      10L -> D(1.0, 0.0), 20L -> D(0.0, 1.0), 30L -> D(1.0, 0.0)))
    assertSame(corpus, cen, "cosine", "finite+ties")
    assertSame(corpus, cen, "l2r6", "finite+ties")
  }

  test("null corpus vector: first (lowest) cid, null score") {
    val corpus = Seq((1L, null: Seq[java.lang.Double]), (2L, Seq(java.lang.Double.valueOf(1.0), java.lang.Double.valueOf(0.0))))
      .toDF("id", "vec").select(col("id"), col("vec").cast("array<double>"))
    val cen = cens(Seq(7L -> D(1.0, 0.0), 3L -> D(0.0, 1.0)))
    assertSame(corpus, cen, "cosine", "null corpus vec")
    assertSame(corpus, cen, "l2r6", "null corpus vec")
  }

  test("null centroid vector: loses under cosine, WINS under l2r6 (nulls first)") {
    val corpus = vecs(Seq(1L -> D(1.0, 0.0)))
    val cen = Seq(
      (5L, null: Seq[java.lang.Double]),
      (9L, Seq(java.lang.Double.valueOf(1.0), java.lang.Double.valueOf(0.0))))
      .toDF("cid", "cvec").select(col("cid"), col("cvec").cast("array<double>"))
    assertSame(corpus, cen, "cosine", "null centroid vec")
    assertSame(corpus, cen, "l2r6", "null centroid vec")
  }

  test("dimension mismatch scores null (losing/winning per metric)") {
    val corpus = vecs(Seq(1L -> D(1.0, 0.0, 0.0)))
    val cen = cens(Seq(2L -> D(1.0, 0.0), 4L -> D(1.0, 0.0, 0.0)))
    assertSame(corpus, cen, "cosine", "dim mismatch")
    assertSame(corpus, cen, "l2r6", "dim mismatch")
  }

  test("zero vector (cosine denominator 0) scores null") {
    val corpus = vecs(Seq(1L -> D(0.0, 0.0)))
    val cen = cens(Seq(2L -> D(1.0, 0.0), 3L -> D(0.0, 1.0)))
    assertSame(corpus, cen, "cosine", "zero vec")
  }

  test("NaN/Infinity elements follow Spark's nan-safe struct ordering") {
    val nan = java.lang.Double.NaN
    val inf = java.lang.Double.POSITIVE_INFINITY
    // NaN cosine (NaN element): max(struct) puts NaN ABOVE any finite
    // score — the NaN candidate must WIN under cosine and LOSE under
    // l2r6's min (NaN above all finite distances).
    val corpus = vecs(Seq(1L -> D(1.0, 2.0), 2L -> D(0.5, 0.5)))
    val cenNaN = Seq(
      (10L, Seq[java.lang.Double](nan, 1.0)),
      (20L, Seq[java.lang.Double](1.0, 2.0)))
      .toDF("cid", "cvec").select(col("cid"), col("cvec").cast("array<double>"))
    assertSame(corpus, cenNaN, "cosine", "NaN centroid element")
    assertSame(corpus, cenNaN, "l2r6", "NaN centroid element")
    val cenInf = Seq(
      (10L, Seq[java.lang.Double](inf, 1.0)),
      (20L, Seq[java.lang.Double](1.0, 2.0)))
      .toDF("cid", "cvec").select(col("cid"), col("cvec").cast("array<double>"))
    assertSame(corpus, cenInf, "cosine", "Inf centroid element")
    assertSame(corpus, cenInf, "l2r6", "Inf centroid element")
  }

  test("empty centroid set assigns nothing; singleton assigns it") {
    val corpus = vecs(Seq(1L -> D(1.0, 0.0)))
    val empty = cens(Seq.empty)
    assert(exprAssign(corpus, empty, "cosine").isEmpty)
    assert(refAssign(corpus, empty, "cosine").isEmpty)
    val one = cens(Seq(42L -> D(0.0, 1.0)))
    assertSame(corpus, one, "cosine", "singleton")
    assertSame(corpus, one, "l2r6", "singleton")
  }

  test("null struct ELEMENT in a user-built matrix is skipped, not NPE") {
    // The internal collect_list builders can't produce this; the
    // public nearestCentroidNative can receive it.
    val df = spark.sql(
      """select array(named_struct('cid', 1L, 'cvec', array(1.0d, 0.0d)),
        |             cast(null as struct<cid: bigint, cvec: array<double>>),
        |             named_struct('cid', 3L, 'cvec', array(0.0d, 1.0d))) as cens,
        |       array(0.0d, 1.0d) as vec""".stripMargin)
    val out = df.select(
      VectorFunctions.nearestCentroidNative(col("vec"), col("cens"), "cosine").as("m"))
      .select(col("m.cid"), col("m.score")).head()
    assert(out.getLong(0) == 3L && out.getDouble(1) == 1.0)
    // All-null elements → null result (nothing to assign to).
    val allNull = spark.sql(
      """select array(cast(null as struct<cid: bigint, cvec: array<double>>)) as cens,
        |       array(1.0d) as vec""".stripMargin)
    assert(allNull.select(VectorFunctions
      .nearestCentroidNative(col("vec"), col("cens"), "cosine")).head().isNullAt(0))
  }

  test("randomized parity sweep over mixed null/tie/mismatch inputs") {
    val rnd = new scala.util.Random(17)
    val dims = Seq(3, 3, 3, 4)
    def randVec(): Seq[java.lang.Double] = {
      val d = dims(rnd.nextInt(dims.length))
      if (rnd.nextInt(10) == 0) null
      else Seq.fill(d)(java.lang.Double.valueOf((rnd.nextInt(7) - 3).toDouble))
    }
    val corpus = (1L to 40L).map(i => (i, randVec())).toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<double>"))
    val cen = (1L to 12L).map(i => (i * 10, randVec())).toDF("cid", "cvec")
      .select(col("cid"), col("cvec").cast("array<double>"))
    assertSame(corpus, cen, "cosine", "random sweep")
    assertSame(corpus, cen, "l2r6", "random sweep")
  }
}
