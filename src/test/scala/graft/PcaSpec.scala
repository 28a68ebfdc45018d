package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigen: known 2x2 and 3x3 spectra") {
    val (e2, v2) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(e2.sorted.zip(Seq(1.0, 3.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // eigenvector for eval 3 is (1,1)/sqrt2 up to sign
    val c3 = e2.indexWhere(e => math.abs(e - 3.0) < 1e-9)
    assert(math.abs(math.abs(v2(0)(c3)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(v2(0)(c3) - v2(1)(c3)) < 1e-12)
    val diag = Array(Array(5.0, 0.0, 0.0), Array(0.0, -2.0, 0.0), Array(0.0, 0.0, 1.0))
    val (e3, _) = Pca.jacobiEigen(diag)
    assert(e3.sorted.zip(Seq(-2.0, 1.0, 5.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("covarianceMatrix: hand-computed 2-dim, symmetric, null vectors skipped") {
    val df = Seq(
      Some(Seq(1.0f, 10.0f)), Some(Seq(2.0f, 20.0f)), Some(Seq(3.0f, 30.0f)),
      None)
      .toDF("v")
    val out = Pca.covarianceMatrix(df, "v", dim = 2)
      .as[(Int, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out.size == 4)
    assert(out((0, 0)) == 1.0) // var{1,2,3}
    assert(out((1, 1)) == 100.0)
    assert(out((0, 1)) == 10.0)
    assert(out((0, 1)) == out((1, 0)))
  }

  test("fit/project: orthonormal components, descending evals, variance matches") {
    val rnd = new scala.util.Random(11)
    // anisotropic cloud: x ~ N scaled 5, y ~ scaled 1, z = tiny noise
    val rows = Seq.fill(300)(Seq(
      (rnd.nextGaussian() * 5).toFloat,
      rnd.nextGaussian().toFloat,
      (rnd.nextGaussian() * 0.01f).toFloat))
    val df = rows.toDF("v")
    val m = Pca.fit(df, "v", dim = 3, k = 3)
    // descending eigenvalues, dominant direction ~x
    assert(m.eigenvalues(0) >= m.eigenvalues(1) && m.eigenvalues(1) >= m.eigenvalues(2))
    assert(math.abs(m.components(0)(0)) > 0.99)
    // orthonormal
    for (a <- 0 until 3; b <- a until 3) {
      val dot = (0 until 3).map(i => m.components(a)(i) * m.components(b)(i)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9, s"($a,$b) -> $dot")
    }
    // per-coordinate sample variance of the projection == eigenvalue
    val proj = Pca.project(df, "v", m).select($"pca").as[Seq[Double]].collect()
    for (c <- 0 until 3) {
      val xs = proj.map(_(c))
      val mu = xs.sum / xs.length
      val sv = xs.map(x => (x - mu) * (x - mu)).sum / (xs.length - 1)
      assert(math.abs(sv - m.eigenvalues(c)) < 1e-3 * math.max(1.0, m.eigenvalues(c)),
        s"coord $c: $sv vs ${m.eigenvalues(c)}")
    }
    // whiten: unit variance on well-conditioned coords
    val white = Pca.project(df, "v", m, whiten = true)
      .select($"pca").as[Seq[Double]].collect()
    for (c <- 0 until 2) {
      val xs = white.map(_(c))
      val mu = xs.sum / xs.length
      val sv = xs.map(x => (x - mu) * (x - mu)).sum / (xs.length - 1)
      assert(math.abs(sv - 1.0) < 0.05, s"whitened coord $c: $sv")
    }
  }

  /** The pre-kernel posexplode moment aggregation, kept as the test
    * reference: generated decimal rows summed by Spark's decimal sum.
    */
  private def explodeMoments(
      df: org.apache.spark.sql.DataFrame,
      vecCol: String,
      dim: Int,
      scale: Int,
      intDigits: Int): Map[Int, java.math.BigDecimal] = {
    val elemP = intDigits + scale
    val prodType = s"decimal(${2 * elemP + 1},${2 * scale})"
    val dec = transform(col(vecCol), x => x.cast(s"decimal($elemP,$scale)"))
    val withOne = concat(
      array(lit(1).cast(prodType)),
      transform(dec, x => x.cast(prodType)),
      flatten(transform(dec, (x, i) =>
        transform(slice(dec, i + 1, lit(dim) - i), y => x * y))))
    df.where(col(vecCol).isNotNull)
      .select(posexplode(withOne).as(Seq("__pos", "__v")))
      .groupBy(col("__pos"))
      .agg(sum(col("__v")).as("__s"))
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
  }

  test("moment kernel equals the decimal explode path on random vectors (nulls included)") {
    val rnd = new scala.util.Random(7)
    def randVec(dim: Int): Seq[Option[Float]] =
      Seq.fill(dim) {
        if (rnd.nextInt(20) == 0) None
        else Some(((rnd.nextGaussian() * 30).toFloat))
      }
    for (dim <- Seq(1, 3, 8)) {
      val rows = Seq.fill(120)(
        if (rnd.nextInt(25) == 0) None else Some(randVec(dim))) :+
        Some(Seq.fill(dim)(Option(99.9f))) // near the intDigits=2 edge
      val df = rows.toDF("v").repartition(7)
      val got = Pca.momentFrame(df, "v", dim, scale = 6, intDigits = 2)
        .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
      val want = explodeMoments(df, "v", dim, scale = 6, intDigits = 2)
      assert(got.keySet == want.keySet, s"dim=$dim")
      for ((k, w) <- want)
        assert(got(k).compareTo(w) == 0, s"dim=$dim pos=$k: ${got(k)} vs $w")
    }
  }

  test("moment kernel 128-bit slots: sums past Long range match the BigDecimal path") {
    // elemP = 9 values near ±999: each product's unscaled magnitude is
    // ~1e18, so a handful of rows pushes a slot past 2^63 and through
    // the hi/lo carry path
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(40)(Seq.fill(2)(
      Option(((rnd.nextBoolean().compare(false) * 2 - 1) * (990 + rnd.nextInt(10)) +
        rnd.nextDouble()).toFloat)))
    val df = rows.toDF("v").repartition(5)
    val got = Pca.momentFrame(df, "v", dim = 2, scale = 6, intDigits = 3)
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    val want = explodeMoments(df, "v", dim = 2, scale = 6, intDigits = 3)
    assert(got.keySet == want.keySet)
    for ((k, w) <- want) assert(got(k).compareTo(w) == 0, s"pos=$k: ${got(k)} vs $w")
    // and the triangle sums really did exceed Long range in unscaled units
    val maxAbs = want.values.map(_.unscaledValue.abs).max
    assert(maxAbs.compareTo(java.math.BigInteger.valueOf(Long.MaxValue)) > 0,
      s"test did not exercise the 128-bit path (max unscaled $maxAbs)")
  }

  test("momentFrame: empty corpus yields zero rows on both paths") {
    val df = Seq.empty[Option[Seq[Option[Float]]]].toDF("v")
    assert(Pca.momentFrame(df, "v", 3, scale = 6, intDigits = 2).count() == 0)
    assert(Pca.momentFrame(df, "v", 3, scale = 6, intDigits = 5).count() == 0)
  }

  test("fit is bit-deterministic under repartitioning (exact decimal moments)") {
    val rnd = new scala.util.Random(3)
    val df = Seq.fill(200)(Seq.fill(4)(rnd.nextGaussian().toFloat)).toDF("v")
    val a = Pca.fit(df, "v", dim = 4, k = 2)
    val b = Pca.fit(df.repartition(17), "v", dim = 4, k = 2)
    assert(a.mean.toSeq == b.mean.toSeq)
    assert(a.eigenvalues.toSeq == b.eigenvalues.toSeq)
    assert(a.components.map(_.toSeq).toSeq == b.components.map(_.toSeq).toSeq)
  }
}
