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
