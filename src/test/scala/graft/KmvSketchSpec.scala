package graft

import graft.functions.KmvBuffer
import graft.operators.Profile

import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("KmvBuffer: keeps the k smallest distinct values, sorted") {
    val buf = new KmvBuffer(4)
    Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L, 9L, 5L).foreach(buf.insert)
    assert(buf.n == 4)
    assert(buf.arr.take(4).toSeq == Seq(1L, 2L, 3L, 5L))
    // rejects values above the current max once full
    buf.insert(6L)
    assert(buf.arr.take(4).toSeq == Seq(1L, 2L, 3L, 5L))
    // accepts a new minimum
    buf.insert(0L)
    assert(buf.arr.take(4).toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("KmvBuffer: order-independent (set semantics)") {
    val vals = Seq.tabulate(200)(i => (i * 2654435761L) % 100000)
    val a = new KmvBuffer(16)
    val b = new KmvBuffer(16)
    vals.foreach(a.insert)
    vals.reverse.foreach(b.insert)
    assert(a.n == b.n)
    assert(a.arr.take(a.n).toSeq == b.arr.take(b.n).toSeq)
    // merge of two halves == single-pass insert
    val (l, r) = vals.splitAt(97)
    val m1 = new KmvBuffer(16)
    val m2 = new KmvBuffer(16)
    l.foreach(m1.insert)
    r.foreach(m2.insert)
    (0 until m2.n).foreach(i => m1.insert(m2.arr(i)))
    assert(m1.arr.take(m1.n).toSeq == a.arr.take(a.n).toSeq)
  }

  test("distinctKmv: exact below k, partitioning-invariant") {
    val df = (1 to 300).map(i => ("g" + (i % 3), "v" + (i % 90))).toDF("g", "v")
    val out = Profile.distinctKmv(df, "g", "v", k = 256)
      .as[(String, Int, Double)].collect()
      .map { case (g, n, e) => g -> ((n, e)) }.toMap
    // each group sees exactly 30 distinct values -> exact branch
    val byG = (1 to 300).groupBy(i => "g" + (i % 3))
      .map { case (g, is) => g -> is.map(i => "v" + (i % 90)).distinct.size }
    byG.foreach { case (g, nd) =>
      val (n, e) = out(g)
      assert(n == nd && e == nd.toDouble, s"group $g: got ($n, $e), want $nd")
    }
    // invariant under repartitioning (set semantics end-to-end)
    val out2 = Profile.distinctKmv(df.repartition(13), "g", "v", k = 256)
      .as[(String, Int, Double)].collect()
      .map { case (g, n, e) => g -> ((n, e)) }.toMap
    assert(out2 == out)
  }

  test("distinctKmv: estimate within ~3/sqrt(k) of truth when sketching") {
    val truth = 20000
    val df = (1 to 60000).map(i => ("all", "tok" + (i % truth))).toDF("g", "v")
    val Seq((n, est)) = Profile.distinctKmv(df, "g", "v", k = 1024)
      .select(col("n_kept"), col("est_distinct"))
      .as[(Int, Double)].collect().toSeq
    assert(n == 1024)
    val relErr = math.abs(est - truth) / truth
    assert(relErr < 3.0 / math.sqrt(1024), s"est $est vs $truth (relErr $relErr)")
  }

  test("distinctKmv: nulls skipped, empty input -> empty output") {
    val df = Seq(("g", Option("a")), ("g", None), ("g", Option("b")))
      .toDF("g", "v")
    val Seq((n, e)) = Profile.distinctKmv(df, "g", "v", k = 8)
      .select(col("n_kept"), col("est_distinct"))
      .as[(Int, Double)].collect().toSeq
    assert(n == 2 && e == 2.0)
    assert(Profile.distinctKmv(df.limit(0), "g", "v", k = 8).count() == 0)
  }

  test("overlapKmv: exact branch below k — identical, disjoint, partial") {
    def row(a: Seq[String], b: Seq[String]) =
      Profile.overlapKmv(a.toDF("v"), b.toDF("v"), "v", k = 64)
        .select(col("n_union_kept"), col("est_a"), col("est_b"),
          col("est_union"), col("inter_kept"), col("est_inter"),
          col("jaccard_kmv"))
        .as[(Int, Double, Double, Double, Int, Double, Double)].head()
    // identical 10-element sets: everything exact, jaccard 1
    val same = (1 to 10).map("x" + _)
    assert(row(same, same) == ((10, 10.0, 10.0, 10.0, 10, 10.0, 1.0)))
    // disjoint sets
    val (n1, _, _, eu1, c1, ei1, j1) = row((1 to 10).map("a" + _), (1 to 5).map("b" + _))
    assert(n1 == 15 && eu1 == 15.0 && c1 == 0 && ei1 == 0.0 && j1 == 0.0)
    // half overlap: A = 1..10, B = 6..15 -> union 15, inter 5
    val (n2, ea2, eb2, eu2, c2, ei2, j2) =
      row((1 to 10).map("t" + _), (6 to 15).map("t" + _))
    assert(n2 == 15 && ea2 == 10.0 && eb2 == 10.0 && eu2 == 15.0)
    assert(c2 == 5 && ei2 == 5.0 && math.abs(j2 - 5.0 / 15) < 1e-6)
  }

  test("overlapKmv: sketch-branch estimates track truth within ~4/sqrt(k)") {
    // |A| = 12k, |B| = 10k, |A ∩ B| = 4k (ids 8000..11999)
    val a = (0 until 12000).map(i => "id" + i)
    val b = (8000 until 18000).map(i => "id" + i)
    val k = 1024
    val (estA, estB, estU, estI) =
      Profile.overlapKmv(a.toDF("v"), b.toDF("v"), "v", k = k)
        .select(col("est_a"), col("est_b"), col("est_union"), col("est_inter"))
        .as[(Double, Double, Double, Double)].head()
    val tol = 4.0 / math.sqrt(k)
    assert(math.abs(estA - 12000) / 12000 < tol, s"est_a $estA")
    assert(math.abs(estB - 10000) / 10000 < tol, s"est_b $estB")
    assert(math.abs(estU - 18000) / 18000 < tol, s"est_union $estU")
    // intersection variance is higher (ratio of two estimates)
    assert(math.abs(estI - 4000) / 4000 < 3 * tol, s"est_inter $estI")
  }

  test("overlapKmv: partitioning-invariant and null-safe") {
    val a = (0 until 3000).map(i => Option("k" + i)) :+ None
    val b = (1500 until 4500).map(i => Option("k" + i)) :+ None
    val r1 = Profile.overlapKmv(a.toDF("v"), b.toDF("v"), "v", k = 128).collect().toSeq
    val r2 = Profile.overlapKmv(
      a.toDF("v").repartition(11), b.toDF("v").repartition(7), "v", k = 128)
      .collect().toSeq
    assert(r1 == r2)
  }
}
