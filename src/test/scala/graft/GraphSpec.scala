package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Independent plain-Scala reference of the pageRank contract:
    * same rounding points, same DECIMAL-exact sums (exact
    * micro-units via Long), same dangling redistribution.
    */
  private def reference(
      edges: Seq[(String, String)],
      iters: Int,
      d: Double = 0.85): Map[String, Double] = {
    val w = edges.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val ow = w.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var rank = nodes.map(_ -> r6(1.0 / n)).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map[String, Long]()
      w.foreach { case ((s, t), wt) =>
        val c = r6(rank(s) * wt / ow(s))
        contrib(t) = contrib.getOrElse(t, 0L) + math.round(c * 1e6)
      }
      val dang = nodes.filterNot(ow.contains)
        .map(v => math.round(rank(v) * 1e6)).sum
      rank = nodes.map { v =>
        v -> r6((1.0 - d) / n +
          d * (contrib.getOrElse(v, 0L) / 1e6 + dang / 1e6 / n))
      }.toMap
    }
    rank
  }

  test("pageRank: matches the exact-arithmetic reference; dangling mass redistributes") {
    // B has the most in-links; D is DANGLING (no out-edges); the A->B
    // double link exercises multigraph weighting
    val edges = Seq(
      ("A", "B"), ("A", "B"), ("A", "D"),
      ("B", "C"), ("C", "A"), ("C", "B"), ("E", "B"))
    val out = Graph.pageRank(edges.toDF("s", "t"), "s", "t", iters = 4)
      .as[(String, Double)].collect().toMap
    val ref = reference(edges, iters = 4)
    assert(out.keySet == ref.keySet)
    out.foreach { case (v, r) => assert(r == ref(v), s"node $v: $r vs ${ref(v)}") }
    // structure sanity: the most-linked node outranks the dangling one
    assert(out("B") > out("D"))
    // total mass stays ~1 (rounding drift bounded by nodes x 1e-6 x iters)
    assert(math.abs(out.values.sum - 1.0) < 5e-5)
  }

  test("pageRank: validates inputs") {
    intercept[IllegalArgumentException] {
      Graph.pageRank(Seq(("A", "B")).toDF("s", "t"), "s", "t", iters = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(Seq(("A", "B")).toDF("s", "t"), "s", "t", damping = 1.0)
    }
  }
}
