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

  private def lp(
      edges: Seq[(String, String)],
      seeds: Seq[(String, String)],
      iters: Int): Map[String, (String, Boolean)] =
    Graph.labelPropagate(edges.toDF("s", "d"), "s", "d",
        seeds.toDF("id", "lab"), "id", "lab", iters)
      .as[(String, String, Boolean)].collect()
      .map { case (id, l, sd) => id -> ((l, sd)) }.toMap

  test("labelPropagate: majority vote, tie to smaller label, clamped seeds, reach") {
    // A='spam', B='good' seeds; C ties (1 spam + 1 good -> 'good');
    // D is 2 hops out (labeled only from iter 2); H sees a 2-spam
    // majority; A's only neighbor votes good but A is CLAMPED.
    val edges = Seq(
      ("A", "C"), ("B", "C"), ("C", "D"), ("B", "E"),
      ("F", "H"), ("G", "H"), ("B", "H"),
      ("X", "Y")) // no labeled node ever reaches X/Y
    val seeds = Seq(
      ("A", "spam"), ("B", "good"), ("F", "spam"), ("G", "spam"))
    val out = lp(edges, seeds, iters = 3)
    assert(out("A") == ("spam", true), "seed clamped against its neighborhood")
    assert(out("B") == ("good", true))
    assert(out("C") == ("good", false), "1-1 tie breaks to the smaller label")
    assert(out("D") == ("good", false), "2-hop node labeled on iteration 2")
    assert(out("E") == ("good", false))
    assert(out("H") == ("spam", false), "2-1 spam majority")
    assert(!out.contains("X") && !out.contains("Y"), "unreached nodes stay absent")
  }

  test("labelPropagate: one iteration labels only direct neighbors") {
    val out = lp(Seq(("A", "C"), ("C", "D")), Seq(("A", "x")), iters = 1)
    assert(out == Map("A" -> (("x", true)), "C" -> (("x", false))))
  }

  test("labelPropagate: conflicting duplicate seeds collapse to the min label") {
    val out = lp(Seq(("A", "B")), Seq(("A", "z"), ("A", "a")), iters = 1)
    assert(out("A") == ("a", true))
    assert(out("B") == ("a", false))
  }

  test("labelPropagate: partitioning-invariant and validates iters") {
    val edges = (0L until 400L)
      .map(i => (s"n${i % 40}", s"n${(i * 3 + 7) % 40}"))
    val seeds = Seq(("n0", "l0"), ("n13", "l1"), ("n27", "l2"))
    val base = lp(edges, seeds, iters = 3)
    val shuffled = Graph.labelPropagate(
        edges.toDF("s", "d").repartition(13), "s", "d",
        seeds.toDF("id", "lab").repartition(5), "id", "lab", 3)
      .as[(String, String, Boolean)].collect()
      .map { case (id, l, sd) => id -> ((l, sd)) }.toMap
    assert(base == shuffled)
    assert(base.values.exists(!_._2), "propagation reached unseeded nodes")
    intercept[IllegalArgumentException] {
      Graph.labelPropagate(edges.toDF("s", "d"), "s", "d",
        seeds.toDF("id", "lab"), "id", "lab", iters = 0)
    }
  }

  test("triangleStats: K4, star, and path hand-counts; normalization; determinism") {
    // K4: 4 nodes, 6 edges, 4 triangles, wedges = 4*C(3,2) = 12,
    // clustering = 3*4/12 = 1.0. Input deliberately dirty: reversed
    // duplicates, parallel edges, one self-loop.
    val k4 = (for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d") if a != b
    } yield (a, b)) ++ Seq(("a", "b"), ("c", "c"))
    val got = Graph.triangleStats(k4.toDF("s", "d"), "s", "d")
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(got == ((4L, 6L, 12L, 4L, Some(1.0))))
    // star: hub with 5 leaves — C(5,2) = 10 wedges, 0 triangles
    val star = (1 to 5).map(i => ("hub", s"l$i"))
    val s5 = Graph.triangleStats(star.toDF("s", "d"), "s", "d").as[(Long, Long, Long, Long, Option[Double])].head()
    assert(s5 == ((6L, 5L, 10L, 0L, Some(0.0))))
    // path a-b-c: 1 wedge, 0 triangles
    val p = Graph.triangleStats(Seq(("a", "b"), ("b", "c")).toDF("s", "d"),
      "s", "d").as[(Long, Long, Long, Long, Option[Double])].head()
    assert(p == ((3L, 2L, 1L, 0L, Some(0.0))))
    // only self-loops -> empty graph, null clustering
    val e = Graph.triangleStats(Seq(("x", "x")).toDF("s", "d"), "s", "d")
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(e == ((0L, 0L, 0L, 0L, None)))
    // determinism under repartitioning on a hub-skewed random graph
    val rnd = new scala.util.Random(3)
    val big = Seq.fill(600)((s"n${rnd.nextInt(25)}", s"n${rnd.nextInt(25)}")) ++
      (1 to 100).map(i => ("hubby", s"n${i % 25}")) // degree-skew stressor
    val x = Graph.triangleStats(big.toDF("s", "d"), "s", "d").as[(Long, Long, Long, Long, Option[Double])].head()
    val y = Graph.triangleStats(big.toDF("s", "d").repartition(17), "s", "d")
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(x == y)
    // cross-check the triangle count against a brute-force model
    val undSet = big.filter(t => t._1 != t._2)
      .map(t => (Seq(t._1, t._2).min, Seq(t._1, t._2).max)).toSet
    val ns = undSet.flatMap(t => Seq(t._1, t._2)).toSeq.sorted
    val brute = (for {
      i <- ns.indices; j <- (i + 1) until ns.size; k <- (j + 1) until ns.size
      if undSet((ns(i), ns(j))) && undSet((ns(j), ns(k))) && undSet((ns(i), ns(k)))
    } yield 1).size.toLong
    assert(x._4 == brute, s"triangles ${x._4} vs brute $brute")
  }

  test("reciprocity: mutual pairs counted both ways, normalization, degenerate null") {
    def rec(edges: Seq[(String, String)]): (Long, Long, Option[Double]) = {
      val r = Graph.reciprocity(edges.toDF("s", "d"), "s", "d").head()
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }
    // a<->b mutual (both directions count), a->c one-way
    assert(rec(Seq(("a", "b"), ("b", "a"), ("a", "c"))) == ((3L, 2L, Some(0.666667))))
    assert(rec(Seq(("a", "b"), ("b", "c"))) == ((2L, 0L, Some(0.0))))
    // parallels collapse, self-loops drop — same answer as the clean set
    assert(rec(Seq(("a", "b"), ("a", "b"), ("b", "a"), ("c", "c"))) ==
      ((2L, 2L, Some(1.0))))
    // nothing survives normalization → null ratio
    assert(rec(Seq(("z", "z"))) == ((0L, 0L, None)))
  }

  test("degreeAssortativity: star is -1, regular graph null, barbell hand value") {
    def assort(edges: Seq[(String, String)]): (Long, Long, Option[Double]) = {
      val r = Graph.degreeAssortativity(edges.toDF("s", "d"), "s", "d").head()
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }
    // hub-to-leaf star: perfectly disassortative
    val star = Seq(("c", "x"), ("c", "y"), ("c", "z"))
    assert(assort(star) == ((4L, 3L, Some(-1.0))))
    // K3: every degree equal → zero variance → null
    val k3 = Seq(("a", "b"), ("b", "c"), ("a", "c"))
    assert(assort(k3) == ((3L, 3L, None)))
    // barbell (two K3s bridged at the hubs): r = −8/48 = −1/6
    val barbell = Seq(("a", "b"), ("a", "c"), ("b", "c"),
      ("c", "d"), ("d", "e"), ("d", "f"), ("e", "f"))
    val (n, e, r) = assort(barbell)
    assert(n == 6L && e == 7L)
    assert(math.abs(r.get - (-1.0 / 6.0)) < 1e-6)
  }

  test("degreeAssortativity: normalization (self-loops, parallels, nulls) and repartition") {
    val clean = Seq(("c", "x"), ("c", "y"), ("c", "z"))
    val messy = clean ++ Seq(("x", "c"), ("c", "c")) // parallel + self-loop
    val a = Graph.degreeAssortativity(clean.toDF("s", "d"), "s", "d").collect().toSeq
    val b = Graph.degreeAssortativity(messy.toDF("s", "d"), "s", "d").collect().toSeq
    assert(a == b)
    val withNull = messy.toDF("s", "d")
      .unionByName(Seq((null.asInstanceOf[String], "q")).toDF("s", "d"))
    assert(Graph.degreeAssortativity(withNull, "s", "d").collect().toSeq == a)
    val rnd = new scala.util.Random(5)
    val big = Seq.fill(300)((s"n${rnd.nextInt(25)}", s"n${rnd.nextInt(25)}")).toDF("s", "d")
    val one = Graph.degreeAssortativity(big, "s", "d").collect().toSeq
    val many = Graph.degreeAssortativity(big.repartition(13), "s", "d").collect().toSeq
    assert(one == many)
  }

  test("hits: hub/authority separation on a directory-vs-source graph") {
    import graft.operators.Graph
    // d (directory) links to s1, s2, s3; nobody links to d;
    // s1 also links to s2. Expect: d = best hub, low authority;
    // s2 = best authority (two hubs link it).
    val edges = Seq(
      ("d", "s1"), ("d", "s2"), ("d", "s3"), ("s1", "s2"))
      .toDF("src", "dst")
    val out = Graph.hits(edges, "src", "dst", iters = 5)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out.size == 4)
    val bestHub = out.maxBy(_._2._1)._1
    val bestAuth = out.maxBy(_._2._2)._1
    assert(bestHub == "d", s"best hub was $bestHub: $out")
    assert(bestAuth == "s2", s"best authority was $bestAuth: $out")
    assert(out("d")._2 == 0.0, "nobody links the directory")
    assert(out("s3")._1 == 0.0, "a sink has no hub score")
    // L1 normalization: each score column sums to ~1
    val hubSum = out.values.map(_._1).sum
    val authSum = out.values.map(_._2).sum
    assert(math.abs(hubSum - 1.0) < 1e-4 && math.abs(authSum - 1.0) < 1e-4)
    // deterministic under repartitioning
    val rep = Graph.hits(edges.repartition(5), "src", "dst", iters = 5)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(rep == out)
    // null endpoints drop
    val withNull = edges.union(
      Seq((null.asInstanceOf[String], "s1")).toDF("src", "dst"))
    assert(Graph.hits(withNull, "src", "dst", 5).collect().map(
      r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap == out)
  }
}
