package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-node graph analytics over corpus-derived link edges — the
  * domain-authority view a crawl-curation pipeline ranks sources by
  * (PageRank over the host/domain link graph is the classic crawl
  * prioritization and source-quality signal; see Page et al., "The
  * PageRank citation ranking", 1999).
  *
  * Scale contract: the EDGE input is corpus-sized (one row per
  * observed link) and is aggregated ONCE to weighted (src, dst)
  * pairs; everything after — the iterations — runs on that
  * aggregated frame, bounded by |nodes|·avg-degree (domains, not
  * documents: ≤ millions at 100 TB, not billions). No collect: the
  * dangling-mass scalar rides a broadcast 1-row frame each
  * iteration.
  *
  * Determinism (the oracle replays every iteration): ranks round to
  * 6 dp after every update; per-edge contributions round to 6 dp and
  * accumulate in exact DECIMAL(18,6) (a raw double sum would depend
  * on partitioning); fixed iteration count, no convergence test.
  */
object Graph {

  /** PageRank with uniform dangling-mass redistribution.
    *
    * r₀ = round(1/N, 6); each iteration
    * r'(v) = round((1−d)/N + d·(Σ_{u→v} round(r(u)·w(u,v)/out(u), 6)
    *         + dang/N), 6)
    * where w is the aggregated edge weight (link count), out(u) the
    * sum of u's outgoing weights, and dang the DECIMAL-exact rank
    * mass of nodes with no outgoing edges.
    *
    * @param edges one row per observed link (self-loops allowed;
    *              parallel links aggregate into the weight).
    * @return (node, rank 6 dp) for every node appearing as src or dst.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 5,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "iters must be positive")
    require(damping > 0 && damping < 1, "damping must be in (0, 1)")
    val e = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .groupBy(col(srcCol).as("src"), col(dstCol).as("dst"))
      .agg(count(lit(1)).cast("double").as("w"))
      .localCheckpoint() // the corpus-sized aggregation runs ONCE
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count() // bounded by the domain-node contract
    require(n > 0, "pageRank over an empty edge set")
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
      .localCheckpoint()
    var rank = nodes.withColumn("rank",
      round(lit(1.0) / n, 6))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(rank.withColumnRenamed("node", "src"), "src")
        .join(outw, "src")
        .select(col("dst").as("node"),
          round(col("rank") * col("w") / col("ow"), 6)
            .cast("decimal(18,6)").as("__c"))
        .groupBy(col("node"))
        .agg(sum(col("__c")).as("__cs"))
      val dangling = rank
        .join(outw.select(col("src").as("node")), Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank").cast("decimal(18,6)")),
          lit(0).cast("decimal(18,6)")).as("__dang"))
      rank = nodes
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          round(lit(1.0 - damping) / n + lit(damping) *
            (coalesce(col("__cs").cast("double"), lit(0.0)) +
              col("__dang").cast("double") / n), 6).as("rank"))
      // each iteration's frame is bounded by |nodes|; checkpoint so
      // the lineage (and replanning) does not grow with iters
      rank = rank.localCheckpoint()
    }
    rank
  }

  /** Semi-supervised label propagation over an undirected edge set
    * (Zhu & Ghahramani 2002; the Raghavan et al. community variant)
    * — spread a sparse set of trusted labels (human quality ratings,
    * known-spam domains, topic tags) across the near-dup/link graph:
    * seeds are CLAMPED (they never change), every other node takes
    * the most frequent label among its labeled neighbors, ties to
    * the smaller label, for a fixed number of synchronous iterations
    * (no convergence test — determinism over elegance, the pageRank
    * discipline).
    *
    * Scale shape: per iteration ONE join of the edge frame against
    * the current label frame (shuffle on the node key), one
    * map-side-combined (node, label) count, and a per-node window
    * (parallel across nodes) for the argmax; frames are
    * localCheckpoint'd per iteration so lineage/replanning does not
    * grow with `iters`. Nodes never reached by a label stay absent
    * from the output (no null-label rows to carry).
    *
    * @param edges undirected pairs (each row links both ways;
    *              parallel edges count once).
    * @return (id, label, seeded) — every node that holds a label
    *         after `iters` rounds.
    */
  def labelPropagate(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      idCol: String,
      labelCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, "iters must be positive")
    import org.apache.spark.sql.expressions.Window
    val und = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .union(edges.select(col(dstCol).as("__s"), col(srcCol).as("__d")))
      .distinct()
      .localCheckpoint() // corpus-sized normalization runs ONCE
    val seed = seeds
      .where(col(idCol).isNotNull && col(labelCol).isNotNull)
      // duplicate seed rows for one id collapse to the min label —
      // deterministic, and keeps every labels frame unique per id
      .groupBy(col(idCol).as("__id"))
      .agg(min(col(labelCol)).as("__lab"))
      .localCheckpoint()
    var labels = seed
    for (_ <- 1 to iters) {
      val votes = und
        .join(labels.withColumnRenamed("__id", "__s"), "__s")
        .groupBy(col("__d").as("__id"), col("__lab"))
        .agg(count(lit(1)).as("__c"))
      val w = Window.partitionBy(col("__id"))
        .orderBy(col("__c").desc, col("__lab").asc)
      val best = votes
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select(col("__id"), col("__lab"))
      labels = seed
        .unionByName(best.join(seed.select("__id"), Seq("__id"), "left_anti"))
        .localCheckpoint()
    }
    labels
      .join(seed.select(col("__id"), lit(true).as("seeded")), Seq("__id"), "left")
      .select(col("__id").as(idCol), col("__lab").as(labelCol),
        coalesce(col("seeded"), lit(false)).as("seeded"))
  }

  /** Triangle count + global clustering coefficient over an
    * undirected edge set — the graph-health diagnostic behind "is
    * this link/near-dup graph community-structured or a hub-and-spoke
    * artifact" (spam link farms and boilerplate hubs show extreme
    * clustering signatures).
    *
    * Scale design (Suri & Vassilvitskii, "Counting Triangles and the
    * Curse of the Last Reducer", WWW 2011): every undirected edge
    * orients from its (smaller degree, then smaller id) endpoint to
    * the other, so each node's OUT-degree is O(√m) on any graph —
    * the wedge self-join's fan-out is Σ C(outdeg, 2), which the
    * orientation provably caps where the naive Σ C(deg, 2) lets one
    * hub node explode a single reducer. Each triangle has exactly
    * one node with two out-edges under this orientation, so closed
    * wedges count each triangle once — no /3 correction, no
    * double-count.
    *
    * Everything is exact integer counting (joins + aggregations, no
    * windows); the one ratio rounds at the output boundary.
    *
    * @param edges one row per observed link; direction, self-loops
    *              and parallel edges are normalized away.
    * @return ONE row: (n_nodes, n_edges, n_wedges — unordered
    *         length-2 paths Σ C(deg,2), n_triangles,
    *         global_clustering 6 dp = 3·triangles/wedges, null when
    *         the graph has no wedges).
    */
  def triangleStats(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val und = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("__a"),
        greatest(col(srcCol), col(dstCol)).as("__b"))
      .distinct()
      .localCheckpoint() // corpus-sized normalization runs ONCE
    val deg = und.select(col("__a").as("__n"))
      .union(und.select(col("__b").as("__n")))
      .groupBy(col("__n")).agg(count(lit(1)).as("__deg"))
    // Orient by (degree, id): out[u] = every neighbour v with
    // (deg_v, v) > (deg_u, u). struct comparison gives the
    // lexicographic order both engines share.
    val withDeg = und
      .join(deg.select(col("__n").as("__a"), col("__deg").as("__da")), "__a")
      .join(deg.select(col("__n").as("__b"), col("__deg").as("__db")), "__b")
    val oriented = withDeg.select(
      when(struct(col("__da"), col("__a")) < struct(col("__db"), col("__b")),
        struct(col("__a").as("u"), col("__b").as("v")))
        .otherwise(struct(col("__b").as("u"), col("__a").as("v")))
        .as("__e"))
      .select(col("__e.u").as("__u"), col("__e.v").as("__v"))
      .localCheckpoint()
    // Wedges at the orientation's root node; __v < __w dedupes the
    // unordered pair enumeration. Closing edge looked up in canonical
    // {min, max} form.
    val closed = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.__u") === col("e2.__u") && col("e1.__v") < col("e2.__v"))
      .select(least(col("e1.__v"), col("e2.__v")).as("__a"),
        greatest(col("e1.__v"), col("e2.__v")).as("__b"))
      .join(und, Seq("__a", "__b"))
      .agg(count(lit(1)).as("n_triangles"))
    val base = und.agg(count(lit(1)).as("n_edges"))
    val nodes = deg.agg(
      count(lit(1)).as("n_nodes"),
      // exact integer arithmetic: deg·(deg−1) is always even, so
      // `div 2` is exact at any degree — `/` would route through
      // double and silently lose precision past 2^53
      coalesce(sum(expr("__deg * (__deg - 1) div 2")), lit(0))
        .cast("long").as("n_wedges"))
    nodes.crossJoin(broadcast(base)).crossJoin(broadcast(closed))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        round(when(col("n_wedges") > 0,
          lit(3.0) * col("n_triangles") / col("n_wedges")), 6)
          .as("global_clustering"))
  }

  /** Directed-edge reciprocity — the fraction of directed links whose
    * reverse also exists. The one-number DIRECTED complement of
    * [[degreeAssortativity]]: citation/crawl graphs read near 0,
    * social/follow graphs read 0.2–0.5, and a "web" graph reading
    * ≈ 1 usually means somebody symmetrized the edges upstream by
    * accident (a real pipeline bug this catches cheaply).
    *
    * Normalization: nulls and self-loops drop, parallel duplicates
    * collapse (DISTINCT directed edges). The reverse test is ONE
    * self-equi-join on the id pair — id-sized rows only. Exact
    * counts, one double division at the boundary.
    *
    * @return one row: (n_edges, n_reciprocal, reciprocity 6 dp —
    *         null on an edgeless graph).
    */
  def reciprocity(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .distinct()
      .localCheckpoint() // normalized once; both join sides reuse it
    val rev = e.select(col("__d").as("__s"), col("__s").as("__d"))
    e.join(rev, Seq("__s", "__d"), "left_semi")
      .agg(count(lit(1)).as("n_reciprocal"))
      .crossJoin(broadcast(e.agg(count(lit(1)).as("n_edges"))))
      .select(col("n_edges"), col("n_reciprocal"),
        round(when(col("n_edges") > 0,
          col("n_reciprocal").cast("double") / col("n_edges").cast("double")), 6)
          .as("reciprocity"))
  }

  /** Degree assortativity (Newman, PRL 2002) — does the link graph
    * wire hubs to hubs (r > 0, social-network shape) or hubs to leaves
    * (r < 0, web/crawl shape)? The one-number wiring diagnostic that
    * tells a crawler whether domain authority concentrates or
    * disperses, and it changes how [[pageRank]] mass flows.
    *
    * Pearson correlation of endpoint degrees over the undirected edge
    * list counted in BOTH orientations (shift-invariance makes this
    * equal to Newman's remaining-degree formulation). Same
    * normalization as [[triangleStats]]: nulls and self-loops drop,
    * parallel edges collapse. Degrees come from one grouped count;
    * moments accumulate in exact DECIMAL(38,0) (exact to ~1e9 edges
    * with degrees to ~1e7), each √ factor converts to double BEFORE
    * the root in fixed order (the [[Profile.spearmanCorr]]
    * discipline).
    *
    * @return one row: (n_nodes, n_edges, assortativity 6 dp — null
    *         when every degree is equal, e.g. a cycle).
    */
  def degreeAssortativity(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val und = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("__a"),
        greatest(col(srcCol), col(dstCol)).as("__b"))
      .distinct()
      .localCheckpoint() // corpus-sized normalization runs ONCE
    val deg = und.select(col("__a").as("__n"))
      .union(und.select(col("__b").as("__n")))
      .groupBy(col("__n")).agg(count(lit(1)).cast("decimal(38,0)").as("__deg"))
    val both = und.select(col("__a").as("__u"), col("__b").as("__v"))
      .unionByName(und.select(col("__b").as("__u"), col("__a").as("__v")))
      .join(deg.select(col("__n").as("__u"), col("__deg").as("__du")), "__u")
      .join(deg.select(col("__n").as("__v"), col("__deg").as("__dv")), "__v")
    val agg = both.agg(
      count(lit(1)).cast("decimal(38,0)").as("__k"),
      coalesce(sum(col("__du")), lit(0)).cast("decimal(38,0)").as("__sx"),
      coalesce(sum(col("__dv")), lit(0)).cast("decimal(38,0)").as("__sy"),
      coalesce(sum(col("__du") * col("__du")), lit(0)).cast("decimal(38,0)").as("__sxx"),
      coalesce(sum(col("__dv") * col("__dv")), lit(0)).cast("decimal(38,0)").as("__syy"),
      coalesce(sum(col("__du") * col("__dv")), lit(0)).cast("decimal(38,0)").as("__sxy"))
    val a = (col("__k") * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val b = (col("__k") * col("__syy") - col("__sy") * col("__sy")).cast("double")
    val nodes = deg.agg(count(lit(1)).as("n_nodes"))
    val base = und.agg(count(lit(1)).as("n_edges"))
    agg.crossJoin(broadcast(nodes)).crossJoin(broadcast(base))
      .select(col("n_nodes"), col("n_edges"),
        round(when(a > 0 && b > 0,
          (col("__k") * col("__sxy") - col("__sx") * col("__sy")).cast("double") /
            (sqrt(a) * sqrt(b))), 6).as("assortativity"))
  }

  /** HITS hubs & authorities (Kleinberg, JACM 1999) — the
    * directed-graph complement of [[pageRank]]: a node is a good HUB
    * when it links to good authorities and a good AUTHORITY when
    * good hubs link to it. On a crawl's domain graph the two scores
    * separate link-farm directories (high hub, low authority) from
    * canonical sources (the reverse) — a ranking signal PageRank's
    * single score conflates.
    *
    * Determinism/replay: weighted power iteration with L1
    * normalization, every score rounded 6 dp after each normalize
    * and every contribution sum in exact DECIMAL(18,6) — the
    * [[pageRank]] discipline, so the oracle unrolls the identical
    * `iters` rounds. Per iteration: h ← normalize(Σ_out w·a), then
    * a ← normalize(Σ_in w·h).
    *
    * Scale shape: the corpus-sized edge list aggregates ONCE
    * (staged); every iteration runs on the bounded weighted graph
    * (|nodes| ≤ the domain contract), iteration frames are
    * checkpointed so lineage never grows, and the L1 totals ride
    * broadcast one-row frames — no collect, no driver loop over
    * data. Null endpoints drop.
    *
    * @return one row per node: (node, hub 6 dp, authority 6 dp).
    */
  def hits(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 5): DataFrame = {
    require(iters >= 1, "iters must be positive")
    val e = edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .groupBy(col(srcCol).as("src"), col(dstCol).as("dst"))
      .agg(count(lit(1)).cast("double").as("w"))
      .localCheckpoint() // the corpus-sized aggregation runs ONCE
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count() // bounded by the domain-node contract
    require(n > 0, "hits over an empty edge set")
    // round(1/n, 6) underflows to 0 past 2,000,000 nodes, which would
    // zero the init vector and null every later score — fail loudly
    // at the contract boundary instead (the domain graph is bounded
    // by construction; a bigger graph needs a higher-precision HITS).
    require(n <= 2000000L,
      s"hits: $n nodes - the 6 dp init round(1/n, 6) underflows past " +
        "2,000,000 nodes; shrink the graph or raise the precision")
    def normalize(raw: DataFrame, outCol: String): DataFrame = {
      // The L1 total rides a single-partition window over the bounded
      // |nodes| frame (≤ 2M rows by the contract above) instead of a
      // separate agg + crossJoin(broadcast): the old shape evaluated
      // `raw` — an e-sized join + aggregation — TWICE per half-round
      // (once under the broadcast total, once as the join input) and
      // paid a broadcast-collect job per normalize. One evaluation,
      // one job (guide §2.4: two ops keyed the same way share one
      // pass; round-17).
      val w = org.apache.spark.sql.expressions.Window.partitionBy()
      // A vanished L1 total (all contributions rounding to 0 at 6 dp
      // — e.g. tiny weight×score products) must not silently null
      // every subsequent score: the guard rides the division column
      // the plan needs, per the fail-loud discipline.
      val tot = sum(col("__s")).over(w)
      val safeTot = when(tot > 0, tot.cast("double"))
        .otherwise(raise_error(lit(
          "hits: normalization total vanished at 6 dp - scores " +
            "underflowed; coarsen weights or raise precision"))
          .cast("double"))
      nodes.join(raw, Seq("node"), "left")
        .select(col("node"),
          round(coalesce(col("__s"), lit(0).cast("decimal(18,6)"))
            .cast("double") / safeTot, 6).as(outCol))
        .localCheckpoint() // bounded |nodes| frame per iteration
    }
    var auth = nodes.withColumn("authority", round(lit(1.0) / n, 6))
    var hub = nodes.withColumn("hub", round(lit(1.0) / n, 6))
    for (_ <- 1 to iters) {
      hub = normalize(
        e.join(auth.withColumnRenamed("node", "dst"), "dst")
          .select(col("src").as("node"),
            round(col("w") * col("authority"), 6)
              .cast("decimal(18,6)").as("__c"))
          .groupBy(col("node")).agg(sum(col("__c")).as("__s")),
        "hub")
      auth = normalize(
        e.join(hub.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"),
            round(col("w") * col("hub"), 6)
              .cast("decimal(18,6)").as("__c"))
          .groupBy(col("node")).agg(sum(col("__c")).as("__s")),
        "authority")
    }
    hub.join(auth, Seq("node"))
  }
}
