package graft

import graft.operators.Events
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "ts_ms", "event_type")

  test("eventFunnel: strict ordered progression, hand-computed") {
    // u1 completes all 3 in order; u2 clicks BEFORE viewing (click
    // doesn't count) then clicks after; u3 views only; u4 has only a
    // click (enters the funnel population, reaches nothing).
    val df = ev(
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      (2L, 50L, "click"), (2L, 100L, "view"), (2L, 150L, "click"),
      (3L, 10L, "view"),
      (4L, 10L, "click"),
      (5L, 10L, "signup")) // non-step type: filtered out entirely
    val out = Events.eventFunnel(df, "user_id", "ts_ms", "event_type",
      Seq("view", "click", "purchase"))
      .orderBy("step_idx")
      .as[(Int, String, Long, Double)].collect()
    assert(out.map(_._2).toSeq == Seq("view", "click", "purchase"))
    // population = u1..u4 (u5's signup is not a step type)
    assert(out.map(_._3).toSeq == Seq(3L, 2L, 1L))
    assert(out.map(_._4).toSeq == Seq(0.75, 0.5, 0.25))
  }

  test("eventFunnel/timeToConvert: a null timestamp never enters the fold") {
    // u1's null-ts view must NOT become an accepted step 0 with a
    // null t0 (which would nullify every later `ts > t0` and mark a
    // genuinely-converting user as never converting); the row is
    // excluded, the user's remaining events still count.
    val df = Seq[(Long, Option[Long], String)](
      (1L, None, "view"), (1L, Some(100L), "view"),
      (1L, Some(200L), "click"),
      (2L, None, "view")) // ONLY a null-ts event: reaches nothing
      .toDF("user_id", "ts_ms", "event_type")
    val out = Events.eventFunnel(df, "user_id", "ts_ms", "event_type",
      Seq("view", "click")).orderBy("step_idx")
      .as[(Int, String, Long, Double)].collect()
    assert(out.map(_._3).toSeq == Seq(1L, 1L), s"got ${out.toSeq}")
    val ttc = Events.timeToConvert(df, "user_id", "ts_ms", "event_type",
      Seq("view", "click"), probs = Seq(0.5))
      .as[(String, Double, Double)].collect()
    assert(ttc.toSeq == Seq(("duration_ms", 0.5, 100.0)), s"got ${ttc.toSeq}")
  }

  test("eventFunnel: equal timestamps do NOT advance (strict >)") {
    val df = ev((1L, 100L, "view"), (1L, 100L, "click"), (1L, 200L, "click"))
    val out = Events.eventFunnel(df, "user_id", "ts_ms", "event_type",
      Seq("view", "click"))
      .orderBy("step_idx").as[(Int, String, Long, Double)].collect()
    assert(out.map(_._3).toSeq == Seq(1L, 1L)) // the 200 click counts
    val same = Events.eventFunnel(
      ev((1L, 100L, "view"), (1L, 100L, "click")),
      "user_id", "ts_ms", "event_type", Seq("view", "click"))
      .orderBy("step_idx").as[(Int, String, Long, Double)].collect()
    assert(same.map(_._3).toSeq == Seq(1L, 0L))
  }

  test("eventFunnel: greedy earliest transition is optimal") {
    // view@100, click@150, view@200, purchase@180: greedy anchors
    // view@100/click@150 so purchase@180 counts (a later view would
    // not have).
    val df = ev(
      (1L, 100L, "view"), (1L, 150L, "click"),
      (1L, 200L, "view"), (1L, 180L, "purchase"))
    val out = Events.eventFunnel(df, "user_id", "ts_ms", "event_type",
      Seq("view", "click", "purchase"))
      .orderBy("step_idx").as[(Int, String, Long, Double)].collect()
    assert(out.map(_._3).toSeq == Seq(1L, 1L, 1L))
  }

  test("eventFunnel: empty input yields zero counts with null share") {
    val out = Events.eventFunnel(ev(), "user_id", "ts_ms", "event_type",
      Seq("view", "click"))
      .orderBy("step_idx")
      .select(col("n_users"), col("share"))
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 0L))
    assert(out.forall(_.isNullAt(1)))
  }

  test("retentionCohorts: hand-computed weekly cells") {
    val wk = 604800000L
    // cohort week 0: u1 active weeks 0,1,3; u2 active week 0 only.
    // cohort week 1: u3 active weeks 1,2.
    val df = Seq(
      (1L, 0L), (1L, wk + 5L), (1L, 3 * wk + 1L), (1L, 10L), // dup week 0
      (2L, 100L),
      (3L, wk + 1L), (3L, 2 * wk + 1L))
      .toDF("user_id", "ts_ms")
    val out = Events.retentionCohorts(df, "user_id", "ts_ms", maxOffset = 8)
      .as[(Long, Int, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out((0L, 0)) == ((2L, 1.0)))
    assert(out((0L, 1)) == ((1L, 0.5)))
    assert(out((0L, 3)) == ((1L, 0.5)))
    assert(out((1L, 0)) == ((1L, 1.0)))
    assert(out((1L, 1)) == ((1L, 1.0)))
    assert(out.size == 5) // no empty cells emitted
  }

  test("retentionCohorts: maxOffset filters far cells; offset 0 always 1.0") {
    val wk = 604800000L
    val df = Seq((1L, 0L), (1L, 9 * wk)).toDF("user_id", "ts_ms")
    val out = Events.retentionCohorts(df, "user_id", "ts_ms", maxOffset = 8)
      .as[(Long, Int, Long, Double)].collect()
    assert(out.toSeq == Seq((0L, 0, 1L, 1.0)))
  }

  test("tumblingRollup: hand-computed windows, exact decimal sums") {
    val d = 86400000L
    val df = Seq(
      (1L, 10L, 1.25), (2L, 20L, 2.50), (1L, d + 1L, 4.0))
      .toDF("user_id", "ts_ms", "value")
    val out = Events.tumblingRollup(df, "ts_ms", "value", "user_id", d)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(0L) == ((2L, 2L, 3.75, 1.875)))
    assert(out(d) == ((1L, 1L, 4.0, 4.0)))
  }

  test("hoppingRollup: every event lands in width/slide covering windows") {
    // width 10, slide 5 -> k=2. Event at ts=12 covers starts {10, 5};
    // ts=3 covers {0, -5}.
    val df = Seq((1L, 12L, 2.0), (2L, 3L, 1.0)).toDF("user_id", "ts_ms", "value")
    val out = Events.hoppingRollup(df, "ts_ms", "value", "user_id",
      widthMs = 10L, slideMs = 5L)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.keySet == Set(-5L, 0L, 5L, 10L))
    assert(out(5L) == ((1L, 1L, 2.0)) && out(10L) == ((1L, 1L, 2.0)))
    assert(out(0L) == ((1L, 1L, 1.0)) && out(-5L) == ((1L, 1L, 1.0)))
    // width == slide degenerates to tumbling
    val hop = Events.hoppingRollup(df, "ts_ms", "value", "user_id", 10L, 10L)
    val tum = Events.tumblingRollup(df, "ts_ms", "value", "user_id", 10L)
    assert(hop.collect().toSet == tum.collect().toSet)
    intercept[IllegalArgumentException] {
      Events.hoppingRollup(df, "ts_ms", "value", "user_id", 10L, 3L)
    }
  }

  test("transitionMatrix: hand-computed counts and row-normalized probs") {
    // u1: a->b->a->c ; u2: b->a — transitions: a->b, b->a(x2), a->c
    val df = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "a"), (1L, 40L, 4L, "c"),
      (2L, 5L, 5L, "b"), (2L, 6L, 6L, "a"))
      .toDF("user_id", "ts_ms", "event_id", "event_type")
    val out = graft.operators.Events.transitionMatrix(df, "user_id", "ts_ms",
      "event_type", "event_id")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out.size == 3)
    assert(out(("a", "b")) == ((1L, 0.5)))
    assert(out(("a", "c")) == ((1L, 0.5)))
    assert(out(("b", "a")) == ((2L, 1.0)))
  }

  test("transitionMatrix: equal timestamps break on the tie column deterministically") {
    val df = Seq(
      (1L, 10L, 2L, "b"), (1L, 10L, 1L, "a"), (1L, 10L, 3L, "c"))
      .toDF("user_id", "ts_ms", "event_id", "event_type")
    val out = graft.operators.Events.transitionMatrix(df, "user_id", "ts_ms",
      "event_type", "event_id")
      .as[(String, String, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    assert(out == Set(("a", "b"), ("b", "c"))) // order by event_id: a,b,c
  }

  test("eventFunnelByGroup: per-slice parity with the global funnel") {
    val rnd = new scala.util.Random(19)
    val rows = (1 to 500).map { _ =>
      val u = rnd.nextInt(30).toLong
      (u, if (u % 3 == 0) "a" else "b", rnd.nextInt(100000).toLong,
        Seq("view", "click", "purchase", "error")(rnd.nextInt(4)))
    }
    val df = rows.toDF("user_id", "seg", "ts_ms", "event_type")
    val steps = Seq("view", "click", "purchase")
    val byGroup = Events.eventFunnelByGroup(df, "seg", "user_id", "ts_ms",
      "event_type", steps)
      .as[(String, Int, String, Long, Double)].collect()
      .groupBy(_._1).map { case (g, rs) =>
        g -> rs.sortBy(_._2).map(r => (r._2, r._3, r._4, r._5)).toSeq
      }
    for (g <- Seq("a", "b")) {
      val slice = Events.eventFunnel(df.where($"seg" === g), "user_id",
        "ts_ms", "event_type", steps)
        .as[(Int, String, Long, Double)].collect().sortBy(_._1).toSeq
      assert(byGroup(g) == slice, s"group $g")
    }
  }

  test("eventFunnel/retention: reproducible under repartitioning") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(100000).toLong,
        Seq("view", "click", "purchase", "error")(rnd.nextInt(4)))
    }
    val df = rows.toDF("user_id", "ts_ms", "event_type")
    val a = Events.eventFunnel(df, "user_id", "ts_ms", "event_type",
      Seq("view", "click", "purchase")).collect().toSet
    val b = Events.eventFunnel(df.repartition(13), "user_id", "ts_ms",
      "event_type", Seq("view", "click", "purchase")).collect().toSet
    assert(a == b)
    val c = Events.retentionCohorts(df, "user_id", "ts_ms").collect().toSet
    val e = Events.retentionCohorts(df.repartition(17), "user_id", "ts_ms")
      .collect().toSet
    assert(c == e)
  }

  test("gapFill: silent buckets materialized, carried forward, flagged") {
    // user 1: days 0, 1, 4 observed — days 2, 3 are gaps carrying
    // day 1's value; user 2: single day, no gaps.
    val df = Seq(
      (1L, 0L * 86400000 + 5, 1.5), (1L, 0L * 86400000 + 9, 2.5),
      (1L, 1L * 86400000 + 1, 7.0),
      (1L, 4L * 86400000 + 2, 1.0),
      (2L, 2L * 86400000 + 3, 9.0))
      .toDF("user_id", "ts_ms", "value")
    val out = Events.gapFill(df, "ts_ms", "user_id", "value", stepMs = 86400000L)
      .as[(Long, Long, Double, Boolean)].collect()
      .sortBy(r => (r._1, r._2))
    val d = 86400000L
    assert(out.toSeq == Seq(
      (1L, 0L, 4.0, false), (1L, d, 7.0, false),
      (1L, 2 * d, 7.0, true), (1L, 3 * d, 7.0, true),
      (1L, 4 * d, 1.0, false),
      (2L, 2 * d, 9.0, false)))
  }

  test("twap: hold-time weighting, last-obs zero hold, single-obs null") {
    // key 1: v=10 holds 100ms, v=20 holds 200ms, v=30 holds 0 (last)
    //   twap = (10*100 + 20*200) / 300 = 16.666667
    // key 2: single observation -> null
    val df = Seq(
      (1L, 0L, 1L, 10.0), (1L, 100L, 2L, 20.0), (1L, 300L, 3L, 30.0),
      (2L, 50L, 4L, 99.0))
      .toDF("k", "ts_ms", "eid", "v")
    val out = Events.twap(df, "k", "ts_ms", "v", tieCols = Seq("eid"))
      .as[(Long, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 0L, 300L, 3L, Some(16.666667))))
    assert(out(2L)._5.isEmpty && out(2L)._4 == 1L)
    // a burst (ten same-ms readings) cannot outvote a long hold: the
    // tie order gives all but the last burst row zero hold
    val burst = ((1 to 10).map(i => (3L, 1000L, i.toLong, 500.0)) :+
      ((3L, 0L, 0L, 1.0))).toDF("k", "ts_ms", "eid", "v")
    val b = Events.twap(burst, "k", "ts_ms", "v", Seq("eid"))
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    assert(b._5.contains(1.0), s"burst must not move twap: $b")
    // null values dropped; repartition-invariant
    val a1 = Events.twap(df.repartition(7), "k", "ts_ms", "v", Seq("eid"))
      .collect().toSet
    assert(a1 == Events.twap(df, "k", "ts_ms", "v", Seq("eid")).collect().toSet)
  }

  test("sessionStats: gap rule, bounce flag, same-ts events share a session") {
    val m = 60000L
    val rows = Seq(
      // user 1: session 1 = events at 0, 10m, 10m (same ts twice);
      // 31-min gap; session 2 = single event (bounce)
      (1L, 0L), (1L, 10 * m), (1L, 10 * m),
      (1L, 41 * m + 1),
      // user 2: one session of two events exactly 30m apart (gap not
      // exceeded — boundary is strict >)
      (2L, 0L), (2L, 30 * m))
      .toDF("user_id", "ts_ms")
    val out = Events.sessionStats(rows, "user_id", "ts_ms", gapMinutes = 30)
      .as[(Long, String, Long, Long, Long, Long, Boolean)].collect()
      .sortBy(r => (r._1, r._3))
    assert(out.length == 3)
    assert(out(0) == ((1L, "1#1", 0L, 10 * m, 10 * m, 3L, false)))
    assert(out(1) == ((1L, "1#2", 41 * m + 1, 41 * m + 1, 0L, 1L, true)))
    assert(out(2) == ((2L, "2#1", 0L, 30 * m, 30 * m, 2L, false)))
    // partitioning-invariant
    val again = Events.sessionStats(rows.repartition(7), "user_id", "ts_ms", 30)
      .collect().toSet
    assert(again == Events.sessionStats(rows, "user_id", "ts_ms", 30).collect().toSet)
  }

  test("withEwma: hand-computed adjust-convention values, null drop, determinism") {
    // key 1 values 8, 4, 2 in time order, alpha=0.5 (decay 0.5):
    //   t0: 8
    //   t1: (0.5*8 + 4) / 1.5 = 16/3
    //   t2: (0.25*8 + 0.5*4 + 2) / 1.75 = 6/1.75
    val df = Seq(
      (1L, 1L, Some(8.0)), (1L, 2L, Some(4.0)), (1L, 3L, Some(2.0)),
      (1L, 4L, None), // dropped
      (2L, 1L, Some(5.0)))
      .toDF("k", "o", "v")
    val out = Events.withEwma(df, "k", Seq("o"), "v", alpha = 0.5, window = 20)
      .as[(Long, Long, Double, Double)].collect().sortBy(r => (r._1, r._2))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(_._4).toSeq ==
      Seq(8.0, r6(16.0 / 3), r6(6.0 / 1.75), 5.0))
    assert(out.length == 4, "null value row dropped")
    // the window truncates: only the last `window` observations count
    val flat = (1L to 30L).map(i => (9L, i, Some(if (i <= 28) 0.0 else 100.0)))
      .toDF("k", "o", "v")
    val w2 = Events.withEwma(flat, "k", Seq("o"), "v", alpha = 0.5, window = 2)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._2)
    // at o=30: window holds {100, 100} -> 100; at o=29: {0, 100} ->
    // (0.5*0 + 100)/1.5
    assert(w2.last._4 == 100.0 && w2(28)._4 == r6(100.0 / 1.5))
    // partitioning-invariant
    val a = Events.withEwma(df.repartition(5), "k", Seq("o"), "v", 0.5)
      .collect().toSet
    assert(a == Events.withEwma(df, "k", Seq("o"), "v", 0.5).collect().toSet)
    intercept[IllegalArgumentException] {
      Events.withEwma(df, "k", Seq("o"), "v", alpha = 1.0)
    }
    intercept[IllegalArgumentException] {
      Events.withEwma(df, "k", Seq("o"), "v", alpha = 0.5, window = 34)
    }
  }

  test("timeToConvert: funnel-consistent durations, interpolated quantiles, non-converts excluded") {
    // user 1: view@10 click@20 purchase@110 → duration 100
    // user 2: view@0 click@5 purchase@205 → duration 205... but use
    //   200: view@0, click@100, purchase@200 → duration 200
    // user 3: view then purchase WITHOUT click → never converts
    // user 4: purchase before view → never converts
    val rows = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 110L, "purchase"),
      (2L, 0L, "view"), (2L, 100L, "click"), (2L, 200L, "purchase"),
      (3L, 0L, "view"), (3L, 50L, "purchase"),
      (4L, 0L, "purchase"), (4L, 10L, "view"))
      .toDF("user_id", "ts_ms", "event_type")
    val out = Events.timeToConvert(rows, "user_id", "ts_ms", "event_type",
      Seq("view", "click", "purchase"), probs = Seq(0.25, 0.5, 0.9))
      .as[(String, Double, Double)].collect().sortBy(_._2)
    // durations {100, 200}: p·(n−1) interpolation
    assert(out.toSeq == Seq(
      ("duration_ms", 0.25, 125.0),
      ("duration_ms", 0.5, 150.0),
      ("duration_ms", 0.9, 190.0)))
    // nobody converts -> empty report, not nulls
    val none = Events.timeToConvert(
      rows.where($"user_id" === 3), "user_id", "ts_ms", "event_type",
      Seq("view", "click", "purchase"))
    assert(none.count() == 0)
    // partitioning-invariant
    val again = Events.timeToConvert(rows.repartition(7), "user_id",
      "ts_ms", "event_type", Seq("view", "click", "purchase"),
      probs = Seq(0.25, 0.5, 0.9))
      .as[(String, Double, Double)].collect().sortBy(_._2)
    assert(again.toSeq == out.toSeq)
    intercept[IllegalArgumentException] {
      Events.timeToConvert(rows, "user_id", "ts_ms", "event_type", Seq("view"))
    }
  }

  test("topPaths: hand-computed trigrams, ties deterministic") {
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "d"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c"),
      (3L, 1L, "x"), (3L, 2L, "y"), // too short for a trigram
      (4L, 5L, "b"), (4L, 5L, "a"), (4L, 6L, "c")) // same-ts tie: a before b
      .toDF("user_id", "ts_ms", "event_type")
    val out = Events.topPaths(df, "user_id", "ts_ms", "event_type", n = 3, topK = 10)
      .as[(String, Long, Int)].collect().sortBy(_._3)
    assert(out.toSeq == Seq(("a>b>c", 3L, 1), ("b>c>d", 1L, 2)))
  }

  test("topPaths: n=2 bigrams equal a manual lead count; topK truncates") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(500)(
      (rnd.nextInt(30).toLong, rnd.nextInt(10000).toLong,
        Seq("v", "c", "p")(rnd.nextInt(3))))
    val df = rows.toDF("user_id", "ts_ms", "event_type")
    val manual = rows.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (e._2, e._3)).map(_._3).sliding(2)
        .filter(_.size == 2).map(_.mkString(">"))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Events.topPaths(df, "user_id", "ts_ms", "event_type", n = 2, topK = 4)
      .as[(String, Long, Int)].collect()
    assert(got.length == math.min(4, manual.size))
    got.foreach { case (p, n, _) => assert(manual(p) == n, p) }
  }

  test("anomalies: a spike against a flat history is flagged, warmup is not") {
    val d = 86400000L
    // key 1: seven flat days then a spike, then flat again
    val rows = (0 until 7).map(i => (1L, i * d + 1, 10.0)) ++
      Seq((1L, 7 * d + 1, 500.0)) ++ Seq((1L, 8 * d + 1, 10.0))
    val out = Events.anomalies(rows.toDF("user_id", "ts_ms", "value"),
      "ts_ms", "user_id", "value", stepMs = d, trailing = 7, z = 3.0)
      .as[(Long, Long, Double, Option[Double], Boolean)].collect()
      .sortBy(_._2)
    // warmup rows (first 7) never flag; the flat-history spike day
    // has sd == 0 -> zscore null -> not flagged by the z rule…
    assert(out.take(7).forall(!_._5))
    // …so use a noisy history instead for the positive case:
    val noisy = (0 until 14).map(i =>
      (2L, i * d + 1, 10.0 + (i % 3))) ++ Seq((2L, 14 * d + 1, 300.0))
    val out2 = Events.anomalies(noisy.toDF("user_id", "ts_ms", "value"),
      "ts_ms", "user_id", "value", d, trailing = 7, z = 3.0)
      .as[(Long, Long, Double, Option[Double], Boolean)].collect()
      .sortBy(_._2)
    val spike = out2.last
    assert(spike._3 == 300.0 && spike._5, s"spike row $spike")
    assert(out2.init.forall(!_._5))
  }

  test("anomalies: gap days inherit the carried value and score normally") {
    val d = 86400000L
    val rows = Seq((1L, 0L, 5.0), (1L, d + 1, 6.0), (1L, 4 * d + 1, 5.5),
      (1L, 5 * d, 6.5), (1L, 6 * d, 5.0), (1L, 7 * d, 6.0), (1L, 8 * d, 100.0))
    val out = Events.anomalies(rows.toDF("user_id", "ts_ms", "value"),
      "ts_ms", "user_id", "value", d, trailing = 5, z = 3.0)
      .as[(Long, Long, Double, Option[Double], Boolean)].collect()
      .sortBy(_._2)
    assert(out.length == 9) // days 0..8, gaps at 2, 3 materialized
    assert(out(2)._3 == 6.0 && out(3)._3 == 6.0) // carried
    assert(out.last._5, "the 100.0 spike must flag")
  }

  test("gapFill: value_filled never null and spans are per-key") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(300)(
      (rnd.nextInt(5).toLong, rnd.nextInt(20).toLong * 86400000 + rnd.nextInt(1000),
        rnd.nextDouble()))
    val df = rows.toDF("user_id", "ts_ms", "value")
    val out = Events.gapFill(df, "ts_ms", "user_id", "value", 86400000L)
    assert(out.where(col("value_filled").isNull).count() == 0)
    // each key's row count == its span in days
    val spans = df.groupBy($"user_id")
      .agg(((max(floor($"ts_ms" / 86400000)) - min(floor($"ts_ms" / 86400000))) + 1)
        .as("span"))
      .as[(Long, Long)].collect().toMap
    val counts = out.groupBy("user_id").count().as[(Long, Long)].collect().toMap
    assert(counts == spans)
    // partitioning-invariant
    val a = out.collect().toSet
    val b = Events.gapFill(df.repartition(7), "ts_ms", "user_id", "value", 86400000L)
      .collect().toSet
    assert(a == b)
  }

  test("gapFill: pathological span trips the maxBuckets guard with a clear error") {
    // one key observed 3 years apart at stepMs=1000 → ~95M buckets;
    // without the guard this is a single ~95M-element array in one
    // task. The guard must fire lazily, per key, from inside the plan.
    val df = Seq((1L, 0L, 1.0), (1L, 3L * 365 * 86400000, 2.0))
      .toDF("user_id", "ts_ms", "value")
    val ex = intercept[Exception] {
      Events.gapFill(df, "ts_ms", "user_id", "value", stepMs = 1000L).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("maxBuckets")), msgs(ex).mkString(" | "))
    // anomalies inherits the same guard
    val ex2 = intercept[Exception] {
      Events.anomalies(df, "ts_ms", "user_id", "value", stepMs = 1000L).count()
    }
    assert(msgs(ex2).exists(_.contains("maxBuckets")))
    // an explicit larger cap lets the caller opt in
    val n = Events.gapFill(df, "ts_ms", "user_id", "value",
      stepMs = 86400000L, maxBuckets = 2000L).count()
    assert(n == 3L * 365 + 1)
  }

  test("bounded-report caps: survivalCurve maxDurations fires in-plan; topPaths topK is range-checked") {
    // 150 distinct durations against a cap of 100 → the in-plan guard
    // (fused into the risk-set window) must error, not sort unbounded
    val wide = (0 until 150).map(i => (i.toLong, i % 2 == 0))
      .toDF("dur", "ev")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    val ex = intercept[Exception] {
      // collect, not count: count() prunes every column including the
      // guarded one — any real consumer reads the curve columns
      Events.survivalCurve(wide, "dur", "ev", maxDurations = 100).collect()
    }
    assert(msgs(ex).exists(_.contains("maxDurations")), msgs(ex).mkString(" | "))
    // under the cap the same frame computes fine
    assert(Events.survivalCurve(wide, "dur", "ev", maxDurations = 150).count() == 150)
    // topK upper bound is a loud require, not a silent giant window
    val df = Seq((1L, 1L, "a")).toDF("user_id", "ts_ms", "event_type")
    val e2 = intercept[IllegalArgumentException] {
      Events.topPaths(df, "user_id", "ts_ms", "event_type", n = 2, topK = 1000001)
    }
    assert(e2.getMessage.contains("topK"))
  }

  test("gapFill: chunked spine is seamless across 4096-bucket block boundaries") {
    // span of 10000 buckets crosses two block boundaries; every
    // bucket must appear exactly once with the carried value.
    val df = Seq((1L, 0L, 3.0), (1L, 9999L * 1000, 4.0))
      .toDF("user_id", "ts_ms", "value")
    val out = Events.gapFill(df, "ts_ms", "user_id", "value", stepMs = 1000L)
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._2)
    assert(out.length == 10000)
    assert(out.map(_._2).toSeq == (0L until 10000L).map(_ * 1000))
    assert(out.head._3 == 3.0 && out.last._3 == 4.0)
    assert(out.init.tail.forall(r => r._3 == 3.0 && r._4))
  }

  test("dauMau: exact per-day/per-month distincts, month boundary, null drops") {
    val jan1 = 1704067200000L // 2024-01-01T00:00Z
    val day = 86400000L
    val rows = Seq[(Option[Long], Option[Long])](
      (Some(1L), Some(jan1)), (Some(2L), Some(jan1)),
      (Some(1L), Some(jan1 + 1000)), // day 1: users {1,2}
      (Some(1L), Some(jan1 + day)), (Some(3L), Some(jan1 + day)), // day 2: {1,3}
      (Some(1L), Some(jan1 + 31 * day)), // Feb 1: {1} -> feb MAU {1}
      (None, Some(jan1)), (Some(9L), None)) // nulls drop
    val df = rows.toDF("user_id", "ts_ms")
    val out = graft.operators.Events.dauMau(df, "ts_ms", "user_id")
      .select($"day".cast("string"), $"dau", $"mau", $"stickiness")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("2024-01-01") == ("2024-01-01", 2L, 3L, 0.666667), out)
    assert(out("2024-01-02") == ("2024-01-02", 2L, 3L, 0.666667))
    assert(out("2024-02-01") == ("2024-02-01", 1L, 1L, 1.0))
    assert(out.size == 3)
  }

  test("survivalCurve: hand-computed KM with censoring, hazard-1 zeroing, drops") {
    // A dies t1, B censored t1, C dies t2, D censored t3
    val subj = Seq((1L, true), (1L, false), (2L, true), (3L, false))
      .toDF("dur", "ev")
    val out = Events.survivalCurve(subj, "dur", "ev")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // risk sets 4 -> 2 -> 1; S = 0.75 -> 0.375 -> 0.375 (censoring
    // consumes risk-set members without dropping survival)
    assert(out(1L) == (1L, 4L, 1L, 1L, 0.25, 0.75), out(1L))
    assert(out(2L) == (2L, 2L, 1L, 0L, 0.5, 0.375), out(2L))
    assert(out(3L) == (3L, 1L, 0L, 1L, 0.0, 0.375), out(3L))

    // hazard exactly 1 (the whole remaining risk set dies — only
    // possible at the last observed duration, since a longer-lived
    // subject would sit in the risk set): survival hits exact 0, no
    // ln(0) blowup
    val dead = Seq((0L, false), (0L, false), (1L, true), (1L, true))
      .toDF("dur", "ev")
    val d = Events.survivalCurve(dead, "dur", "ev")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(d(1L)._5 == 1.0 && d(1L)._6 == 0.0, d(1L))
    assert(d(0L)._6 == 1.0, "pure censoring leaves survival at 1")

    // null / negative durations drop; empty input yields empty curve
    val messy = Seq((Some(-1L), true), (None, true)).toDF("dur", "ev")
    assert(Events.survivalCurve(messy, "dur", "ev").count() == 0)
  }

  test("ohlc: open/close by time not value, tie order, bucketing") {
    // one bucket (w=100): values 5 (t=1), 9 (t=2), 3 (t=3) → o=5 h=9 l=3 c=3
    val ev = Seq(("k", 1L, 1L, 5.0), ("k", 2L, 2L, 9.0), ("k", 3L, 3L, 3.0),
      ("k", 150L, 4L, 7.0)).toDF("k", "ts", "eid", "v")
    val out = Events.ohlc(ev, "k", "ts", "v", windowMs = 100L, tieCols = Seq("eid"))
      .collect().map(r => r.getLong(1) -> r).toMap
    val b0 = out(0L)
    assert((b0.getLong(2), b0.getDouble(3), b0.getDouble(4), b0.getDouble(5),
      b0.getDouble(6)) == ((3L, 5.0, 9.0, 3.0, 3.0)))
    assert(out(100L).getDouble(3) == 7.0)
    // same-ms ties resolve on the tie column
    val tied = Seq(("k", 5L, 2L, 8.0), ("k", 5L, 1L, 2.0)).toDF("k", "ts", "eid", "v")
    val t0 = Events.ohlc(tied, "k", "ts", "v", 100L, Seq("eid")).head()
    assert(t0.getDouble(3) == 2.0 && t0.getDouble(6) == 8.0)
  }

  test("activeStreaks: islands, longest with earliest tie, distinct days") {
    def day(d: Long) = d * 86400000L + 3600000L // any intra-day instant
    // u: days {1,2,3, 7,8, 20} → longest 3 starting day 1
    val ev = Seq(1L, 2L, 3L, 7L, 8L, 20L).map(d => ("u", day(d))) ++
      Seq(("u", day(2) + 999L)) // duplicate active day collapses
    val r = Events.activeStreaks(ev.toDF("k", "ts"), "k", "ts").head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((6L, 3L, 1L)))
    // tie between two 2-day runs → earliest start wins
    val tie = Seq(5L, 6L, 10L, 11L).map(d => ("v", day(d))).toDF("k", "ts")
    val t = Events.activeStreaks(tie, "k", "ts").head()
    assert((t.getLong(2), t.getLong(3)) == ((2L, 5L)))
  }

  test("rateLimitAudit: trailing-window counts, first violation, RANGE ties") {
    val ev = Seq(("u", 0L), ("u", 10L), ("u", 20L), ("u", 2000L), ("v", 5L))
      .toDF("k", "ts")
    val out = Events.rateLimitAudit(ev, "k", "ts", maxEvents = 2, windowMs = 100L)
      .collect().map(r => r.getString(0) -> r).toMap
    val u = out("u")
    assert((u.getLong(1), u.getLong(2), u.getLong(3), u.getLong(4)) ==
      ((4L, 1L, 3L, 20L)))
    val v = out("v")
    assert(v.getLong(2) == 0L && v.isNullAt(4))
    // same-ms burst: RANGE frames include the ties, so all three
    // events see count 3 — deterministic without a tie column
    val burst = Seq(("w", 5L), ("w", 5L), ("w", 5L)).toDF("k", "ts")
    val w = Events.rateLimitAudit(burst, "k", "ts", 2, 100L).head()
    assert((w.getLong(2), w.getLong(3), w.getLong(4)) == ((3L, 3L, 5L)))
    val withNull = Seq[(Option[String], Option[Long])](
      (Some("x"), Some(1L)), (None, Some(2L)), (Some("x"), None)).toDF("k", "ts")
    assert(Events.rateLimitAudit(withNull, "k", "ts", 1, 10L).head().getLong(1) == 1L)
  }

  test("activityHeatmap: epoch arithmetic lands on the right cells") {
    // 1970-01-01 00:30 UTC is a Thursday (dow 4), hour 0;
    // 1970-01-04 23:30 UTC is a Sunday (dow 0), hour 23
    val thu0 = 30L * 60 * 1000
    val sun23 = 3L * 86400000 + 23L * 3600000 + 30 * 60 * 1000
    val df = Seq(thu0, thu0 + 1000, sun23).toDF("ts_ms")
    val out = Events.activityHeatmap(df, "ts_ms")
      .as[(Int, Int, Long, Double)].collect().map(r => (r._1, r._2) -> r).toMap
    assert(out((4, 0))._3 == 2L && out((4, 0))._4 == 0.666667)
    assert(out((0, 23))._3 == 1L)
    // null timestamps drop; bounded output
    val withNull = Seq[Option[Long]](Some(thu0), None).toDF("ts_ms")
    assert(Events.activityHeatmap(withNull, "ts_ms").count() == 1L)
  }

  test("interArrival: hand gaps with exact percentiles, single-event key, tie order") {
    val ev = Seq(("u", 0L, 1L), ("u", 10L, 2L), ("u", 30L, 3L), ("u", 100L, 4L),
      ("v", 50L, 5L)).toDF("k", "ts", "eid")
    val out = Events.interArrival(ev, "k", "ts", Seq("eid")).collect()
      .map(r => r.getString(0) -> r).toMap
    val u = out("u")
    // gaps (10, 20, 70): p50 = 20, p90 = 20 + 0.8·50 = 60
    assert((u.getLong(1), u.getLong(2), u.getLong(3)) == ((4L, 3L, 10L)))
    assert(u.getDouble(4) == 20.0 && u.getDouble(5) == 60.0 && u.getLong(6) == 70L)
    val v = out("v")
    assert(v.getLong(1) == 1L && v.getLong(2) == 0L && v.isNullAt(4))
    // same-ms burst: ties break on eid, so gaps are 0 and deterministic
    val burst = Seq(("w", 5L, 2L), ("w", 5L, 1L), ("w", 9L, 3L)).toDF("k", "ts", "eid")
    val w = Events.interArrival(burst, "k", "ts", Seq("eid")).head()
    assert(w.getLong(2) == 2L && w.getLong(3) == 0L && w.getLong(6) == 4L)
  }

  test("concurrency: closed-open sweep-line levels, grouped and global") {
    // intervals: [1,5) [2,4) [4,6) — at t=4 one ends as one starts
    val iv = Seq(("a", 1L, 5L), ("a", 2L, 4L), ("a", 4L, 6L))
      .toDF("g", "s", "e")
    val tl = Events.concurrency(iv, "s", "e", Seq("g"))
      .select("t", "concurrent").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(tl == Seq((1L, 1L), (2L, 2L), (4L, 2L), (5L, 1L), (6L, 0L)))
    // ungrouped path (distributed prefix sum) agrees
    val glob = Events.concurrency(iv, "s", "e")
      .select("t", "concurrent").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(glob == tl)
    // groups are independent
    val two = iv.unionByName(Seq(("b", 1L, 9L)).toDF("g", "s", "e"))
    val byG = Events.concurrency(two, "s", "e", Seq("g"))
      .where(col("g") === "b").select("t", "concurrent")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(byG == Seq((1L, 1L), (9L, 0L)))
  }

  test("concurrency: null intervals drop, inverted intervals raise, repartition-invariant") {
    val withNull = Seq((Some(1L), Some(3L)), (None, Some(4L)), (Some(2L), None))
      .toDF("s", "e")
    assert(Events.concurrency(withNull, "s", "e").count() == 2)
    val inverted = Seq((5L, 1L)).toDF("s", "e")
    val ex = intercept[Exception] {
      Events.concurrency(inverted, "s", "e").collect()
    }
    assert(ex.getMessage.contains("concurrency"))
    val rnd = new scala.util.Random(3)
    val many = Seq.fill(300) {
      val s = rnd.nextInt(100).toLong; (s, s + 1 + rnd.nextInt(20))
    }.toDF("s", "e")
    val one = Events.concurrency(many, "s", "e").collect().toSeq.sortBy(_.getLong(0))
    val rep = Events.concurrency(many.repartition(13), "s", "e")
      .collect().toSeq.sortBy(_.getLong(0))
    assert(one == rep)
  }

  test("peakConcurrency: earliest boundary at the peak, per group and global") {
    val iv = Seq(("a", 1L, 5L), ("a", 2L, 4L), ("a", 4L, 6L), ("b", 7L, 8L))
      .toDF("g", "s", "e")
    val byG = Events.peakConcurrency(iv, "s", "e", Seq("g"))
      .as[(String, Long, Long)].collect().toSet
    // group a peaks at 2 first reached at t=2 (also 2 at t=4 — min wins)
    assert(byG == Set(("a", 2L, 2L), ("b", 1L, 7L)))
    val glob = Events.peakConcurrency(iv, "s", "e")
      .as[(Long, Long)].collect().head
    assert(glob == ((2L, 2L)))
  }

  test("gapFill: a NULL-key series fills like any other (null-safe spine join)") {
    val ev = Seq[(Option[String], Long, Double)](
      (None, 0L, 1.0), (None, 3000L, 4.0), (Some("a"), 0L, 9.0))
      .toDF("k", "ts", "v")
    val out = Events.gapFill(ev, "ts", "k", "v", stepMs = 1000L)
      .where($"k".isNull)
      .orderBy("bucket_ms")
      .select($"value_filled".cast("double")).as[Double].collect().toSeq
    // buckets 0..3: [1, ffill 1, ffill 1, 4] — an equality join would
    // have nulled every bucket of the null-key series
    assert(out == Seq(1.0, 1.0, 1.0, 4.0))
  }

  test("cusum: hand-computed two-sided levels, reset identity, alarm threshold") {
    // target 50, slack 5, h 10: values [60, 30, 58] →
    // S+ = [5, 0, 3] (the −25 step resets through max(0,·)),
    // S− = [0, 15, 2] — row 2 crosses h on the LOW side
    val ev = Seq((1L, 1L, 60.0), (1L, 2L, 30.0), (1L, 3L, 58.0))
      .toDF("k", "t", "v")
    val out = Events.cusum(ev, "k", Seq("t"), "v",
      target = 50.0, slack = 5.0, h = 10.0)
      .orderBy("t")
      .select("t", "alarm", "cusum_hi", "cusum_lo")
      .as[(Long, Boolean, Double, Double)].collect().toSeq
    assert(out == Seq(
      (1L, false, 5.0, 0.0),
      (2L, true, 0.0, 15.0),
      (3L, false, 3.0, 2.0)))
    // keys are independent; null values drop
    val multi = ev.unionAll(Seq((2L, Some(1L), Some(200.0)),
      (1L, Some(4L), Option.empty[Double]))
      .toDF("k", "t", "v"))
    val withNull = Events.cusum(multi, "k", Seq("t"), "v", 50.0, 5.0, 10.0)
    assert(withNull.where($"k" === 2L)
      .select("alarm").as[Boolean].collect().toSeq ==
      Seq(true)) // 200 − 55 = 145 > 10 immediately
    assert(withNull.where($"k" === 1L).count() == 3) // the null row left
    intercept[IllegalArgumentException] {
      Events.cusum(ev, "k", Seq("t"), "v", 50.0, -1.0, 10.0)
    }
  }

  test("coOccurrence: hand-computed support/confidence/lift, duplicates collapse") {
    // baskets: u1{A,B}, u2{A,B}, u3{A}, u4{B,C}; N=4, nA=3, nB=3, nC=1
    val ev = Seq((1L, "A"), (1L, "B"), (1L, "A"), // duplicate A collapses
      (2L, "A"), (2L, "B"), (3L, "A"), (4L, "B"), (4L, "C"))
      .toDF("u", "it")
    val out = Events.coOccurrence(ev, "u", "it")
      .as[(String, String, Long, Long, Long, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(out.size == 4) // A->B, B->A, B->C, C->B
    val ab = out(("A", "B"))
    assert((ab._3, ab._4, ab._5) == ((3L, 3L, 2L)))
    assert(ab._6 == 0.5 && ab._7 == 0.666667 && ab._8 == 0.888889)
    val cb = out(("C", "B"))
    assert(cb._7 == 1.0 && cb._8 == 1.333333)
    // ordered-pair symmetry where supports are symmetric
    assert(out(("B", "A"))._5 == 2L && out(("B", "C"))._7 == 0.333333)
  }

  test("attributionCredits: linear splits, first/last deterministic, window respected") {
    val ev = Seq(
      (1L, 1L, 101L, "click"),    // in window of the t=3 purchase
      (1L, 2L, 102L, "view"),     // in window
      (1L, 3L, 103L, "purchase"),
      (2L, 100L, 201L, "click"),  // 100 <= 200 - 10: outside window
      (2L, 200L, 202L, "purchase"),
      (3L, 5L, 301L, "click"),    // tied timestamps: id tie-break
      (3L, 5L, 302L, "view"),
      (3L, 6L, 303L, "purchase")).toDF("u", "ts", "id", "typ")
    def run(model: String) = Events.attributionCredits(ev, "u", "ts", "id",
      "typ", Seq("click", "view"), "purchase", windowMs = 10L, model = model)
      .as[(String, Long, Double)].collect().toSet
    assert(run("linear") ==
      Set(("click", 2L, 1.0), ("view", 2L, 1.0)))
    // first touch: user 1 -> click(t=1); user 3 tie -> id 301 (click)
    assert(run("first") == Set(("click", 2L, 2.0)))
    // last touch: user 1 -> view(t=2); user 3 tie -> id 302 (view)
    assert(run("last") == Set(("view", 2L, 2.0)))
    intercept[IllegalArgumentException] {
      Events.attributionCredits(ev, "u", "ts", "id", "typ",
        Seq("click"), "purchase", 10L, model = "shapley")
    }
    intercept[IllegalArgumentException] {
      Events.attributionCredits(ev, "u", "ts", "id", "typ",
        Seq("purchase"), "purchase", 10L)
    }
  }

  test("attributionCredits: sweep form equals the brute-force join form") {
    // The sweep rewrite must agree with the naive per-user range join
    // on a dense synthetic stream that exercises every boundary: a
    // touch exactly AT t_conv (inclusive), exactly at t_conv - window
    // (exclusive), equal-timestamp ties broken by id, conversions
    // with no in-window touch, and interleaved multi-conversion
    // windows.
    val rows = for {
      u <- 1 to 5
      i <- 0 until 40
    } yield {
      val typ = Seq("click", "view", "purchase", "view")((u + i) % 4)
      // coarse timestamps force exact-boundary and tie collisions
      (u.toLong, ((i * 7 + u * 3) % 50).toLong * 10L, (u * 1000 + i).toLong, typ)
    }
    val ev = rows.toDF("u", "ts", "id", "typ")
    def brute(model: String) = {
      import org.apache.spark.sql.expressions.Window
      val t = ev.where(col("typ").isin("click", "view"))
        .select(col("u"), col("ts").as("tt"), col("id").as("tid"),
          col("typ").as("channel"))
      val c = ev.where(col("typ") === "purchase")
        .select(col("u"), col("ts").as("tc"), col("id").as("cid"))
      val w = Window.partitionBy(col("u"), col("cid"))
      val j = t.join(c, Seq("u"))
        .where(col("tt") <= col("tc") && col("tt") > col("tc") - 100L)
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("rn", row_number().over(
          w.orderBy(col("tt").asc, col("tid").asc)))
      val cr = model match {
        case "linear" => j.withColumn("cr",
          round(lit(1.0) / col("n"), 10).cast("decimal(28,10)"))
        case "first" => j.where(col("rn") === 1)
          .withColumn("cr", lit(1).cast("decimal(28,10)"))
        case "last" => j.where(col("rn") === col("n"))
          .withColumn("cr", lit(1).cast("decimal(28,10)"))
      }
      cr.groupBy(col("channel"))
        .agg(countDistinct(col("cid")).as("n_conversions"),
          round(sum(col("cr")).cast("double"), 4).as("credit"))
        .as[(String, Long, Double)].collect().toSet
    }
    for (model <- Seq("linear", "first", "last")) {
      val sweep = Events.attributionCredits(ev, "u", "ts", "id", "typ",
        Seq("click", "view"), "purchase", windowMs = 100L, model = model)
        .as[(String, Long, Double)].collect().toSet
      assert(sweep == brute(model), s"model=$model")
    }
  }

  test("peakConcurrency: a null group key is a real group, not a dropped row") {
    // concurrency() emits the null-key group; the peak probe join
    // must be null-safe or the group silently vanishes from the report
    val iv = Seq[(Option[String], Long, Long)](
      (Some("a"), 1L, 5L), (None, 2L, 6L), (None, 3L, 7L)).toDF("g", "s", "e")
    val byG = Events.peakConcurrency(iv, "s", "e", Seq("g"))
      .as[(Option[String], Long, Long)].collect().toSet
    assert(byG == Set((Some("a"), 1L, 1L), (None, 2L, 3L)))
  }

  test("rfmSegments: hand-computed quantile scores at buckets = 2") {
    // asOf=100. u1: r=10 f=4 m=40; u2: r=50 f=2 m=10; u3: r=20 f=1
    // m=100; u4: r=80 f=3 m=5. Median edges: r 35, f 2.5, m 25.
    val ev = Seq(
      ("u1", 90L, 10.0), ("u1", 10L, 10.0), ("u1", 20L, 10.0), ("u1", 30L, 10.0),
      ("u2", 50L, 5.0), ("u2", 40L, 5.0),
      ("u3", 80L, 100.0),
      ("u4", 20L, 1.0), ("u4", 10L, 2.0), ("u4", 15L, 2.0)
    ).toDF("u", "ts", "v")
    val out = Events.rfmSegments(ev, "u", "ts", "v", asOfMs = 100L, buckets = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(7)))).toMap
    assert(out("u1") == ((10L, 4L, 40.0, "222")))
    assert(out("u2") == ((50L, 2L, 10.0, "111")))
    assert(out("u3") == ((20L, 1L, 100.0, "212")))
    assert(out("u4") == ((80L, 3L, 5.0, "121")))
    // deterministic under repartitioning
    val rep = Events.rfmSegments(ev.repartition(7), "u", "ts", "v", 100L, 2)
      .collect().map(r => r.getString(0) -> r.getString(7)).toMap
    assert(rep == out.map { case (k, v) => k -> v._4 })
  }

  test("crossCorrelation: a shifted copy correlates 1.0 at its lag") {
    // A counts per bucket [2,1,3,0]; B is A shifted +1: [0,2,1,3]
    val rows = Seq.fill(2)(("a", 0L)) ++ Seq(("a", 10L)) ++
      Seq.fill(3)(("a", 20L)) ++
      Seq.fill(2)(("b", 10L)) ++ Seq(("b", 20L)) ++ Seq.fill(3)(("b", 30L))
    val ev = rows.toDF("typ", "ts")
    val out = Events.crossCorrelation(ev, "ts", "typ", "a", "b",
      stepMs = 10L, maxLag = 1)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1) == ((3L, 1.0)))
    // hand-computed at lag -1: [1,3,0] vs [0,2,1] -> 6/sqrt(84)
    assert(out(-1)._2 ==
      math.rint(6.0 / math.sqrt(84.0) * 1e6) / 1e6)
    // constant overlap -> null corr, never a divide-by-zero
    val flat = Seq(("a", 0L), ("a", 10L), ("b", 0L), ("b", 10L)).toDF("typ", "ts")
    val fo = Events.crossCorrelation(flat, "ts", "typ", "a", "b", 10L, 1)
      .where(col("lag") === 0).head()
    assert(fo.isNullAt(2))
  }

  test("theilSenTrend: exact line recovers slope and intercept; outlier-robust") {
    // y = 2x + 1 over buckets 0..4, one value per bucket
    val ev = (0 to 4).map(x => (x * 10L, 2.0 * x + 1)).toDF("ts", "v")
    val r = Events.theilSenTrend(ev, "ts", "v", stepMs = 10L).head()
    assert((r.getLong(0), r.getLong(1)) == ((5L, 10L)))
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 1.0)
    // one wild outlier bucket barely moves the median slope
    val dirty = ev.union(Seq((50L, 1000.0)).toDF("ts", "v"))
    val rd = Events.theilSenTrend(dirty, "ts", "v", stepMs = 10L).head()
    assert(rd.getDouble(2) < 3.0, s"robust slope moved to ${rd.getDouble(2)}")
    // bucket-cap guard raises in-plan (pair volume is |buckets|²)
    val wide = (0 until 20).map(i => (i.toLong, 1.0)).toDF("ts", "v")
    val err = intercept[Exception] {
      Events.theilSenTrend(wide, "ts", "v", stepMs = 1L, maxBuckets = 10L)
        .collect()
    }
    assert(err.getMessage.contains("maxBuckets") ||
      err.getCause != null, err.getMessage)
  }
}
