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
}
