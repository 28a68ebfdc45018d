package graft

import graft.operators.Profile
import org.apache.spark.sql.functions._

class MgSketchSpec extends SparkSpec {
  import spark.implicits._

  test("mgHeavyHitters: bounded output, all genuinely-frequent items present") {
    // skewed stream: item i has weight ~ 60000/i over 200 items
    val rows = (1 to 200).flatMap(i => Seq.fill(60000 / (i * i) + 1)(s"it$i"))
    val n = rows.length
    val k = 32
    val df = rows.toDF("v")
    val out = Profile.mgHeavyHitters(df, "v", k).as[(String, Long)].collect()
    assert(out.length <= k)
    val counts = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val threshold = n.toDouble / (k + 1)
    val got = out.map(_._1).toSet
    counts.foreach { case (item, c) =>
      if (c > threshold) assert(got.contains(item), s"$item (count $c) missing")
    }
    // kept counters are lower bounds within N/(k+1)
    out.foreach { case (item, cnt) =>
      assert(cnt <= counts(item), s"$item over-counted")
      assert(counts(item) - cnt <= threshold + 1, s"$item under by too much")
    }
  }

  test("mgHeavyHitters: guarantee holds under any partitioning (merge order)") {
    val rnd = new scala.util.Random(9)
    val rows = rnd.shuffle(
      Seq.fill(5000)("hot1") ++ Seq.fill(4000)("hot2") ++
        (1 to 6000).map(i => s"cold$i"))
    val k = 16
    val threshold = rows.length.toDouble / (k + 1) // ~882
    for (parts <- Seq(1, 7, 32)) {
      val got = Profile.mgHeavyHitters(rows.toDF("v").repartition(parts), "v", k)
        .as[(String, Long)].collect().map(_._1).toSet
      assert(got.contains("hot1") && got.contains("hot2"), s"parts=$parts")
    }
    assert(5000 > threshold && 4000 > threshold) // the test premise
  }

  test("mgHeavyHitters: exact when distinct items fit in k; nulls skipped") {
    val df = Seq(Some("a"), Some("a"), Some("b"), None, Some("a")).toDF("v")
    val out = Profile.mgHeavyHitters(df, "v", k = 8)
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 3L, "b" -> 1L))
  }

  test("mgHeavyHitters: k=1 degrades to (at most) the majority candidate") {
    val df = (Seq.fill(60)("maj") ++ (1 to 40).map("x" + _)).toDF("v")
    val out = Profile.mgHeavyHitters(df.repartition(5), "v", k = 1)
      .as[(String, Long)].collect()
    assert(out.length <= 1)
    // 60 of 100 > N/2: the majority element MUST survive
    assert(out.headOption.exists(_._1 == "maj"))
  }
}
