package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (b <- 0 until bits) {
      z |= ((x >> b) & 1L) << (2 * b)
      z |= ((y >> b) & 1L) << (2 * b + 1)
    }
    z
  }

  test("zorderValue: matches the reference interleave bit-for-bit") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", Layout.zorderValue(Seq($"x", $"y"), 16).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == mortonRef(x, y, 16), s"($x,$y)") }
  }

  test("zorderValue: three columns, small width, stays in range") {
    val pts = for (x <- 0L to 7L; y <- 0L to 7L; w <- 0L to 7L) yield (x, y, w)
    val zs = pts.toDF("x", "y", "w")
      .select(Layout.zorderValue(Seq($"x", $"y", $"w"), 3).as("z"))
      .as[Long].collect()
    assert(zs.distinct.length == 512) // the curve is a bijection
    assert(zs.forall(z => z >= 0 && z < 512))
  }

  test("zorderValue: rejects widths that overflow a long") {
    intercept[IllegalArgumentException](
      Layout.zorderValue(Seq($"x", $"y"), 32))
  }

  test("layoutZOrder: files cover small multi-dim boxes vs an unclustered write") {
    // 4096 points on a 64×64 grid; z-layout into 16 files must give
    // per-file bounding boxes dramatically tighter than round-robin.
    val pts = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    Layout.layoutZOrder(pts, Seq($"x", $"y"), bits = 6, s"$dir/z", numFiles = 16)
    pts.repartition(16).write.mode("overwrite").parquet(s"$dir/plain")

    def avgBoxArea(path: String): Double = {
      val boxes = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(((max($"x") - min($"x") + 1) * (max($"y") - min($"y") + 1)).as("area"))
        .select(avg($"area")).as[Double].head()
      boxes
    }
    val zArea = avgBoxArea(s"$dir/z")
    val plainArea = avgBoxArea(s"$dir/plain")
    // round-robin files span the whole 64×64 = 4096 box; z files
    // cover ~1/16 of the grid each (256) plus boundary slack.
    assert(plainArea > 3500, s"plain=$plainArea")
    assert(zArea < plainArea / 4, s"z=$zArea vs plain=$plainArea")

    // a selective 2-D predicate prunes most z files entirely
    val hit = spark.read.parquet(s"$dir/z")
      .where($"x" < 8 && $"y" < 8)
      .select(input_file_name()).distinct().count()
    assert(hit <= 4, s"selective filter touched $hit of 16 z files")
  }

  test("compactionPlan: bins respect the target and the rule is deterministic") {
    val files = Seq(
      ("a", 70L), ("b", 60L), ("c", 50L), ("d", 40L),
      ("e", 30L), ("f", 20L), ("g", 10L), ("h", 5L))
      .toDF("file", "size_bytes")
    val plan = Layout.compactionPlan(files, "file", "size_bytes", targetBytes = 100L)
      .select($"file", $"size_bytes", $"bin")
      .as[(String, Long, Int)].collect().sortBy(_._1)
    // size-desc order: a(70) b(60) c(50) d(40) e(30) f(20) g(10) h(5)
    // cum-before:      0     70    130   180   220   250   270   280
    // bin = cum//100:  0     0     1     1     2     2     2     2
    val expect = Map("a" -> 0, "b" -> 0, "c" -> 1, "d" -> 1,
      "e" -> 2, "f" -> 2, "g" -> 2, "h" -> 2)
    plan.foreach { case (f, _, b) => assert(b == expect(f), f) }
    // every bin except possibly the last holds >= target/2 … <= ~2× target
    val sums = plan.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    assert(sums.values.forall(_ <= 200))
  }

  test("compactionPlan: single file larger than target gets its own leading bins") {
    val files = Seq(("big", 250L), ("s1", 10L), ("s2", 10L)).toDF("file", "size_bytes")
    val plan = Layout.compactionPlan(files, "file", "size_bytes", 100L)
      .select($"file", $"bin").as[(String, Int)].collect().toMap
    assert(plan("big") == 0)          // cum-before 0
    assert(plan("s1") == 2 && plan("s2") == 2) // cum-before 250, 260
  }
}
