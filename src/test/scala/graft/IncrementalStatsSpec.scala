package graft

import org.apache.spark.sql.functions._

import graft.operators.IncrementalStats

class IncrementalStatsSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (0 until 120).map(i =>
    (i.toLong, Seq("en", "de", "fa")(i % 3), (i % 17 + 1) * 0.25))
  private def df = rows.toDF("id", "g", "v")

  private def canon(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("merge of split states is bit-identical to the whole-corpus state") {
    val whole = IncrementalStats.momentState(df, Seq("g"), "v")
    val a = IncrementalStats.momentState(df.where($"id" % 2 === 0), Seq("g"), "v")
    val b = IncrementalStats.momentState(df.where($"id" % 2 === 1), Seq("g"), "v")
    val merged = IncrementalStats.mergeMomentStates(Seq(a, b), Seq("g"))
    assert(canon(merged) == canon(whole))
    // schema closure up to nullability (count() marks n non-null on
    // the build side; the merged sum is nullable by SQL typing)
    assert(merged.schema.map(f => (f.name, f.dataType)) ==
      whole.schema.map(f => (f.name, f.dataType)), "merge must be schema-closed")
    // associativity: ((a+b)+c) == (a+(b+c)) on a 3-way split
    val parts = (0 until 3).map(k =>
      IncrementalStats.momentState(df.where($"id" % 3 === k), Seq("g"), "v"))
    val left = IncrementalStats.mergeMomentStates(
      Seq(IncrementalStats.mergeMomentStates(parts.take(2), Seq("g")), parts(2)),
      Seq("g"))
    val right = IncrementalStats.mergeMomentStates(
      Seq(parts(0), IncrementalStats.mergeMomentStates(parts.drop(1), Seq("g"))),
      Seq("g"))
    assert(canon(left) == canon(right) && canon(left) == canon(whole))
  }

  test("momentReport matches direct per-group statistics") {
    val rep = IncrementalStats.momentReport(
      IncrementalStats.momentState(df, Seq("g"), "v"), Seq("g"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    for (g <- Seq("en", "de", "fa")) {
      val vs = rows.filter(_._2 == g).map(_._3)
      val mean = math.rint(vs.sum / vs.size * 1e6) / 1e6
      val varS = vs.map(v => (v - mean) * (v - mean)).sum / (vs.size - 1)
      assert(rep(g)._1 == vs.size.toLong)
      assert(rep(g)._2 == mean)
      assert(math.abs(rep(g)._3 - varS) < 1e-4, s"$g var ${rep(g)._3} vs $varS")
    }
  }

  test("null values drop; a null group is a real slice; guards") {
    val withNulls = df.union(Seq(
      (900L, "en", Double.NaN).copy(_3 = Double.NaN)).toDF("id", "g", "v")
      .withColumn("v", lit(null).cast("double")))
      .union(Seq((901L, null.asInstanceOf[String], 2.0)).toDF("id", "g", "v"))
    val st = IncrementalStats.momentState(withNulls, Seq("g"), "v")
    val en = st.where($"g" === "en").head()
    assert(en.getLong(en.fieldIndex("n")) == 40L) // the null-v row dropped
    assert(st.where($"g".isNull).count() == 1)    // the null group exists
    intercept[IllegalArgumentException] {
      IncrementalStats.mergeMomentStates(
        Seq(df.select($"g", $"v")), Seq("g"))
    }
  }
}
