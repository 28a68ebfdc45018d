package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin: inner join matches the plain join") {
    val large = Seq((1, "a1"), (1, "a2"), (2, "b1"), (3, "c1")).toDF("k", "lv")
    val small = Seq((1, "X"), (2, "Y")).toDF("k", "sv")
    val plain = large.join(small, Seq("k"))
      .select($"k", $"lv", $"sv").as[(Int, String, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(large, small, Seq("k"), saltFactor = 4)
      .select($"k", $"lv", $"sv").as[(Int, String, String)].collect().sorted.toSeq
    assert(salted == plain)
  }

  test("saltedJoin: left join keeps unmatched rows exactly once") {
    val large = Seq((1, "a1"), (9, "z1")).toDF("k", "lv")
    val small = Seq((1, "X")).toDF("k", "sv")
    val out = Skew.saltedJoin(large, small, Seq("k"), saltFactor = 3, joinType = "left")
      .select($"k", $"lv", $"sv").collect()
    assert(out.length == 2)
    val unmatched = out.filter(_.isNullAt(2))
    assert(unmatched.length == 1 && unmatched.head.getInt(0) == 9)
  }

  test("saltedJoin: rejects right joins") {
    val df = Seq((1, "a")).toDF("k", "v")
    intercept[IllegalArgumentException](
      Skew.saltedJoin(df, df, Seq("k"), 2, joinType = "right"))
  }
}
