package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: exact row/null/distinct counts per column") {
    val df = Seq(
      (Some("a"), Some(1)), (Some("a"), None), (None, Some(2)), (Some("b"), Some(2)))
      .toDF("s", "i")
    val out = Profile.profile(df)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out("s") == ((4L, 1L, 2L)))
    assert(out("i") == ((4L, 1L, 2L)))
  }

  test("profile: approx mode returns plausible estimates") {
    val df = (1 to 1000).map(i => i % 100).toDF("v")
    val (_, _, dist) = Profile.profile(df, approx = true)
      .as[(String, Long, Long, Long)].head() match {
        case (_, n, nulls, d) => (n, nulls, d)
      }
    assert(dist > 80 && dist < 120)
  }
}
