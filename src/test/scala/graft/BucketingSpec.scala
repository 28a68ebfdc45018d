package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed join plans without a shuffle exchange") {
    val facts = (1 to 1000).map(i => (i.toLong % 50, s"f$i")).toDF("k", "fv")
    val dims = (0 until 50).map(i => (i.toLong, s"d$i")).toDF("k", "dv")
    Bucketing.writeBucketed(facts, "graft_b_facts", Seq("k"), 8, sortCols = Seq("k"))
    Bucketing.writeBucketed(dims, "graft_b_dims", Seq("k"), 8, sortCols = Seq("k"))
    // disable broadcast so the join would otherwise shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "graft_b_facts", "graft_b_dims", Seq("k"))
      assert(joined.count() == 1000)
      assert(Bucketing.exchangeCount(joined) == 0)

      // control: the same join over non-bucketed data shuffles
      val plain = facts.join(dims, Seq("k"))
      plain.count()
      assert(Bucketing.exchangeCount(plain) > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_b_facts")
      spark.sql("DROP TABLE IF EXISTS graft_b_dims")
    }
  }
}
