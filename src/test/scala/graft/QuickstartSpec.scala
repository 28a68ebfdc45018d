package graft

/** Keeps the README quickstart honest: the exact pipeline the README
  * shows ([[graft.tools.Quickstart.run]]) compiles and runs at
  * sf0.01 inside the suite, every stage retains rows, and the stage
  * counts are monotonically non-increasing through the filters (a
  * gate that grows its input is a composition bug).
  */
class QuickstartSpec extends SparkSpec {

  test("the README quickstart pipeline runs end to end at sf0.01") {
    val sfDir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val (counts, shards) = graft.tools.Quickstart.run(spark, sfDir)
    val byStage = counts.toMap
    assert(counts.map(_._1) ==
      Seq("raw", "gated", "deduped", "selected", "sequences"))
    assert(counts.forall(_._2 > 0), s"a stage went empty: $counts")
    assert(byStage("gated") <= byStage("raw"))
    assert(byStage("deduped") <= byStage("gated"))
    assert(byStage("selected") <= byStage("deduped"))
    // the shard frame is the training artifact: full sequences only
    assert(shards.columns.toSet ==
      Set("seq_id", "n_tokens", "input_ids"))
    val bad = shards.where(org.apache.spark.sql.functions.col("n_tokens") =!= 512)
    assert(bad.count() == 0, "packToShards leaked a partial sequence")
  }
}
