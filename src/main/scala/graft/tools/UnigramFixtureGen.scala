package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerate the shipped unigram fixture
  * (src/main/resources/graft/unigram/test_pieces.tsv): train on the
  * sf0.01 bench corpus with the documented q_unigram_train
  * configuration. Dev tool, not part of the driver contract.
  */
object UnigramFixtureGen {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = args.headOption
      .getOrElse("src/main/resources/graft/unigram/test_pieces.tsv")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val spec = graft.functions.Unigram.train(docs, "text",
      numPieces = 272, emRounds = 2, maxPieceLen = 6, maxUnitLen = 16)
    val p = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p,
      graft.functions.Unigram.renderPieces(spec)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[fixture] wrote ${spec.pieces.length} pieces to $out")
    spec.pieces.drop(256).foreach { case (piece, s) =>
      println(s"[fixture] $piece\t$s")
    }
    spark.stop()
  }
}
