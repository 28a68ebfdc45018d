package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions match the Column API") {
    GraftExtensions.register(spark)
    Seq((Seq(1.0f, 2.0f, 2.0f), Seq(2.0f, 0.0f, 0.0f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val sql = spark
      .sql("SELECT cosine_similarity(a, b) AS c FROM vecs")
      .as[Double].head()
    val api = Seq((Seq(1.0f, 2.0f, 2.0f), Seq(2.0f, 0.0f, 0.0f))).toDF("a", "b")
      .select(VectorFunctions.cosineSimilarityNative($"a", $"b")).as[Double].head()
    assert(sql == api)

    Seq("the quick brown fox").toDF("text").createOrReplaceTempView("docs_sql")
    val sh = spark
      .sql("SELECT char_shingles(text, 5) AS s, simhash(word_ngrams(split(text, '\\\\s+'), 2), 28) AS sig FROM docs_sql")
      .collect()(0)
    assert(sh.getSeq[String](0).nonEmpty)
    assert(sh.getLong(1) != 0L)

    val jac = spark
      .sql("SELECT jaccard_sim(array('a','b'), array('b','c')) AS j")
      .as[Double].head()
    assert(math.abs(jac - 1.0 / 3.0) < 1e-12)

    val mins = spark
      .sql("SELECT chunk_minhash(array('x','y','z'), 4) AS m")
      .collect()(0).getSeq[String](0)
    assert(mins.length == 4 && mins.forall(_.length == 4))
  }

  test("non-literal size arguments are rejected") {
    GraftExtensions.register(spark)
    Seq(("abc", 3)).toDF("s", "n").createOrReplaceTempView("bad_args")
    val e = intercept[Exception] {
      spark.sql("SELECT char_shingles(s, n) FROM bad_args").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getCause != null && e.getCause.getMessage.contains("integer literal"))
  }
}
