package graft

import graft.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the native graft expressions.
  *
  * Production path: `--conf spark.sql.extensions=graft.GraftExtensions`
  * injects the functions at session build. For an already-running
  * session (tests, notebooks), `GraftExtensions.register(spark)` adds
  * them to the session's function registry directly.
  *
  * ```sql
  * SELECT cosine_similarity(a.embedding, b.embedding) FROM ...
  * SELECT simhash(word_ngrams(split(text, '\\s+'), 2), 28) FROM docs
  * ```
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (name, arity, builder) =>
      ext.injectFunction(
        (new FunctionIdentifier(name),
          new ExpressionInfo("graft", name),
          (args: Seq[Expression]) => {
            require(args.length == arity, s"$name expects $arity arguments")
            builder(args)
          }))
    }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, arity, builder) for every injected function. */
  val definitions: Seq[(String, Int, Seq[Expression] => Expression)] = Seq(
    ("cosine_similarity", 2, args => CosineSimilarity(args(0), args(1))),
    ("jaccard_sim", 2, args => JaccardSim(args(0), args(1))),
    ("simhash", 2,
      args => SimHash(args(0), intLit(args(1), "simhash bits"))),
    ("chunk_minhash", 2,
      args => ChunkMinHash(args(0), intLit(args(1), "chunk_minhash numHashes"))),
    ("char_shingles", 2,
      args => CharShingles(args(0), intLit(args(1), "char_shingles k"))),
    ("word_ngrams", 2,
      args => WordNgrams(args(0), intLit(args(1), "word_ngrams n"))))

  /** Register all graft SQL functions on a live session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, _, builder) =>
      org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, name, builder)
    }
}
