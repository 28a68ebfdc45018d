package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` / `array<double>`
  * columns, built from the higher-order functions (`zip_with`,
  * `aggregate`) so everything stays declarative and codegen-capable.
  * Accumulation is in double regardless of input element type.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ accumulated in double. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity in [-1, 1]; null-safe on zero vectors. */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom > 0, dotProduct(a, b) / denom)
  }

  /** Squared euclidean distance. */
  def squaredL2Distance(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)

  /** Random-hyperplane (SimHash-for-vectors) LSH bucket id from
    * `numPlanes` sign bits. Planes are deterministic Rademacher (±1)
    * vectors derived from md5(plane, dim-index) — reproducible across
    * engines and runs, no stored model. One pass, no shuffle.
    */
  def hyperplaneBucket(vec: Column, dim: Int, numPlanes: Int): Column = {
    require(numPlanes <= 30, "bucket id held in an int")
    val bits = (0 until numPlanes).map { p =>
      // plane component i = +1 if first md5 nibble of "p:i" is even
      val products = (0 until dim).map { i =>
        val nibble = conv(substring(md5(lit(s"$p:$i")), 1, 1), 16, 10).cast("int")
        val sign = when(nibble % 2 === 0, 1.0).otherwise(-1.0)
        element_at(vec, i + 1).cast("double") * sign
      }
      val dot = products.reduce(_ + _)
      when(dot > 0, 1).otherwise(0) * lit(1 << p)
    }
    bits.reduce(_ + _)
  }
}
