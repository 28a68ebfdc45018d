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

  /** Matryoshka prefix truncation (MRL, Kusupati et al. 2022,
    * arXiv:2205.13147): the first `dim` components of an
    * MRL-trained embedding are themselves a usable lower-dimensional
    * embedding — the standard storage/bandwidth lever for
    * billion-vector serving (4× fewer floats moved per scan at
    * dim/4). Pure `slice`, row-local, codegen'd; cosine ranking
    * needs no renorm (cosine is scale-invariant), use
    * [[truncateNormalize]] when dot-product serving expects unit
    * vectors.
    */
  def truncate(vec: Column, dim: Int): Column = {
    require(dim > 0, "dim must be positive")
    slice(vec, 1, dim)
  }

  /** [[truncate]] + L2 renormalization to a unit `array<double>`
    * (zero prefixes → null, same null-safety as
    * [[cosineSimilarity]]).
    */
  def truncateNormalize(vec: Column, dim: Int): Column = {
    val tv = truncate(vec, dim)
    val n = l2Norm(tv)
    when(n > 0, transform(tv, x => x.cast("double") / n))
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

  /** Deterministic Rademacher (±1) hyperplane components: sign i of
    * plane p is the parity of the first md5 nibble of "p:i". No
    * fitted model to ship — any engine (or a SQL oracle) can
    * regenerate the exact planes.
    *
    * `planeOffset` selects a disjoint slice of the global plane
    * family (planes planeOffset..planeOffset+numPlanes-1) so multiple
    * independent LSH tables (banding / OR-amplification) can be built
    * from the same generator.
    */
  def planeSigns(dim: Int, numPlanes: Int, planeOffset: Int = 0): Seq[Seq[Int]] =
    (planeOffset until planeOffset + numPlanes).map { p =>
      (0 until dim).map { i =>
        val d = java.security.MessageDigest
          .getInstance("MD5")
          .digest(s"$p:$i".getBytes("UTF-8"))
        if (((d(0) >> 4) & 1) == 0) 1 else -1
      }
    }

  /** Native codegen cosine similarity — bit-identical to
    * [[cosineSimilarity]] but a tight primitive loop instead of four
    * interpreted higher-order-function passes. Use in hot paths.
    */
  def cosineSimilarityNative(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      CosineSimilarity(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  }

  /** Native codegen squared L2 — bit-identical to
    * [[squaredL2Distance]] (same index-order accumulation, same null
    * semantics); the kernel the PQ fit/encode/ADC pairs loop runs on.
    */
  def squaredL2DistanceNative(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      SquaredL2Distance(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  }

  /** Row-local nearest centroid over a centroid-matrix column
    * (`array<struct<cid, vec>>`, cid-ascending) — see
    * [[NearestCentroid]] for the exact equivalence contract with the
    * max/min(struct) aggregation shape it replaces. metric: "cosine"
    * (argmax, raw kernel score) or "l2r6" (argmin of round(L2², 6)).
    */
  def nearestCentroidNative(vec: Column, cens: Column, metric: String): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      NearestCentroid(
        GraftSqlBridge.expression(vec), GraftSqlBridge.expression(cens), metric))
  }

  /** Native codegen hyperplane bucket — bit-identical to
    * [[hyperplaneBucket]]; one pass over the vector for all planes.
    */
  def hyperplaneBucketNative(
      vec: Column, dim: Int, numPlanes: Int, planeOffset: Int = 0): Column = {
    // Same bound as the HOF twin: the kernel computes 1 << p, which
    // Java wraps mod 32 — planes past 31 would silently alias.
    require(numPlanes >= 1 && numPlanes <= 30, "bucket id held in an int")
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      HyperplaneBucket(
        GraftSqlBridge.expression(vec),
        planeSigns(dim, numPlanes, planeOffset).map(_.map(_.toDouble))))
  }

  /** Johnson–Lindenstrauss projection to `outDim` dims (native, one
    * pass): Rademacher ±1/√k matrix from the SAME deterministic
    * md5-parity generator as the LSH planes ([[planeSigns]] — use
    * `planeOffset` to pick an independent slice). The projected
    * `array<double>` drops into every downstream ANN operator at
    * outDim/dim of the scan+shuffle payload with 1±ε distance
    * distortion. Null on length mismatch or null elements.
    */
  def randomProject(
      vec: Column, dim: Int, outDim: Int, planeOffset: Int = 0): Column = {
    require(outDim >= 1 && outDim <= dim,
      s"outDim must be in [1, $dim], got $outDim")
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      RademacherProject(
        GraftSqlBridge.expression(vec),
        planeSigns(dim, outDim, planeOffset).map(_.map(_.toDouble))))
  }

  /** Symmetric per-vector int8 quantization (native, one pass):
    * struct(`scale` = max|vᵢ| as float, `q` = round(127·vᵢ/scale) as
    * array<tinyint>). 4× smaller embedding payloads for ANN
    * shuffle/storage; invert with [[dequantize8]] (per-component
    * error ≤ scale/254). Zero vectors quantize to all-zero codes.
    */
  def quantize8(vec: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(QuantizeInt8(GraftSqlBridge.expression(vec)))
  }

  /** Declarative twin of [[quantize8]] — the oracle-portable
    * semantics (interpreted HOFs; max|v| re-derived per element, so
    * use the native version in hot paths).
    */
  def quantize8Hof(vec: Column): Column = {
    val maxAbs = array_max(transform(vec, v => abs(v)))
    val q = transform(vec, v =>
      when(maxAbs === 0.0f, lit(0).cast("tinyint"))
        .otherwise(round(v.cast("double") * 127 / maxAbs.cast("double"))
          .cast("tinyint")))
    struct(maxAbs.as("scale"), q.as("q"))
  }

  /** Cosine over int8 code arrays (the `q` field of [[quantize8]]):
    * cosine is scale-invariant, so the similarity runs entirely on
    * integer accumulators over 4×-smaller payloads. Approximation
    * error vs float cosine is bounded by the quantization step
    * (±1/254 per normalized component).
    */
  def cosineSimilarityInt8(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      CosineSimilarityInt8(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  }

  /** Reconstruct `array<float>` from a [[quantize8]] struct:
    * vᵢ ≈ qᵢ·scale/127.
    */
  def dequantize8(qs: Column): Column =
    transform(qs.getField("q"), x =>
      (x.cast("double") * qs.getField("scale").cast("double") / 127)
        .cast("float"))

  /** Element-wise subtraction of a fixed mean vector (row-local
    * codegen-friendly `zip_with` against a literal array) — the
    * centering transform that makes [[packSignBits]] codes track
    * angular order (SimHash is tightest on zero-mean data). The mean
    * comes from [[graft.operators.Similarity.meanVector]] (fit once,
    * reuse everywhere); null on length mismatch is inherited from
    * `zip_with`'s null-element contract.
    */
  def subtractMean(vec: Column, mean: Seq[Double]): Column =
    zip_with(vec.cast("array<double>"),
      array(mean.map(lit): _*),
      (x, m) => x - m)

  /** Sign-bit (1-bit) vector code as `array<bigint>` words — 32×
    * smaller than float payloads, 8× smaller than [[quantize8]]. For
    * mean-centered embeddings 1 − hamming/dim tracks the angle
    * (SimHash bound), so binary codes are the coarsest, cheapest
    * rerank tier: scan binary → shortlist → rerank int8/float.
    */
  def packSignBits(vec: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(PackSignBits(GraftSqlBridge.expression(vec)))
  }

  /** Hamming distance between two [[packSignBits]] codes. */
  def hammingDistance(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      HammingDistance(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  }

  /** Random-hyperplane (SimHash-for-vectors) LSH bucket id from
    * `numPlanes` sign bits. The planes are [[planeSigns]] literals
    * baked into the expression — constant-folded, one pass, no
    * shuffle, no model state.
    */
  def hyperplaneBucket(vec: Column, dim: Int, numPlanes: Int): Column = {
    require(numPlanes <= 30, "bucket id held in an int")
    val planes = planeSigns(dim, numPlanes)
    val bits = planes.zipWithIndex.map { case (signs, p) =>
      val signArr = array(signs.map(s => lit(s.toDouble)): _*)
      val dot = aggregate(
        zip_with(vec, signArr, (x, y) => x.cast("double") * y),
        lit(0.0),
        (acc, v) => acc + v)
      when(dot > 0, lit(1 << p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }
}
