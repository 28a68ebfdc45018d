package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA over embedding columns — the whitening/decorrelation step in
  * front of SemDeDup-style clustering and the dimensionality lever
  * when matryoshka prefixes aren't available (embeddings not
  * MRL-trained).
  *
  * Scale design: the ONLY corpus pass computes the exact second
  * moments (n, Σx, upper-triangle Σxxᵀ) — elements are cast ONCE to
  * a compact decimal, so every accumulator is an EXACT decimal sum:
  * order-independent, partition-deterministic, and replayable in
  * another engine (the same device as the entropy/NB-score sums).
  * The default path is [[graft.functions.DecimalMomentAggregate]]:
  * one flat 128-bit buffer per partition doing the multiplies as
  * exact unscaled-long arithmetic, so the shuffle carries ≤
  * partitions · one buffer regardless of corpus size and only the
  * bounded moment set reaches the driver (the
  * (d(d+1)/2+d+1)-row explode-aggregate survives as the wide-element
  * fallback, value-identical by randomized test). The d×d
  * eigendecomposition (cyclic Jacobi) is driver-side — d is a model
  * dimension (64–4096), never data-sized. Projection is a row-local
  * codegen'd dot per component.
  */
object Pca {

  /** Fitted model: `mean` (d), `components` (k rows × d, unit,
    * mutually orthogonal, descending `eigenvalues` (k), sign-fixed so
    * each component's largest-|coordinate| entry is positive).
    */
  case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double]) {
    def k: Int = components.length
    def dim: Int = mean.length
  }

  /** The one-scan moment frame: position 0 = n, positions 1..d = Σxᵢ,
    * positions d+1.. = the UPPER-TRIANGLE Σxᵢxⱼ (j ≥ i, row-major —
    * covariance is symmetric, so half the multiplies buy the whole
    * matrix), every sum an exact decimal. Two deliberate type
    * choices keep the hot multiply on Spark's COMPACT-LONG decimal
    * path (`Decimal` stays long-backed while precision ≤ 18, ~an
    * order of magnitude faster than the BigDecimal fallback):
    * elements are DECIMAL(intDigits+scale, scale) and the default
    * contract (`intDigits = 2`, `scale = 6`) makes every product
    * DECIMAL(17, 2·scale). Inputs must satisfy |x| < 10^intDigits
    * (the embedding contract by a wide margin); raise `intDigits`
    * for wider data and pay the BigDecimal path. Null vectors are
    * skipped; elements are assumed dense.
    */
  private[graft] def momentFrame(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      scale: Int,
      intDigits: Int = 2): DataFrame = {
    require(scale >= 1 && intDigits >= 1, "scale/intDigits must be positive")
    val elemP = intDigits + scale
    val dec = transform(col(vecCol), x => x.cast(s"decimal($elemP,$scale)"))
    if (elemP <= 9) {
      // Native kernel: the same pre-cast decimals multiplied/summed as
      // exact unscaled longs into ONE buffer per partition — no
      // 2,145-generated-rows-per-vector explode, no hash aggregate
      // over position keys. Value-identical to the explode path below
      // (randomized-equality test in PcaSpec); the empty-corpus filter
      // restores its zero-rows-in → zero-rows-out contract.
      import org.apache.spark.sql.GraftSqlBridge
      val agg = GraftSqlBridge.column(
        graft.functions.DecimalMomentAggregate(
          GraftSqlBridge.expression(dec), dim, scale, intDigits)
          .toAggregateExpression())
      df.where(col(vecCol).isNotNull)
        .select(agg.as("__m"))
        .where(element_at(col("__m"), 1) =!= 0)
        .select(posexplode(col("__m")).as(Seq("__pos", "__s")))
    } else {
      // Wide elements (elemP > 9): products exceed exact-long range,
      // so keep the decimal explode-aggregate (BigDecimal path).
      val prodType = s"decimal(${2 * elemP + 1},${2 * scale})"
      val withOne = concat(
        array(lit(1).cast(prodType)),
        transform(dec, x => x.cast(prodType)),
        flatten(transform(dec, (x, i) =>
          transform(slice(dec, i + 1, lit(dim) - i), y => x * y))))
      df.where(col(vecCol).isNotNull)
        .select(posexplode(withOne).as(Seq("__pos", "__v")))
        .groupBy(col("__pos"))
        .agg(sum(col("__v")).as("__s"))
    }
  }

  /** 0-based row index i of 0-based triangle offset `p0` (the
    * inverse of offset(i) = i·d − i(i−1)/2): the discriminant is the
    * EXACT perfect square (2d+1−2i)² at each row start, so the
    * floor can never flip — all intermediates < 2⁵³.
    */
  private def triRow(p0: Column, dim: Int): Column =
    floor((lit(2 * dim + 1) -
      sqrt(lit((2L * dim + 1) * (2L * dim + 1)).cast("double") -
        p0.cast("double") * 8)) / 2).cast("int")

  /** Sample covariance matrix of the embedding column, computed from
    * the exact-decimal moments: `cov(i,j) = (Σxᵢxⱼ − Σxᵢ·Σxⱼ/n)/(n−1)`
    * (that exact association order, replicated in the oracle), 6 dp.
    * One corpus scan computes the upper triangle; the reshape joins
    * run on the bounded moment frame and the strict triangle mirrors
    * to the full symmetric output.
    *
    * @return d² rows (i, j, cov).
    */
  def covarianceMatrix(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      scale: Int = 6,
      intDigits: Int = 2): DataFrame = {
    require(dim > 0, "dim must be positive")
    val m = momentFrame(df, vecCol, dim, scale, intDigits).localCheckpoint()
    val nRow = m.where(col("__pos") === 0)
      .select(col("__s").cast("double").as("__n"))
    val sx = m.where(col("__pos").between(1, dim))
      .select((col("__pos") - 1).cast("int").as("__i"),
        col("__s").cast("double").as("__sx"))
    val p0 = col("__pos") - dim - 1
    val iCol = triRow(p0, dim)
    // offset(i) = i·d − i(i−1)/2 — i(i−1) is always even, the /2 exact
    val offI = iCol * dim - (iCol * (iCol - 1)).cast("long") / 2
    val tri = m.where(col("__pos") > dim)
      .select(
        iCol.as("i"),
        (iCol + (p0 - offI)).cast("int").as("j"),
        col("__s").cast("double").as("__p"))
      .join(broadcast(sx.select(col("__i").as("i"), col("__sx").as("__si"))), Seq("i"))
      .join(broadcast(sx.select(col("__i").as("j"), col("__sx").as("__sj"))), Seq("j"))
      .crossJoin(broadcast(nRow))
      .select(col("i"), col("j"),
        round((col("__p") - col("__si") * col("__sj") / col("__n")) /
          (col("__n") - 1), 6).as("cov"))
    // mirror the strict upper triangle to the full symmetric matrix
    tri.select(explode(
      when(col("i") === col("j"),
        array(struct(col("i"), col("j"), col("cov"))))
        .otherwise(array(
          struct(col("i"), col("j"), col("cov")),
          struct(col("j").as("i"), col("i").as("j"), col("cov")))))
      .as("c"))
      .select("c.*")
  }

  /** Fit: one moment scan + driver-side Jacobi on the d×d matrix.
    * Deterministic end to end — exact decimal moments, fixed-order
    * rotations, sign convention.
    */
  def fit(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      k: Int,
      scale: Int = 6,
      intDigits: Int = 2): PcaModel = {
    require(k > 0 && k <= dim, "need 0 < k <= dim")
    val rows = momentFrame(df, vecCol, dim, scale, intDigits).collect()
    val byPos = rows.map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    val n = byPos(0).doubleValue()
    require(n > 1, "need at least two vectors to fit")
    val sx = Array.tabulate(dim)(i => byPos(i + 1).doubleValue())
    def triPos(i: Int, j: Int): Int = dim + 1 + i * dim - i * (i - 1) / 2 + (j - i)
    val cov = Array.tabulate(dim, dim) { (a, b) =>
      val (i, j) = if (a <= b) (a, b) else (b, a)
      (byPos(triPos(i, j)).doubleValue() - sx(i) * sx(j) / n) / (n - 1)
    }
    val (evals, evecs) = jacobiEigen(cov)
    val order = evals.indices.sortBy(i => -evals(i)).take(k)
    val comps = order.map { c =>
      val v = Array.tabulate(dim)(i => evecs(i)(c))
      // sign convention: the largest-|coordinate| entry is positive
      val m = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(m) < 0) v.map(x => -x) else v
    }.toArray
    PcaModel(
      Array.tabulate(dim)(i => sx(i) / n),
      comps,
      order.map(evals).toArray)
  }

  /** Project each vector onto the model's components (row-local, one
    * codegen'd dot per component, no shuffle). `whiten = true`
    * divides each coordinate by √eigenvalue (unit-variance output;
    * non-positive eigenvalues yield null coordinates rather than
    * exploding).
    *
    * @return `df` + `outCol` array<double> of length k, 6 dp.
    */
  def project(
      df: DataFrame,
      vecCol: String,
      model: PcaModel,
      outCol: String = "pca",
      whiten: Boolean = false): DataFrame = {
    val centered = graft.functions.VectorFunctions
      .subtractMean(col(vecCol), model.mean.toSeq)
    val coords = model.components.zipWithIndex.map { case (comp, c) =>
      val dot = graft.functions.VectorFunctions
        .dotProduct(centered, typedLit(comp.toSeq))
      val v =
        if (!whiten) dot
        else if (model.eigenvalues(c) > 0) dot / math.sqrt(model.eigenvalues(c))
        else lit(null).cast("double")
      round(v, 6)
    }
    df.withColumn(outCol, array(coords: _*))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * (eigenvalues, eigenvector matrix — column c pairs with value c).
    * Fixed sweep order → deterministic; converges quadratically
    * (off-diagonal norm < 1e-11 or 100 sweeps).
    */
  private[graft] def jacobiEigen(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    var sweep = 0
    while (sweep < 100 && off() > 1e-22) {
      for (p <- 0 until d - 1; q <- p + 1 until d) {
        val apq = a(p)(q)
        if (math.abs(apq) > 1e-300) {
          val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
          val t =
            if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1))
            else -1.0 / (-theta + math.sqrt(theta * theta + 1))
          val c = 1.0 / math.sqrt(t * t + 1)
          val s = t * c
          val app = a(p)(p); val aqq = a(q)(q)
          a(p)(p) = app - t * apq
          a(q)(q) = aqq + t * apq
          a(p)(q) = 0.0; a(q)(p) = 0.0
          var i = 0
          while (i < d) {
            if (i != p && i != q) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq; a(p)(i) = a(i)(p)
              a(i)(q) = c * aiq + s * aip; a(q)(i) = a(i)(q)
            }
            val vip = v(i)(p); val viq = v(i)(q)
            v(i)(p) = c * vip - s * viq
            v(i)(q) = c * viq + s * vip
            i += 1
          }
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
}
