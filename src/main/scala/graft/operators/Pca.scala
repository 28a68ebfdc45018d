package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA over embedding columns — the whitening/decorrelation step in
  * front of SemDeDup-style clustering and the dimensionality lever
  * when matryoshka prefixes aren't available (embeddings not
  * MRL-trained).
  *
  * Scale design: the ONLY corpus pass computes the exact second
  * moments (n, Σx, Σxxᵀ) in one explode-aggregate — elements are
  * cast ONCE to `DECIMAL(18,scale)`, so every accumulator is an
  * EXACT decimal sum: order-independent, partition-deterministic,
  * and replayable in another engine (the same device as the
  * entropy/NB-score sums). The generated (d²+d+1)-element rows are
  * pipelined into a partial hash aggregate, so the shuffle carries
  * ≤ partitions·(d²+d+1) rows regardless of corpus size, and only
  * that bounded moment set reaches the driver. The d×d
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
    * positions d+1..d+d² = Σxᵢxⱼ (row-major), every sum an exact
    * decimal. Null vectors are skipped; elements are assumed dense
    * (embedding contract).
    */
  private[graft] def momentFrame(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      scale: Int): DataFrame = {
    val prodType = s"decimal(37,${2 * scale})"
    val dec = transform(col(vecCol), x => x.cast(s"decimal(18,$scale)"))
    val withOne = concat(
      array(lit(1).cast(prodType)),
      transform(dec, x => x.cast(prodType)),
      flatten(transform(dec, xi => transform(dec, xj => xi * xj))))
    df.where(col(vecCol).isNotNull)
      .select(posexplode(withOne).as(Seq("__pos", "__v")))
      .groupBy(col("__pos"))
      .agg(sum(col("__v")).as("__s"))
  }

  /** Sample covariance matrix of the embedding column, computed from
    * the exact-decimal moments: `cov(i,j) = (Σxᵢxⱼ − Σxᵢ·Σxⱼ/n)/(n−1)`
    * (that exact association order, replicated in the oracle), 6 dp.
    * One corpus scan; the reshape joins run on the bounded
    * (d²+d+1)-row moment frame.
    *
    * @return d² rows (i, j, cov).
    */
  def covarianceMatrix(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      scale: Int = 9): DataFrame = {
    require(dim > 0, "dim must be positive")
    val m = momentFrame(df, vecCol, dim, scale).localCheckpoint()
    val nRow = m.where(col("__pos") === 0)
      .select(col("__s").cast("double").as("__n"))
    val sx = m.where(col("__pos").between(1, dim))
      .select((col("__pos") - 1).cast("int").as("__i"),
        col("__s").cast("double").as("__sx"))
    m.where(col("__pos") > dim)
      .select(
        floor((col("__pos") - dim - 1) / dim).cast("int").as("i"),
        pmod(col("__pos") - dim - 1, lit(dim)).cast("int").as("j"),
        col("__s").cast("double").as("__p"))
      .join(broadcast(sx.select(col("__i").as("i"), col("__sx").as("__si"))), Seq("i"))
      .join(broadcast(sx.select(col("__i").as("j"), col("__sx").as("__sj"))), Seq("j"))
      .crossJoin(broadcast(nRow))
      .select(col("i"), col("j"),
        round((col("__p") - col("__si") * col("__sj") / col("__n")) /
          (col("__n") - 1), 6).as("cov"))
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
      scale: Int = 9): PcaModel = {
    require(k > 0 && k <= dim, "need 0 < k <= dim")
    val rows = momentFrame(df, vecCol, dim, scale).collect()
    val byPos = rows.map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    val n = byPos(0).doubleValue()
    require(n > 1, "need at least two vectors to fit")
    val sx = Array.tabulate(dim)(i => byPos(i + 1).doubleValue())
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      (byPos(dim + 1 + i * dim + j).doubleValue() - sx(i) * sx(j) / n) / (n - 1)
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
