package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column (extension tier — no reference
  * analog). The decomposition that feeds the rest of the embedding tier:
  * decorrelate/compact vectors before PQ subspace splitting (an OPQ-lite
  * rotation — product quantizers assume subspaces carry comparable,
  * independent energy), shrink dim before IVF/kNN, and surface explained
  * variance as a corpus diagnostic.
  *
  * Scale shape: ONE mapPartitions pass folds each partition into a single
  * (n, d sums, d(d+1)/2 upper-triangular product sums) partial,
  * tree-reduced to the driver — no shuffle of the data, no per-row
  * aggregation state; cost is a scan plus O(d²) per row. The d×d
  * eigensolve runs on the DRIVER (cyclic Jacobi) — d is embedding width
  * (64-4096), so the driver work is microseconds-to-seconds and never a
  * scale concern; the corpus never moves. Projection is a lazy broadcast
  * map pass: k·d multiply-adds per row.
  *
  * Determinism: fixed partitioning ⇒ fixed double-sum order; eigenpairs
  * sorted by (eigenvalue desc, then the Jacobi output order), and each
  * eigenvector's sign is normalized so its largest-magnitude entry
  * (lowest index on ties) is positive — the model is reproducible and
  * the covariance is DuckDB-replayable (q_pca_cov; the eigensolve is
  * contract-checked via trace preservation, q_pca_check).
  */
object Pca {

  /** PCA model: `components(c)` is the c-th principal axis (unit norm,
    * length d), `eigenvalues` the matching sample variances (desc),
    * `totalVariance` the covariance trace (= sum of ALL d eigenvalues,
    * not just the k kept). */
  final case class PcaModel(mean: Array[Double],
                            components: Array[Array[Double]],
                            eigenvalues: Array[Double],
                            totalVariance: Double) {
    def k: Int = components.length
    def dim: Int = mean.length
    def explainedVarianceRatio: Array[Double] =
      eigenvalues.map(_ / totalVariance)
  }

  /** Sufficient statistics in one scan: (n, per-dim sums, upper-triangular
    * raw product sums). Sample covariance derives as
    * cov(i,j) = (Sxy − n·μi·μj) / (n − 1). */
  private def moments(df: DataFrame, idCol: String, vecCol: String)
      : (Long, Array[Double], Array[Double]) = {
    val spark = df.sparkSession
    import spark.implicits._
    Similarity.requireIntegralId(df, idCol, "Pca")
    val vecs = df.na.drop(Seq(idCol, vecCol))
      .select(col(idCol).cast("long"),
        org.apache.spark.sql.functions.transform(col(vecCol),
          x => x.cast("double")))
      .as[(Long, Array[Double])]
    // treeAggregate with a null-array zero: empty partitions contribute
    // nothing and an all-empty input surfaces as n = 0, not an empty-
    // collection reduce error
    val zero: (Long, Array[Double], Array[Double]) = (0L, null, null)
    def merge(a: (Long, Array[Double], Array[Double]),
              b: (Long, Array[Double], Array[Double]))
        : (Long, Array[Double], Array[Double]) =
      if (a._1 == 0L) b
      else if (b._1 == 0L) a
      else {
        require(a._2.length == b._2.length,
          s"Pca: ragged embedding widths (${a._2.length} vs ${b._2.length})")
        var i = 0
        while (i < a._2.length) { a._2(i) += b._2(i); i += 1 }
        i = 0
        while (i < a._3.length) { a._3(i) += b._3(i); i += 1 }
        (a._1 + b._1, a._2, a._3)
      }
    val (n, s, p) = vecs.rdd.treeAggregate(zero)(
      seqOp = (acc, row) => {
        val v = row._2
        val (n0, s0, p0) =
          if (acc._1 == 0L)
            (0L, new Array[Double](v.length),
              new Array[Double](v.length * (v.length + 1) / 2))
          else acc
        require(v.length == s0.length,
          s"Pca: ragged embedding widths (${s0.length} vs ${v.length})")
        var i = 0
        var t = 0
        while (i < v.length) {
          s0(i) += v(i)
          var j = i
          while (j < v.length) { p0(t) += v(i) * v(j); j += 1; t += 1 }
          i += 1
        }
        (n0 + 1L, s0, p0)
      },
      combOp = merge)
    require(n >= 2, s"Pca needs at least 2 rows, got $n")
    (n, s, p)
  }

  /** Dense symmetric sample covariance (d×d, row-major) + mean. */
  private[pipeline] def covMatrix(df: DataFrame, idCol: String,
                                  vecCol: String)
      : (Long, Array[Double], Array[Array[Double]]) = {
    val (n, s, p) = moments(df, idCol, vecCol)
    val d = s.length
    val mean = s.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = (p(t) - n * mean(i) * mean(j)) / (n - 1)
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    (n, mean, cov)
  }

  /** Upper-triangular covariance as a frame (i, j, cov) — the
    * oracle-facing view (DuckDB replays each cell with covar_samp). */
  def covFrame(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (_, _, cov) = covMatrix(df, idCol, vecCol)
    val rows = for {
      i <- 0 until cov.length
      j <- i until cov.length
    } yield (i, j, cov(i)(j))
    spark.createDataset(rows).toDF("i", "j", "cov")
  }

  /** Rounding-free oracle view of the covariance: quantize each element
    * to the exact integer q = floor(v · 2^scaleBits) (a power-of-two
    * scale of a float widened to double is EXACT — no rounding happens
    * before the floor, so any engine computes the identical q), fold the
    * co-moment sums n, Σqᵢ, Σqⱼ, Σqᵢqⱼ as overflow-checked longs (exact,
    * summation-order-independent — the property double sums lack), and
    * derive each cell through one fixed IEEE chain
    *
    *   cov = (Sxy − Sx·Sy/n) / (n−1) / 4^scaleBits
    *
    * that an external engine replays bit-for-bit from the same longs.
    * Emits (i, j, n, sx, sy, sxy, cov) — every column either an exact
    * long or a double derived from exact longs by that chain, so the
    * frame compares UNROUNDED across engines (no round(…,6) half-even vs
    * half-up boundary flips; see the q_robust_mean lesson in NOTES).
    *
    * This is the GATE/diagnostic tier: it pins [[covFrame]]'s double
    * arithmetic (CovExactSpec requires agreement to 1e-6, the
    * quantization step) while being engine-portable. Scale shape is the
    * same single treeAggregate as [[covMatrix]] — no data shuffle.
    * Overflow contract: n · 4^scaleBits must fit a long (checked
    * arithmetic throws rather than wrapping — lower scaleBits for
    * corpora beyond ~2^(62−2·scaleBits) rows or |v| ≥ 1). */
  def covFrameExact(df: DataFrame, idCol: String, vecCol: String,
                    scaleBits: Int = 20): DataFrame = {
    require(scaleBits >= 1 && scaleBits <= 26,
      s"Pca.covFrameExact: scaleBits must be in [1, 26], got $scaleBits")
    val spark = df.sparkSession
    import spark.implicits._
    Similarity.requireIntegralId(df, idCol, "Pca.covFrameExact")
    val scale = math.pow(2.0, scaleBits)
    val qvecs = df.na.drop(Seq(idCol, vecCol))
      .select(org.apache.spark.sql.functions.transform(col(vecCol),
        x => floor(x.cast("double") * lit(scale))).as("q"))
      .as[Array[Long]]
    // (n, Σq per dim, Σ qᵢqⱼ upper-tri) — all checked-long exact
    val zero: (Long, Array[Long], Array[Long]) = (0L, null, null)
    def merge(a: (Long, Array[Long], Array[Long]),
              b: (Long, Array[Long], Array[Long]))
        : (Long, Array[Long], Array[Long]) =
      if (a._1 == 0L) b
      else if (b._1 == 0L) a
      else {
        require(a._2.length == b._2.length,
          s"Pca.covFrameExact: ragged widths (${a._2.length} vs ${b._2.length})")
        var i = 0
        while (i < a._2.length) { a._2(i) = Math.addExact(a._2(i), b._2(i)); i += 1 }
        i = 0
        while (i < a._3.length) { a._3(i) = Math.addExact(a._3(i), b._3(i)); i += 1 }
        (a._1 + b._1, a._2, a._3)
      }
    val (n, s, p) = qvecs.rdd.treeAggregate(zero)(
      seqOp = (acc, q) => {
        val (n0, s0, p0) =
          if (acc._1 == 0L)
            (0L, new Array[Long](q.length),
              new Array[Long](q.length * (q.length + 1) / 2))
          else acc
        require(q.length == s0.length,
          s"Pca.covFrameExact: ragged widths (${s0.length} vs ${q.length})")
        var i = 0
        var t = 0
        while (i < q.length) {
          s0(i) = Math.addExact(s0(i), q(i))
          var j = i
          while (j < q.length) {
            p0(t) = Math.addExact(p0(t), Math.multiplyExact(q(i), q(j)))
            j += 1; t += 1
          }
          i += 1
        }
        (n0 + 1L, s0, p0)
      },
      combOp = merge)
    require(n >= 2, s"Pca.covFrameExact needs at least 2 rows, got $n")
    val d = s.length
    val unscale = scale * scale // 4^scaleBits, exact power of two
    val rows = new scala.collection.mutable.ArrayBuffer[(Int, Int, Long, Long, Long, Long, Double)]
    var i = 0
    var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val sxy = p(t)
        // the fixed chain DuckDB mirrors term-for-term (all casts explicit)
        val cov = (sxy.toDouble - s(i).toDouble * s(j).toDouble / n.toDouble) /
          (n - 1).toDouble / unscale
        rows += ((i, j, n, s(i), s(j), sxy, cov))
        j += 1; t += 1
      }
      i += 1
    }
    spark.createDataset(rows.toSeq)
      .toDF("i", "j", "n", "sx", "sy", "sxy", "cov")
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix. Returns
    * (eigenvalues, eigenvectors as rows), sorted by eigenvalue desc with
    * sign normalized (largest-|entry|, lowest index on ties, positive).
    * Deterministic: fixed sweep order, fixed convergence threshold. */
  private[pipeline] def jacobiEigen(m: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    val maxSweeps = 64
    // convergence is relative to the matrix scale, not absolute — a
    // covariance in units of 1e-8 would otherwise stop after sweep one
    var scale = 0.0
    var si = 0
    while (si < d) {
      var sj = 0
      while (sj < d) { scale = math.max(scale, math.abs(a(si)(sj))); sj += 1 }
      si += 1
    }
    val eps = 1e-14 * math.max(1e-300, scale)
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > eps) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            off = math.max(off, math.abs(apq))
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s   => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // columns of v are eigenvectors; sort desc by eigenvalue, normalize sign
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val eig = order.map(i => a(i)(i)).toArray
    val vecs = order.map { ci =>
      val w = Array.tabulate(d)(r => v(r)(ci))
      var best = 0
      var i = 1
      while (i < d) { if (math.abs(w(i)) > math.abs(w(best))) best = i; i += 1 }
      if (w(best) < 0) { i = 0; while (i < d) { w(i) = -w(i); i += 1 } }
      w
    }.toArray
    (eig, vecs)
  }

  /** Fit the top-`k` principal components (k = 0 ⇒ keep all d). */
  def fit(df: DataFrame, idCol: String, vecCol: String,
          k: Int = 0): PcaModel =
      graft.util.Errors.context("Pca.fit", Seq(idCol, vecCol)) {
    val (_, mean, cov) = covMatrix(df, idCol, vecCol)
    val d = mean.length
    require(k >= 0 && k <= d, s"Pca.fit: k must be in [0, $d], got $k")
    val keep = if (k == 0) d else k
    val (eig, vecs) = jacobiEigen(cov)
    var trace = 0.0
    var i = 0
    while (i < d) { trace += cov(i)(i); i += 1 }
    PcaModel(mean, vecs.take(keep), eig.take(keep), trace)
  }

  /** Project onto the model's components: (idCol, projection) with
    * projection(c) = components(c) · (x − mean); `whiten` divides each
    * coordinate by sqrt(eigenvalue) (unit variance per component —
    * components with eigenvalue < 1e-12 pass through unscaled rather
    * than exploding). Lazy broadcast map — no shuffle. */
  def transform(df: DataFrame, idCol: String, vecCol: String,
                model: PcaModel, whiten: Boolean = false): DataFrame =
      graft.util.Errors.context("Pca.transform", Seq(idCol, vecCol)) {
    val spark = df.sparkSession
    import spark.implicits._
    Similarity.requireIntegralId(df, idCol, "Pca.transform")
    val bc = spark.sparkContext.broadcast(model)
    val doWhiten = whiten
    df.na.drop(Seq(idCol, vecCol))
      .select(col(idCol).cast("long"),
        org.apache.spark.sql.functions.transform(col(vecCol),
          x => x.cast("double")))
      .as[(Long, Array[Double])]
      .map { case (id, x) =>
        val m = bc.value
        require(x.length == m.dim,
          s"Pca.transform: vector width ${x.length} != model dim ${m.dim}")
        val out = new Array[Double](m.k)
        var c = 0
        while (c < m.k) {
          val w = m.components(c)
          var acc = 0.0
          var i = 0
          while (i < x.length) { acc += w(i) * (x(i) - m.mean(i)); i += 1 }
          if (doWhiten && m.eigenvalues(c) > 1e-12)
            acc /= math.sqrt(m.eigenvalues(c))
          out(c) = acc
          c += 1
        }
        (id, out)
      }
      .toDF(idCol, "projection")
  }

  /** Fit + project in one call. */
  def fitTransform(df: DataFrame, idCol: String, vecCol: String,
                   k: Int = 0, whiten: Boolean = false): DataFrame =
    transform(df, idCol, vecCol, fit(df, idCol, vecCol, k), whiten)

  /** Sign of JL cell (seed, j, i): +1 iff the first hex digit of
    * md5("seed:j:i") is 0-7 — md5-based SPECIFICALLY so an external
    * engine replays the projection bit-for-bit (DuckDB:
    * `substr(md5(seed || ':' || j || ':' || i), 1, 1) BETWEEN '0' AND
    * '7'`), the same replayability contract as [[graft.agg.CountMin]]. */
  private[pipeline] def jlSign(seed: Int, j: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest((seed.toString + ":" + j + ":" + i)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (((d(0) & 0xf0) >>> 4) < 8) 1.0 else -1.0
  }

  /** Johnson–Lindenstrauss random sign projection: out(j) =
    * (1/√outDim)·Σᵢ s(j,i)·x(i) with s ∈ {±1} derived deterministically
    * from md5(seed:j:i) (Achlioptas 2003's database-friendly ±1 variant).
    * The data-independent sibling of [[transform]]: no fit pass, no
    * driver model — the sign matrix is rebuilt per partition from the
    * seed (outDim·d md5 calls per task, microseconds), so projecting a
    * 100-TB corpus is ONE stateless map pass with nothing broadcast.
    * Distance preservation follows the JL bound in outDim alone; use it
    * to cut d before k-means/kNN when PCA's fit scan isn't worth it. */
  def jlProject(df: DataFrame, idCol: String, vecCol: String,
                outDim: Int, seed: Int = 7): DataFrame =
      graft.util.Errors.context("Pca.jlProject", Seq(idCol, vecCol)) {
    require(outDim >= 1, s"Pca.jlProject: outDim must be >= 1, got $outDim")
    val spark = df.sparkSession
    import spark.implicits._
    Similarity.requireIntegralId(df, idCol, "Pca.jlProject")
    val k = outDim
    val sd = seed
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    df.na.drop(Seq(idCol, vecCol))
      .select(col(idCol).cast("long"),
        org.apache.spark.sql.functions.transform(col(vecCol),
          x => x.cast("double")))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        var signs: Array[Array[Double]] = null
        it.map { case (id, x) =>
          if (signs == null)
            signs = Array.tabulate(k, x.length)((j, i) => jlSign(sd, j, i))
          require(x.length == signs(0).length,
            s"Pca.jlProject: vector width ${x.length} != ${signs(0).length}")
          val out = new Array[Double](k)
          var j = 0
          while (j < k) {
            val row = signs(j)
            var acc = 0.0
            var i = 0
            while (i < x.length) { acc += row(i) * x(i); i += 1 }
            out(j) = acc * scale
            j += 1
          }
          (id, out)
        }
      }
      .toDF(idCol, "projection")
  }

  /** Eigensolve integrity contract, DuckDB-replayable: the eigenvalue sum
    * must reproduce the covariance trace (rotation invariant — drifts iff
    * the Jacobi solve lost mass), eigenvalues must be sorted desc, and the
    * kept components must be orthonormal to 1e-9. The oracle recomputes
    * the trace from per-dim var_samp and expects the flags true. */
  def fitCheck(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val model = fit(df, idCol, vecCol)
    val eigSum = model.eigenvalues.sum
    val monotone = model.eigenvalues.sliding(2)
      .forall(w => w.length < 2 || w(0) >= w(1) - 1e-9)
    var orthoErr = 0.0
    var a = 0
    while (a < model.k) {
      var b = a
      while (b < model.k) {
        var dot = 0.0
        var i = 0
        while (i < model.dim) { dot += model.components(a)(i) * model.components(b)(i); i += 1 }
        val want = if (a == b) 1.0 else 0.0
        orthoErr = math.max(orthoErr, math.abs(dot - want))
        b += 1
      }
      a += 1
    }
    spark.createDataset(Seq((model.dim, model.totalVariance, eigSum,
        monotone, orthoErr <= 1e-9)))
      .toDF("dim", "trace_cov", "eig_sum", "monotone", "orthonormal")
  }
}
