package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Closed-form linear models over DataFrame columns: multi-feature
  * ridge regression fit in ONE distributed pass. The regression
  * companion of [[graft.pipeline.Classify]]'s logistic tier — use it
  * for quality-score calibration against a continuous target, dosage /
  * mixture-weight fitting, or any "which features explain this metric"
  * question over a full-scale table.
  *
  * The normal equations need only the feature/label moment sums —
  * p(p+3)/2 + 1 scalars for p features — so the fit is ONE hash-free
  * scalar aggregate over the corpus (codegen'd sums, map-side partials,
  * a single final reduce) followed by an O(p³) solve on the driver
  * (p is tens at most; the corpus never moves). Scoring
  * ([[applyLinear]]) is a literal-weight projection — one fused map
  * pass, no join, nothing broadcast but the p+1 literals inside the
  * generated code.
  */
object Regression {

  /** Ridge fit by the centered normal equations:
    *
    *   (G + λI) β = c,   G_ij = Σ (x_i − x̄_i)(x_j − x̄_j),
    *                     c_i  = Σ (x_i − x̄_i)(y − ȳ)
    *   intercept = ȳ − Σ β_i x̄_i
    *
    * — λ penalizes the SLOPES only (the standard convention: the
    * intercept is recovered from the means, never shrunk), and λ = 0
    * degrades to OLS. G and c are assembled from raw power sums
    * (Σx_i, Σx_ix_j, Σx_iy, …) gathered in the single pass; the solve
    * is Gaussian elimination with partial pivoting on the (p+λ)-
    * regularized system. A singular system (collinear features with
    * λ = 0) yields NaN coefficients — pass λ > 0 to keep the system
    * positive-definite. Rows with any null feature/label are dropped.
    *
    * Output: ONE row — (n, intercept, beta_<f1>, …, beta_<fp>). */
  def ridgeFit(df: DataFrame, features: Seq[String], labelCol: String,
               lambda: Double = 0.0): DataFrame = {
    require(features.nonEmpty, "ridgeFit needs at least one feature")
    require(features.distinct.size == features.size,
      s"duplicate feature columns: $features")
    require(lambda >= 0.0, s"lambda must be >= 0, got $lambda")
    val spark = df.sparkSession
    val p = features.length
    val xs = features.map(f => col(f).cast("double"))
    val y = col(labelCol).cast("double")
    val base = df.na.drop(features :+ labelCol)
    // one scalar aggregate: n, Σxi, Σy, Σxixj (i <= j), Σxiy
    val aggs =
      Seq(count(lit(1)).as("n")) ++
        xs.zipWithIndex.map { case (x, i) => sum(x).as(s"sx$i") } ++
        Seq(sum(y).as("sy")) ++
        (for (i <- 0 until p; j <- i until p)
          yield sum(xs(i) * xs(j)).as(s"sxx${i}_$j")) ++
        xs.zipWithIndex.map { case (x, i) => sum(x * y).as(s"sxy$i") }
    val row = base.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("n")
    require(n > 0, "ridgeFit: no complete rows after null drop")
    val nd = n.toDouble
    val sx = Array.tabulate(p)(i => row.getAs[Double](s"sx$i"))
    val sy = row.getAs[Double]("sy")
    val mx = sx.map(_ / nd)
    val my = sy / nd
    // centered Gram and cross-covariance from the raw sums:
    // Σ(xi−mi)(xj−mj) = Σxixj − n·mi·mj
    val g = Array.tabulate(p, p) { (i, j) =>
      val key = if (i <= j) s"sxx${i}_$j" else s"sxx${j}_$i"
      row.getAs[Double](key) - nd * mx(i) * mx(j)
    }
    val c = Array.tabulate(p) { i =>
      row.getAs[Double](s"sxy$i") - nd * mx(i) * my
    }
    for (i <- 0 until p) g(i)(i) += lambda
    val beta = solve(g, c)
    val intercept = my - (0 until p).map(i => beta(i) * mx(i)).sum
    import spark.implicits._
    val out = Seq((n, intercept, beta.toSeq))
      .toDF("n", "intercept", "__b")
    features.zipWithIndex.foldLeft(out) { case (d, (f, i)) =>
      d.withColumn(s"beta_$f", col("__b").getItem(i))
    }.drop("__b")
  }

  /** In-place Gaussian elimination with partial pivoting; returns NaN
    * coefficients when a pivot vanishes (singular system). */
  private def solve(a: Array[Array[Double]],
                    b: Array[Double]): Array[Double] = {
    val p = b.length
    val m = Array.tabulate(p)(i => a(i) :+ b(i))
    for (k <- 0 until p) {
      var piv = k
      for (i <- k + 1 until p)
        if (math.abs(m(i)(k)) > math.abs(m(piv)(k))) piv = i
      val t = m(k); m(k) = m(piv); m(piv) = t
      if (m(k)(k) == 0.0) return Array.fill(p)(Double.NaN)
      for (i <- k + 1 until p) {
        val f = m(i)(k) / m(k)(k)
        for (j <- k to p) m(i)(j) -= f * m(k)(j)
      }
    }
    val x = new Array[Double](p)
    for (k <- p - 1 to 0 by -1) {
      var s = m(k)(p)
      for (j <- k + 1 until p) s -= m(k)(j) * x(j)
      x(k) = s / m(k)(k)
    }
    x
  }

  /** Literal-weight linear scoring: adds `outCol` =
    * intercept + Σ coefs_i · features_i as a codegen'd projection.
    * Pair with [[ridgeFit]]'s one-row output collected driver-side. */
  def applyLinear(df: DataFrame, features: Seq[String],
                  coefs: Seq[Double], intercept: Double,
                  outCol: String = "prediction"): DataFrame = {
    require(features.length == coefs.length,
      s"${features.length} features but ${coefs.length} coefficients")
    val terms = features.zip(coefs).map { case (f, w) =>
      col(f).cast("double") * lit(w)
    }
    df.withColumn(outCol, terms.foldLeft(lit(intercept): org.apache.spark.sql.Column)(_ + _))
  }
}
