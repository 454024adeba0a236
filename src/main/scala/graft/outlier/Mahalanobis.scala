package graft.outlier

import org.apache.commons.math3.distribution.ChiSquaredDistribution
import org.apache.commons.math3.linear.{Array2DRowRealMatrix, LUDecomposition}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mahalanobis distance + chi²-threshold outlier detection (reference
  * handyspark/sql/dataframe.py:353-400).
  *
  * Spark-first design: the reference runs VectorAssembler → StandardScaler →
  * ml.stat.Correlation (RDD round-trips) → scipy inv → pandas UDF. Here the
  * standardization moments and the full correlation matrix come from ONE
  * hash-aggregate pass (k means + k stddevs + k(k−1)/2 pairwise corrs — all
  * codegen'd), the k×k inverse is computed on the driver (commons-math3 LU,
  * k is tiny), and the distance is a pure arithmetic Column expression —
  * sum over Σ⁻¹ᵢⱼ·uᵢ·uⱼ with the inverse folded in as literals. No UDF, no
  * vector materialization, whole-stage codegen end-to-end; at 100 TB this
  * is one aggregation plus one map-side projection.
  */
object Mahalanobis {

  final case class Model(cols: Seq[String], means: Array[Double],
                         stds: Array[Double], invCorr: Array[Array[Double]]) {
    /** distance as a Column over the model's columns */
    def distance: Column = {
      val k = cols.length
      val u = cols.indices.map(i =>
        (col(cols(i)) - lit(means(i))) / lit(stds(i)))
      val terms = for { i <- 0 until k; j <- 0 until k } yield
        u(i) * u(j) * lit(invCorr(i)(j))
      sqrt(terms.reduce(_ + _))
    }
  }

  /** Learn moments + inverse correlation matrix. Below `wideThreshold`
    * columns this is ONE codegen'd hash-aggregate (k means + k stddevs +
    * k(k−1)/2 `corr`s); beyond it the k² aggregate-expression fan-out
    * stops being codegen-friendly (janino method-size limits, very wide
    * agg buffers), so the fit switches to a two-pass typed path — means
    * first, then one mapPartitions pass accumulating centered squares and
    * upper-triangle cross products per partition, treeReduce'd. Two scans
    * either way at most; both paths produce the same Model. */
  def fit(df: DataFrame, cols: Seq[String], wideThreshold: Int = 20): Model = {
    val k = cols.length
    val clean = df.na.drop(cols)
    if (k > wideThreshold) return fitWide(clean, cols)
    val aggs =
      cols.map(c => avg(col(c)).as(s"m_$c")) ++
      cols.map(c => stddev_samp(col(c)).as(s"s_$c")) ++
      (for { i <- 0 until k; j <- 0 until k if i < j } yield
        corr(col(cols(i)), col(cols(j))).as(s"r_${i}_$j"))
    val row = clean.agg(aggs.head, aggs.tail: _*).head()
    val means = cols.map(c => row.getAs[Double](s"m_$c")).toArray
    val stds = cols.map(c => row.getAs[Double](s"s_$c")).toArray
    val corrM = Array.tabulate(k, k) { (i, j) =>
      if (i == j) 1.0
      else if (i < j) row.getAs[Double](s"r_${i}_$j")
      else row.getAs[Double](s"r_${j}_$i")
    }
    val inv = new LUDecomposition(new Array2DRowRealMatrix(corrM))
      .getSolver.getInverse
    Model(cols, means, stds, inv.getData)
  }

  /** The wide-column fit: centered accumulation (means from pass 1) so
    * the cross products don't cancel catastrophically, upper-triangle
    * flattened into one primitive array per partition. */
  private def fitWide(clean: DataFrame, cols: Seq[String]): Model = {
    val k = cols.length
    val meanAggs = cols.map(c => avg(col(c)).as(c))
    val meanRow = clean.agg(meanAggs.head, meanAggs.tail: _*).head()
    val means = Array.tabulate(k)(meanRow.getDouble)
    val rdd = clean.select(cols.map(c => col(c).cast("double")): _*).rdd
    val zero = (0L, new Array[Double](k * (k + 1) / 2))
    val (n, tri) = rdd.mapPartitions { rows =>
      val acc = new Array[Double](k * (k + 1) / 2)
      var cnt = 0L
      val u = new Array[Double](k)
      rows.foreach { r =>
        var i = 0
        while (i < k) { u(i) = r.getDouble(i) - means(i); i += 1 }
        var idx = 0
        i = 0
        while (i < k) {
          var j = i
          while (j < k) { acc(idx) += u(i) * u(j); idx += 1; j += 1 }
          i += 1
        }
        cnt += 1L
      }
      Iterator.single((cnt, acc))
    }.fold(zero) { (a, b) =>
      var i = 0
      while (i < a._2.length) { a._2(i) += b._2(i); i += 1 }
      (a._1 + b._1, a._2)
    }
    require(n > 1, s"Mahalanobis fit needs > 1 complete rows, got $n")
    def triIdx(i: Int, j: Int): Int = { // i <= j
      i * k - i * (i - 1) / 2 + (j - i)
    }
    val stds = Array.tabulate(k)(i => math.sqrt(tri(triIdx(i, i)) / (n - 1)))
    val corrM = Array.tabulate(k, k) { (i, j) =>
      if (i == j) 1.0
      else {
        val (lo, hi) = if (i < j) (i, j) else (j, i)
        tri(triIdx(lo, hi)) /
          math.sqrt(tri(triIdx(lo, lo)) * tri(triIdx(hi, hi)))
      }
    }
    val inv = new LUDecomposition(new Array2DRowRealMatrix(corrM))
      .getSolver.getInverse
    Model(cols, means, stds, inv.getData)
  }

  /** chi² critical value at confidence `cv` with k degrees of freedom
    * (reference dataframe.py:390-400). */
  def chi2Threshold(k: Int, cv: Double = 0.999): Double =
    math.sqrt(new ChiSquaredDistribution(k).inverseCumulativeProbability(cv))

  /** df + `__mahalanobis` + `__outlier` columns. */
  def addDistance(df: DataFrame, cols: Seq[String],
                  cv: Double = 0.999): DataFrame = {
    val model = fit(df, cols)
    val thr = chi2Threshold(cols.length, cv)
    df.withColumn("__mahalanobis", model.distance)
      .withColumn("__outlier", col("__mahalanobis") > lit(thr))
  }

  /** Outlier rows ordered by distance desc (reference dataframe.py:578-585). */
  def getOutliers(df: DataFrame, cols: Seq[String], cv: Double = 0.999): DataFrame =
    addDistance(df, cols, cv).filter(col("__outlier"))
      .orderBy(desc("__mahalanobis"))

  def removeOutliers(df: DataFrame, cols: Seq[String], cv: Double = 0.999): DataFrame =
    addDistance(df, cols, cv).filter(!col("__outlier"))
      .drop("__mahalanobis", "__outlier")
}
