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

  /** Learn moments + inverse correlation matrix in one pass. */
  def fit(df: DataFrame, cols: Seq[String]): Model = {
    val k = cols.length
    val clean = df.na.drop(cols)
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
