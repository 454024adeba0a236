package graft.eval

import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.mllib.evaluation.BinaryClassificationMetrics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary-classification evaluation (reference extensions/evaluation.py).
  *
  * The reference adapts DataFrames to mllib's RDD-based
  * BinaryClassificationMetrics through py4j SerDe. Here the curves are
  * DataFrame-NATIVE: one groupBy(score) aggregation + a cumulative window
  * over distinct scores — the same two-phase shape mllib uses internally,
  * but staying in Tungsten rows with codegen. The window is global but runs
  * over #distinct-scores rows (already aggregated), which is the inherent
  * size of the curve itself. An mllib adapter is kept for AUC parity.
  */
object BinaryMetrics {

  /** Normalize a probability-vector or double score column to a double
    * score (reference to_metrics_RDD, sql/dataframe.py:491-493: takes
    * P(class=1) from the vector). */
  def scoreAndLabels(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val scoreExpr = df.schema(scoreCol).dataType.typeName match {
      case "vector" => vector_to_array(col(scoreCol)).getItem(1)
      case _        => col(scoreCol).cast("double")
    }
    df.select(scoreExpr.as("score"), col(labelCol).cast("double").as("label"))
  }

  /** Per-threshold confusion counts: threshold, tp, fp, fn, tn, plus
    * fpr / recall(tpr) / precision. Thresholds are the distinct scores,
    * descending (mllib semantics: predict positive when score >= t). */
  def curveData(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val sl = scoreAndLabels(df, scoreCol, labelCol)
    val perScore = sl.groupBy(col("score")).agg(
      sum(col("label")).as("pos"),
      (count(lit(1)) - sum(col("label"))).as("neg"))
    val w = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    perScore
      .withColumn("tp", sum("pos").over(w))
      .withColumn("fp", sum("neg").over(w))
      .withColumn("p", sum("pos").over(wAll))
      .withColumn("n", sum("neg").over(wAll))
      .select(col("score").as("threshold"),
        col("tp"), col("fp"),
        (col("p") - col("tp")).as("fn"),
        (col("n") - col("fp")).as("tn"),
        (col("fp") / col("n")).as("fpr"),
        (col("tp") / col("p")).as("recall"),
        (col("tp") / (col("tp") + col("fp"))).as("precision"))
  }

  /** ROC points (fpr, tpr) ordered by threshold desc, with the (0,0) and
    * (1,1) terminals mllib emits. */
  def roc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val curve = curveData(df, scoreCol, labelCol)
      .select(col("fpr"), col("recall").as("tpr"))
    Seq((0.0, 0.0)).toDF("fpr", "tpr")
      .unionAll(curve)
      .unionAll(Seq((1.0, 1.0)).toDF("fpr", "tpr"))
  }

  /** PR points (recall, precision). */
  def pr(df: DataFrame, scoreCol: String, labelCol: String): DataFrame =
    curveData(df, scoreCol, labelCol).select(col("recall"), col("precision"))

  /** threshold → fpr/recall/precision frame + terminal row (0,1,1,0)
    * (reference getMetricsByThreshold, extensions/evaluation.py:60-75). */
  def metricsByThreshold(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    curveData(df, scoreCol, labelCol)
      .select(col("threshold"), col("fpr"), col("recall"), col("precision"))
      .unionAll(Seq((0.0, 1.0, 1.0, 0.0))
        .toDF("threshold", "fpr", "recall", "precision"))
  }

  /** Confusion matrix at a threshold — ONE aggregation pass
    * (reference binarizes + MulticlassMetrics, extensions/evaluation.py:77-95). */
  def confusionMatrix(df: DataFrame, scoreCol: String, labelCol: String,
                      threshold: Double): DataFrame = {
    val sl = scoreAndLabels(df, scoreCol, labelCol)
    val pred = (col("score") >= lit(threshold)).cast("int")
    val lbl = col("label").cast("int")
    sl.agg(
      sum(((pred === 0) && (lbl === 0)).cast("long")).as("tn"),
      sum(((pred === 1) && (lbl === 0)).cast("long")).as("fp"),
      sum(((pred === 0) && (lbl === 1)).cast("long")).as("fn"),
      sum(((pred === 1) && (lbl === 1)).cast("long")).as("tp"))
  }

  /** mllib adapter for AUC metrics (areaUnderROC/areaUnderPR). */
  def mllibMetrics(df: DataFrame, scoreCol: String, labelCol: String,
                   numBins: Int = 0): BinaryClassificationMetrics = {
    val rdd = scoreAndLabels(df, scoreCol, labelCol)
      .rdd.map(r => (r.getDouble(0), r.getDouble(1)))
    new BinaryClassificationMetrics(rdd, numBins)
  }
}
