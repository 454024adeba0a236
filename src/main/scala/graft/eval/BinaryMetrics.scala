package graft.eval

import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.mllib.evaluation.BinaryClassificationMetrics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binary-classification evaluation (reference extensions/evaluation.py).
  *
  * The reference adapts DataFrames to mllib's RDD-based
  * BinaryClassificationMetrics through py4j SerDe. Here the curves are
  * DataFrame-NATIVE: one groupBy(score) aggregation, then cumulative
  * tp/fp from a range-partitioned sort with per-partition offset merging
  * (the same distributed cumulative pattern as mllib's internals and the
  * engine's KS/Spearman passes) — no global window, no single-partition
  * stage even when the classifier emits millions of distinct scores. An
  * mllib adapter is kept for AUC parity.
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
    // drop null scores/labels: mllib's metrics require complete pairs, and
    // the cumulative passes read these columns as primitive doubles
    df.select(scoreExpr.as("score"), col(labelCol).cast("double").as("label"))
      .na.drop(Seq("score", "label"))
  }

  /** Per-threshold confusion counts: threshold, tp, fp, fn, tn, plus
    * fpr / recall(tpr) / precision. Thresholds are the distinct scores,
    * descending (mllib semantics: predict positive when score >= t). */
  def curveData(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val spark = df.sparkSession
    val sl = scoreAndLabels(df, scoreCol, labelCol)
    val perScore = sl.groupBy(col("score")).agg(
      sum(col("label")).cast("double").as("pos"),
      (count(lit(1)) - sum(col("label"))).cast("double").as("neg"))
    // distributed cumulative tp/fp over descending score: range sort, then
    // per-partition running sums seeded with the collected partition totals
    val np = spark.sessionState.conf.numShufflePartitions
    val sorted = perScore
      .repartitionByRange(np, col("score").desc)
      .sortWithinPartitions(col("score").desc)
    val rdd = sorted.rdd // one val: both passes reuse the sort shuffle
    val partTotals = rdd.mapPartitionsWithIndex { (pi, it) =>
      var pos = 0.0; var neg = 0.0
      it.foreach { r => pos += r.getDouble(1); neg += r.getDouble(2) }
      Iterator.single((pi, (pos, neg)))
    }.collect().sortBy(_._1).map(_._2)
    val posOff = partTotals.map(_._1).scanLeft(0.0)(_ + _)
    val negOff = partTotals.map(_._2).scanLeft(0.0)(_ + _)
    val (p, n) = (posOff.last, negOff.last)
    val cum = rdd.mapPartitionsWithIndex { (pi, it) =>
      var tp = posOff(pi)
      var fp = negOff(pi)
      it.map { r =>
        tp += r.getDouble(1)
        fp += r.getDouble(2)
        org.apache.spark.sql.Row(r.getDouble(0), tp, fp)
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("threshold",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("tp",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("fp",
        org.apache.spark.sql.types.DoubleType)))
    spark.createDataFrame(cum, schema)
      .select(col("threshold"), col("tp"), col("fp"),
        (lit(p) - col("tp")).as("fn"),
        (lit(n) - col("fp")).as("tn"),
        (col("fp") / lit(n)).as("fpr"),
        (col("tp") / lit(p)).as("recall"),
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
