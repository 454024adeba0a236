package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multiclass classification metrics (extension tier — the reference's
  * evaluation surface is binary-only via mllib's
  * BinaryClassificationMetrics). The language-ID / source-routing /
  * topic-bucket side of the evaluation story: per-class precision,
  * recall and F1, plus the accuracy/macro/weighted summary.
  *
  * Scale shape: ONE groupBy(label, pred) aggregation folds the corpus
  * to a confusion frame bounded by #classes² rows; every metric derives
  * from grouped aggregates over that tiny frame — nothing else touches
  * the corpus, so cost is a single shuffle regardless of corpus size.
  */
object Multiclass {

  /** Confusion counts: (label, pred, n), one corpus pass. Null rows are
    * dropped AFTER the fold (they group into null cells, filtered on the
    * classes²-bounded result): a pre-aggregation na.drop would evaluate
    * the prediction expression twice — once in the filter, once as the
    * group key — which doubles the corpus cost when the prediction is a
    * computed column (measured on the language-ID row). */
  def confusion(df: DataFrame, predCol: String, labelCol: String): DataFrame =
    df.groupBy(col(labelCol).cast("string").as("label"),
        col(predCol).cast("string").as("pred"))
      .agg(count(lit(1)).as("n"))
      .filter(col("label").isNotNull && col("pred").isNotNull)

  /** Per-class metrics over the union of observed labels and predictions:
    * (cls, support, predicted, tp, precision, recall, f1). Precision of a
    * never-predicted class and recall of a never-seen class are NaN
    * (0/0 — not a fake 0); f1 is 0.0 when precision + recall is 0 and
    * NaN when either side is NaN.
    *
    * The confusion fold is collected and the per-class arithmetic runs
    * on the DRIVER: deriving support/predicted/tp as three Spark
    * branches would recompute the (possibly expensive) prediction
    * lineage three times — measured 3.6× on the language-ID evaluation
    * row. The collect is bounded by OBSERVED (label, pred) pairs;
    * `maxCells` guards against mistakenly passing a high-cardinality
    * column as the label. */
  def perClass(df: DataFrame, predCol: String, labelCol: String,
               maxCells: Int = 1 << 20): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cells = confusion(df, predCol, labelCol)
      .as[(String, String, Long)].limit(maxCells + 1).collect()
    require(cells.length <= maxCells,
      s"Multiclass.perClass: more than $maxCells distinct (label, pred) " +
        "cells — is one of the columns a free-text/id column?")
    val support = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    val predicted = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum)
    val tp = cells.filter(c => c._1 == c._2).map(c => c._1 -> c._3).toMap
    val classes = (support.keys ++ predicted.keys).toSeq.distinct.sorted
    classes.map { cls =>
      val sup = support.getOrElse(cls, 0L)
      val prd = predicted.getOrElse(cls, 0L)
      val t = tp.getOrElse(cls, 0L)
      val prec = if (prd > 0) t.toDouble / prd else Double.NaN
      val rec = if (sup > 0) t.toDouble / sup else Double.NaN
      val f1 =
        if (prec.isNaN || rec.isNaN) Double.NaN
        else if (prec + rec == 0.0) 0.0
        else 2.0 * prec * rec / (prec + rec)
      (cls, sup, prd, t, prec, rec, f1)
    }.toDF("cls", "support", "predicted", "tp", "precision", "recall", "f1")
  }

  /** One-row summary: (n, accuracy, macro_precision, macro_recall,
    * macro_f1, weighted_f1). Macro averages skip NaN classes (classes
    * with no predictions / no support contribute nothing rather than
    * poisoning the mean); weighted_f1 weights by support. */
  def summary(df: DataFrame, predCol: String, labelCol: String): DataFrame = {
    val pc = perClass(df, predCol, labelCol)
    def nanSafe(c: org.apache.spark.sql.Column) =
      when(isnan(c), lit(null)).otherwise(c)
    // CASE-guard the ANSI divides: an empty input has zero total support
    pc.agg(
      coalesce(sum("support"), lit(0L)).as("n"),
      when(coalesce(sum("support"), lit(0L)) > 0,
        sum("tp").cast("double") / sum("support"))
        .otherwise(lit(Double.NaN)).as("accuracy"),
      avg(nanSafe(col("precision"))).as("macro_precision"),
      avg(nanSafe(col("recall"))).as("macro_recall"),
      avg(nanSafe(col("f1"))).as("macro_f1"),
      when(coalesce(sum("support"), lit(0L)) > 0,
        sum(nanSafe(col("f1")) * col("support")) / sum("support"))
        .otherwise(lit(Double.NaN)).as("weighted_f1"))
  }
}
