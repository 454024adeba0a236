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

  /** Confusion counts: (label, pred, n), one corpus pass. */
  def confusion(df: DataFrame, predCol: String, labelCol: String): DataFrame =
    df.na.drop(Seq(predCol, labelCol))
      .groupBy(col(labelCol).cast("string").as("label"),
        col(predCol).cast("string").as("pred"))
      .agg(count(lit(1)).as("n"))

  /** Per-class metrics over the union of observed labels and predictions:
    * (cls, support, predicted, tp, precision, recall, f1). Precision of a
    * never-predicted class and recall of a never-seen class are NaN
    * (0/0 — not a fake 0); f1 is 0.0 when precision + recall is 0 and
    * NaN when either side is NaN. */
  def perClass(df: DataFrame, predCol: String, labelCol: String): DataFrame = {
    val c = confusion(df, predCol, labelCol)
    val support = c.groupBy(col("label").as("cls"))
      .agg(sum("n").as("support"))
    val predicted = c.groupBy(col("pred").as("cls"))
      .agg(sum("n").as("predicted"))
    val tp = c.filter(col("label") === col("pred"))
      .select(col("label").as("cls"), col("n").as("tp"))
    val joined = support.join(predicted, Seq("cls"), "full_outer")
      .join(tp, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("predicted"), lit(0L)).as("predicted"),
        coalesce(col("tp"), lit(0L)).as("tp"))
    val prec = when(col("predicted") > 0,
      col("tp").cast("double") / col("predicted"))
      .otherwise(lit(Double.NaN))
    val rec = when(col("support") > 0,
      col("tp").cast("double") / col("support"))
      .otherwise(lit(Double.NaN))
    joined
      .withColumn("precision", prec)
      .withColumn("recall", rec)
      .withColumn("f1",
        when(isnan(col("precision")) || isnan(col("recall")),
          lit(Double.NaN))
          .when(col("precision") + col("recall") === 0.0, lit(0.0))
          .otherwise(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))))
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
