package graft.core

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.agg.Stats

/** Column-indexing façade (reference HandyColumns,
  * handyspark/sql/dataframe.py:1465-1809): `hdf.cols("Fare").median()`.
  * Selectors accept plain names or the type aliases
  * 'continuous'/'categorical'/'numerical'/'string'/'array'.
  */
final case class HandyColumns(hf: HandyFrame, selector: Seq[String]) {

  private def names: Seq[String] = {
    val resolved =
      selector.flatMap(s => ColumnClasses.resolve(hf.schema, s)).distinct
    // existence check matches Spark's resolution: case-insensitive unless
    // spark.sql.caseSensitive is set
    val caseSensitive =
      hf.df.sparkSession.sessionState.conf.caseSensitiveAnalysis
    val known =
      if (caseSensitive) hf.schema.fieldNames.toSet
      else hf.schema.fieldNames.map(_.toLowerCase).toSet
    val missing = resolved.filterNot(c =>
      known(if (caseSensitive) c else c.toLowerCase))
    // fail HERE with the framed summary (reference HANDY EXCEPTION SUMMARY,
    // util.py:42-92) instead of letting Spark's analysis error surface
    // three operators later
    graft.util.Errors.context("cols", selector)(
      require(missing.isEmpty,
        s"unknown column(s) ${missing.mkString(", ")}; available: " +
          hf.schema.fieldNames.mkString(", ")))
    resolved
  }

  private def df: DataFrame = hf.df

  /** first-n values (safety-limited column fetch, reference :1492-1552) */
  def take(n: Int): Array[Row] =
    df.select(names.map(col): _*).limit(math.min(n, hf.state.safetyLimit))
      .collect()

  def mean(): DataFrame = Stats.meanOf(df, names)
  def min(): DataFrame =
    df.agg(org.apache.spark.sql.functions.min(col(names.head)).as(names.head),
      names.tail.map(c => org.apache.spark.sql.functions.min(col(c)).as(c)): _*)
  def max(): DataFrame =
    df.agg(org.apache.spark.sql.functions.max(col(names.head)).as(names.head),
      names.tail.map(c => org.apache.spark.sql.functions.max(col(c)).as(c)): _*)
  def stddev(): DataFrame =
    df.agg(stddev_samp(col(names.head)).as(names.head),
      names.tail.map(c => stddev_samp(col(c)).as(c)): _*)
  def variance(): DataFrame =
    df.agg(var_samp(col(names.head)).as(names.head),
      names.tail.map(c => var_samp(col(c)).as(c)): _*)
  def median(precision: Double = 0.01): DataFrame =
    Stats.median(df, names, precision)
  def percentile(p: Double, precision: Double = 0.01): DataFrame =
    Stats.percentileApprox(df, names, Seq(p / 100.0), precision)
  def q1(precision: Double = 0.01): DataFrame = percentile(25, precision)
  def q3(precision: Double = 0.01): DataFrame = percentile(75, precision)
  def isNull(ratio: Boolean = false): DataFrame =
    Stats.isNull(df, names, ratio)
  def nunique(rsd: Double = 0.05): DataFrame = Stats.nunique(df, names, rsd)
  def valueCounts(dropna: Boolean = true): DataFrame =
    Stats.valueCounts(df, names, dropna)
  def mode(): DataFrame = Stats.mode(df, names.head)
  def entropy(): DataFrame = Stats.entropy(df, names.head)
  def corr(method: String = "pearson"): DataFrame = method match {
    case "spearman" => Stats.corrSpearman(df, names)
    case _          => Stats.corrPearson(df, names)
  }
  def describe(): DataFrame = Stats.describe(df, names)
  def outliers(k: Double = 1.5): DataFrame =
    graft.clean.Clean.outlierCounts(df, names, k)
  def boxplotStats(k: Double = 1.5): DataFrame =
    graft.plotdata.PlotData.bxpStats(df, names.head, k)
  def hist(bins: Int = 10): DataFrame =
    graft.plotdata.PlotData.histogram(df, names.head, bins)
}

object HandyColumns {
  implicit final class ColsOps(private val hf: HandyFrame) extends AnyVal {
    def cols(selector: String*): HandyColumns = HandyColumns(hf, selector.toSeq)
    /** groupBy passthrough that keeps the decorated state (reference
      * HandyGrouped, dataframe.py:841-855). */
    def groupedBy(cols: String*): HandyGrouped =
      HandyGrouped(hf, cols.toSeq)
  }
}

/** Thin wrapper over RelationalGroupedDataset that remembers the group
  * columns and the engine state (reference HandyGrouped). */
final case class HandyGrouped(hf: HandyFrame, groupCols: Seq[String]) {
  def agg(exprs: (String, String)*): HandyFrame =
    HandyFrame(hf.df.groupBy(groupCols.map(org.apache.spark.sql.functions.col): _*)
      .agg(exprs.toMap), hf.state)
  def count(): HandyFrame =
    HandyFrame(hf.df.groupBy(groupCols.map(org.apache.spark.sql.functions.col): _*)
      .count(), hf.state)
}
