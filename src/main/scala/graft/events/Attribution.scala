package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marketing/conversion attribution over an event stream: credit each
  * CONVERSION event to the TOUCH events (impressions, clicks, emails…)
  * that preceded it within a lookback window, under the standard
  * models — first-touch, last-touch, linear (equal split). The
  * time-ordered cousin of the funnel tier: funnels count sequences,
  * attribution allocates credit.
  */
object Attribution {

  /** Touch→conversion credit assignment. Input: one event stream with
    * a type column; `touchTypes` are creditable, `convType` converts.
    * For every conversion, the credited touches are those of the SAME
    * key strictly before it (ties by `tieCol`: a touch at the same
    * timestamp with a smaller tie id counts) and within `lookbackUs`.
    * Output: one row per (conversion, credited touch) —
    * (keyCols…, conv_tie, conv_ts, touch_tie, touch_ts, n_touches,
    * weight) where weight follows `model`:
    *   "linear"  → 1/n_touches for each of the n credited touches;
    *   "first"   → 1.0 on the earliest credited touch only;
    *   "last"    → 1.0 on the latest credited touch only.
    * Conversions with NO credited touch emit one row with null touch
    * columns, n_touches = 0 and weight 0 — unattributed conversions
    * are the number a campaign report must show, not hide.
    *
    * Scale shape: one shuffle on the key; per key the credited pairs
    * come from an in-partition range join (touches × conversions of
    * one key, bounded by the lookback); the first/last pick and the
    * 1/n weights are window ranks KEYED on the conversion — nothing
    * global, nothing driver-side. */
  def attribute(df: DataFrame, keyCols: Seq[String], tsCol: String,
                tieCol: String, typeCol: String, touchTypes: Seq[String],
                convType: String, lookbackUs: Long,
                model: String = "linear"): DataFrame = {
    require(keyCols.nonEmpty, "attribute needs key columns")
    require(touchTypes.nonEmpty, "attribute needs touch types")
    require(lookbackUs > 0, s"lookbackUs must be > 0, got $lookbackUs")
    require(Seq("linear", "first", "last").contains(model),
      s"model must be linear|first|last, got $model")
    val ks = keyCols.map(col)
    val base = df.na.drop(keyCols ++ Seq(tsCol, tieCol, typeCol))
      .withColumn("__tsu", unix_micros(col(tsCol)))
    val convs = base.filter(col(typeCol) === convType)
      .select(ks :+ col("__tsu").as("conv_ts") :+
        col(tieCol).as("conv_tie"): _*)
    val touches = base.filter(col(typeCol).isin(touchTypes: _*))
      .select(ks :+ col("__tsu").as("touch_ts") :+
        col(tieCol).as("touch_tie"): _*)
    val credited = convs.join(touches, keyCols)
      .filter((col("touch_ts") < col("conv_ts") ||
        (col("touch_ts") === col("conv_ts") &&
          col("touch_tie") < col("conv_tie"))) &&
        col("touch_ts") >= col("conv_ts") - lookbackUs)
    val perConv = Window.partitionBy((ks :+ col("conv_tie")): _*)
    // deterministic touch order inside a conversion: time, then tie
    val asc = Window.partitionBy((ks :+ col("conv_tie")): _*)
      .orderBy(col("touch_ts"), col("touch_tie"))
    val desc = Window.partitionBy((ks :+ col("conv_tie")): _*)
      .orderBy(col("touch_ts").desc, col("touch_tie").desc)
    val weighted = credited
      .withColumn("n_touches", count(lit(1)).over(perConv))
      .withColumn("weight", model match {
        case "linear" => lit(1.0) / col("n_touches")
        case "first" =>
          when(row_number().over(asc) === 1, 1.0).otherwise(0.0)
        case "last" =>
          when(row_number().over(desc) === 1, 1.0).otherwise(0.0)
      })
      .filter(col("weight") > 0)
    // unattributed conversions: anti-join against the credited set
    val orphan = convs.join(credited.select(ks :+ col("conv_tie"): _*)
        .distinct(), keyCols :+ "conv_tie", "left_anti")
      .withColumn("touch_ts", lit(null).cast("long"))
      .withColumn("touch_tie", lit(null).cast("long"))
      .withColumn("n_touches", lit(0L))
      .withColumn("weight", lit(0.0))
    val cols = ks ++ Seq(col("conv_tie"), col("conv_ts"),
      col("touch_tie"), col("touch_ts"), col("n_touches"), col("weight"))
    weighted.select(cols: _*).unionAll(orphan.select(cols: _*))
  }
}
