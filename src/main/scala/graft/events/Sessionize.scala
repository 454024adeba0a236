package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over a NUMERIC ordering column (epoch
  * seconds/micros — cast timestamps first; `gap` is in the same unit): a
  * new session starts when the gap to the key's previous event exceeds
  * `gap`. The lag → flag → running-sum windows are all KEYED — no global
  * window, one shuffle on the keys. Shared by the batch session queries
  * and the range-join interval builder; the streaming counterpart is
  * `StreamingOps.sessionCounts` (native session_window). */
object Sessionize {

  /** per-row 1-based session id within its key, as column `sidCol` */
  def withSessionIds(df: DataFrame, keys: Seq[String], tsCol: String,
                     gap: Long, sidCol: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tsCol)
    df.withColumn("__prev", lag(tsCol, 1).over(w))
      .withColumn("__new_s", (col("__prev").isNull ||
        col(tsCol) - col("__prev") > gap).cast("int"))
      .withColumn(sidCol, sum("__new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new_s")
  }

  /** one row per (key, session): bounds `lo`/`hi` + `n_events` */
  def sessionBounds(df: DataFrame, keys: Seq[String], tsCol: String,
                    gap: Long, sidCol: String = "session_id"): DataFrame =
    withSessionIds(df, keys, tsCol, gap, sidCol)
      .groupBy((keys :+ sidCol).map(col): _*)
      .agg(min(tsCol).as("lo"), max(tsCol).as("hi"),
        count(lit(1)).as("n_events"))
}
