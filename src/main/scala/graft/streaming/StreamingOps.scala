package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming variants of the engine's aggregations — an
  * EXTENSION over the reference, which has no streaming at all (SURVEY
  * §2.12). Each op takes a streaming DataFrame (`spark.readStream...`) and
  * returns a transformed streaming frame ready for `writeStream`.
  *
  * All aggregations are keyed + watermarked so state is bounded: at 100 TB/
  * day the state store holds only (#keys × #open-windows) rows.
  */
object StreamingOps {

  /** Incremental value_counts per event-time window. */
  def windowedValueCounts(stream: DataFrame, tsCol: String, keyCol: String,
                          windowDur: String = "1 hour",
                          watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("value_counts"))

  /** Streaming describe: mean/min/max/stddev per key per window. */
  def windowedDescribe(stream: DataFrame, tsCol: String, keyCol: String,
                       valCol: String, windowDur: String = "1 hour",
                       watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"), avg(col(valCol)).as("mean"),
        min(col(valCol)).as("min"), max(col(valCol)).as("max"),
        stddev(col(valCol)).as("stddev"))

  /** Streaming exact dedup on a key with watermarked state retention —
    * the streaming face of Dedup.exact. */
  def streamingDedup(stream: DataFrame, tsCol: String, keyCols: Seq[String],
                     watermark: String = "24 hours"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)

  /** Sessionization with mapGroupsWithState-free session windows
    * (session_window is native since Spark 3.2). */
  def sessionCounts(stream: DataFrame, tsCol: String, userCol: String,
                    gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"))
}
