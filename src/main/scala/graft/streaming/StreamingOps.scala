package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Streaming NEAR-dedup: drop rows whose 64-bit SimHash signature was
    * already seen within the watermark — identical or near-identical token
    * sequences share a signature, so trivial rewrites dedup too. State is
    * one long per distinct signature, expired by the watermark. */
  def streamingNearDedup(stream: DataFrame, tsCol: String, textCol: String,
                         watermark: String = "24 hours"): DataFrame =
    stream
      .withColumn("__sig", graft.pipeline.Dedup.simhash(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("__sig"))
      .drop("__sig")

  /** Per-key Welford accumulator for `runningStats` — O(1) state per key. */
  final case class RunningState(n: Long, mean: Double, m2: Double)

  /** One emitted update of a key's running moments. */
  final case class RunningStat(key: String, n: Long, mean: Double,
                               stddev: Double)

  /** Per-key running count/mean/stddev maintained across micro-batches with
    * EXPLICIT state (flatMapGroupsWithState) — the custom-state tier for
    * semantics windowed aggregation can't express: moments over the entire
    * stream history, emitted on every update, with numerically-stable
    * Welford accumulation. State is O(1) per key (three doubles), so the
    * state store stays bounded by key cardinality at any volume. */
  def runningStats(stream: Dataset[(String, Double)]): Dataset[RunningStat] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.groupByKey(_._1)
      .flatMapGroupsWithState[RunningState, RunningStat](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Double)],
         state: GroupState[RunningState]) =>
          var s = state.getOption.getOrElse(RunningState(0L, 0.0, 0.0))
          rows.foreach { case (_, v) =>
            val n1 = s.n + 1
            val d = v - s.mean
            val mean = s.mean + d / n1
            s = RunningState(n1, mean, s.m2 + d * (v - mean))
          }
          state.update(s)
          Iterator.single(RunningStat(key, s.n, s.mean,
            if (s.n > 1) math.sqrt(s.m2 / (s.n - 1)) else 0.0))
      }
  }

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
