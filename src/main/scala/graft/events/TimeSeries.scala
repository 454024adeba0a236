package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key time-series health and monitoring operators: gap analysis
  * (instrumentation outages), time-weighted averages (step-function
  * metrics sampled at irregular instants), and CUSUM change detection
  * (small persistent shifts a threshold alarm misses).
  *
  * Scale shape: gapReport/timeWeightedAvg are ONE keyed window (lead
  * over the key's time order — one shuffle on the key, in-partition
  * sort) folded into ONE hash aggregate per key. cusum is a sequential
  * per-key recursion like [[Rolling.ewma]]: flatMapSortedGroups streams
  * each key's events in shuffle-sorted order with O(1) state, no
  * per-key buffering. */
object TimeSeries {

  /** Per-key event-gap profile over micros timestamps: n_events,
    * span_us (last − first), max_gap_us, avg_gap_us, and
    * n_gaps_over = gaps strictly longer than `thresholdUs` — the
    * missing-data / outage report. Keys with a single event have no
    * gaps: null max/avg, zero count. Gaps pair consecutive events in
    * (ts, tie) order; the tie column makes the pairing total. */
  def gapReport(df: DataFrame, keys: Seq[String], tsCol: String,
                tieCol: String, thresholdUs: Long): DataFrame = {
    require(keys.nonEmpty, "gapReport needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__tsu"), col(tieCol))
    val withGap = df.na.drop(keys :+ tsCol :+ tieCol)
      .withColumn("__tsu", unix_micros(col(tsCol)))
      .withColumn("__gap", col("__tsu") - lag("__tsu", 1).over(w))
    withGap.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        (max("__tsu") - min("__tsu")).as("span_us"),
        max("__gap").as("max_gap_us"),
        // exact long sum ÷ count (one correctly-rounded division) — a
        // double-accumulated avg() is sum-order-dependent in the last ulp
        (sum("__gap").cast("double") / count("__gap")).as("avg_gap_us"),
        sum(when(col("__gap") > thresholdUs, 1L).otherwise(0L))
          .as("n_gaps_over"))
  }

  /** Time-weighted average per key under step-function hold: each
    * observation's value holds until the next one, so
    * twa = Σ vᵢ·(tᵢ₊₁ − tᵢ) / (t_last − t_first). The last observation
    * has no hold interval and contributes no weight (standard
    * left-closed convention). Single-event keys (zero span) return the
    * event's value — the step function is constant there. One keyed
    * lead window + one aggregate. */
  def timeWeightedAvg(df: DataFrame, keys: Seq[String], tsCol: String,
                      tieCol: String, valueCol: String): DataFrame = {
    require(keys.nonEmpty, "timeWeightedAvg needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__tsu"), col(tieCol))
    val v = col(valueCol).cast("double")
    val withNext = df.na.drop(keys :+ tsCol :+ tieCol :+ valueCol)
      .withColumn("__tsu", unix_micros(col(tsCol)))
      .withColumn("__hold",
        (lead("__tsu", 1).over(w) - col("__tsu")).cast("double"))
    withNext.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        (max("__tsu") - min("__tsu")).as("span_us"),
        when(max("__tsu") > min("__tsu"),
          sum(v * col("__hold")) / (max("__tsu") - min("__tsu")))
          .otherwise(max(v)).as("twa"))
  }

  /** Two-sided CUSUM change detection per key: in (ts, tie) order,
    *   s⁺ᵢ = max(0, s⁺ᵢ₋₁ + (vᵢ − target − slack))
    *   s⁻ᵢ = max(0, s⁻ᵢ₋₁ + (target − slack − vᵢ))
    * with alarms where either side exceeds `h`. Detects small
    * persistent mean shifts that never trip a per-point threshold.
    * Returns one row per input event: (keys..., tie, value, cusum_hi,
    * cusum_lo, alarm). The recursion is sequential per key — same
    * flatMapSortedGroups shape as [[Rolling.ewma]] (one shuffle,
    * streaming iterator, O(1) state); a DuckDB recursive CTE replays
    * the identical +/−/max op order bit-for-bit, so results compare
    * UNROUNDED. */
  def cusum(df: DataFrame, keys: Seq[String], tsCol: String, tieCol: String,
            valueCol: String, target: Double, slack: Double,
            h: Double): DataFrame = {
    require(keys.nonEmpty, "cusum needs at least one key column")
    require(slack >= 0 && h > 0, s"need slack >= 0 and h > 0: $slack, $h")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val base = df.na.drop(keys :+ tsCol :+ tieCol :+ valueCol)
      .select(struct(keys.map(col): _*).as("__k"),
        col(tsCol).as("__ts"),
        col(tieCol).cast("long").as("__tie"),
        col(valueCol).cast("double").as("__v"))
    val kType = base.schema("__k").dataType.asInstanceOf[StructType]
    val outSchema = StructType(Seq(
      StructField("__k", kType), StructField("__tie", LongType),
      StructField("value", DoubleType), StructField("cusum_hi", DoubleType),
      StructField("cusum_lo", DoubleType), StructField("alarm", BooleanType)))
    val res = base.as(Encoders.row(base.schema))
      .groupByKey((r: Row) => r.getStruct(0))(Encoders.row(kType))
      .flatMapSortedGroups(col("__ts"), col("__tie")) {
        (k: Row, it: Iterator[Row]) =>
          var hi = 0.0
          var lo = 0.0
          it.map { r =>
            val v = r.getDouble(3)
            hi = math.max(0.0, hi + (v - target - slack))
            lo = math.max(0.0, lo + (target - slack - v))
            Row(k, r.getLong(2), v, hi, lo, hi > h || lo > h)
          }
      }(Encoders.row(outSchema))
    res.select(keys.map(k => col("__k").getField(k).as(k)) :+
      col("__tie").as(tieCol) :+ col("value") :+ col("cusum_hi") :+
      col("cusum_lo") :+ col("alarm"): _*)
  }
}
