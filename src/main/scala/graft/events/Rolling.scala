package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sliding time-window aggregates over an event stream — the per-entity
  * "activity in the trailing hour/day" feature family (rate limiting,
  * burst detection, rolling engagement counters). Complements the
  * tumbling windows of `q_events_windowed` and the gap-based sessions of
  * [[Sessionize]]: a tumbling window assigns each event to ONE bucket; a
  * rolling window scores EVERY event against its own trailing interval.
  *
  * Scale shape: one keyed window — Spark shuffles on the entity key and
  * sorts within key, which is exactly the minimal work the semantics
  * require (each entity's events must meet ordered). There is no global
  * window and no self-join; a range-join formulation of the same feature
  * would shuffle the event stream twice. Entity-keyed windows are safe at
  * 100 TB as long as no single entity dominates a partition; for that
  * degenerate case pre-aggregate to coarse time grains first (see
  * `rollingAggCoarse`).
  */
object Rolling {

  /** Trailing-interval aggregates per event: for each row, `n_win` and
    * `sum_win` over all events of the same `keys` whose `tsCol` (epoch
    * seconds, long) lies in `[ts - windowSec + 1, ts]` — a closed trailing
    * window including the current row and its same-second peers (RANGE
    * frame semantics: ties share one frame, so the result is
    * order-deterministic even with duplicate timestamps). */
  def rollingAgg(df: DataFrame, keys: Seq[String], tsCol: String,
                 valueCol: String, windowSec: Long): DataFrame = {
    require(windowSec >= 1, s"rollingAgg needs windowSec >= 1, got $windowSec")
    graft.util.Errors.context("rollingAgg", keys :+ tsCol :+ valueCol) {
    // materialize the epoch cast ONCE: an inline cast in the orderBy gives
    // each window function its own projected sort key, which blocks the
    // CollapseWindow rule and doubles the Window+Sort passes (seen in the
    // plan audit — two identical sorts per partition)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__graft_tss"))
      .rangeBetween(-(windowSec - 1), Window.currentRow)
    df.withColumn("__graft_tss", col(tsCol).cast("long"))
      .select(col("*"), count(lit(1)).over(w).as("n_win"),
        sum(col(valueCol)).over(w).as("sum_win"))
      .drop("__graft_tss")
  } }

  /** The skew-safe variant for entities with pathological event counts:
    * pre-aggregate to `grainSec` buckets (partial/final hash aggregate —
    * cuts the window input from events to occupied grains), then run the
    * trailing window over the bucket stream. The result is the rolling
    * aggregate at bucket granularity: exact whenever `grainSec` divides
    * `windowSec` and events are bucketed to their grain start. */
  def rollingAggCoarse(df: DataFrame, keys: Seq[String], tsCol: String,
                       valueCol: String, windowSec: Long,
                       grainSec: Long): DataFrame = {
    require(grainSec >= 1 && windowSec % grainSec == 0,
      s"grainSec must divide windowSec ($grainSec / $windowSec)")
    val kc = keys.map(col)
    // floor, not truncate-toward-zero: long/long division in Spark is true
    // division, and cast("long") truncates — pre-1970 (negative) epochs
    // would land in the wrong grain bucket
    val grain = floor(col(tsCol).cast("long") / grainSec).cast("long") * grainSec
    val bucketed = df.groupBy(kc :+ grain.as("grain_ts"): _*)
      .agg(count(lit(1)).as("n_grain"), sum(col(valueCol)).as("sum_grain"))
    val w = Window.partitionBy(kc: _*).orderBy(col("grain_ts"))
      .rangeBetween(-(windowSec - grainSec), Window.currentRow)
    bucketed
      .withColumn("n_win", sum(col("n_grain")).over(w))
      .withColumn("sum_win", sum(col("sum_grain")).over(w))
  }

  /** Robust trailing-baseline anomaly score — [[rollingZscore]] with
    * median/IQR in place of mean/stddev, for streams where the baseline
    * itself is outlier-contaminated (one earlier burst inflates a
    * stddev baseline and MASKS the next burst; quartiles shrug it off):
    *
    *   robust_z = (x − median_w) / (0.7413 · IQR_w)
    *
    * over the same key's events in the STRICTLY EARLIER seconds
    * [t − windowSec + 1, t − 1] (current second excluded, as in
    * rollingZscore). 0.7413 = 1/(2·Φ⁻¹(0.75)) makes the denominator a
    * consistent σ estimate under normality, so thresholds carry over.
    * The window quantiles are Spark's EXACT `percentile` (quantile_cont
    * interpolation) evaluated as window aggregates — one keyed window
    * pass computes all three quartiles (CollapseWindow folds them).
    * null z while the baseline has < 4 events or zero IQR.
    *
    * Scale note: exact percentile over a window buffers the FRAME's
    * values per row — fine for the bounded trailing windows this is
    * for (minutes-hours of per-key events); for huge frames aggregate
    * to grains first (the [[rollingAggCoarse]] treatment). */
  def rollingRobustZscore(df: DataFrame, keys: Seq[String], tsCol: String,
                          valueCol: String, windowSec: Long,
                          threshold: Double = 3.5): DataFrame = {
    require(windowSec >= 2,
      s"rollingRobustZscore needs windowSec >= 2: $windowSec")
    require(threshold > 0.0, s"threshold must be positive: $threshold")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__graft_tss"))
      .rangeBetween(-(windowSec - 1), -1)
    val med = expr(s"percentile($valueCol, 0.5)").over(w)
    val q1 = expr(s"percentile($valueCol, 0.25)").over(w)
    val q3 = expr(s"percentile($valueCol, 0.75)").over(w)
    val iqr = q3 - q1
    val z = when(count(col(valueCol)).over(w) >= 4 && iqr > 0,
      (col(valueCol) - med) / (lit(0.7413) * iqr))
    df.withColumn("__graft_tss", col(tsCol).cast("long"))
      .select(col("*"), med.as("baseline_median"), iqr.as("baseline_iqr"),
        z.as("robust_z"))
      .withColumn("is_anomaly",
        coalesce(abs(col("robust_z")) > threshold, lit(false)))
      .drop("__graft_tss")
  }

  /** Sketch-tier [[rollingRobustZscore]] — the SCALE path for dense keys
    * where the exact window percentile's per-row frame buffer (it
    * re-collects and sorts every trailing frame) is the memory/CPU wall:
    * the trailing baseline's median/IQR come from a
    * [[graft.expr.HistCounts]] window aggregate instead — a CountHist
    * equal-width sketch whose state is bins+2 longs per frame position
    * regardless of frame size, with O(1) adds instead of the exact
    * tier's O(F log F) per-row buffer sort.
    *
    * Estimates are DETERMINISTIC (the sketch is an exact function of the
    * frame's values — no randomness) and carry CountHist's quantile
    * bound: |median̂ − median| ≤ 2·cellWidth, so |IQR̂ − IQR| ≤
    * 4·cellWidth, where cellWidth = (hi−lo)/bins. Pick [lo, hi]
    * covering the value range (out-of-range mass is EXCLUDED from the
    * quantiles — below/above tallies are surfaced so a mis-sized range
    * is visible) and bins so 2·cellWidth is inside your anomaly margin.
    * Same strictly-earlier RANGE frame, n ≥ 4 + positive-IQR gating,
    * and 0.7413·IQR scaling as the exact tier; parity envelope vs the
    * exact op is spec-pinned (RollingSpec). */
  def rollingRobustZscoreSketch(df: DataFrame, keys: Seq[String],
                                tsCol: String, valueCol: String,
                                windowSec: Long, lo: Double, hi: Double,
                                bins: Int,
                                threshold: Double = 3.5): DataFrame = {
    require(windowSec >= 2,
      s"rollingRobustZscoreSketch needs windowSec >= 2: $windowSec")
    require(threshold > 0.0, s"threshold must be positive: $threshold")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__graft_tss"))
      .rangeBetween(-(windowSec - 1), -1)
    val v = col(valueCol).cast("double")
    // HistQuantiles (not HistCounts + quantilesOf): a moving window
    // re-evaluates its aggregate per output row, and materializing the
    // bins-long counts array per row is pure boxing overhead — measured
    // 80× the exact tier's cost on small frames before this was split
    df.withColumn("__graft_tss", col(tsCol).cast("long"))
      .withColumn("__sk", graft.expr.HistQuantiles.of(v, lo, hi, bins,
        Seq(0.25, 0.5, 0.75)).over(w))
      .withColumn("baseline_median", element_at(col("__sk.quantiles"), 2))
      .withColumn("baseline_iqr",
        element_at(col("__sk.quantiles"), 3) -
          element_at(col("__sk.quantiles"), 1))
      .withColumn("baseline_below", col("__sk.below"))
      .withColumn("baseline_above", col("__sk.above"))
      .withColumn("robust_z",
        when(col("__sk.n") >= 4 && col("baseline_iqr") > 0,
          (v - col("baseline_median")) /
            (lit(0.7413) * col("baseline_iqr"))))
      .withColumn("is_anomaly",
        coalesce(abs(col("robust_z")) > threshold, lit(false)))
      .drop("__graft_tss", "__sk")
  }

  /** Last-observation-carried-forward fill: nulls in `valueCol` take the
    * most recent non-null value of the same key at-or-before their
    * timestamp (sensor dropout / sparse-feature densification). One keyed
    * window with `last(ignoreNulls)` — the same single shuffle + in-key
    * sort the semantics require; rows before a key's first observation
    * stay null. Ties at one timestamp resolve by `tieCol` order (pass the
    * event id) so the fill is deterministic under duplicate timestamps. */
  def locfFill(df: DataFrame, keys: Seq[String], tsCol: String,
               valueCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(valueCol,
      last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Resample per-key event streams onto a fixed `stepSec` grid:
    * per (keys, grid cell) the mean/count of that cell's values, then
    * EMPTY cells between a key's first and last observation are
    * materialized (sequence explode of the key's span — never a global
    * calendar) and gap-filled with the previous cell's mean
    * (carry-forward). The ML-feature regularization step: models want
    * equally spaced series, event logs aren't. Output: (keys...,
    * grid_ts, n_obs, value) with n_obs = 0 marking filled gaps.
    *
    * Scale shape: one grouped aggregate (cells), one per-key min/max
    * aggregate + sequence explode (span/stepSec rows per key — bounded
    * by the grid, not the event count), one left join on (keys, cell),
    * one keyed LOCF window. A key spanning more than `maxCells` cells
    * fails loudly (degenerate span ⇒ the grid itself explodes). */
  /** Exponentially-weighted moving average per key: rows sorted by
    * (`tsCol`, `tieCol`) within each key, then
    * `e_1 = x_1; e_i = alpha*x_i + (1-alpha)*e_{i-1}` — the
    * smoothing-feature / drift-tracker primitive a trailing mean's hard
    * cutoff can't express. Returns (keys..., tieCol, ewma); join back on
    * the tie id for the full row. Null keys/ts/tie/values are dropped
    * (a null observation has no defined weight).
    *
    * The recursion is inherently sequential per key, so this is the one
    * events op that is NOT a SQL window: `flatMapSortedGroups` gives a
    * STREAMING iterator sorted by the shuffle (one shuffle on the key,
    * in-sort by (ts, tie), O(1) state per key, no per-key buffering) —
    * entity event counts never hit memory. Ties sort on `tieCol` (pass
    * the event id) so the order — and therefore the float result — is
    * total and deterministic; the timestamp sorts at FULL precision
    * (no epoch-second truncation). */
  def ewma(df: DataFrame, keys: Seq[String], tsCol: String, tieCol: String,
           valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    require(keys.nonEmpty, "ewma needs at least one key column")
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
      StructField("ewma", DoubleType)))
    val res = base.as(Encoders.row(base.schema))
      .groupByKey((r: Row) => r.getStruct(0))(Encoders.row(kType))
      .flatMapSortedGroups(col("__ts"), col("__tie")) {
        (k: Row, it: Iterator[Row]) =>
          var e = 0.0
          var first = true
          it.map { r =>
            val v = r.getDouble(3)
            e = if (first) { first = false; v }
                else alpha * v + (1.0 - alpha) * e
            Row(k, r.getLong(2), e)
          }
      }(Encoders.row(outSchema))
    res.select(keys.map(k => col("__k").getField(k).as(k)) :+
      col("__tie").as(tieCol) :+ col("ewma"): _*)
  }

  /** Trailing-baseline anomaly score per event: z = (x − mean)/stddev of
    * the same key's events in the STRICTLY EARLIER seconds
    * [t−windowSec+1, t−1] (the current second is excluded so a burst
    * can't mask itself), plus `is_anomaly` = |z| > threshold. z is null
    * while the baseline has < 2 events or zero variance — warm-up and
    * constant streams flag nothing. One keyed window, same single
    * shuffle + in-key sort as [[rollingAgg]]. */
  def rollingZscore(df: DataFrame, keys: Seq[String], tsCol: String,
                    valueCol: String, windowSec: Long,
                    threshold: Double = 3.0): DataFrame = {
    require(windowSec >= 2, s"rollingZscore needs windowSec >= 2: $windowSec")
    require(threshold > 0.0, s"threshold must be positive: $threshold")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__graft_tss"))
      .rangeBetween(-(windowSec - 1), -1)
    val z = when(count(col(valueCol)).over(w) >= 2 &&
        stddev_samp(col(valueCol)).over(w) > 0,
      (col(valueCol) - avg(col(valueCol)).over(w)) /
        stddev_samp(col(valueCol)).over(w))
    df.withColumn("__graft_tss", col(tsCol).cast("long"))
      .select(col("*"), z.as("z"))
      // flag is boolean two-state: an undefined z (warm-up, zero
      // variance) is NOT an anomaly — downstream filters need no
      // null-handling
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > threshold, lit(false)))
      .drop("__graft_tss")
  }

  def resample(df: DataFrame, keys: Seq[String], tsCol: String,
               valueCol: String, stepSec: Long,
               maxCells: Int = 1 << 20): DataFrame = {
    require(stepSec > 0, s"stepSec must be positive, got $stepSec")
    val kc = keys.map(col)
    val cell = floor(col(tsCol).cast("long") / stepSec).cast("long") * stepSec
    val cells = df.na.drop(keys :+ tsCol)
      .groupBy(kc :+ cell.as("grid_ts"): _*)
      .agg(count(col(valueCol)).as("n_obs"),
        avg(col(valueCol)).as("__cell_mean"))
    val spans = cells.groupBy(kc: _*)
      .agg(min("grid_ts").as("__lo"), max("grid_ts").as("__hi"))
    val grid = spans.withColumn("grid_ts",
      explode(sequence(col("__lo"),
        when((col("__hi") - col("__lo")) / stepSec < maxCells, col("__hi"))
          .otherwise(raise_error(concat(
            lit(s"resample span exceeds $maxCells cells of $stepSec s — " +
              "raise stepSec or split the key: lo="),
            col("__lo"), lit(" hi="), col("__hi")))),
        lit(stepSec))))
      .drop("__lo", "__hi")
    val w = Window.partitionBy(kc: _*).orderBy(col("grid_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(cells, keys :+ "grid_ts", "left")
      .na.fill(0L, Seq("n_obs"))
      .withColumn("value",
        last(col("__cell_mean"), ignoreNulls = true).over(w))
      .drop("__cell_mean")
  }
}
