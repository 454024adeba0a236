package graft.events

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}

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

  /** Per-key autocorrelation function at lags 1..`maxLag` (the
    * seasonality / self-similarity probe):
    *
    *   acf(l) = Σ_{t≤n−l} (x_t − x̄)(x_{t+l} − x̄) / Σ_t (x_t − x̄)²
    *
    * with x̄ the key's full-series mean — the standard biased estimator
    * (denominator over ALL n terms, so acf(0) ≡ 1 and |acf| ≤ 1).
    * Series order is (ts, tie); constant series (zero variance) yield
    * null. Output: one row per (key, lag): (keys…, lag, n, acf).
    *
    * Scale shape: ONE shuffle on the key — the mean (whole-partition
    * window), the `maxLag` leads (one window pass), and the final
    * per-key aggregate all share the keyed partitioning; the lag melt
    * is a `stack` projection of the single aggregate row, not a
    * row-multiplying explode of the series. */
  def acf(df: DataFrame, keys: Seq[String], tsCol: String, tieCol: String,
          valueCol: String, maxLag: Int): DataFrame = {
    require(keys.nonEmpty, "acf needs at least one key column")
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col("__tsu"), col(tieCol))
    val wAll = Window.partitionBy(kc: _*)
    val base = df.na.drop(keys :+ tsCol :+ tieCol :+ valueCol)
      .withColumn("__tsu", unix_micros(col(tsCol)))
      .withColumn("__x", col(valueCol).cast("double"))
      .withColumn("__m", avg("__x").over(wAll))
    val withLeads = (1 to maxLag).foldLeft(base) { (d, l) =>
      d.withColumn(s"__lead_$l", lead("__x", l).over(w))
    }
    val aggs = Seq(count(lit(1)).as("n"),
      sum((col("__x") - col("__m")) * (col("__x") - col("__m")))
        .as("__den")) ++
      (1 to maxLag).map(l =>
        sum((col("__x") - col("__m")) * (col(s"__lead_$l") - col("__m")))
          .as(s"__num_$l"))
    val perKey = withLeads.groupBy(kc: _*).agg(aggs.head, aggs.tail: _*)
    val stackExpr = s"stack($maxLag, " +
      (1 to maxLag).map(l => s"$l, __num_$l").mkString(", ") +
      ") as (lag, __num)"
    perKey.select(kc ++ Seq(col("n"), col("__den"), expr(stackExpr)): _*)
      .select(kc ++ Seq(col("lag"), col("n"),
        (col("__num") / nullif(col("__den"), lit(0.0))).as("acf")): _*)
  }

  /** Partial autocorrelation per key via the Durbin-Levinson recursion
    * over [[acf]]'s autocorrelations: PACF(k) = φ_kk, with
    *
    *   φ_kk = (ρ_k − Σ_{j<k} φ_{k−1,j}·ρ_{k−j}) /
    *          (1 − Σ_{j<k} φ_{k−1,j}·ρ_j),
    *   φ_kj = φ_{k−1,j} − φ_kk·φ_{k−1,k−j}
    *
    * (inner sums accumulated in ascending j — the op order an oracle
    * unrolls term-for-term). The distributed work IS the acf pass; the
    * recursion runs INSIDE the executors via flatMapGroups over the
    * already-keyed acf frame — per-group state is exactly maxLag
    * (lag, ρ) pairs plus the φ coefficient array, so key cardinality
    * is unbounded (no driver collect, no maxKeys refuse). Groups are
    * keyed by the JSON-serialized key struct (injective for a fixed
    * schema), so arbitrary key column types group correctly without a
    * per-type encoder. A null ρ (zero variance) nulls that key's pacf
    * from the first affected lag on.
    * Returns (keys…, lag, pacf) for lag = 1..maxLag. */
  def pacf(df: DataFrame, keys: Seq[String], tsCol: String, tieCol: String,
           valueCol: String, maxLag: Int): DataFrame = {
    val k = keys.length
    val keySchema = StructType(keys.map(c =>
      StructField(c, df.schema(c).dataType)))
    val outSchema = StructType(keySchema.fields ++ Seq(
      StructField("lag", IntegerType), StructField("pacf", DoubleType)))
    val rho = acf(df, keys, tsCol, tieCol, valueCol, maxLag)
      .select(keys.map(col) ++ Seq(col("lag"), col("acf"),
        to_json(struct(keys.map(col): _*)).as("__gk")): _*)
    implicit val rowEnc: Encoder[Row] = Encoders.row(outSchema)
    rho.groupByKey(_.getString(k + 2))(Encoders.STRING).flatMapGroups {
      (_: String, it: Iterator[Row]) =>
      val rows = it.toArray
      val keyVals = (0 until k).map(rows.head.get)
      val rhoMap = rows.map(r => r.getInt(k) -> (
        if (r.isNullAt(k + 1)) None else Some(r.getDouble(k + 1)))).toMap
      // phi(k-1) coefficients, built up lag by lag; None poisons onward
      var prev = Array.empty[Double]
      var poisoned = false
      (1 to maxLag).map { lag =>
        val pk: Option[Double] =
          if (poisoned) None
          else rhoMap.getOrElse(lag, None) match {
            case None => poisoned = true; None
            case Some(rhoK) =>
              if (lag == 1) { prev = Array(rhoK); Some(rhoK) }
              else {
                var num = rhoK; var den = 1.0
                var j = 1
                while (j < lag) {
                  num -= prev(j - 1) * rhoMap(lag - j).get
                  den -= prev(j - 1) * rhoMap(j).get
                  j += 1
                }
                if (den == 0.0) { poisoned = true; None }
                else {
                  val phiKK = num / den
                  val next = new Array[Double](lag)
                  var i = 1
                  while (i < lag) {
                    next(i - 1) = prev(i - 1) - phiKK * prev(lag - i - 1)
                    i += 1
                  }
                  next(lag - 1) = phiKK
                  prev = next
                  Some(phiKK)
                }
              }
          }
        Row.fromSeq(keyVals ++ Seq(lag,
          pk.map(java.lang.Double.valueOf).orNull))
      }.iterator
    }
  }

  /** Cross-correlation function between two ALIGNED series per key:
    * Pearson r between x_t and y_{t+lag} for every lag in
    * [−maxLag, maxLag], over an integer-indexed grid (`idxCol` — build
    * it upstream with a date_diff/window bucketing; requiring the grid
    * makes "aligned" explicit instead of silently joining ragged
    * timestamps). Sign convention: r at POSITIVE lag correlates x now
    * with y `lag` steps LATER, so a peak at +k means x LEADS y by k
    * (y is a delayed copy/echo of x); a peak at −k means y leads x.
    *
    * Scale shape: ONE ±maxLag explode of the x side (2K+1 rows per
    * observation, K ≪ series length), an equi-join on (keys, shifted
    * index) — co-partitioned, never a cross join — and one hash
    * aggregate keyed on (keys, lag) folding the raw-sums correlation
    * identity. Lags with < 2 matched points or zero variance yield
    * null r. Returns (keys…, lag, n, r). */
  def crossCorrelation(df: DataFrame, keys: Seq[String], idxCol: String,
                       xCol: String, yCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"crossCorrelation: maxLag must be >= 1, got $maxLag")
    val kc = keys.map(col)
    val base = df.na.drop(keys :+ idxCol)
    val xs = base.na.drop(Seq(xCol)).select(
      kc ++ Seq(col(idxCol).cast("long").as("__i"),
        col(xCol).cast("double").as("__x")): _*)
      .withColumn("__lag",
        explode(array((-maxLag to maxLag).map(lit): _*)))
    val ys = base.na.drop(Seq(yCol)).select(
      kc ++ Seq(col(idxCol).cast("long").as("__j"),
        col(yCol).cast("double").as("__y")): _*)
    val joined = xs.join(ys,
      (keys.map(c => xs(c) === ys(c)) :+
        ((col("__i") + col("__lag")) === col("__j"))).reduce(_ && _))
      .select(xs("*"), col("__y"))
    val agg = joined.groupBy(kc :+ col("__lag").as("lag"): _*)
      .agg(count(lit(1)).as("n"),
        sum("__x").as("__sx"), sum("__y").as("__sy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"),
        sum(col("__x") * col("__y")).as("__sxy"))
    val n = col("n").cast("double")
    val vx = n * col("__sxx") - col("__sx") * col("__sx")
    val vy = n * col("__syy") - col("__sy") * col("__sy")
    agg
      .withColumn("r",
        when(col("n") >= 2 && vx > 0 && vy > 0,
          (n * col("__sxy") - col("__sx") * col("__sy")) / sqrt(vx * vy)))
      .select(kc ++ Seq(col("lag"), col("n"), col("r")): _*)
  }

  /** Burst detection over a pre-bucketed rate series: per key, mark
    * buckets whose count exceeds `mult` × the key's MEAN rate, then
    * merge CONSECUTIVE flagged bucket indices into bursts with the
    * island trick (idx − row_number over flagged rows is constant
    * within a run). The mean threshold is deliberate — it is an exact
    * one-pass scalar an oracle replays; callers wanting robustness to
    * the bursts themselves inflating the baseline can pre-trim or feed
    * a reference-period mean. Input is one row per (keys, idxCol)
    * bucket with `cntCol` (build it upstream with the hour/day
    * truncation of your choice; zero-count buckets absent from the
    * input cannot split a run — document or densify upstream if the
    * series has holes).
    *
    * Scale shape: one key-keyed scalar aggregate (mean) broadcast-joined
    * back, one keyed row_number window over the FLAGGED subset, one
    * (keys, island) aggregate. Returns per burst: (keys…, start_idx,
    * end_idx, n_buckets, total, peak), ordered nowhere — callers sort.
    * Keys whose mean is 0 (all-zero counts) flag nothing. */
  def bursts(df: DataFrame, keys: Seq[String], idxCol: String,
             cntCol: String, mult: Double = 2.0): DataFrame = {
    require(mult > 0, s"bursts: mult must be > 0, got $mult")
    require(keys.nonEmpty, "bursts needs at least one key column")
    val kc = keys.map(col)
    val idx = col(idxCol).cast("long")
    val cnt = col(cntCol).cast("double")
    val base = df.na.drop(keys ++ Seq(idxCol, cntCol))
      .select(kc ++ Seq(idx.as("__i"), cnt.as("__c")): _*)
    // no broadcast hint: the means frame is one row per key, which for
    // user-grained keys can itself be huge — let AQE pick the strategy
    val means = base.groupBy(kc: _*).agg(avg("__c").as("__mu"))
    val flagged = base.join(means, keys)
      .filter(col("__c") > col("__mu") * mult)
    val w = Window.partitionBy(kc: _*).orderBy(col("__i"))
    flagged
      .withColumn("__island", col("__i") - row_number().over(w))
      .groupBy(kc :+ col("__island"): _*)
      .agg(min("__i").as("start_idx"), max("__i").as("end_idx"),
        count(lit(1)).as("n_buckets"), sum("__c").as("total"),
        max("__c").as("peak"))
      .drop("__island")
  }

  /** Holt linear (double-exponential) smoothing per key — EWMA plus a
    * trend the level recursion feeds on, for drifting metrics where a
    * single exponential lags systematically:
    *
    *   l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *
    * initialized l_1 = x_1, b_1 = 0 (trend is learned, not seeded from
    * x_2 − x_1 — one convention, replayable without a two-row
    * lookahead). Emits (keys…, tie, level, trend, forecast) per
    * observation, forecast = l_t + b_t = the one-step-ahead prediction.
    * Same shape as [[Rolling.ewma]]: one shuffle, shuffle-sorted group
    * iterators, O(1) state per key — the recursion streams, it never
    * buffers a key's history. Results replay bit-for-bit against a
    * RECURSIVE CTE applying the identical op order. */
  def holtLinear(df: DataFrame, keys: Seq[String], tsCol: String,
                 tieCol: String, valueCol: String, alpha: Double,
                 beta: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0,1]: $beta")
    require(keys.nonEmpty, "holtLinear needs at least one key column")
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
      StructField("level", DoubleType), StructField("trend", DoubleType)))
    val res = base.as(Encoders.row(base.schema))
      .groupByKey((r: Row) => r.getStruct(0))(Encoders.row(kType))
      .flatMapSortedGroups(col("__ts"), col("__tie")) {
        (k: Row, it: Iterator[Row]) =>
          var l = 0.0
          var b = 0.0
          var first = true
          it.map { r =>
            val v = r.getDouble(3)
            if (first) { first = false; l = v; b = 0.0 }
            else {
              val lNew = alpha * v + (1.0 - alpha) * (l + b)
              b = beta * (lNew - l) + (1.0 - beta) * b
              l = lNew
            }
            Row(k, r.getLong(2), l, b)
          }
      }(Encoders.row(outSchema))
    res.select(keys.map(k => col("__k").getField(k).as(k)) :+
      col("__tie").as(tieCol) :+ col("level") :+ col("trend") :+
      (col("level") + col("trend")).as("forecast"): _*)
  }

  /** Diurnal seasonality summary per key — how much of a metric's
    * variance the hour-of-day profile explains:
    *
    *   r² = 1 − SSE_within / SST,   SSE_within = Σ_h Σ_{t∈h} (x − x̄_h)²
    *
    * (the one-way-ANOVA variance-explained of the 24 hour-of-day
    * groups — ≈0 for hour-independent metrics, →1 when the hour alone
    * predicts the value), plus the peak and trough hours (argmax /
    * argmin of the hourly means, rounded to 6 decimals before the
    * argmax so hour choice is ulp-stable; ties take the earliest
    * hour). Both sums come from per-(key, hour) moment sums —
    * SSE_within = Σx² − Σ_h s_h²/n_h — so the whole thing is TWO
    * stacked hash aggregates on the key, no windows over events.
    * Constant series (SST = 0) yield null r². Output: (keys…, n,
    * r2_seasonal, peak_hour, trough_hour, peak_mean, trough_mean). */
  def seasonality(df: DataFrame, keys: Seq[String], tsCol: String,
                  valueCol: String): DataFrame = {
    require(keys.nonEmpty, "seasonality needs at least one key column")
    val kc = keys.map(col)
    val hour = ((unix_micros(col(tsCol)) / lit(3600000000L))
      .cast("long") % 24).cast("int")
    val perHour = df.na.drop(keys :+ tsCol :+ valueCol)
      .groupBy(kc :+ hour.as("__h"): _*)
      .agg(count(lit(1)).as("__n"),
        sum(col(valueCol).cast("double")).as("__s"),
        sum(col(valueCol).cast("double") * col(valueCol).cast("double"))
          .as("__ss"))
      .withColumn("__m", round(col("__s") / col("__n"), 6))
    val peakW = Window.partitionBy(kc: _*)
      .orderBy(col("__m").desc, col("__h"))
    val troughW = Window.partitionBy(kc: _*)
      .orderBy(col("__m").asc, col("__h"))
    val ranked = perHour
      .withColumn("__rp", row_number().over(peakW))
      .withColumn("__rt", row_number().over(troughW))
    val agg = ranked.groupBy(kc: _*)
      .agg(sum("__n").as("n"), sum("__s").as("__st"),
        sum("__ss").as("__sst"),
        sum(col("__s") * col("__s") / col("__n")).as("__between"),
        max(when(col("__rp") === 1, col("__h"))).as("peak_hour"),
        max(when(col("__rp") === 1, col("__m"))).as("peak_mean"),
        max(when(col("__rt") === 1, col("__h"))).as("trough_hour"),
        max(when(col("__rt") === 1, col("__m"))).as("trough_mean"))
    val sst = col("__sst") - col("__st") * col("__st") / col("n")
    val sse = col("__sst") - col("__between")
    agg.select(kc ++ Seq(col("n"),
      when(sst > 0.0, lit(1.0) - sse / sst).as("r2_seasonal"),
      col("peak_hour"), col("trough_hour"), col("peak_mean"),
      col("trough_mean")): _*)
  }

  /** Single change-point localization per key (the AMOC / binary-
    * segmentation step [[cusum]] alarms don't give you — WHERE did the
    * mean shift?): the split t maximizing the scaled mean-shift
    * statistic
    *
    *   G(t) = √(n_t · (N − n_t) / N) · |mean(x₁..t) − mean(x_{t+1}..N)|
    *
    * over every prefix/suffix split in (ts, tie) order. Returns the
    * best split per key: (keys…, n, split_tie, n_before, gain,
    * mean_before, mean_after) — the change STARTS at the row after
    * `split_tie`. Keys with < 2 observations are absent. `gain`
    * compares across engines under round(6); the argmax ranks on the
    * ROUNDED gain with the earliest split winning ties, so the chosen
    * split is ulp-stable too.
    *
    * Scale shape: one keyed window pass (running sum + count), one
    * keyed rank window, both on the same shuffle; the statistic never
    * materializes more than the series itself. Run [[cusum]] first to
    * find WHICH keys shifted, this to find WHERE. */
  def changePoint(df: DataFrame, keys: Seq[String], tsCol: String,
                  tieCol: String, valueCol: String): DataFrame = {
    require(keys.nonEmpty, "changePoint needs at least one key column")
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col("__tsu"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(kc: _*)
    val base = df.na.drop(keys :+ tsCol :+ tieCol :+ valueCol)
      .withColumn("__tsu", unix_micros(col(tsCol)))
      .withColumn("__x", col(valueCol).cast("double"))
      .withColumn("__nt", count(lit(1)).over(w))
      .withColumn("__st", sum("__x").over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__s", sum("__x").over(wAll))
      .filter(col("__nt") < col("__n")) // suffix must be non-empty
    val meanB = col("__st") / col("__nt")
    val meanA = (col("__s") - col("__st")) / (col("__n") - col("__nt"))
    val gain = sqrt(col("__nt") * (col("__n") - col("__nt")) /
      col("__n")) * abs(meanB - meanA)
    val rankW = Window.partitionBy(kc: _*)
      .orderBy(col("__g").desc, col("__tsu"), col(tieCol))
    base
      .withColumn("__g", round(gain, 6))
      .withColumn("__rk", row_number().over(rankW))
      .filter(col("__rk") === 1)
      .select(kc ++ Seq(col("__n").as("n"),
        col(tieCol).as("split_tie"), col("__nt").as("n_before"),
        col("__g").as("gain"), meanB.as("mean_before"),
        meanA.as("mean_after")): _*)
  }

  /** Burstiness per key: the Fano factor (index of dispersion) of
    * per-bucket event counts over the key's observed span —
    *
    *   F = Var(c) / Mean(c)     over buckets [min_bucket, max_bucket]
    *
    * (≈1 Poisson arrivals, ≫1 bursty, <1 regular/paced). EMPTY buckets
    * inside the span count as zeros — they are what makes a stream
    * bursty — but never materialize: N = max−min+1 buckets is span
    * arithmetic, and the zero buckets contribute nothing to Σc and
    * Σc², so mean = Σc/N and var = Σc²/N − mean² need only the
    * OCCUPIED bucket counts. Every input is an exact long (population
    * variance over integer counts), so the whole row replays
    * bit-for-bit in any engine. Keys spanning one bucket have
    * variance 0; fano is null when mean is 0 (cannot happen for keys
    * with events, kept for contract clarity).
    *
    * Scale shape: two stacked hash aggregates on the key (per-bucket
    * counts → per-key moments), no windows, no explode — the span can
    * be years of empty buckets for free. Output: (keys…, n_events,
    * n_buckets, occupied, mean, variance, fano). */
  def dispersion(df: DataFrame, keys: Seq[String], tsCol: String,
                 bucketUs: Long): DataFrame = {
    require(keys.nonEmpty, "dispersion needs at least one key column")
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val kc = keys.map(col)
    val bucket = expr(s"unix_micros(${tsCol}) div ${bucketUs}L")
    val perBucket = df.na.drop(keys :+ tsCol)
      .groupBy(kc :+ bucket.as("__b"): _*)
      .agg(count(lit(1)).as("__c"))
    val mean = col("n_events").cast("double") / col("n_buckets")
    perBucket.groupBy(kc: _*)
      .agg(sum("__c").as("n_events"),
        (max("__b") - min("__b") + 1).as("n_buckets"),
        count(lit(1)).as("occupied"),
        sum(col("__c") * col("__c")).as("__cc"))
      .select(kc ++ Seq(col("n_events"), col("n_buckets"),
        col("occupied"), mean.as("mean"),
        (col("__cc").cast("double") / col("n_buckets") - mean * mean)
          .as("variance")): _*)
      .withColumn("fano",
        when(col("mean") > 0.0, col("variance") / col("mean")))
  }

  /** Mann-Kendall trend test + Sen's slope per key — the
    * distribution-free "is this metric drifting" test for short
    * per-entity series (run it on RESAMPLED/aggregated series, not raw
    * event streams — the statistic is pairwise by construction):
    *
    *   S     = Σ_{i<j} sign(x_j − x_i)          (time order)
    *   VarS  = [n(n−1)(2n+5) − Σ_v t_v(t_v−1)(2t_v+5)] / 18
    *   z     = (S∓1)/√VarS  (continuity-corrected; 0 when S = 0,
    *            null when VarS = 0 — constant or single-point series)
    *   sen   = median of (x_j − x_i)/(t_j − t_i) over pairs with
    *            distinct timestamps (seconds; robust slope estimate)
    *
    * t_v are per-distinct-value tie counts. S, n, and the tie sums are
    * exact longs and VarS/z are fixed op chains over them, so those
    * columns replay bit-for-bit in any engine.
    *
    * `senEstimator` picks the median flavor: "interpolated" (the
    * classical Sen estimate — averages the two middle slopes on even
    * counts) or "lower" (the ⌈m/2⌉-th smallest slope, a Type-1 order
    * statistic). "lower" SELECTS an existing slope value instead of
    * manufacturing a new double, so the emitted number is a fixed op
    * chain over the inputs — the engine-portable choice for oracle
    * rows (an interpolated midpoint between two ulp-separated doubles
    * has no cross-engine bit contract; see the q_robust_mean lesson).
    *
    * Scale shape: ONE keyed shuffle; the pair frame is a within-key
    * rank self-join — O(Σ n_k²) pairs by construction, which is the
    * point of the `maxN` probe: any key longer than `maxN` observations
    * REFUSES (aggregate the series first — daily/hourly resample —
    * rather than raising the cap; MK on 10⁶ raw points is 10¹² pairs
    * of noise). */
  def mannKendall(df: DataFrame, keys: Seq[String], tsCol: String,
                  tieCol: String, valueCol: String,
                  maxN: Int = 10000,
                  senEstimator: String = "interpolated"): DataFrame = {
    require(keys.nonEmpty, "mannKendall needs at least one key column")
    require(maxN >= 2, s"maxN must be >= 2, got $maxN")
    require(Set("interpolated", "lower").contains(senEstimator),
      s"senEstimator must be 'interpolated' or 'lower', got $senEstimator")
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col("__tsu"), col(tieCol))
    val base = df.na.drop(keys :+ tsCol :+ tieCol :+ valueCol)
      .withColumn("__tsu", unix_micros(col(tsCol)))
      .withColumn("__x", col(valueCol).cast("double"))
      .withColumn("__rn", row_number().over(w))
      .select(kc ++ Seq(col("__tsu"), col("__x"), col("__rn")): _*)
      .cache() // consumed by the probe, the pair join (twice), and ties
    val longest = base.groupBy(kc: _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(max("__n"), lit(0L)).as("m")).head().getLong(0)
    require(longest <= maxN,
      s"mannKendall is pairwise (O(n²) per key) and refuses keys longer " +
        s"than maxN=$maxN observations (longest here: $longest). " +
        s"Aggregate the series first (Rolling.resample / a time-bucket " +
        s"groupBy), or raise maxN deliberately.")
    val a = base.select(kc ++ Seq(col("__tsu").as("__ta"),
      col("__x").as("__xa"), col("__rn").as("__ra")): _*)
    val b = base.select(kc ++ Seq(col("__tsu").as("__tb"),
      col("__x").as("__xb"), col("__rn").as("__rb")): _*)
    val pairs = a.join(b, keys).filter(col("__ra") < col("__rb"))
    val sAgg = pairs.groupBy(kc: _*).agg(
      sum(when(col("__xb") > col("__xa"), 1L)
        .when(col("__xb") < col("__xa"), -1L).otherwise(0L)).as("s"))
    val slopes = pairs.filter(col("__tb") =!= col("__ta"))
      .select(kc ++ Seq(((col("__xb") - col("__xa")) /
        ((col("__tb") - col("__ta")).cast("double") / 1e6))
        .as("__slope")): _*)
    val senAgg = senEstimator match {
      case "interpolated" =>
        slopes.groupBy(kc: _*)
          .agg(graft.expr.ExactPercentile.of(col("__slope"), Seq(0.5))
            .getItem(0).as("sen_slope"))
      case "lower" =>
        // Type-1 pick: the value at sorted position ⌈m/2⌉ — tie order
        // within equal slopes is irrelevant to the SELECTED value, so
        // the keyed window needs no further tie-break columns
        slopes
          .withColumn("__srn", row_number().over(
            Window.partitionBy(kc: _*).orderBy(col("__slope"))))
          .withColumn("__m", count(lit(1)).over(Window.partitionBy(kc: _*)))
          .filter(col("__srn") === expr("(__m + 1) div 2"))
          .select(kc :+ col("__slope").as("sen_slope"): _*)
    }
    val ties = base.groupBy(kc :+ col("__x"): _*)
      .agg(count(lit(1)).as("__t"))
      .groupBy(kc: _*)
      .agg(count(lit(1)).as("__nv"),
        sum(col("__t") * (col("__t") - 1) * (col("__t") * 2 + 5))
          .as("__tsum"),
        sum("__t").as("n"))
    val varS = ((col("n") * (col("n") - 1) * (col("n") * 2 + 5) -
      col("__tsum")).cast("double") / 18.0).as("var_s")
    val z = when(col("var_s") > 0.0,
      when(col("s") > 0, (col("s") - 1).cast("double") / sqrt(col("var_s")))
        .when(col("s") < 0,
          (col("s") + 1).cast("double") / sqrt(col("var_s")))
        .otherwise(lit(0.0)))
    // left joins: single-observation keys have no pairs — s
    // coalesces to 0, sen_slope stays null, varS = 0 nulls z
    ties.join(sAgg, keys, "left").join(senAgg, keys, "left")
      .select(kc ++ Seq(col("n"), coalesce(col("s"), lit(0L)).as("s"),
        varS, col("sen_slope")): _*)
      .withColumn("z", z)
      .select(kc ++ Seq(col("n"), col("s"), col("var_s"), col("z"),
        col("sen_slope")): _*)
  }

  /** Durbin-Watson autocorrelation-of-residuals statistic per key: fit
    * y ~ time by per-key OLS (closed form), then
    *
    *   DW = Σ_{t≥2} (e_t − e_{t−1})² / Σ_t e_t²   ∈ [0, 4]
    *
    * over the time-ordered residuals — ≈2 means uncorrelated residuals,
    * →0 positive serial correlation (the trend-line fit is lying about
    * independence), →4 negative. Time enters the regression as SECONDS
    * from the key's first event (min-centered in exact long micros
    * before the double divide — raw epoch-micros x would put ~1e30 in
    * the x² sums and cancel catastrophically). Output: (keys…, n, dw);
    * keys with < 2 events or a degenerate fit (zero x- or residual
    * variance) yield null dw.
    *
    * Scale shape: one shuffle on the key; the min-center window, the
    * OLS sums aggregate, the residual join-back (AQE broadcasts the
    * per-key coefficient frame), the lag window, and the final
    * aggregate all run on that one keyed partitioning. */
  def durbinWatson(df: DataFrame, keys: Seq[String], tsCol: String,
                   tieCol: String, valueCol: String): DataFrame = {
    require(keys.nonEmpty, "durbinWatson needs at least one key column")
    val kc = keys.map(col)
    val wAll = Window.partitionBy(kc: _*)
    val w = Window.partitionBy(kc: _*).orderBy(col("__xc"), col(tieCol))
    val base = df.na.drop(keys :+ tsCol :+ tieCol :+ valueCol)
      .withColumn("__tsu", unix_micros(col(tsCol)))
      .withColumn("__xc",
        ((col("__tsu") - min("__tsu").over(wAll)).cast("double") / 1e6))
      .withColumn("__y", col(valueCol).cast("double"))
    val sums = base.groupBy(kc: _*).agg(
      count(lit(1)).as("__n"), sum("__xc").as("__sx"),
      sum("__y").as("__sy"),
      sum(col("__xc") * col("__y")).as("__sxy"),
      sum(col("__xc") * col("__xc")).as("__sxx"))
    val slope = (col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
      nullif(col("__n") * col("__sxx") - col("__sx") * col("__sx"),
        lit(0.0))
    val coefs = sums.select(kc ++ Seq(col("__n"), slope.as("__slope"),
      ((col("__sy") - slope * col("__sx")) / col("__n"))
        .as("__icept")): _*)
    val resid = base.join(coefs, keys)
      .withColumn("__e",
        col("__y") - (col("__icept") + col("__slope") * col("__xc")))
      .withColumn("__ep", lag("__e", 1).over(w))
    resid.groupBy(kc: _*).agg(
      count(lit(1)).as("n"),
      (sum((col("__e") - col("__ep")) * (col("__e") - col("__ep"))) /
        nullif(sum(col("__e") * col("__e")), lit(0.0))).as("dw"))
  }
}
