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

  /** Per-window heavy-hitter CANDIDATES on a stream: the windowed face of
    * [[graft.expr.MisraGries]]. State per window is the O(k) sketch (the
    * aggregation buffer lives in the state store and merges across
    * micro-batches — MG is a mergeable summary, so the bound holds no
    * matter how arrivals split into batches). Emits
    * (window, candidates: array<struct<item,cnt>>); counts are lower
    * bounds within n_window/(k+1), and candidates cover every item above
    * that bound. For exact counts, recount the emitted candidates against
    * the archived window — the batch [[graft.agg.Frequency.heavyHitters]]
    * recipe; a stream cannot replay its own past, so exactness needs the
    * second (batch) pass by construction. */
  def windowedHeavyHitters(stream: DataFrame, tsCol: String, valueCol: String,
                           k: Int, windowDur: String = "1 hour",
                           watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur))
      .agg(graft.expr.MisraGries.of(col(valueCol), k).as("candidates"))

  /** Per-window approximate quantiles on a stream, via the mergeable
    * [[graft.expr.HistCounts]] histogram sketch: the aggregation buffer
    * (bins+2 longs) lives in the state store and merges exactly across
    * micro-batches — the streaming quantile path GK cannot provide (GK
    * summaries are not mergeable, so Spark refuses approx_percentile in
    * an incremental aggregation). Emits per window: n (in-range rows),
    * below/above out-of-range tallies, and `quantiles` aligned with
    * `ps`, each within 2·cell-width of the window's exact type-7
    * quantile ([[graft.agg.CountHist]]'s bound — widen [lo, hi] or
    * raise `bins` to tighten). State per open window is bins+2 longs,
    * independent of arrival count. */
  def windowedQuantiles(stream: DataFrame, tsCol: String, valueCol: String,
                        lo: Double, hi: Double, bins: Int,
                        ps: Seq[Double] = Seq(0.5, 0.95, 0.99),
                        windowDur: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur))
      .agg(graft.expr.HistCounts.of(col(valueCol), lo, hi, bins).as("__h"))
      .select(col("window"),
        aggregate(col("__h.counts"), lit(0L), _ + _).as("n"),
        col("__h.below").as("below"), col("__h.above").as("above"),
        graft.agg.CountHist.quantilesOf(col("__h.counts"), lo, hi, bins, ps)
          .as("quantiles"))

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

  final case class ZRow(key: String, ts: Long, tie: Long, value: Double)
  final case class ZOut(key: String, ts: Long, tie: Long, value: Double,
                        z: Option[Double], isAnomaly: Boolean)

  /** STREAMING anomaly flags against each key's ENTIRE history: every
    * event scores z = (x − mean)/stddev of the key's Welford state
    * BEFORE the event folds in (a burst can't mask itself), then updates
    * the state — the history-baseline sibling of
    * [[graft.events.Rolling.rollingZscore]]'s trailing window. z is None
    * (flag false) until a key has >= 2 prior events with variance; state
    * is O(1) per key. In-batch rows apply in (ts, tie) order; arrival
    * order stands in for event time across batches, like
    * [[streamingLocf]]/[[streamingEwma]]. */
  def streamingZscore(stream: Dataset[ZRow],
                      threshold: Double = 3.0): Dataset[ZOut] = {
    require(threshold > 0.0, s"threshold must be positive: $threshold")
    val spark = stream.sparkSession
    import spark.implicits._
    stream.groupByKey(_.key)
      .flatMapGroupsWithState[RunningState, ZOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[ZRow],
         state: GroupState[RunningState]) =>
          var s = state.getOption.getOrElse(RunningState(0L, 0.0, 0.0))
          val out = rows.toArray.sortBy(r => (r.ts, r.tie)).map { r =>
            val sd = if (s.n > 1) math.sqrt(s.m2 / (s.n - 1)) else 0.0
            val z = if (s.n >= 2 && sd > 0.0) Some((r.value - s.mean) / sd)
                    else None
            val n1 = s.n + 1
            val d = r.value - s.mean
            val mean = s.mean + d / n1
            s = RunningState(n1, mean, s.m2 + d * (r.value - mean))
            ZOut(key, r.ts, r.tie, r.value, z,
              z.exists(v => math.abs(v) > threshold))
          }
          state.update(s)
          out.iterator
      }
  }

  /** Per-key CountHist sketch state for [[streamingRobustZscore]] —
    * bins+2 longs regardless of arrival count. */
  final case class RobustState(lo: Double, hi: Double,
                               below: Long, above: Long,
                               counts: Array[Long])

  /** One emitted robust score: the key's pre-update sketch median/IQR
    * and the 0.7413·IQR-scaled z. */
  final case class RobustZOut(key: String, ts: Long, tie: Long,
                              value: Double, median: Option[Double],
                              iqr: Option[Double], z: Option[Double],
                              isAnomaly: Boolean)

  /** STREAMING robust anomaly flags against each key's ENTIRE history —
    * the median/IQR sibling of [[streamingZscore]] (one earlier burst
    * inflates a Welford stddev baseline and MASKS the next; quartiles
    * shrug it off) and the streaming face of
    * [[graft.events.Rolling.rollingRobustZscoreSketch]]: each event
    * scores robust_z = (x − median)/(0.7413·IQR) from the key's
    * CountHist sketch BEFORE folding in, with the same n ≥ 4 +
    * positive-IQR gate and the 2·cellWidth-per-quantile estimate bound
    * as the batch tiers. State per key is bins+2 longs — bounded by key
    * cardinality, never by volume. Out-of-range values ARE scored —
    * against the pre-update in-range baseline, which is exactly what a
    * caller wants (a value outside the sketch's domain is the most
    * anomalous kind) — and then update only the below/above tallies;
    * size [lo, hi] to the NORMAL value domain. NaN inputs score None
    * (isAnomaly false) and leave the sketch untouched. In-batch rows
    * apply in (ts, tie) order; arrival order stands in for event time
    * across batches, like [[streamingZscore]]. */
  def streamingRobustZscore(stream: Dataset[ZRow], lo: Double, hi: Double,
                            bins: Int, threshold: Double = 3.5)
      : Dataset[RobustZOut] = {
    require(bins > 0 && lo < hi,
      s"streamingRobustZscore: need bins > 0 and lo < hi ([$lo,$hi]×$bins)")
    require(threshold > 0.0, s"threshold must be positive: $threshold")
    val spark = stream.sparkSession
    import spark.implicits._
    stream.groupByKey(_.key)
      .flatMapGroupsWithState[RobustState, RobustZOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[ZRow],
         state: GroupState[RobustState]) =>
          val s = state.getOption.getOrElse(
            RobustState(lo, hi, 0L, 0L, new Array[Long](bins)))
          // work on a Sketch view of the state (shared counts array)
          val sk = new graft.agg.CountHist.Sketch(s.lo, s.hi,
            s.counts.length)
          java.lang.System.arraycopy(s.counts, 0, sk.counts, 0,
            s.counts.length)
          sk.below = s.below; sk.above = s.above
          val out = rows.toArray.sortBy(r => (r.ts, r.tie)).map { r =>
            val n = sk.n
            val (med, iqr) =
              if (n >= 1) {
                val m = sk.quantile(0.5)
                val i = sk.quantile(0.75) - sk.quantile(0.25)
                (Some(m), Some(i))
              } else (None, None)
            val z =
              if (n >= 4 && iqr.exists(_ > 0.0) && !r.value.isNaN)
                Some((r.value - med.get) / (0.7413 * iqr.get))
              else None
            if (!r.value.isNaN) sk.add(r.value)
            RobustZOut(key, r.ts, r.tie, r.value, med, iqr, z,
              z.exists(v => math.abs(v) > threshold))
          }
          state.update(RobustState(s.lo, s.hi, sk.below, sk.above,
            sk.counts))
          out.iterator
      }
  }

  /** Sliding (overlapping) event-time windows — the streaming mirror of
    * `events.Rolling.rollingAggCoarse`: every event lands in
    * window/slide overlapping buckets, so each emitted row is the count/
    * sum over one trailing `windowDur` interval at `slideDur` granularity.
    * Native windowed aggregation: watermark-bounded state, partial/final
    * aggregates, no custom state store. */
  def slidingCounts(stream: DataFrame, tsCol: String, keyCol: String,
                    valueCol: String, windowDur: String = "1 hour",
                    slideDur: String = "5 minutes",
                    watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur, slideDur), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("value_sum"))

  /** Per-event trailing-window state for [[trailingCounts]]: the recent
    * event timestamps still inside the horizon, ascending. */
  final case class TrailState(times: List[Long])

  /** One emitted update: the key's event at `ts` and the count of its
    * events in `(ts − windowSec, ts]`. */
  final case class TrailCount(key: String, ts: Long, nWin: Long)

  /** EXACT per-event trailing-interval counts on a stream — the true
    * streaming analog of `events.Rolling.rollingAgg` (the native sliding
    * window above only gives bucket granularity): explicit per-key state
    * holds the timestamps still inside the horizon; each event prunes the
    * expired prefix and emits its own trailing count. State is bounded by
    * `maxState` timestamps per key (rate cap — beyond it the oldest are
    * dropped, degrading gracefully to a floor count). Within a
    * micro-batch events are processed in timestamp order, so replays and
    * batch boundaries produce identical counts. */
  def trailingCounts(stream: Dataset[(String, Long)], windowSec: Long,
                     maxState: Int = 10000): Dataset[TrailCount] = {
    require(windowSec >= 1, s"trailingCounts needs windowSec >= 1")
    val spark = stream.sparkSession
    import spark.implicits._
    stream.groupByKey(_._1)
      .flatMapGroupsWithState[TrailState, TrailCount](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)],
         state: GroupState[TrailState]) =>
          var times = state.getOption.map(_.times).getOrElse(Nil)
          val out = rows.map(_._2).toArray.sorted.map { ts =>
            // keep the state ascending even under cross-batch late data
            val (older, newer) = times.partition(_ <= ts)
            times = older ::: ts :: newer
            // prune relative to the NEWEST timestamp (watermark-like: a
            // late event is counted against surviving state only)
            val horizon = times.last - windowSec
            times = times.dropWhile(_ <= horizon)
            if (times.length > maxState) times = times.takeRight(maxState)
            TrailCount(key, ts, times.count(t => t > ts - windowSec && t <= ts))
          }
          state.update(TrailState(times))
          out.iterator
      }
  }

  /** Streaming drift monitor: per-event-time-window Population Stability
    * Index of `valueCol` against a FROZEN reference distribution (fit the
    * reference once with `Stats.psi`'s conventions — `lo`, `width`,
    * `refShares.length` bins — and pass its bin shares here). Each
    * window's PSI answers "has this feature drifted from the training
    * snapshot in the last N minutes?" — alert on the 0.1/0.25 rules.
    *
    * One stateful aggregation only (chained streaming aggs need append
    * mode gymnastics): the per-bin counts are conditional sums inside a
    * single windowed groupBy — bins are static (`refShares.length`), so
    * the aggregate emits one count column per bin and a stateless
    * projection folds them into the PSI sum against the literal
    * reference shares. State is O(windows × 1 row); any volume. */
  def streamingPsi(stream: DataFrame, tsCol: String, valueCol: String,
                   lo: Double, width: Double, refShares: Array[Double],
                   windowDur: String = "10 minutes",
                   watermark: String = "1 hour",
                   eps: Double = 1e-6): DataFrame = {
    require(refShares.nonEmpty, "streamingPsi needs reference bin shares")
    require(width > 0, s"streamingPsi needs width > 0, got $width")
    val bins = refShares.length
    val bin = least(greatest(
      floor((col(valueCol).cast("double") - lo) / width), lit(0L)),
      lit(bins - 1L))
    val binCounts = (0 until bins).map(b =>
      sum(when(bin === b, 1L).otherwise(0L)).as(s"__b$b"))
    val agg = stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur))
      .agg(binCounts.head, binCounts.tail :+ count(lit(1)).as("n"): _*)
    val total = greatest(col("n").cast("double"), lit(1.0))
    val psiTerms = (0 until bins).map { b =>
      val p = lit(math.max(refShares(b), eps))
      val s = greatest(col(s"__b$b").cast("double") / total, lit(eps))
      (s - p) * log(s / p)
    }
    agg.select(col("window"), psiTerms.reduce(_ + _).as("psi"), col("n"))
  }

  /** Frozen reference for [[streamingScoreDrift]]: the trained
    * classifier's score distribution over the training-time corpus as
    * `bins` equal-width shares on [0, 1] (score 1.0 clamps into the top
    * bin — same binning as the stream side). One batch aggregation. */
  def scoreShares(df: DataFrame, featuresCol: String,
                  weights: Array[Double], bins: Int = 10): Array[Double] = {
    require(bins >= 1, s"scoreShares needs bins >= 1, got $bins")
    val score = graft.pipeline.Classify.scoreColumn(col(featuresCol), weights)
    val bin = least(floor(score * bins), lit(bins - 1)).cast("int")
    val counts = df.na.drop(Seq(featuresCol))
      .groupBy(bin.as("__b")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = math.max(counts.values.sum, 1L).toDouble
    Array.tabulate(bins)(b => counts.getOrElse(b, 0L) / total)
  }

  /** Classifier score drift on a stream: scores each row with the
    * frozen model ([[graft.pipeline.Classify.scoreColumn]] — a pure
    * projection, stream-legal) and runs [[streamingPsi]] over the score
    * distribution against the training-time [[scoreShares]] reference.
    * The "has the corpus shifted under my quality classifier" monitor:
    * a drifting PSI says the scorer now sees inputs it wasn't
    * calibrated for, BEFORE downstream keep rates move. Same state
    * bound as streamingPsi: one windowed aggregation, O(windows) rows. */
  def streamingScoreDrift(stream: DataFrame, tsCol: String,
                          featuresCol: String, weights: Array[Double],
                          refShares: Array[Double],
                          windowDur: String = "10 minutes",
                          watermark: String = "1 hour"): DataFrame = {
    val scored = stream.withColumn("__graft_score",
      graft.pipeline.Classify.scoreColumn(col(featuresCol), weights))
    streamingPsi(scored, tsCol, "__graft_score",
      lo = 0.0, width = 1.0 / refShares.length, refShares,
      windowDur, watermark)
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

  final case class EwmaState(e: Double, has: Boolean)
  final case class EwmaRow(key: String, ts: Long, tie: Long, value: Double)
  final case class EwmaOut(key: String, ts: Long, tie: Long, ewma: Double)

  /** STREAMING per-key EWMA — the continuous face of
    * [[graft.events.Rolling.ewma]]: one double of state per key carries
    * the smoothed value across micro-batches; rows inside a batch apply
    * in (ts, tie) order. Same caveat as [[streamingLocf]]: arrival order
    * stands in for event time ACROSS batches (a late row in a later
    * batch folds in at its arrival position) — exact whenever the source
    * delivers per-key ordered data, which the batch-parity spec pins. */
  def streamingEwma(stream: Dataset[EwmaRow], alpha: Double)
      : Dataset[EwmaOut] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    val spark = stream.sparkSession
    import spark.implicits._
    stream.groupByKey(_.key)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[EwmaRow],
         state: GroupState[EwmaState]) =>
          var st = state.getOption.getOrElse(EwmaState(0.0, has = false))
          val out = rows.toArray.sortBy(r => (r.ts, r.tie)).map { r =>
            st = if (st.has) EwmaState(alpha * r.value + (1.0 - alpha) * st.e,
              has = true)
            else EwmaState(r.value, has = true)
            EwmaOut(key, r.ts, r.tie, st.e)
          }
          state.update(st)
          out.iterator
      }
  }

  final case class HoltState(l: Double, b: Double, has: Boolean)
  final case class HoltOut(key: String, ts: Long, tie: Long,
                           level: Double, trend: Double, forecast: Double)

  /** STREAMING Holt linear smoothing — the continuous face of
    * [[graft.events.TimeSeries.holtLinear]]: two doubles of state per
    * key (level + trend) carry across micro-batches; rows inside a
    * batch apply in (ts, tie) order with the IDENTICAL op order as the
    * batch recursion (level from l+b, trend from the recomputed level),
    * so a single-batch run is bit-exact against it (batch-parity
    * spec-pinned). Same arrival-order caveat as [[streamingEwma]]. */
  def streamingHolt(stream: Dataset[EwmaRow], alpha: Double, beta: Double)
      : Dataset[HoltOut] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0,1]: $beta")
    val spark = stream.sparkSession
    import spark.implicits._
    stream.groupByKey(_.key)
      .flatMapGroupsWithState[HoltState, HoltOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[EwmaRow],
         state: GroupState[HoltState]) =>
          var st = state.getOption.getOrElse(HoltState(0.0, 0.0, has = false))
          val out = rows.toArray.sortBy(r => (r.ts, r.tie)).map { r =>
            st = if (st.has) {
              val lNew = alpha * r.value + (1.0 - alpha) * (st.l + st.b)
              HoltState(lNew,
                beta * (lNew - st.l) + (1.0 - beta) * st.b, has = true)
            } else HoltState(r.value, 0.0, has = true)
            HoltOut(key, r.ts, r.tie, st.l, st.b, st.l + st.b)
          }
          state.update(st)
          out.iterator
      }
  }

  final case class CusumState(hi: Double, lo: Double)
  final case class CusumOut(key: String, ts: Long, tie: Long,
                            value: Double, cusumHi: Double,
                            cusumLo: Double, alarm: Boolean)

  /** STREAMING two-sided CUSUM — the continuous face of
    * [[graft.events.TimeSeries.cusum]]: two doubles of state per key
    * (the high/low one-sided sums) carry across micro-batches; rows
    * inside a batch apply in (ts, tie) order with the identical
    * max(0, ·) op order, so a single-batch run is bit-exact against
    * the batch recursion (parity spec-pinned). Same arrival-order
    * caveat as [[streamingEwma]]. */
  def streamingCusum(stream: Dataset[EwmaRow], target: Double,
                     slack: Double, h: Double): Dataset[CusumOut] = {
    require(slack >= 0 && h > 0, s"need slack >= 0 and h > 0: $slack, $h")
    val spark = stream.sparkSession
    import spark.implicits._
    stream.groupByKey(_.key)
      .flatMapGroupsWithState[CusumState, CusumOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[EwmaRow],
         state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(0.0, 0.0))
          val out = rows.toArray.sortBy(r => (r.ts, r.tie)).map { r =>
            st = CusumState(
              math.max(0.0, st.hi + (r.value - target - slack)),
              math.max(0.0, st.lo + (target - slack - r.value)))
            CusumOut(key, r.ts, r.tie, r.value, st.hi, st.lo,
              st.hi > h || st.lo > h)
          }
          state.update(st)
          out.iterator
      }
  }

  final case class LocfCarry(value: Double, has: Boolean)
  final case class LocfRow(key: String, ts: Long, tie: Long,
                           value: Option[Double])

  /** Streaming LOCF — the continuous mirror of
    * [[graft.events.Rolling.locfFill]]: per key, null values take the
    * last non-null value seen, with the carry PERSISTING across
    * micro-batches (one Double + flag per key — bounded state). Rows
    * within a batch are processed in (ts, tie) order, so intra-batch
    * fills match the batch operator exactly; ACROSS batches arrival
    * order stands in for event time (a late row older than the carry
    * still takes the current carry) — the standard streaming
    * approximation, spec-pinned, exact whenever the source delivers
    * per-key ordered data. */
  final case class DebounceState(lastKeptUs: Long, has: Boolean)
  final case class DebounceRow(key: String, ts: Long, tie: Long)

  /** Streaming TRUE debounce — the last-SURVIVOR variant the batch
    * [[graft.events.Engagement.debounce]] deliberately does not offer
    * (it is inherently sequential, which is exactly what per-key
    * streaming state is for): an event survives iff it is ≥ `minGapUs`
    * after the last KEPT event of its key, so a burst collapses to its
    * first event no matter how long it lasts (the predecessor-gap
    * batch form re-admits a burst's later events once intra-burst gaps
    * shrink below the threshold — different, documented semantics).
    * One Long + flag of state per key; rows inside a batch apply in
    * (ts, tie) order; the same arrival-order-across-batches caveat as
    * [[streamingLocf]], exact on per-key ordered sources. */
  def streamingDebounce(stream: Dataset[DebounceRow], minGapUs: Long)
      : Dataset[DebounceRow] = {
    require(minGapUs >= 0, s"minGapUs must be >= 0, got $minGapUs")
    val spark = stream.sparkSession
    import spark.implicits._
    stream.groupByKey(_.key)
      .flatMapGroupsWithState[DebounceState, DebounceRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[DebounceRow],
         state: GroupState[DebounceState]) =>
          var st = state.getOption.getOrElse(DebounceState(0L, has = false))
          val out = rows.toArray.sortBy(r => (r.ts, r.tie)).flatMap { r =>
            if (!st.has || r.ts - st.lastKeptUs >= minGapUs) {
              st = DebounceState(r.ts, has = true)
              Some(r)
            } else None
          }
          state.update(st)
          out.iterator
      }
  }

  def streamingLocf(stream: Dataset[LocfRow]): Dataset[LocfRow] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.groupByKey(_.key)
      .flatMapGroupsWithState[LocfCarry, LocfRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[LocfRow],
         state: GroupState[LocfCarry]) =>
          var carry = state.getOption.getOrElse(LocfCarry(0.0, has = false))
          val out = rows.toArray.sortBy(r => (r.ts, r.tie)).map { r =>
            r.value match {
              case Some(v) =>
                carry = LocfCarry(v, has = true)
                r
              case None =>
                if (carry.has) r.copy(value = Some(carry.value)) else r
            }
          }
          state.update(carry)
          out.iterator
      }
  }
}
