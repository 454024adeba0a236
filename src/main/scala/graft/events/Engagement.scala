package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Audience/engagement reach metrics over an event stream: cumulative
  * distinct users (total reach to date) and trailing-window active
  * users (the DAU/WAU/MAU family) — both computed through exact
  * first-occurrence / bounded-explode plans, never a sliding
  * COUNT(DISTINCT) window (which no engine can decompose exactly).
  */
object Engagement {

  /** Cumulative distinct-user reach per day: (day, new_users,
    * cum_users) for every day with ≥1 FIRST-seen user. The exact trick:
    * cumulative distinct at day d = count of users whose FIRST activity
    * is ≤ d — so fold to one row per user (min day), count per day,
    * running-sum over the bounded distinct-day frame.
    *
    * Scale shape: one user-keyed aggregate (the only corpus shuffle),
    * one day-keyed count, one running sum over distinct days (the
    * "window over distinct values" shape — bounded by calendar days,
    * not rows or users). */
  def cumulativeReach(df: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val firstDay = df.na.drop(Seq(userCol, tsCol))
      .groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("day"))
    val perDay = firstDay.groupBy("day")
      .agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDay.withColumn("cum_users", sum("new_users").over(w))
      .orderBy("day")
  }

  /** Trailing-window active users: for every day in the observed span,
    * how many distinct users were active in the `windowDays` days
    * ending that day (windowDays = 1 → DAU, 7 → WAU, 28/30 → MAU).
    * Days with zero trailing actives inside the span are emitted with
    * 0 (a gap IS the signal a reach dashboard exists to show).
    *
    * Exact without a sliding distinct: distinct (user, active-day)
    * pairs each contribute to the `windowDays` window-end days
    * [day, day+windowDays-1]; distinct (user, window-end) then counts
    * each user once per window. The explode factor is windowDays —
    * bounded and chosen by the caller, the classic exact-MAU plan.
    *
    * Scale shape: one distinct on (user, day) — day-granular, far
    * smaller than events — a ×windowDays explode of that, a second
    * distinct, one count aggregate, and a broadcast-range join to
    * complete zero days. */
  def rollingActive(df: DataFrame, userCol: String, tsCol: String,
                    windowDays: Int): DataFrame = {
    require(windowDays >= 1 && windowDays <= 366,
      s"windowDays must be in [1, 366], got $windowDays")
    // cached: BOTH the contribution explode and the span scalar read this
    // frame — uncached, the events scan + distinct shuffle would run twice.
    // Day-granular (users × active-days), far smaller than the event log.
    val userDays = df.na.drop(Seq(userCol, tsCol))
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"))
      .distinct()
      .cache()
    val contrib = userDays
      .select(col("__u"), explode(sequence(col("__d"),
        date_add(col("__d"), windowDays - 1))).as("day"))
      .distinct()
    val counts = contrib.groupBy("day")
      .agg(count(lit(1)).as("active_users"))
    // complete the span [min day, max day] so gap days report 0; the
    // span frame is two scalars exploded — broadcast-sized
    val span = userDays.agg(min("__d").as("__lo"), max("__d").as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"))).as("day"))
    span.join(counts, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("active_users"), lit(0L)).as("active_users"))
      .orderBy("day")
  }

  /** Throttle/debounce an event stream: drop every event closer than
    * `minGapUs` microseconds to its per-key PREDECESSOR event (kept or
    * not) — the stateless-window form used to collapse double-clicks
    * and sensor chatter. Note the semantics: gaps are measured against
    * the raw predecessor, not the last survivor (the last-survivor
    * variant is inherently sequential; for that, sessionize and keep
    * session heads). First event per key always survives.
    *
    * Scale shape: one keyed window (lag), one filter — a single
    * shuffle on the key. */
  def debounce(df: DataFrame, keyCols: Seq[String], tsCol: String,
               tieCol: String, minGapUs: Long): DataFrame = {
    require(keyCols.nonEmpty, "debounce needs key columns")
    require(minGapUs >= 0, s"minGapUs must be >= 0, got $minGapUs")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__tsu"), col(tieCol))
    df.na.drop(keyCols :+ tsCol)
      .withColumn("__tsu", unix_micros(col(tsCol)))
      .withColumn("__prev", lag("__tsu", 1).over(w))
      .filter(col("__prev").isNull ||
        col("__tsu") - col("__prev") >= minGapUs)
      .drop("__tsu", "__prev")
  }
}
