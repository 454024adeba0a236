package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event stream — the product
  * question "of the users who did A, how many went on to do B, then C,
  * within a window?".
  *
  * Matching semantics (deterministic, oracle-replayable as chained
  * min-joins): the funnel is ANCHORED at each user's FIRST step-0 event;
  * step i (i ≥ 1) completes at the EARLIEST step-i event STRICTLY after
  * step i−1's time with `ts − anchor ≤ window` (the whole funnel must fit
  * inside `window` of the anchor, in `tsCol`'s unit). Greedy
  * earliest-after-previous is exactly the chained `min(ts) WHERE
  * ts > t_prev` definition, so a SQL oracle can replay it join-for-join.
  * Later anchor choices that might complete when the first one cannot are
  * deliberately NOT searched — first-touch attribution, the standard
  * product-analytics semantics.
  *
  * Scale shape: the scan is filtered to the step types (predicate pushed
  * to the source), then ONE shuffle on the user key; each user's step
  * events are folded in a single JVM pass (running minima per step — no
  * sort, no per-user quadratic work). Memory per group is that user's
  * step-typed event times only. The K-chained-join formulation a SQL
  * engine would run costs K shuffles of the event table; this is one.
  */
object Funnel {

  /** One row per user holding the step completion times
    * `t0 .. t{k−1}` (nullable longs, `tsCol`'s unit) — null from the
    * first uncompleted step onward. Users with no step-0 event emit no
    * row. `tsCol` must be numeric (cast timestamps to epoch first). */
  def funnelTimes(df: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, steps: Seq[String],
                  window: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    require(window > 0, s"window must be positive, got $window")
    val spark = df.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val k = steps.size
    val typed = df
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isin(steps: _*))
      .select(col(userCol).cast("long"), col(typeCol),
        col(tsCol).cast("long"))
      .as[(Long, String, Long)]
    typed.groupByKey(_._1).flatMapGroups { (user, it) =>
      // running minimum per step under the greedy constraints needs the
      // full per-step candidate lists only for steps > 0 (a step's cutoff
      // depends on the previous step's final time) — keep per-step sorted
      // insertion cost out by collecting then scanning mins per step
      val times = Array.fill(k)(scala.collection.mutable.ArrayBuffer.empty[Long])
      it.foreach { case (_, tpe, ts) => times(stepIdx(tpe)) += ts }
      if (times(0).isEmpty) Iterator.empty
      else {
        val out = new Array[java.lang.Long](k)
        val anchor = times(0).min
        out(0) = anchor
        var i = 1
        var prev = anchor
        var alive = true
        while (i < k && alive) {
          var best = Long.MaxValue
          times(i).foreach { t =>
            if (t > prev && t - anchor <= window && t < best) best = t
          }
          if (best == Long.MaxValue) alive = false
          else { out(i) = best; prev = best }
          i += 1
        }
        Iterator.single((user, out))
      }
    }.toDF(userCol, "__ts")
      .select(col(userCol) +:
        (0 until k).map(i => col("__ts")(i).as(s"t$i")): _*)
  }

  /** The funnel report: one row per step with `step` (0-based), the step
    * name, `n_users` reaching it, and `conversion` = n_users / step-0
    * users (NaN-free: step 0's own conversion is 1.0; an empty funnel
    * yields k rows of zero users with null conversion). One extra
    * single-row aggregate over [[funnelTimes]] unpivoted driver-side —
    * the report is k values, never data-sized. */
  def report(df: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String], window: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val times = funnelTimes(df, userCol, typeCol, tsCol, steps, window)
    val counts = times.agg(
      count(col("t0")).as("c0"),
      (1 until steps.size).map(i => count(col(s"t$i")).as(s"c$i")): _*)
      .collect()(0)
    val n0 = counts.getLong(0)
    steps.indices.map { i =>
      val n = counts.getLong(i)
      (i, steps(i), n,
        if (n0 == 0L) null.asInstanceOf[java.lang.Double]
        else java.lang.Double.valueOf(n.toDouble / n0))
    }.toDF("step", "step_name", "n_users", "conversion")
  }
}
