package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan-Meier survival estimation over right-censored durations —
  * "how long until a user converts / a document is flagged / a job
  * fails", with subjects that never experienced the event contributing
  * censored observations. The engine-tier time-to-event operator the
  * events tier (funnel, retention, sessionization) was missing.
  *
  * Scale shape: ONE corpus aggregate folds the duration column to the
  * distinct-duration frame (d events, c censored per time); the at-risk
  * counts and the cumulative product both come from windows over that
  * bounded frame — the ROC/aucBy "window over distinct values" shape,
  * never a window over subjects. The product Π(1 − d/r) is computed as
  * exp(Σ ln(1 − d/r)) with an explicit zero flag (Spark's `log` yields
  * null at 0 where SQL ln() yields −inf), which a SQL oracle replays
  * with the identical op order. */
object Survival {

  /** KM curve from (duration, event) rows: `eventCol` is 1 when the
    * event was observed at `durationCol`, 0 when the subject was
    * censored then. Returns one row per distinct duration, ordered:
    * (t, n_risk, n_event, n_censored, survival) where survival is the
    * KM estimate S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/rᵢ). Null durations/events
    * are dropped; censored-only times carry survival unchanged (factor
    * 1) but still reduce the downstream at-risk counts.
    *
    * Bounded-domain contract: the survival product is a SEQUENTIAL
    * chain over the distinct-duration frame (the unpartitioned windows
    * below), deliberately kept sequential so a SQL oracle replays the
    * exp(Σ ln) op order bit-for-bit — so the frame must be small.
    * `maxDistinct` probes and REFUSES continuous duration columns
    * (distinct ≈ subjects) instead of silently funneling one partition:
    * resample durations to calendar units first, or use
    * [[kaplanMeierBinned]] for the grid-approximated curve at scale. */
  def kaplanMeier(df: DataFrame, durationCol: String,
                  eventCol: String, maxDistinct: Int = 1000000): DataFrame = {
    require(maxDistinct >= 1, s"maxDistinct must be >= 1, got $maxDistinct")
    val byT = df.na.drop(Seq(durationCol, eventCol))
      .groupBy(col(durationCol).cast("double").as("t"))
      .agg(sum(col(eventCol).cast("double")).as("__d"),
        count(lit(1)).cast("double").as("__n"))
      .cache() // consumed by the probe and the curve
    val nd = byT.count()
    require(nd <= maxDistinct,
      s"kaplanMeier: $nd distinct durations exceed maxDistinct=" +
        s"$maxDistinct — the survival product is a sequential chain over " +
        s"the distinct-duration frame. Bucket durations to calendar " +
        s"units first, use kaplanMeierBinned (quantile-grid curve), or " +
        s"raise maxDistinct deliberately.")
    kmCurve(byT)
  }

  /** Grid-approximated KM for continuous durations at scale: durations
    * snap UP to a `bins`-cell uniform grid over [min, max] (pure
    * codegen'd arithmetic — no per-row search), then the exact KM runs
    * on the ≤ bins distinct grid points. The curve is the exact KM of
    * the snapped data: event times move later by at most one cell
    * width, so S(t) is sandwiched between the true S at the cell's two
    * edges — grid resolution is the only approximation. Long-tailed
    * durations concentrate cells near the tail; resample to coarser
    * units first if the head matters more than the tail. */
  def kaplanMeierBinned(df: DataFrame, durationCol: String,
                        eventCol: String, bins: Int = 1000): DataFrame = {
    require(bins >= 2 && bins <= 1000000,
      s"bins must be in [2, 1000000], got $bins")
    val clean = df.na.drop(Seq(durationCol, eventCol))
      .withColumn("__t0", col(durationCol).cast("double"))
    val mm = clean.agg(min("__t0").as("lo"), max("__t0").as("hi"))
    val snapped = clean.crossJoin(broadcast(mm))
      .withColumn("t",
        when(col("hi") === col("lo"), col("lo"))
          .otherwise(col("lo") + ceil((col("__t0") - col("lo")) /
            ((col("hi") - col("lo")) / bins)) *
            ((col("hi") - col("lo")) / bins)))
    val byT = snapped
      .groupBy("t")
      .agg(sum(col(eventCol).cast("double")).as("__d"),
        count(lit(1)).cast("double").as("__n"))
    kmCurve(byT)
  }

  /** The shared curve builder over a (t, __d events, __n at-t count)
    * frame — bounded by the callers' contracts (≤ maxDistinct / ≤ bins
    * rows), so the unpartitioned windows are deliberate: the survival
    * product must fold sequentially for SQL-oracle bit-replay. */
  private def kmCurve(byT: DataFrame): DataFrame = {
    val wAll = Window.partitionBy()
    val wBefore = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wUpTo = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRisk = byT
      .withColumn("__risk",
        sum("__n").over(wAll) - coalesce(sum("__n").over(wBefore), lit(0.0)))
    val factor = lit(1.0) - col("__d") / col("__risk")
    val curve = withRisk
      .withColumn("__lnf", when(factor > 0, log(factor)).otherwise(lit(0.0)))
      .withColumn("__zero", when(factor <= 0, 1.0).otherwise(0.0))
      .withColumn("survival",
        when(sum("__zero").over(wUpTo) > 0, lit(0.0))
          .otherwise(exp(sum("__lnf").over(wUpTo))))
    curve.select(col("t"),
        col("__risk").cast("long").as("n_risk"),
        col("__d").cast("long").as("n_event"),
        (col("__n") - col("__d")).cast("long").as("n_censored"),
        col("survival"))
      .orderBy("t")
  }

  /** Nelson-Aalen cumulative hazard per group — the additive
    * companion of [[kaplanMeierBy]] (hazard sums are better-behaved
    * than survival products for comparing groups and feeding
    * regressions):
    *
    *   H(t) = Σ_{tᵢ ≤ t} dᵢ / nᵢ        (dᵢ events, nᵢ at risk at tᵢ)
    *
    * with the Breslow survival estimate exp(−H(t)) alongside. Same
    * distinct-duration frame and risk-set windows as KM — one shuffle
    * on the group, per-group running sums; the hazard is a running sum
    * of exact-count ratios folding in deterministic time order, so the
    * curve replays in SQL. Output: (groupCol, t, n_risk, n_event,
    * hazard, survival_breslow). */
  def nelsonAalenBy(df: DataFrame, groupCol: String, durationCol: String,
                    eventCol: String): DataFrame = {
    val byT = df.na.drop(Seq(groupCol, durationCol, eventCol))
      .groupBy(col(groupCol), col(durationCol).cast("double").as("t"))
      .agg(sum(col(eventCol).cast("double")).as("__d"),
        count(lit(1)).cast("double").as("__n"))
    val wAll = Window.partitionBy(groupCol)
    val wBefore = Window.partitionBy(groupCol).orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wUpTo = Window.partitionBy(groupCol).orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("__risk",
        sum("__n").over(wAll) -
          coalesce(sum("__n").over(wBefore), lit(0.0)))
      .withColumn("hazard",
        sum(col("__d") / col("__risk")).over(wUpTo))
      .select(col(groupCol), col("t"),
        col("__risk").cast("long").as("n_risk"),
        col("__d").cast("long").as("n_event"),
        col("hazard"), exp(-col("hazard")).as("survival_breslow"))
  }

  /** Per-group KM curves: identical shape with every window partitioned
    * by `groupCol` — distinct (group, duration) frame, fully parallel
    * across groups. */
  def kaplanMeierBy(df: DataFrame, groupCol: String, durationCol: String,
                    eventCol: String): DataFrame = {
    val byT = df.na.drop(Seq(groupCol, durationCol, eventCol))
      .groupBy(col(groupCol), col(durationCol).cast("double").as("t"))
      .agg(sum(col(eventCol).cast("double")).as("__d"),
        count(lit(1)).cast("double").as("__n"))
    val wAll = Window.partitionBy(groupCol)
    val wBefore = Window.partitionBy(groupCol).orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wUpTo = Window.partitionBy(groupCol).orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRisk = byT
      .withColumn("__risk",
        sum("__n").over(wAll) - coalesce(sum("__n").over(wBefore), lit(0.0)))
    val factor = lit(1.0) - col("__d") / col("__risk")
    val curve = withRisk
      .withColumn("__lnf", when(factor > 0, log(factor)).otherwise(lit(0.0)))
      .withColumn("__zero", when(factor <= 0, 1.0).otherwise(0.0))
      .withColumn("survival",
        when(sum("__zero").over(wUpTo) > 0, lit(0.0))
          .otherwise(exp(sum("__lnf").over(wUpTo))))
    curve.select(col(groupCol), col("t"),
        col("__risk").cast("long").as("n_risk"),
        col("__d").cast("long").as("n_event"),
        (col("__n") - col("__d")).cast("long").as("n_censored"),
        col("survival"))
      .orderBy(groupCol, "t")
  }

  /** Log-rank test between the groups of `groupCol` (2+ groups): the
    * standard O−E chi-square approximation
    * X² = Σ_g (O_g − E_g)² / E_g with E_g = Σ_t d_t · r_{g,t} / r_t.
    * Folds to the distinct (group, duration) frame like
    * [[kaplanMeierBy]]; per-time totals are windows over it. Returns
    * one row per group (group, observed, expected) plus the caller
    * combines into the statistic — or use [[logRankStat]] for the
    * single-row X²/dof form. */
  def logRank(df: DataFrame, groupCol: String, durationCol: String,
              eventCol: String): DataFrame = {
    val byGT = df.na.drop(Seq(groupCol, durationCol, eventCol))
      .groupBy(col(groupCol), col(durationCol).cast("double").as("t"))
      .agg(sum(col(eventCol).cast("double")).as("__d"),
        count(lit(1)).cast("double").as("__n"))
    // COMPLETE the (group × time) frame before computing at-risk: a
    // group with no observation at time t is still at risk there, so
    // the missing cells must exist as (d=0, n=0) rows or both r_t and
    // the group's expected-count contribution silently drop. Both
    // factors of the crossJoin are bounded (distinct groups × distinct
    // times — the histogram dense-completion precedent).
    val times = byGT.select("t").distinct()
    val groups = byGT.groupBy(groupCol).agg(sum("__n").as("__gtot"))
    val full = groups.crossJoin(times)
      .join(byGT, Seq(groupCol, "t"), "left")
      .na.fill(0.0, Seq("__d", "__n"))
    // per-group at-risk at t: group total − group mass before t
    val wgBefore = Window.partitionBy(groupCol).orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withGroupRisk = full.withColumn("__rg",
      col("__gtot") - coalesce(sum("__n").over(wgBefore), lit(0.0)))
    // per-time totals across groups: windows partitioned by t
    val wt = Window.partitionBy("t")
    val withTotals = withGroupRisk
      .withColumn("__dt", sum("__d").over(wt))
      .withColumn("__rt", sum("__rg").over(wt))
    withTotals
      .groupBy(groupCol)
      .agg(sum("__d").as("observed"),
        sum(col("__dt") * col("__rg") / col("__rt")).as("expected"))
      .orderBy(groupCol)
  }

  /** Log-rank X² statistic + dof as a single row. */
  def logRankStat(df: DataFrame, groupCol: String, durationCol: String,
                  eventCol: String): DataFrame = {
    logRank(df, groupCol, durationCol, eventCol)
      .agg(count(lit(1)).cast("long").as("k"),
        sum(when(col("expected") > 0,
          (col("observed") - col("expected")) *
            (col("observed") - col("expected")) / col("expected"))
          .otherwise(0.0)).as("chi2"))
      .withColumn("dof", (col("k") - 1).cast("long"))
  }
}
