package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention analysis: bucket users into cohorts by their FIRST
  * event's period (`floor(ts / bucket)`), then count how many of each
  * cohort are active again 1, 2, … periods later — the classic
  * triangular retention matrix.
  *
  * Scale shape, all keyed: one min-aggregate per user (map-side
  * combinable), one distinct over (user, period) (map-side combinable —
  * the event stream collapses to at most users × periods rows before the
  * shuffle), one user-keyed join of those two SMALL frames (AQE picks
  * broadcast when the user table fits), one (cohort, offset) aggregate,
  * and one cohort-keyed window to attach the cohort size. The raw event
  * table is never joined or windowed directly.
  */
object Retention {

  /** One row per (cohort, offset ≥ 0) with `n_active` distinct users,
    * `cohort_size` (= n_active at offset 0 — every user is active in
    * their first period by construction), and `retention` =
    * n_active / cohort_size. `tsCol` must be numeric and non-negative
    * (cast timestamps to epoch first; `bucket` in the same unit —
    * integer division is floor division only for non-negative values,
    * matching the SQL oracle's `//`). */
  def cohorts(df: DataFrame, userCol: String, tsCol: String,
              bucket: Long): DataFrame = {
    require(bucket > 0, s"bucket must be positive, got $bucket")
    val ev = df
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).cast("long").as("__u"),
        col(tsCol).cast("long").as("__t"))
      // integral `div`, not `/`: long / long is DOUBLE division in Spark,
      // and truncating the rounded quotient can mis-bucket boundary
      // timestamps by one period
      .select(col("__u"), expr(s"__t div ${bucket}L").as("__p"))
    val first = ev.groupBy("__u").agg(min("__p").as("__cohort"))
    val active = ev.distinct()
    active.join(first, "__u")
      .groupBy(col("__cohort").as("cohort"),
        (col("__p") - col("__cohort")).as("offset"))
      .agg(count(lit(1)).as("n_active"))
      .withColumn("cohort_size",
        max(when(col("offset") === 0, col("n_active")))
          .over(Window.partitionBy("cohort")))
      .withColumn("retention", col("n_active") / col("cohort_size"))
  }

  /** RFM segmentation — the classic engagement triage: per user,
    * Recency (hours since their last event, against the CORPUS max
    * timestamp), Frequency (event count), Monetary (Σ `valueCol`,
    * rounded to 6 decimals so quantile-boundary comparisons are
    * engine-stable), each scored 1..`nBins` by quantile thresholds
    * computed over the USERS (exact percentiles, quantile_cont
    * interpolation). Higher is better everywhere — recency scores
    * DESCEND with staleness (freshest users get `nBins`). A metric
    * strictly above the k-th threshold scores ≥ k+1; ties sit in the
    * lower bucket (deterministic, no rank machinery).
    *
    * Scale shape: one user aggregate over the events, one ≤3·(nBins−1)-
    * value percentile aggregate over the USER frame, thresholds folded
    * back as a broadcast crossJoin, scores as one projection. Output:
    * (userCol, recency_h, frequency, monetary, r_score, f_score,
    * m_score, segment = "RFM" digits). */
  def rfm(df: DataFrame, userCol: String, tsCol: String,
          valueCol: String, nBins: Int = 5): DataFrame = {
    require(nBins >= 2 && nBins <= 10,
      s"nBins must be in [2, 10], got $nBins")
    val clean = df.na.drop(Seq(userCol, tsCol, valueCol))
    val refTs = clean.agg(max(unix_micros(col(tsCol))).as("__ref"))
    val perUser = clean
      .groupBy(col(userCol))
      .agg(max(unix_micros(col(tsCol))).as("__last"),
        count(lit(1)).as("frequency"),
        round(sum(col(valueCol).cast("double")), 6).as("monetary"))
      .crossJoin(broadcast(refTs))
      .withColumn("recency_h",
        expr("(__ref - __last) div 3600000000"))
      .drop("__last", "__ref")
    val ps = (1 until nBins).map(_.toDouble / nBins)
    val cuts = perUser.agg(
      graft.expr.ExactPercentile.of(col("recency_h"), ps).as("__qr"),
      graft.expr.ExactPercentile.of(col("frequency"), ps).as("__qf"),
      graft.expr.ExactPercentile.of(col("monetary"), ps).as("__qm"))
    def scoreAsc(metric: org.apache.spark.sql.Column, q: String) =
      (0 until nBins - 1).map(i =>
        when(metric > col(q).getItem(i), 1).otherwise(0))
        .foldLeft(lit(1))(_ + _)
    val withScores = perUser.crossJoin(broadcast(cuts))
      .withColumn("r_score",
        lit(nBins + 1) - scoreAsc(col("recency_h").cast("double"), "__qr"))
      .withColumn("f_score", scoreAsc(col("frequency").cast("double"),
        "__qf"))
      .withColumn("m_score", scoreAsc(col("monetary"), "__qm"))
    withScores.select(col(userCol), col("recency_h"), col("frequency"),
      col("monetary"), col("r_score"), col("f_score"), col("m_score"),
      concat(col("r_score"), col("f_score"), col("m_score"))
        .as("segment"))
  }
}
