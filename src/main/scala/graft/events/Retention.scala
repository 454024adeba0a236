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
}
