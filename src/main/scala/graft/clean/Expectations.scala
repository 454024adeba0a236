package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-health expectation suite — the declarative quality gate a
  * 100-TB ingest runs before promoting a snapshot (the Deequ/
  * Great-Expectations shape, engine-native): each check declares a
  * metric and a threshold; the whole suite folds into ONE aggregate
  * pass over the table (uniqueness checks add their distinct-count
  * expansions, nothing else re-scans), and the result is one row per
  * check with the measured metric and a pass flag — machine-readable,
  * joinable into a run ledger.
  */
object Expectations {

  /** One declarative check. `metric` is a fraction in [0,1] unless
    * stated otherwise; `pass` compares it to `threshold` with ≥. */
  sealed trait Check {
    def name: String
    def column: String
  }
  /** share of non-null rows in `column` ≥ threshold. */
  final case class Completeness(column: String, threshold: Double = 1.0)
    extends Check { val name = "completeness" }
  /** distinct(cols) / rows ≥ threshold (1.0 = a key). Null-containing
    * tuples count as distinct-per-row (SQL COUNT DISTINCT drops them;
    * a null-keyed table should FAIL uniqueness, not pass it) — so the
    * metric is (countDistinct + null-tuple rows) / rows. */
  final case class Uniqueness(columns: Seq[String], threshold: Double = 1.0)
    extends Check { val name = "uniqueness"; val column = columns.mkString(",") }
  /** share of NON-NULL values inside [lo, hi] ≥ threshold (an all-null
    * column scores 1.0 here — pair with Completeness to catch that). */
  final case class InRange(column: String, lo: Double, hi: Double,
                           threshold: Double = 1.0)
    extends Check { val name = "in_range" }
  /** share of NON-NULL values in the allowed set ≥ threshold. */
  final case class AllowedValues(column: String, allowed: Seq[String],
                                 threshold: Double = 1.0)
    extends Check { val name = "allowed_values" }
  /** share of NON-NULL values ≥ 0 ≥ threshold. */
  final case class NonNegative(column: String, threshold: Double = 1.0)
    extends Check { val name = "non_negative" }

  /** Run the suite in one aggregate pass. Returns one row per check,
    * input order preserved via check_id:
    * (check_id, check, column, metric, threshold, pass).
    * Empty table: every share metric is defined as 1.0 (vacuous truth)
    * — an empty partition is not a QUALITY failure; gate row counts
    * separately.
    *
    * Scale shape: a single agg (uniqueness adds one distinct-aggregate
    * expansion each — keep those few), then a literal unpivot of the
    * one result row into check rows. No joins, no windows, no second
    * scan. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "expectations need at least one check")
    val n = count(lit(1)).cast("double")
    def share(pred: Column, base: Column): Column =
      when(base > 0, sum(pred.cast("double")) / base).otherwise(lit(1.0))
    val aggs: Seq[Column] = checks.zipWithIndex.map { case (c, i) =>
      val m = c match {
        case Completeness(col0, _) =>
          share(col(col0).isNotNull, n)
        case Uniqueness(cols, _) =>
          val nonNullTuple = cols.map(col(_).isNotNull).reduce(_ && _)
          when(n > 0,
            (countDistinct(cols.head, cols.tail: _*).cast("double") +
              sum((!nonNullTuple).cast("double"))) / n)
            .otherwise(lit(1.0))
        case InRange(col0, lo, hi, _) =>
          // try_cast: a dirty string column must score a low metric,
          // not fail the scan under ANSI cast semantics
          val x = expr(s"try_cast(`$col0` AS double)")
          share(x >= lo && x <= hi, count(col(col0)).cast("double"))
        case AllowedValues(col0, allowed, _) =>
          share(col(col0).isin(allowed: _*),
            count(col(col0)).cast("double"))
        case NonNegative(col0, _) =>
          val x = expr(s"try_cast(`$col0` AS double)")
          share(x >= 0, count(col(col0)).cast("double"))
      }
      m.as(s"__m$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single metrics row into one output row per check —
    // explode of a literal array of structs, still one job
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(i).cast("long").as("check_id"), lit(c.name).as("check"),
        lit(c.column).as("column"), col(s"__m$i").as("metric"),
        lit(thresholdOf(c)).as("threshold"))
    }
    one.select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.check_id"), col("__r.check"), col("__r.column"),
        col("__r.metric"), col("__r.threshold"),
        (col("__r.metric") >= col("__r.threshold")).as("pass"))
  }

  private def thresholdOf(c: Check): Double = c match {
    case Completeness(_, t) => t
    case Uniqueness(_, t) => t
    case InRange(_, _, _, t) => t
    case AllowedValues(_, _, t) => t
    case NonNegative(_, t) => t
  }

  /** Functional-dependency check: does `determinant → dependent` hold?
    * Returns the violating determinant groups — those mapping to more
    * than one distinct non-null dependent value — with their row count,
    * distinct dependent count, and two example values (min/max, so the
    * report is deterministic). Empty result = the FD holds.
    *
    * Scale shape: one hash aggregate keyed on the determinant; the
    * violation filter is on the aggregate output (group rows, not data
    * rows). */
  def fdViolations(df: DataFrame, determinant: Seq[String],
                   dependent: String): DataFrame = {
    require(determinant.nonEmpty, "fdViolations needs determinant columns")
    df.na.drop(determinant)
      .groupBy(determinant.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(dependent)).as("n_dependent"),
        min(col(dependent)).as("example_min"),
        max(col(dependent)).as("example_max"))
      .filter(col("n_dependent") > 1)
  }

  /** Null-pattern mining: which columns go missing TOGETHER. Each row
    * maps to a mask string over `cols` ('1' = null at that position,
    * column order as given); one hash aggregate counts rows per mask
    * and a share column normalizes. The all-zeros mask is the healthy
    * row count; a dominant joint pattern usually means one upstream
    * source dropped, which per-column null counts
    * ([[graft.agg.Stats]] nullcounts) cannot distinguish from
    * uncorrelated noise. Returns (mask, n, share), count-desc with a
    * mask tie-break. */
  def nullPatterns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "nullPatterns needs at least one column")
    val mask = concat(cols.map(c =>
      when(col(c).isNull, lit("1")).otherwise(lit("0"))): _*)
    val counts = df.select(mask.as("mask"))
      .groupBy("mask").agg(count(lit(1)).as("n"))
    counts
      .withColumn("share", col("n") / sum("n").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .orderBy(col("n").desc, col("mask"))
  }

  /** Referential-integrity orphans: child rows whose `childKey` has no
    * match in `parent.parentKey`. Null child keys are NOT orphans (SQL
    * FK semantics) — gate them with Completeness instead. Returns the
    * orphan child rows.
    *
    * Scale shape: a left-anti join on the key — Catalyst broadcasts
    * the deduplicated parent side when small; at dimension-table scale
    * this is one map-side pass over the child. */
  def fkOrphans(child: DataFrame, childKey: String,
                parent: DataFrame, parentKey: String): DataFrame = {
    // rename the parent key before the join: with same-lineage child and
    // parent (self-FK checks) a bare col(parentKey) reference would be
    // ambiguous against the child's own columns
    val keys = parent.select(col(parentKey).as("__graft_pk"))
      .na.drop().distinct()
    child.filter(col(childKey).isNotNull)
      .join(keys, col(childKey) === col("__graft_pk"), "left_anti")
  }
}
