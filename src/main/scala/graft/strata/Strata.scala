package graft.strata

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stratification — the reference's signature dataflow operator
  * (handyspark/sql/dataframe.py:1152-1161, 1812-2052).
  *
  * A stratum is either an existing categorical column, an equal-width
  * `Bucket`, or a `Quantile` bucket over a continuous column. Stratifying
  * yields (a) clause strings per observed combination — the public contract
  * keys for `statistics_`/`fences_` maps — and (b) two execution paths:
  *
  *  - the GROUPED path (reference `@agg` decorators): one Spark job with
  *    strata columns prepended to the groupBy — a single shuffle keyed on
  *    low-cardinality strata; this is the 100-TB path;
  *  - the FILTERED path: one child DataFrame per combination, recombined by
  *    union — per-stratum predicate-pushdown scans; right only for small
  *    stratum counts (documented in SURVEY §7.4: O(#strata) jobs).
  */
sealed trait StratumSpec {
  /** name of the (possibly derived) column this stratum groups on */
  def colName: String
}

/** Stratify on an existing (categorical) column. */
final case class ColStratum(name: String) extends StratumSpec {
  def colName: String = name
}

/** Equal-width binning of a continuous column (reference `Bucket`,
  * dataframe.py:1385-1433). Edges come from one min/max action; bucket
  * index is `min(floor((x-min)/width), bins-1)` — pure arithmetic, stays
  * inside whole-stage codegen (no Bucketizer UDF-style evaluation). */
final case class Bucket(column: String, bins: Int = 5) extends StratumSpec {
  def colName: String = s"__bucket_${column}_$bins"
}

/** Quantile binning (reference `Quantile`, dataframe.py:1436-1462): edges
  * from percentiles, same arithmetic mapping as Bucket between edges.
  * `exact=false` (default) fits edges with the mergeable GK sketch
  * (`approxQuantile`, relativeError 0.01 like the reference) — the 100-TB
  * path; `exact=true` uses interpolated exact percentiles, matching DuckDB
  * `quantile_cont` for oracle-checked queries. */
final case class Quantile(column: String, bins: Int = 5, exact: Boolean = false)
    extends StratumSpec {
  def colName: String = s"__quantile_${column}_$bins"
}

/** One observed strata combination: its values and its filter clause. */
final case class Stratum(values: Seq[(String, Any)], clause: String)

final class StratifiedFrame private[strata] (
    val df: DataFrame,
    val specs: Seq[StratumSpec],
    /** df with derived bucket columns appended (same as df if no buckets) */
    val bucketed: DataFrame,
    /** edges per derived column, for clause pretty-printing */
    val edges: Map[String, Array[Double]]) {

  def strataCols: Seq[String] = specs.map(_.colName)

  /** Observed strata combinations + clause strings, discovered LAZILY on
    * first use (one Spark action). The reference discovers combos eagerly at
    * stratify() time (dataframe.py:1846); deferring it means grouped-path
    * pipelines — which prepend strata columns to a groupBy and never touch
    * per-combination clauses — skip an entire extra scan of the input. The
    * filtered path and clause-keyed statistics trigger it on demand.
    * Null-valued combinations are dropped (matching the reference's
    * dropna'd value_counts discovery, dataframe.py:1846, 225-244) — a
    * `col === null` filter clause would never match, silently yielding an
    * empty stratum on the filtered path. */
  lazy val strata: Seq[Stratum] = {
    val combos = bucketed
      .na.drop(specs.map(_.colName))
      .groupBy(specs.map(s => col(s.colName)): _*)
      .count()
      .orderBy(specs.map(s => col(s.colName)): _*)
      .collect()
    combos.map { row =>
      val values = specs.zipWithIndex.map { case (s, i) =>
        s.colName -> row.get(i)
      }
      Stratum(values, StratifiedFrame.clause(values, specs, edges))
    }.toSeq
  }

  /** GROUPED path: run `f` once with strata columns prepended. */
  def agg(f: (DataFrame, Seq[String]) => DataFrame): DataFrame =
    f(bucketed, strataCols)

  // -- reference-style stratified statistics (all on the GROUPED path:
  //    one shuffle keyed on the strata, like the @agg decorators) --------

  def mean(cols: String*): DataFrame =
    agg((d, sc) => d.groupBy(sc.map(col): _*)
      .agg(avg(cols.head).as(cols.head), cols.tail.map(c => avg(c).as(c)): _*))
  def median(cols: Seq[String], precision: Double = 0.01): DataFrame =
    agg((d, sc) => graft.agg.Stats.percentileApprox(d, cols, Seq(0.5),
      precision, sc))
  def valueCounts(cols: String*): DataFrame =
    agg((d, sc) => graft.agg.Stats.valueCounts(d, cols.toSeq, strata = sc))
  def mode(c: String): DataFrame =
    agg((d, sc) => graft.agg.Stats.modeStratified(d, c, sc))
  def entropy(c: String): DataFrame =
    agg((d, sc) => graft.agg.Stats.entropy(d, c, sc))
  def describe(cols: String*): DataFrame =
    agg((d, sc) => graft.agg.Stats.describe(d, cols.toSeq, sc))
  def outliers(cols: Seq[String], k: Double = 1.5): DataFrame =
    agg((d, sc) => graft.clean.Clean.outlierCounts(d, cols, k, sc))

  /** FILTERED path: run `f` per stratum child, recombine by union
    * (reference dataframe.py:1863, 1946-1972). With no observed strata
    * (empty/all-null input) the result is `f`'s shape with zero rows.
    *
    * SCALE AUTO-SWITCH: the union is O(#strata) jobs as authored. The
    * `StrataUnionRewrite` optimizer rule is registered (idempotently) on
    * the session here, and — keyed on the `__stratum` marker column only
    * this method emits — automatically collapses aggregate-shaped unions
    * into ONE grouped scan once the stratum count exceeds
    * `spark.graft.strataUnionAutoThreshold` (default 32). Sound because
    * `strata` holds OBSERVED combinations (a grouped aggregate can never
    * lose a stratum that a filtered global aggregate would keep). The rule
    * is inert for every other plan shape, so registering it does not
    * change unrelated queries. */
  def perStratum(f: DataFrame => DataFrame): DataFrame = {
    val exp = df.sparkSession.experimental
    if (!exp.extraOptimizations.contains(graft.plans.StrataUnionRewrite))
      exp.extraOptimizations = exp.extraOptimizations :+
        graft.plans.StrataUnionRewrite
    if (strata.isEmpty)
      f(bucketed).withColumn("__stratum", lit("")).limit(0)
    else
      strata.map { st =>
        val child = st.values.foldLeft(bucketed) { case (d, (c, v)) =>
          d.filter(col(c) === lit(v))
        }
        f(child).withColumn("__stratum", lit(st.clause))
      }.reduce(_.unionAll(_))
  }

  /** Human-readable clause for a combination, used as statistics/fences
    * dictionary keys (tests in the reference codify these strings,
    * test_dataframe.py:201-202, 233-234). */
  def clauseOf(values: Seq[(String, Any)]): String =
    StratifiedFrame.clause(values, specs, edges)
}

object StratifiedFrame {

  def apply(df: DataFrame, specs: Seq[StratumSpec]): StratifiedFrame = {
    // 1. fit bucket edges (one action per continuous spec; a single
    //    combined agg would also work but specs are few)
    // Degenerate inputs are explicit: an empty/all-null column yields NO
    // edges (no strata — the combo discovery below then finds nothing); an
    // all-equal column collapses to a single [v, v] bucket so the clause
    // string stays truthful and no division-by-zero width is ever built.
    val edges: Map[String, Array[Double]] = specs.collect {
      case b @ Bucket(c, n) =>
        val r = df.agg(min(col(c)).cast("double"), max(col(c)).cast("double"))
          .head()
        val fitted =
          if (r.isNullAt(0) || r.isNullAt(1)) Array.empty[Double]
          else {
            val (lo, hi) = (r.getDouble(0), r.getDouble(1))
            if (hi == lo) Array(lo, hi)
            else { val w = (hi - lo) / n; Array.tabulate(n + 1)(i => lo + i * w) }
          }
        b.colName -> fitted
      case q @ Quantile(c, n, exact) =>
        val ps = Array.tabulate(n + 1)(i => i.toDouble / n)
        val fitted =
          if (exact) graft.agg.SortedQuantiles
            .globalArray(df, col(c), ps.toSeq) // shared sort path
            .fold(Array.empty[Double])(_.toArray)
          else df.stat.approxQuantile(c, ps, 0.01) // empty when no data
        q.colName -> (if (fitted.length < 2) Array.empty[Double] else fitted)
    }.toMap

    // 2. append derived bucket-index columns (arithmetic only)
    val bucketed = specs.foldLeft(df) { (d, s) =>
      s match {
        case Bucket(c, _) =>
          val es = edges(s.colName)
          if (es.isEmpty) d.withColumn(s.colName, lit(null).cast("int"))
          else {
            val nb = es.length - 1 // 1 for the degenerate all-equal column
            val w = (es.last - es.head) / nb
            // null input must yield a NULL bucket (dropped by combo
            // discovery) — without the guard, greatest(null, 0) puts every
            // null row into bucket 0 (Spark greatest/least skip nulls)
            val idx =
              if (w == 0) when(col(c).isNotNull, lit(0))
              else when(col(c).isNotNull,
                least(greatest(floor((col(c) - lit(es.head)) / lit(w)),
                  lit(0)), lit(nb - 1)))
            d.withColumn(s.colName, idx.cast("int"))
          }
        case Quantile(c, _, _) =>
          val es = edges(s.colName)
          if (es.isEmpty) d.withColumn(s.colName, lit(null).cast("int"))
          else {
            val nb = es.length - 1
            // index = #edges strictly below x, clamped — expressed as a
            // CASE chain over the (≤ ~20) interior edges; codegen-friendly
            val idx = es.slice(1, nb).foldLeft(
              when(col(c).isNotNull, lit(0))) { (acc, e) =>
              acc + (col(c) >= lit(e)).cast("int")
            }
            d.withColumn(s.colName, least(idx, lit(nb - 1)).cast("int"))
          }
        case ColStratum(_) => d
      }
    }

    // 3. combo discovery is lazy — see `StratifiedFrame.strata`.
    new StratifiedFrame(df, specs, bucketed, edges)
  }

  private[strata] def clause(values: Seq[(String, Any)], specs: Seq[StratumSpec],
                             edges: Map[String, Array[Double]]): String =
    values.zip(specs).map {
      case ((_, v), ColStratum(name)) =>
        v match {
          // backslash-escape so the clause round-trips through Spark's SQL
          // parser even when the value contains quotes or backslashes
          case s: String =>
            val esc = s.replace("\\", "\\\\").replace("\"", "\\\"")
            s"""$name == "$esc""""
          case other => s"$name == $other"
        }
      case ((cn, v), spec) =>
        val es = edges(cn)
        val i = v.asInstanceOf[Number].intValue()
        val c = spec match {
          case Bucket(c, _)      => c
          case Quantile(c, _, _) => c
          case _                 => cn
        }
        val hiOp = if (i == es.length - 2) "<=" else "<"
        s"($c >= ${es(i)}) and ($c $hiOp ${es(i + 1)})"
    }.mkString(" and ")
}
