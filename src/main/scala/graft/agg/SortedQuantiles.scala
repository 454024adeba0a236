package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared sort-based EXACT multi-quantile — the 100-TB replacement for
  * funneling whole groups through [[graft.expr.ExactPercentile]]'s
  * buffer-and-sort TypedImperativeAggregate (per-group state O(group
  * values): fine at gate SFs, an executor-memory wall at 60M-row groups
  * — the r12 campaign measured a single 8.5 GB hash-aggregate page).
  *
  * Plan shape (the [[graft.util.RangeCum]] scaffold, proven by
  * quantilesByCounts / q_quantile_bands):
  *
  *   1. MELT one scan of the input into a (keys…, request-id, value)
  *      stream — every requested (column, ps) list rides the same pass;
  *   2. fold to the distinct (keys…, request, value) CELL frame with
  *      counts (map-side combine: low-cardinality columns — most of a
  *      TPC-H-ish schema — collapse to tiny cell sets; genuinely
  *      continuous columns degrade to one range-sort of n rows, the
  *      q_corr_spearman cost bound);
  *   3. RangeCum range-sorts the cells by value within (keys, request)
  *      and emits running counts plus (free, from its pass-1 driver
  *      fold) the per-group totals n;
  *   4. for each requested p the two covering order statistics are
  *      picked in ONE streaming aggregate (rank = p·(n−1), a value v
  *      covers position t iff cum ≥ t and cum − count < t), and the
  *      pair interpolates exactly like ExactPercentile:
  *      pos = p·(n−1); frac = pos − ⌊pos⌋; frac == 0 → lo, else
  *      lo + (hi − lo)·frac — BIT-IDENTICAL (SortedQuantilesSpec pins
  *      doubleToLongBits parity against the buffering aggregate).
  *
  * Memory everywhere is one row + the offset map; no per-group buffers.
  *
  * Output: one row per key group, one `array<double>` column per
  * request (ps order preserved) — the same shape ExactPercentile.of
  * yields inside a groupBy agg, so call sites keep their element_at
  * unpacking. Parity caveats, all spec-pinned:
  *   - a group where a request's values are ALL null gets a null array
  *     (same as ExactPercentile);
  *   - a group where EVERY request is all-null is omitted entirely
  *     (a groupBy+agg would emit it with null arrays) — in-engine
  *     callers that need the full group universe left-join from it
  *     (see Clean.calcFences);
  *   - null KEY values form groups, as in groupBy (null-safe join
  *     internally).
  *
  * EAGER: RangeCum's pass 1 runs Spark jobs at call time, so building
  * the returned plan already costs the sort pass even if the caller
  * never executes it. The totals frame is O(#groups × #requests) rows
  * and is broadcast — group cardinality must be broadcast-sized (true
  * for every in-engine caller: global or low-cardinality strata).
  */
object SortedQuantiles {

  /** One request: exact quantiles of `value` at `ps`, emitted as an
    * `array<double>` column named `name`. `value` may be any numeric
    * expression (it is cast to double, the ExactPercentile contract). */
  final case class Req(name: String, value: Column, ps: Seq[Double])

  def of(df: DataFrame, keys: Seq[String], reqs: Seq[Req]): DataFrame =
    ofCounts(cellsOf(df, keys, reqs), keys, reqs)

  /** The melt + cell fold alone — rows (keys…, `__qc` request index,
    * `__v` double, `__c` double count), ONE corpus scan for every
    * request. Exposed so callers that post-process cells (derive a
    * second request's cells, count ranks against a threshold) can share
    * the scan; feed the result (or a derivation) to [[ofCounts]]. */
  private[graft] def cellsOf(df: DataFrame, keys: Seq[String],
                             reqs: Seq[Req]): DataFrame = {
    require(reqs.nonEmpty, "SortedQuantiles: no requests")
    val kcols = keys.map(col)
    // 1. melt — one scan, one struct per request, explode + null filter
    val projected = df.select(kcols ++ reqs.zipWithIndex.map {
      case (r, j) => r.value.cast("double").as(s"__v_$j")
    }: _*)
    val melted = projected
      .select(kcols :+ explode(array(reqs.indices.map(j =>
        struct(lit(j).as("__qc"), col(s"__v_$j").as("__v"))): _*)).as("__s"): _*)
      .select(kcols ++ Seq(col("__s.__qc").as("__qc"), col("__s.__v").as("__v")): _*)
      .where(col("__v").isNotNull)
    // 2. distinct-cell counts (double counts: RangeCum's integer-double
    // determinism contract)
    melted.groupBy((kcols :+ col("__qc") :+ col("__v")): _*)
      .agg(count(lit(1)).cast("double").as("__c"))
  }

  /** The pick machinery over a PRE-AGGREGATED cell frame — rows
    * (keys…, `__qc` int request index into `reqs`, `__v` double value,
    * `__c` double integer-valued count). Callers that can derive one
    * request's cells from another's (calcMadFences: |x − median| cell
    * counts fold straight off the value cell counts) skip re-scanning
    * the corpus entirely. Same output/parity contract as [[of]]. */
  private[graft] def ofCounts(cells: DataFrame, keys: Seq[String],
                              reqs: Seq[Req]): DataFrame = {
    require(reqs.nonEmpty, "SortedQuantiles: no requests")
    reqs.foreach { r =>
      require(r.ps.nonEmpty, s"SortedQuantiles: request ${r.name} has no ps")
      r.ps.foreach(p => require(p >= 0 && p <= 1,
        s"SortedQuantiles: p must be in [0,1], got $p (${r.name})"))
    }
    require(reqs.map(_.name).distinct.size == reqs.size,
      "SortedQuantiles: request names must be distinct")
    val kcols = keys.map(col)

    // 3. running + total counts in value order within (keys, request).
    // NOTE the cell frame is executed twice here (the range exchange's
    // boundary sampling runs its child once more than the shuffle
    // write) — a caller whose cells are expensive or reused downstream
    // should persist them BEFORE calling (calcMadFences and the
    // CacheRegistry users do); an unconditional persist here measured
    // NET-NEGATIVE for one-shot callers with near-continuous columns
    // (q_fence_cap 3.4 → 9.1 s at 100×: materializing a ~10M-cell cache
    // costs more than re-running the codegen melt+fold).
    val (cum, totals, nKeys) = graft.util.RangeCum.cumSumWithTotalsN(
      cells, keys :+ "__qc", "__v", Seq("__c"))

    // broadcast the (tiny) totals back onto the cell stream; null-safe
    // on the key columns — null strata are groups. Past the broadcast
    // key ceiling, fall back to a shuffle join (memory-safe)
    val groupKeys = keys :+ "__qc"
    val tot = totals
      .withColumnRenamed("__tot___c", "__n")
    val totRenamed = groupKeys.foldLeft(tot)((d, k) =>
      d.withColumnRenamed(k, s"__t_$k"))
    val joinCond = groupKeys.map(k =>
      cum(k) <=> totRenamed(s"__t_$k")).reduce(_ && _)
    val totSide = if (nKeys <= graft.util.RangeCum.MaxBroadcastKeys)
      broadcast(totRenamed) else totRenamed
    val joined = cum.join(totSide, joinCond)
      .drop(groupKeys.map(k => s"__t_$k"): _*)

    // 4. covering order statistics for the UNION of requested ps, one
    // streaming aggregate per (keys, request) group
    val allPs = reqs.flatMap(_.ps).distinct
    val psIdx = allPs.zipWithIndex.toMap
    val picks = allPs.zipWithIndex.flatMap { case (p, i) =>
      val r = lit(p) * (col("__n") - 1) // rank, 0-based (p·(n−1))
      val loPos = floor(r) + 1          // covering positions, 1-based
      val hiPos = least(floor(r) + 2, col("__n"))
      def covering(pos: Column) = when(
        col("__cum___c") >= pos && col("__cum___c") - col("__c") < pos,
        col("__v"))
      Seq(min(covering(loPos)).as(s"__lo_$i"),
        min(covering(hiPos)).as(s"__hi_$i"))
    } :+ first(col("__n")).as("__n")
    val perReq = joined.groupBy((kcols :+ col("__qc")): _*)
      .agg(picks.head, picks.tail: _*)

    // interpolate exactly as ExactPercentile.eval: integral rank short-
    // circuits to the lower statistic (lo == hi there), else linear
    val valued = allPs.zipWithIndex.foldLeft(perReq) { case (d, (p, i)) =>
      val r = lit(p) * (col("__n") - 1)
      val frac = r - floor(r)
      d.withColumn(s"__val_$i",
        when(frac === 0.0, col(s"__lo_$i"))
          .otherwise(col(s"__lo_$i") +
            (col(s"__hi_$i") - col(s"__lo_$i")) * frac))
    }

    // 5. pivot back: one row per key group, one array column per request
    val outAggs = reqs.zipWithIndex.map { case (rq, j) =>
      first(when(col("__qc") === j,
          array(rq.ps.map(p => col(s"__val_${psIdx(p)}")): _*)),
        ignoreNulls = true).as(rq.name)
    }
    valued.groupBy(kcols: _*).agg(outAggs.head, outAggs.tail: _*)
  }

  /** Convenience: single global (no keys) request → the quantile array
    * (null when the column is entirely null/empty), driver-side. */
  def globalArray(df: DataFrame, value: Column, ps: Seq[Double]): Option[Seq[Double]] = {
    val row = of(df, Nil, Seq(Req("__q", value, ps))).head()
    if (row.isNullAt(0)) None else Some(row.getSeq[Double](0))
  }
}
