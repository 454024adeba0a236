package graft.util

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Distributed cumulative sums over a value-ordered frame WITHOUT an
  * unpartitioned window — the range-sort + partition-offset scaffold
  * (the BinaryMetrics.cumScaffold / ksTestMulti shape) generalized to
  * arbitrary (keys…, order, sum-columns) frames so the distinct-value
  * cumulative family (Mann-Whitney mid-ranks, conformal order
  * statistics, ECDF sweeps) stops funneling through one partition when
  * the value column is continuous (distinct ≈ n).
  *
  * Shape: range-partition by (keys…, order), sort within partitions
  * (Tungsten radix sort, compact UnsafeRow shuffle), fold ONE
  * per-(partition, key) subtotal pass to the driver (O(#partitions +
  * #keys) rows — the guard refuses beyond `maxDriverEntries`), scan the
  * running offsets driver-side, then a second pass over the SAME sort
  * shuffle emits every row with its running sums. Wall-clock is two
  * passes over shuffle files written once; memory is one row plus the
  * offset map everywhere.
  *
  * Determinism contract: each emitted cum equals the sequential
  * in-order sum ONLY when the summed columns are integer-valued
  * (counts) — integer doubles add exactly in any association, so the
  * offset+scan chain is bit-identical to a single sequential window.
  * For non-integer columns the association differs across partition
  * boundaries; callers comparing such sums against a sequential oracle
  * replay must keep the sequential form (see kaplanMeier's bounded
  * windows) or accept ulp drift.
  */
object RangeCum {

  /** Append `__cum_<c>` (running inclusive sum, double) for each c in
    * `sumCols`, ordered by `orderCol` (asc/desc) within `keys` (empty =
    * one global ordering). Exclusive prefixes derive as
    * `__cum_<c> − <c>`. Input column set is preserved. */
  def cumSum(df: DataFrame, keys: Seq[String], orderCol: String,
             sumCols: Seq[String], ascending: Boolean = true,
             maxDriverEntries: Int = 4000000): DataFrame =
    cumSumWithTotals(df, keys, orderCol, sumCols, ascending,
      maxDriverEntries)._1

  /** [[cumSum]] plus the PER-KEY GRAND TOTALS as a second (tiny, driver-
    * built) DataFrame — schema (keys…, `__tot_<c>` double per sum
    * column). The totals fall out of pass 1's per-(partition, key)
    * subtotal fold for free, so callers that need "running sum AND group
    * total" (the exact-quantile pick, ECDF normalization) get both
    * without a second cluster pass or a persist; the totals frame is
    * O(#keys) rows and broadcast-join material by construction.
    *
    * NOTE this method (like cumSum) is EAGER: pass 1 runs Spark jobs at
    * call time (sort + subtotal collect), not at first action on the
    * returned frames. */
  def cumSumWithTotals(df: DataFrame, keys: Seq[String], orderCol: String,
                       sumCols: Seq[String], ascending: Boolean = true,
                       maxDriverEntries: Int = 4000000): (DataFrame, DataFrame) = {
    require(sumCols.nonEmpty, "RangeCum.cumSum needs at least one sum column")
    val spark = df.sparkSession
    val np = spark.sessionState.conf.numShufflePartitions
    val ocol = if (ascending) col(orderCol).asc else col(orderCol).desc
    val sortCols = keys.map(col) :+ ocol
    val sorted = df.repartitionByRange(np, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema
    val keyIdx = keys.map(schema.fieldIndex).toArray
    val sumIdx = sumCols.map(schema.fieldIndex).toArray
    val rdd = sorted.rdd // both passes reuse this sort's shuffle files
    def rowKey(r: Row): Seq[Any] = keyIdx.toSeq.map(r.get)
    def numAt(r: Row, i: Int): Double =
      if (r.isNullAt(i)) 0.0
      else r.get(i) match {
        case n: java.lang.Number => n.doubleValue()
        case b: Boolean          => if (b) 1.0 else 0.0
        case other => throw new IllegalArgumentException(
          s"RangeCum: non-numeric value $other in sum column")
      }
    // pass 1: per-(partition, key) subtotals, in in-partition key order
    val subtotals = rdd.mapPartitionsWithIndex { (pi, it) =>
      val m = scala.collection.mutable.LinkedHashMap
        .empty[Seq[Any], Array[Double]]
      it.foreach { r =>
        val t = m.getOrElseUpdate(rowKey(r), new Array[Double](sumIdx.length))
        var i = 0
        while (i < sumIdx.length) { t(i) += numAt(r, sumIdx(i)); i += 1 }
      }
      m.iterator.map { case (k, t) => (pi, k, t) }
    }.collect()
    require(subtotals.length <= maxDriverEntries,
      s"RangeCum.cumSum: ${subtotals.length} (partition, key) subtotals " +
        s"exceed maxDriverEntries=$maxDriverEntries — too many keys for " +
        s"the driver offset scan; aggregate keys first or raise the cap")
    // driver scan: running offset per key across partitions in range order
    val offsets: Map[Int, Map[Seq[Any], Array[Double]]] = {
      val byPart = scala.collection.mutable.Map
        .empty[Int, scala.collection.mutable.Map[Seq[Any], Array[Double]]]
      subtotals.groupBy(_._2).foreach { case (k, entries) =>
        var acc = new Array[Double](sumIdx.length)
        entries.sortBy(_._1).foreach { case (pi, _, tot) =>
          byPart.getOrElseUpdate(pi,
            scala.collection.mutable.Map.empty)(k) = acc
          val next = new Array[Double](sumIdx.length)
          var i = 0
          while (i < sumIdx.length) { next(i) = acc(i) + tot(i); i += 1 }
          acc = next
        }
      }
      byPart.map { case (pi, m) => pi -> m.toMap }.toMap
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(schema.fields ++
      sumCols.map(c => StructField(s"__cum_$c", DoubleType, nullable = false)))
    // pass 2: seed each key's running sums from its offset, emit per row
    val out = rdd.mapPartitionsWithIndex { (pi, it) =>
      val partOffsets = bc.value.getOrElse(pi, Map.empty)
      var curKey: Seq[Any] = null
      var run: Array[Double] = null
      it.map { r =>
        val k = rowKey(r)
        if (curKey == null || k != curKey) {
          curKey = k
          run = partOffsets.getOrElse(k,
            new Array[Double](sumIdx.length)).clone()
        }
        var i = 0
        while (i < sumIdx.length) { run(i) += numAt(r, sumIdx(i)); i += 1 }
        Row.fromSeq(r.toSeq ++ run.toSeq)
      }
    }
    val cum = spark.createDataFrame(out, outSchema)
    // grand totals per key: one more fold over the ALREADY-COLLECTED
    // subtotal array — no cluster work
    val totSchema = StructType(keyIdx.map(schema.fields(_)) ++
      sumCols.map(c => StructField(s"__tot_$c", DoubleType, nullable = false)))
    val totRows = subtotals.groupBy(_._2).map { case (k, entries) =>
      val tot = new Array[Double](sumIdx.length)
      entries.foreach { case (_, _, t) =>
        var i = 0
        while (i < sumIdx.length) { tot(i) += t(i); i += 1 }
      }
      Row.fromSeq(k ++ tot.toSeq)
    }.toSeq
    val totals = spark.createDataFrame(
      spark.sparkContext.parallelize(totRows, 1), totSchema)
    (cum, totals)
  }
}
