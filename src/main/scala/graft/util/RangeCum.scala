package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.InternalRows
import org.apache.spark.sql.types._

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
  * Both passes stay on `queryExecution.toRdd` (InternalRow): the `.rdd`
  * formulation deserialized every sorted row into a boxed GenericRow on
  * BOTH passes and re-encoded pass 2's output through the interpreted
  * `createDataFrame(RDD[Row])` converter — measured ~1.4× slower for a
  * doubles projection (see corrSpearman's decode note). The sorted
  * iterator reuses its UnsafeRow buffer, so key values are copied
  * (`InternalRow.copyValue`) before they outlive one `next()`: map
  * inserts in pass 1, the current-group key in pass 2. Pass 2 emits one
  * mutated JoinedRow per partition — safe because the planned
  * RDDScanExec unsafe-projects every row before anything downstream
  * can buffer it.
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

  /** Key-count ceiling for broadcast-joining the totals frame back onto
    * the cum stream: past ~1M keys a per-executor hash relation (on top
    * of the offsets broadcast of the same magnitude) stops being "tiny" —
    * callers should fall back to a shuffle join, which is slower but
    * memory-safe. Well under maxDriverEntries on purpose: the driver can
    * HOLD 4M subtotals transiently; pinning them in every executor for a
    * query's lifetime is a different budget. */
  val MaxBroadcastKeys: Long = 1L << 20

  /** Append `__cum_<c>` (running inclusive sum, double) for each c in
    * `sumCols`, ordered by `orderCol` (asc/desc) within `keys` (empty =
    * one global ordering). Exclusive prefixes derive as
    * `__cum_<c> − <c>`. Input column set is preserved. */
  def cumSum(df: DataFrame, keys: Seq[String], orderCol: String,
             sumCols: Seq[String], ascending: Boolean = true,
             maxDriverEntries: Int = 4000000): DataFrame =
    cumSumWithTotals(df, keys, orderCol, sumCols, ascending,
      maxDriverEntries)._1

  /** [[cumSumWithTotals]] minus the key count (source-compat shim for
    * callers that don't need a broadcast-size decision). */
  def cumSumWithTotals(df: DataFrame, keys: Seq[String], orderCol: String,
                       sumCols: Seq[String], ascending: Boolean,
                       maxDriverEntries: Int): (DataFrame, DataFrame) = {
    val (cum, totals, _) = cumSumWithTotalsN(df, keys, orderCol, sumCols,
      ascending, maxDriverEntries)
    (cum, totals)
  }
  def cumSumWithTotals(df: DataFrame, keys: Seq[String], orderCol: String,
                       sumCols: Seq[String]): (DataFrame, DataFrame) =
    cumSumWithTotals(df, keys, orderCol, sumCols, true, 4000000)

  /** Null-safe double read of sum column `i` (null counts as 0). */
  private def numGetter(dt: DataType, i: Int): InternalRow => Double = {
    val get: InternalRow => Double = dt match {
      case DoubleType    => r => r.getDouble(i)
      case FloatType     => r => r.getFloat(i).toDouble
      case IntegerType   => r => r.getInt(i).toDouble
      case LongType      => r => r.getLong(i).toDouble
      case ShortType     => r => r.getShort(i).toDouble
      case ByteType      => r => r.getByte(i).toDouble
      case BooleanType   => r => if (r.getBoolean(i)) 1.0 else 0.0
      case d: DecimalType =>
        r => r.getDecimal(i, d.precision, d.scale).toDouble
      case other => throw new IllegalArgumentException(
        s"RangeCum: non-numeric type $other in sum column")
    }
    r => if (r.isNullAt(i)) 0.0 else get(r)
  }

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
    * returned frames.
    *
    * The third element is the DISTINCT KEY COUNT (== totals row count),
    * known for free from the driver fold — callers broadcast-joining the
    * totals frame use it to fall back to a shuffle join when the key
    * cardinality makes a per-executor hash relation unreasonable. */
  def cumSumWithTotalsN(df: DataFrame, keys: Seq[String], orderCol: String,
                        sumCols: Seq[String], ascending: Boolean = true,
                        maxDriverEntries: Int = 4000000)
      : (DataFrame, DataFrame, Long) = {
    require(sumCols.nonEmpty, "RangeCum.cumSum needs at least one sum column")
    val spark = df.sparkSession
    val np = spark.sessionState.conf.numShufflePartitions
    val ocol = if (ascending) col(orderCol).asc else col(orderCol).desc
    val sortCols = keys.map(col) :+ ocol
    val sorted = df.repartitionByRange(np, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema
    val keyIdx = keys.map(schema.fieldIndex).toArray
    val keyTypes = keyIdx.map(schema.fields(_).dataType)
    // key equality runs through Seq[Any].equals in the driver offset map:
    // Array[Byte] (BinaryType) and unordered MapData compare by identity
    // there, which would silently fragment key groups — refuse up front
    keys.zip(keyTypes).foreach { case (k, dt) => dt match {
      case BinaryType | _: MapType => throw new IllegalArgumentException(
        s"RangeCum: key column '$k' has type ${dt.simpleString} — binary/" +
          "map keys have identity-based equality in the driver offset " +
          "map and would fragment groups; cast to a value-comparable type")
      case _ => ()
    } }
    val sumIdx = sumCols.map(schema.fieldIndex).toArray
    val nSum = sumIdx.length
    val num: Array[InternalRow => Double] =
      sumIdx.map(i => numGetter(schema.fields(i).dataType, i))
    val rdd = sorted.queryExecution.toRdd // both passes reuse this sort's shuffle files
    // key values WITHOUT copying — valid only until the iterator's next()
    def rawKey(r: InternalRow): Seq[Any] = {
      val a = new Array[Any](keyIdx.length)
      var i = 0
      while (i < keyIdx.length) {
        a(i) = if (r.isNullAt(keyIdx(i))) null else r.get(keyIdx(i), keyTypes(i))
        i += 1
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
    }
    // deep-copied key, safe to hold across rows / ship to the driver
    def copyKey(k: Seq[Any]): Seq[Any] =
      k.map(v => if (v == null) null else InternalRow.copyValue(v))
    // pass 1: per-(partition, key) subtotals, in in-partition key order
    val subtotals = rdd.mapPartitionsWithIndex { (pi, it) =>
      val m = scala.collection.mutable.LinkedHashMap
        .empty[Seq[Any], Array[Double]]
      it.foreach { r =>
        val kRaw = rawKey(r)
        var t = m.getOrElse(kRaw, null)
        if (t == null) {
          t = new Array[Double](nSum)
          m.update(copyKey(kRaw), t)
        }
        var i = 0
        while (i < nSum) { t(i) += num(i)(r); i += 1 }
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
        var acc = new Array[Double](nSum)
        entries.sortBy(_._1).foreach { case (pi, _, tot) =>
          byPart.getOrElseUpdate(pi,
            scala.collection.mutable.Map.empty)(k) = acc
          val next = new Array[Double](nSum)
          var i = 0
          while (i < nSum) { next(i) = acc(i) + tot(i); i += 1 }
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
      val partOffsets = bc.value.getOrElse(pi, Map.empty[Seq[Any], Array[Double]])
      var curKey: Seq[Any] = null
      var run: Array[Double] = null
      val joined = new JoinedRow
      it.map { r =>
        val kRaw = rawKey(r)
        if (curKey == null || kRaw != curKey) {
          curKey = copyKey(kRaw)
          run = partOffsets.getOrElse(curKey,
            new Array[Double](nSum)).clone()
        }
        val cums = new GenericInternalRow(nSum)
        var i = 0
        while (i < nSum) {
          run(i) += num(i)(r)
          cums.update(i, run(i))
          i += 1
        }
        joined(r, cums): InternalRow
      }
    }
    val cum = InternalRows.toDF(spark, out, outSchema)
    // grand totals per key: one more fold over the ALREADY-COLLECTED
    // subtotal array — no cluster work (keys are already internal-typed
    // copies, so the totals frame goes through the InternalRow path too)
    val totSchema = StructType(keyIdx.map(schema.fields(_)) ++
      sumCols.map(c => StructField(s"__tot_$c", DoubleType, nullable = false)))
    val totRows: Seq[InternalRow] = subtotals.groupBy(_._2).map { case (k, entries) =>
      val tot = new Array[Double](nSum)
      entries.foreach { case (_, _, t) =>
        var i = 0
        while (i < nSum) { tot(i) += t(i); i += 1 }
      }
      val vals = new Array[Any](k.length + nSum)
      k.copyToArray(vals)
      var i = 0
      while (i < nSum) { vals(k.length + i) = tot(i); i += 1 }
      new GenericInternalRow(vals): InternalRow
    }.toSeq
    val totals = InternalRows.toDF(spark,
      spark.sparkContext.parallelize(totRows, 1), totSchema)
    (cum, totals, totRows.size.toLong)
  }
}
