package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

import graft.agg.CountHist

/** [[HistCounts]]'s sibling for WINDOW use: the same CountHist sketch
  * state, but `eval` interpolates the requested quantiles INSIDE the
  * buffer and emits struct<n, below, above, quantiles: array<double>> —
  * a handful of scalars per row instead of the full bins-long counts
  * array.
  *
  * Why it exists: a moving window re-evaluates its aggregate per output
  * row, and HistCounts' eval allocates a bins-element boxed array each
  * time (plus a per-row UDF pass to interpolate it afterwards) — measured
  * 80× slower than the exact percentile tier on small frames, pure
  * boxing. Here eval is one early-exiting scan over the cells (all
  * requested quantiles collected in a single pass, ascending p), so the
  * per-row cost is O(occupied cells) with zero boxing. Use HistCounts
  * when the counts themselves must travel (persisted sketches, oracle
  * replay); use this when only quantiles leave the frame.
  *
  * Quantile semantics are exactly [[CountHist.Sketch.quantile]] (type-7
  * fractional rank, uniform-within-cell; |estimate − exact| bounded by
  * the order-statistic bracket ± 2·cellWidth). Empty in-range mass →
  * null quantiles array (n/below/above still reported). `ps` must be
  * ascending.
  */
case class HistQuantiles(
    child: Expression,
    lo: Double,
    hi: Double,
    bins: Int,
    ps: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountHist.Sketch]
  with UnaryLike[Expression] {

  override def prettyName: String = "hist_quantiles"
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("below", LongType, nullable = false),
    StructField("above", LongType, nullable = false),
    StructField("quantiles", ArrayType(DoubleType, containsNull = false),
      nullable = true)))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): CountHist.Sketch =
    new CountHist.Sketch(lo, hi, bins)

  override def update(buf: CountHist.Sketch,
                      input: InternalRow): CountHist.Sketch = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: CountHist.Sketch,
                     other: CountHist.Sketch): CountHist.Sketch =
    buf.merge(other)

  override def eval(buf: CountHist.Sketch): Any = {
    val total = buf.n
    val qs =
      if (total == 0L) null
      else {
        // one ascending pass collects every quantile: cum crosses the
        // fractional ranks in order because ps is ascending
        val out = new Array[Double](ps.length)
        val width = buf.width
        var qi = 0
        var cum = 0L
        var b = 0
        while (b < buf.bins && qi < ps.length) {
          val c = buf.counts(b)
          if (c > 0) {
            var r = ps(qi) * (total - 1)
            while (qi < ps.length && r < cum + c) {
              val frac = (r - cum + 0.5) / c
              out(qi) = buf.lo + width * (b + frac)
              qi += 1
              if (qi < ps.length) r = ps(qi) * (total - 1)
            }
          }
          cum += c
          b += 1
        }
        // p == 1 + trailing-zero path of Sketch.quantile: right edge
        while (qi < ps.length) { out(qi) = buf.hi; qi += 1 }
        new GenericArrayData(out)
      }
    InternalRow(total, buf.below, buf.above, qs)
  }

  override def serialize(buf: CountHist.Sketch): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 + 4 + 8 + 8 + 8 * buf.bins)
    bb.putDouble(buf.lo).putDouble(buf.hi).putInt(buf.bins)
    bb.putLong(buf.below).putLong(buf.above)
    var i = 0
    while (i < buf.bins) { bb.putLong(buf.counts(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CountHist.Sketch = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CountHist.Sketch(bb.getDouble, bb.getDouble, bb.getInt)
    buf.below = bb.getLong
    buf.above = bb.getLong
    var i = 0
    while (i < buf.bins) { buf.counts(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): HistQuantiles =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HistQuantiles =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): HistQuantiles =
    copy(child = newChild)
}

object HistQuantiles {
  /** Column API: struct(n, below, above, quantiles) of `c`'s CountHist
    * sketch over [lo, hi] with `bins` cells at ascending percentiles
    * `ps`. Nulls/NaN skipped, as in [[HistCounts.of]]. */
  def of(c: Column, lo: Double, hi: Double, bins: Int,
         ps: Seq[Double]): Column = {
    require(bins > 0, s"hist_quantiles needs bins > 0, got $bins")
    require(lo < hi, s"hist_quantiles needs lo < hi, got [$lo, $hi]")
    require(ps.nonEmpty, "hist_quantiles needs at least one percentile")
    ps.foreach(p => require(p >= 0.0 && p <= 1.0, s"bad percentile $p"))
    require(ps == ps.sorted, s"percentiles must be ascending: $ps")
    val cd = c.cast("double")
    val clean = org.apache.spark.sql.functions.when(
      org.apache.spark.sql.functions.isnan(cd), null).otherwise(cd)
    Bridge.column(
      HistQuantiles(Bridge.expression(clean), lo, hi, bins, ps)
        .toAggregateExpression())
  }
}
