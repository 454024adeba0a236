package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed 2-D skyline (Pareto front): the rows not dominated on a
  * pair of maximize-both criteria — quality-vs-length document
  * selection, cost-vs-coverage source picks, any "keep the efficient
  * frontier" cut. A row p is DOMINATED iff some row q has q.x ≥ p.x and
  * q.y ≥ p.y with at least one strict; duplicates of a surviving point
  * all survive (they dominate neither twin).
  *
  * Algorithm (the sort-sweep identity, distributed): reduce to distinct
  * x first — within equal x only the max-y rows can survive — then
  * sweep distinct x DESCENDING keeping groups whose max-y strictly
  * exceeds every higher-x group's max-y. The sweep is a prefix-max,
  * which distributes exactly like [[graft.eval.BinaryMetrics.liftTable]]'s
  * ranking: range-sort the distinct-x frame, pass 1 collects per-
  * partition maxima (driver computes each partition's EXCLUSIVE prefix
  * max — one tiny array), pass 2 sweeps each partition independently
  * seeded with its prefix. No single-partition window anywhere; the
  * full-row frame is touched only by one hash aggregate and one
  * semi-join of the (small) frontier frame.
  *
  * To minimize a criterion, negate it on the way in. Output: the
  * input's surviving rows, original schema.
  */
object Skyline {

  def skyline2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    val base = df.na.drop(Seq(xCol, yCol))
    val dx = base.groupBy(col(xCol).as("__sx"))
      .agg(max(col(yCol)).as("__sy"))
    val np = spark.sessionState.conf.numShufflePartitions
    val sorted = dx.repartitionByRange(np, col("__sx").desc)
      .sortWithinPartitions(col("__sx").desc)
    // InternalRow on both passes; pass 2 re-emits the (reused) sorted row
    // itself — safe: the planned RDDScanExec unsafe-projects each row
    // before anything downstream buffers it
    val rdd = sorted.queryExecution.toRdd // both passes reuse the one sort shuffle
    val yGet = numGetter(sorted.schema(1).dataType)
    // pass 1: per-partition max of __sy (null-safe: empty partitions)
    val partMax = rdd.mapPartitionsWithIndex { (pi, it) =>
      var m = Double.NegativeInfinity
      var any = false
      it.foreach { r =>
        val y = yGet(r); if (y > m) m = y; any = true
      }
      Iterator.single((pi, if (any) m else Double.NegativeInfinity))
    }.collect().sortBy(_._1).map(_._2)
    // exclusive prefix max per partition: the best y of all STRICTLY
    // higher-x partitions (sort is descending, so all earlier ones)
    val prefix = partMax.scanLeft(Double.NegativeInfinity)(math.max)
    // pass 2: independent per-partition sweep seeded with the prefix
    val survivors = rdd.mapPartitionsWithIndex { (pi, it) =>
      var best = prefix(pi)
      it.flatMap { r =>
        val y = yGet(r)
        if (y > best) { best = y; Iterator.single(r) }
        else Iterator.empty
      }
    }
    val frontier = org.apache.spark.sql.graft.InternalRows
      .toDF(spark, survivors, sorted.schema)
    // keep every input row sitting ON the frontier (duplicates survive);
    // the frontier frame is small — AQE broadcasts it
    base.join(frontier,
      col(xCol) === col("__sx") && col(yCol) === col("__sy"), "leftsemi")
  }

  private def numGetter(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.catalyst.InternalRow => Double = {
    import org.apache.spark.sql.types._
    dt match {
      case DoubleType     => r => r.getDouble(1)
      case FloatType      => r => r.getFloat(1).toDouble
      case LongType       => r => r.getLong(1).toDouble
      case IntegerType    => r => r.getInt(1).toDouble
      case ShortType      => r => r.getShort(1).toDouble
      case ByteType       => r => r.getByte(1).toDouble
      case d: DecimalType => r => r.getDecimal(1, d.precision, d.scale).toDouble
      case other =>
        throw new IllegalArgumentException(
          s"skyline2d needs a numeric y column, got type $other")
    }
  }
}
