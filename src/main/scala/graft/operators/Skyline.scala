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
    val rdd = sorted.rdd // both passes reuse the one sort shuffle
    // pass 1: per-partition max of __sy (null-safe: empty partitions)
    val partMax = rdd.mapPartitionsWithIndex { (pi, it) =>
      var m = Double.NegativeInfinity
      var any = false
      it.foreach { r =>
        val y = toDouble(r.get(1)); if (y > m) m = y; any = true
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
        val y = toDouble(r.get(1))
        if (y > best) { best = y; Iterator.single(r) }
        else Iterator.empty
      }
    }
    val frontier = spark.createDataFrame(survivors, sorted.schema)
    // keep every input row sitting ON the frontier (duplicates survive);
    // the frontier frame is small — AQE broadcasts it
    base.join(frontier,
      col(xCol) === col("__sx") && col(yCol) === col("__sy"), "leftsemi")
  }

  private def toDouble(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case d: java.math.BigDecimal => d.doubleValue()
    case other =>
      throw new IllegalArgumentException(
        s"skyline2d needs a numeric y column, got value $other")
  }
}
