package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage decomposition for the query under diagnosis (scratch —
  * contents change per investigation). Currently: r14 optimization-round
  * anatomy of the SortedQuantiles/RangeCum sort path at gate scale (the
  * quantile family regressed 2-5x at sf0.1 when the buffering
  * ExactPercentile funnel moved to the sort path — find out which stage
  * of the sort path carries the constant). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def clearAll(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      graft.util.CacheRegistry.clear()
      System.gc()
    }

    def time(name: String, runs: Int = 2)(mk: => DataFrame): Unit = {
      clearAll()
      mk.write.format("noop").mode("overwrite").save() // warm-up
      val ts = (1 to runs).map { _ =>
        clearAll()
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-34s best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    // eager variants (RangeCum runs jobs at build time)
    def timeEager(name: String, runs: Int = 2)(mk: => Unit): Unit = {
      clearAll()
      mk // warm-up
      val ts = (1 to runs).map { _ =>
        clearAll()
        val t0 = System.nanoTime()
        mk
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-34s best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    def lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")

    import graft.agg.SortedQuantiles
    val reqs = Seq(SortedQuantiles.Req("__q_l_extendedprice",
      col("l_extendedprice"), Seq(0.25, 0.75)))
    def cells = SortedQuantiles.cellsOf(lineitem, Nil, reqs)
    val np = spark.sessionState.conf.numShufflePartitions

    time("A_cells_noop")(cells)
    time("B_cells_rangesorted_noop")(
      cells.repartitionByRange(np, col("__qc"), col("__v").asc)
        .sortWithinPartitions(col("__qc"), col("__v").asc))
    timeEager("C_rangecum_pass1_only") {
      // what cumSumWithTotals does eagerly: sort + .rdd subtotal collect
      val sorted = cells.repartitionByRange(np, col("__qc"), col("__v").asc)
        .sortWithinPartitions(col("__qc"), col("__v").asc)
      val rdd = sorted.rdd
      rdd.mapPartitionsWithIndex { (pi, it) =>
        var c = 0.0
        while (it.hasNext) { c += it.next().getDouble(2); }
        Iterator.single((pi, c))
      }.collect()
      ()
    }
    timeEager("D_cumsum_build_plus_noop") {
      val (cum, _) = graft.util.RangeCum.cumSumWithTotals(
        cells, Seq("__qc"), "__v", Seq("__c"))
      cum.write.format("noop").mode("overwrite").save()
    }
    timeEager("E_sortedq_of_build_plus_noop") {
      SortedQuantiles.of(lineitem, Nil, reqs)
        .write.format("noop").mode("overwrite").save()
    }
    time("F_q_fence_cap")(graft.Queries.queries("q_fence_cap")(spark, sfDir))
    time("G_q_stratify_quantile")(
      graft.Queries.queries("q_stratify_quantile")(spark, sfDir))
    time("H_q_percentiles")(graft.Queries.queries("q_percentiles")(spark, sfDir))

    spark.stop()
  }
}
