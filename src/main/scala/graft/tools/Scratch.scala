package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage decomposition for the query under diagnosis (scratch —
  * contents change per investigation). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        graft.pipeline.TextAnalysis.tokenCount(col("text")).as("n_tokens"))

    def benchPair(name: String)(mk: => DataFrame): Unit = {
      val pair = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        System.gc()
        def once: Double = {
          val t0 = System.nanoTime()
          mk.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        math.min(once, once)
      }
      println(f"$name%-28s benchmin=${pair.map(t => f"$t%.3f").mkString(",")}")
    }

    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val ncols = Seq("l_orderkey", "l_partkey", "l_suppkey")
    val strata = Seq("l_returnflag")
    time("a_strat_expand_now")(graft.agg.Stats.nuniqueExact(li, ncols, strata))
    time("b_strat_percol")(ncols.map { c =>
      li.groupBy((strata :+ c).map(col): _*).agg(count(lit(1)).as("__o"))
        .groupBy(strata.map(col): _*).agg(count(col(c)).as(c))
    }.reduce(_.join(_, strata)))
    spark.stop()
  }
}
