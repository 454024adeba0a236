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
    def timeU(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    def decoded = li.na.drop(cols)
      .select(cols.map(c => col(c).cast("double").as(c)): _*)
      .rdd.map { r => Array(r.getDouble(0), r.getDouble(1), r.getDouble(2)) }
    timeU("a_decode_count")(decoded.foreach(_ => ()))
    def decodedInternal = li.na.drop(cols)
      .select(cols.map(c => col(c).cast("double").as(c)): _*)
      .queryExecution.toRdd.mapPartitions(_.map { ir =>
        Array(ir.getDouble(0), ir.getDouble(1), ir.getDouble(2))
      })
    timeU("a2_decode_internal")(decodedInternal.foreach(_ => ()))
    timeU("b2_sort_internal")(decodedInternal.map(a => (a(0), a))
      .repartitionAndSortWithinPartitions(
        new org.apache.spark.HashPartitioner(32))
      .foreach(_ => ()))
    timeU("b_one_sort_count")(decoded.map(a => (a(0), a))
      .repartitionAndSortWithinPartitions(
        new org.apache.spark.HashPartitioner(32))
      .foreach(_ => ()))
    time("spearman_k3")(graft.agg.Stats.corrSpearman(li, cols))
    spark.stop()
  }
}
