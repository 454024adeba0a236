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

    benchPair("bench_pack_greedy")(graft.pipeline.Packing.packingSummary(
      graft.pipeline.Packing.packGreedy(docs, "doc_id", "n_tokens", 512), 512))
    benchPair("bench_mahal3col")(graft.Queries.queries("q_mahalanobis_3col")(spark, sfDir))
    benchPair("bench_roc")(graft.Queries.queries("q_roc")(spark, sfDir))
    spark.stop()
  }
}
