package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage decomposition for the query under diagnosis (scratch —
  * contents change per investigation). Currently: q_cc_update anatomy —
  * the heaviest idle row after the r14 session-1 fixes (3.1 s idle at
  * sf0.1): how much is the ngram pair pipeline, the base CC, the
  * incremental fold, and the output sort. */
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

    def documents = spark.read.parquet(s"$sfDir/documents.parquet")
    def mkPairs = graft.pipeline.Dedup
      .ngramJaccard(documents, "doc_id", "text", 3, maxDf = 20)
      .filter(col("jaccard") >= 0.3)
      .select("id_a", "id_b")

    def timeStage(name: String, runs: Int = 2)(body: => Unit): Unit = {
      clearAll(); body // warm-up
      val ts = (1 to runs).map { _ =>
        clearAll()
        val t0 = System.nanoTime(); body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-30s best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    timeStage("1_pairs_noop") {
      mkPairs.write.format("noop").mode("overwrite").save()
    }
    timeStage("2_pairs_cached_count") {
      val p = mkPairs.cache(); p.count(); ()
    }
    timeStage("3_cc_base_only") {
      val p = mkPairs.cache()
      val base = p.filter((col("id_a") + col("id_b")) % 2 === 0)
      graft.pipeline.Components.connectedComponents(base)
        .write.format("noop").mode("overwrite").save()
    }
    timeStage("4_full_cc_update") {
      graft.Queries.queries("q_cc_update")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
