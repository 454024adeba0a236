package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: times Dedup.minhashDedup on a documents table with and
  * without the df stop-list, printing pair counts — quantifies the
  * dup-heavy-corpus mitigation the maxDf knob provides.
  * Usage: runMain graft.tools.MinhashProbe <sfDir> <maxDf> [threshold]
  *
  * `maxDf` < 1 (e.g. 0.02) is interpreted as `maxDfFraction` — the
  * scale-stable fractional form resolved against the corpus doc count —
  * so the same invocation measures the fractional path at any SF.
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val dfArg = args(1).toDouble
    val threshold = if (args.length > 2) args(2).toDouble else 0.8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t0 = System.nanoTime()
    val n =
      if (dfArg < 1.0)
        graft.pipeline.Dedup.minhashDedup(docs, "doc_id", "text",
          threshold = threshold, maxDfFraction = dfArg).count()
      else
        graft.pipeline.Dedup.minhashDedup(docs, "doc_id", "text",
          threshold = threshold, maxDf = dfArg.toInt).count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"maxDf":$dfArg,"threshold":$threshold,"pairs":$n,"sec":$secs%.1f}""")
    spark.stop()
  }
}
