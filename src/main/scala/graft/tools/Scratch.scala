package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

    val minLen = 60
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .na.drop(Seq("doc_id", "text"))
      .select(col("doc_id").cast("long").as("__id"), col("text").as("__t"))
    def wins = docs.filter(length(col("__t")) >= minLen)
      .select(col("__id"),
        explode(sequence(lit(1L),
          (length(col("__t")) - lit(minLen - 1)).cast("long"))).as("__pos"),
        col("__t"))
      .select(col("__id"), col("__pos"),
        col("__t").substr(col("__pos").cast("int"), lit(minLen)).as("__sub"))

    time("windows")(wins)
    time("winhash")(wins.select(xxhash64(col("__sub")).as("__h")))
    def dupH = wins.select(xxhash64(col("__sub")).as("__h"))
      .groupBy("__h").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2).select("__h")
    time("dupH")(dupH)
    def cand = wins.withColumn("__h", xxhash64(col("__sub"))).join(dupH, "__h")
    time("cand")(cand)
    val bySub = Window.partitionBy("__sub")
    def removed = cand
      .withColumn("__n", count(lit(1)).over(bySub))
      .withColumn("__own",
        min(struct(col("__id").as("i"), col("__pos").as("p"))).over(bySub))
      .filter(col("__n") >= 2 &&
        !(col("__own.i") === col("__id") && col("__own.p") === col("__pos")))
      .select("__id", "__pos")
    time("removed")(removed)
    time("spans")(graft.pipeline.SubstringDedup.repeatedSubstringSpans(
      spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text"),
      "doc_id", "text", minLen))
    spark.stop()
  }
}
