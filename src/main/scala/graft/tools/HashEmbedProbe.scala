package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object HashEmbedProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"$name%-30s best=${ts.min}%.3f")
    }
    val tok = docs.na.drop(Seq("doc_id","text"))
      .select(col("doc_id"), explode(graft.pipeline.TextAnalysis.tokens(col("text"))).as("t"))
      .filter(col("t") =!= "")
    time("explode only")(tok.write.format("noop").mode("overwrite").save())
    time("explode+md5")(tok.select(col("doc_id"), md5(col("t")).as("m")).write.format("noop").mode("overwrite").save())
    val m = tok.select(col("doc_id"), md5(col("t")).as("m"))
    time("explode+md5+conv")(m.select(col("doc_id"),
      pmod(conv(substring(col("m"),1,15),16,10).cast("long"), lit(64L)).as("i")).write.format("noop").mode("overwrite").save())
    time("explode+md5+2conv")(m.select(col("doc_id"),
      pmod(conv(substring(col("m"),1,15),16,10).cast("long"), lit(64L)).as("i"),
      (conv(substring(col("m"),16,1),16,10).cast("long") % 2).as("s")).write.format("noop").mode("overwrite").save())
    time("full sums agg")(m.select(col("doc_id"),
      pmod(conv(substring(col("m"),1,15),16,10).cast("long"), lit(64L)).as("i"),
      when(conv(substring(col("m"),16,1),16,10).cast("long") % 2 === 0, 1.0).otherwise(-1.0).as("s"))
      .groupBy("doc_id","i").agg(sum("s")).write.format("noop").mode("overwrite").save())
    time("full hashEmbed")(graft.pipeline.TextAnalysis.hashEmbed(docs,"doc_id","text",64).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
