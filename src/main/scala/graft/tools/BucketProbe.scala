package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: hyperplane-LSH bucket occupancy of an embeddings table —
  * prints the bucket-size distribution (top buckets, share of mass) for
  * a given signature width. Quantifies how far occupancy deviates from
  * uniform when the data has cluster structure (similar vectors share
  * signatures at ANY width — that is what makes LSH work, and what makes
  * its buckets track cluster mass instead of n/2^bits).
  * Usage: runMain graft.tools.BucketProbe <sfDir> <bits> [table]
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val bits = args(1).toInt
    val table = if (args.length > 2) args(2).toInt else 0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val planes = graft.pipeline.Dedup.hyperplanes(bits, 64, table)
    val bc = spark.sparkContext.broadcast(planes)
    val buckets = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(expr("transform(embedding, x -> cast(x as double))").as("v"))
      .as[Array[Double]]
      .map { v =>
        val ps = bc.value
        var bucket = 0L
        var b = 0
        while (b < ps.length) {
          val p = ps(b)
          var dot = 0.0
          var j = 0
          while (j < v.length) { dot += v(j) * p(j); j += 1 }
          if (dot > 0) bucket |= (1L << b)
          b += 1
        }
        bucket
      }.toDF("bucket").groupBy("bucket").agg(count(lit(1)).as("n"))
      .orderBy(desc("n")).collect()
    val total = buckets.map(_.getLong(1)).sum.toDouble
    val top = buckets.take(10).map(r => r.getLong(1))
    println(s"""{"bits":$bits,"cells_used":${buckets.length},""" +
      s""""n":${total.toLong},"top10":[${top.mkString(",")}],""" +
      f""""top1_share":${top.head / total}%.4f,""" +
      f""""top10_share":${top.sum / total}%.4f}""")
    spark.stop()
  }
}
