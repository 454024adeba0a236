package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PQ recall probe backing the q_pq_recall floor and the NOTES PQ
  * guidance: per-query recall@k of ADC top-k vs the exact brute-force
  * top-k on an SF's embeddings table, for a given (m, ksub).
  *
  * Usage: runMain graft.tools.PqProbe [sfDir] [m] [ksub] [k] [nQueries]
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val m = if (args.length > 1) args(1).toInt else 8
    val ksub = if (args.length > 2) args(2).toInt else 64
    val k = if (args.length > 3) args(3).toInt else 10
    val nQ = if (args.length > 4) args(4).toInt else 8
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"corpus rows: ${e.count()}")
    val qs = e.filter(col("vec_id") < nQ)
      .select(col("vec_id").cast("long"),
        expr("transform(embedding, x -> cast(x as double))"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val corpus = e.filter(col("vec_id") >= nQ)
    val cb = graft.pipeline.Quantize.pqTrain(corpus, "vec_id", "embedding",
      m, ksub)
    val enc = graft.pipeline.Quantize.pqEncode(corpus, "vec_id", "embedding",
      cb).cache()
    val recalls = qs.map { case (qid, qv) =>
      val q = qv.toArray
      val approx = graft.pipeline.Quantize.pqTopK(enc, cb, "vec_id", q, k)
        .collect().map(_.getLong(0)).toSet
      val exact = graft.pipeline.Similarity.bruteForceTopK(corpus, "vec_id",
        "embedding", q, k).collect().map(_.getLong(0)).toSet
      val r = (approx & exact).size.toDouble / k
      println(f"q$qid%-6d recall@$k = $r%.2f")
      r
    }
    println(f"mean recall@$k (m=$m ksub=$ksub): ${recalls.sum / recalls.length}%.3f")
    spark.stop()
  }
}
