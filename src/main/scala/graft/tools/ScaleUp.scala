package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up replicator for scaling experiments: writes a `factor`×
  * replica of a testdata directory with keys shifted per replica so key
  * cardinality grows with the data (10 verbatim copies would instead give
  * every row 9 exact duplicates and quadratic pair blowups in the dedup
  * operators — not the shape real growth has).
  *
  *  - key columns get `replica * 100M` added;
  *  - document text gets a per-replica suffix token (keeps replicas from
  *    being exact dups while preserving the shingle distribution);
  *  - embeddings get component 0 nudged by `replica * 0.01` (breaks
  *    cross-replica exact duplicates, preserves within-replica geometry);
  *  - event timestamps shift by one day per replica (grows the session /
  *    window key space);
  *  - dimension tables (region, nation) are copied once.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> <factor>
  */
object ScaleUp {

  private val Shift = 100000000L

  def main(args: Array[String]): Unit = {
    val Array(srcDir, dstDir, factorStr) = args
    val factor = factorStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copyOnce(name: String): Unit =
      spark.read.parquet(s"$srcDir/$name.parquet")
        .write.mode("overwrite").parquet(s"$dstDir/$name.parquet")

    def rep(name: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val src = spark.read.parquet(s"$srcDir/$name.parquet")
      (0 until factor).map(r => f(src, r)).reduce(_.unionAll(_))
        .write.mode("overwrite").parquet(s"$dstDir/$name.parquet")
    }
    def shiftKeys(keys: String*)(d: DataFrame, r: Int): DataFrame =
      keys.foldLeft(d)((acc, k) =>
        acc.withColumn(k, col(k) + lit(r * Shift)))

    Seq("region", "nation").foreach(copyOnce)
    rep("customer")(shiftKeys("c_custkey"))
    rep("supplier")(shiftKeys("s_suppkey"))
    rep("part")(shiftKeys("p_partkey"))
    rep("orders")(shiftKeys("o_orderkey", "o_custkey"))
    rep("lineitem")(shiftKeys("l_orderkey", "l_partkey", "l_suppkey"))
    rep("events") { (d, r) =>
      shiftKeys("event_id", "user_id")(d, r)
        .withColumn("ts", col("ts") + lit(r * 86400L * 1000000000L))
    }
    rep("documents") { (d, r) =>
      val shifted = shiftKeys("doc_id")(d, r)
      if (r == 0) shifted
      else shifted.withColumn("text", concat(col("text"), lit(s" r$r")))
    }
    rep("embeddings") { (d, r) =>
      val shifted = shiftKeys("vec_id")(d, r)
      // BOUNDED nudge on a per-replica ROTATING component: the original
      // `component 0 += r * 0.01` grew with the replica index — at
      // factor 100 the +0.99 shift dominated every vector's geometry, so
      // all high-replica vectors pointed near e0 and the corpus
      // manufactured ~10^8 above-threshold "near-dup" pairs (measured:
      // q_near_new_op emitted 106M rows at sf10). Rotating the nudged
      // component (r mod 64) and keeping the magnitude at 0.01·(1+r/64)
      // ≤ ~0.03 keeps every replica distinct while preserving the
      // original similarity structure.
      if (r == 0) shifted
      else shifted.withColumn("embedding",
        transform(col("embedding"),
          (x, i) => when(i === r % 64, x + lit(((r / 64) + 1) * 0.01f))
            .otherwise(x)))
    }
    spark.stop()
  }
}
