package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.agg.Stats
import graft.clean.Clean
import graft.core.HandyFrame
import graft.ml.{HandyFencer, HandyImputer}
import graft.plotdata.PlotData
import graft.strata.{Bucket, ColStratum, Quantile, StratifiedFrame}

/** Shared scaffolding for the gate tiers (split from Queries.scala):
  * the per-table parquet readers (events normalizes its three possible
  * `ts` encodings) and cross-tier contracts (the PQ rank-dominance
  * harness). `private[graft]` — driver-facing surface stays
  * [[Queries]]/[[SparkEntry]]. */
private[graft] object QueryHelpers {

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
  def orders(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")
  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  def spark_part(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/part.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
  /** events.parquet's `ts` encoding varies with how the driver wrote the
    * file: TIMESTAMP(NANOS) arrives (with
    * spark.sql.legacy.parquet.nanosAsLong=true) as an epoch-nanos long,
    * TIMESTAMP(MICROS) without a timezone annotation as TIMESTAMP_NTZ,
    * and annotated micros as a session-tz TIMESTAMP. Normalize all three
    * to TimestampType: the session timezone is pinned to UTC
    * (Verify/Bench/Explain), so the NTZ wall-clock cast is epoch-exact
    * against DuckDB's naive-timestamp epoch_us. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Rank-wise dominance contract for ANN result sets whose ids are
    * model-dependent (PQ/IVF-PQ codebooks — SQL can't derive them): the
    * returned ids are re-scored with the EXACT cosine in-query and
    * compared rank-for-rank against the brute-force top-k. The i-th best
    * exact cosine of any k-subset of the corpus is at most the i-th
    * brute cosine, so `pq_exact_le_brute` must hold on every rank; ids
    * outside the corpus would be dropped by the re-score join and
    * surface as `pq_returned_ok` = false. brute_cos is the per-rank
    * value DuckDB replays independently. */
  def pqContract(s: SparkSession, corpus: DataFrame,
                         pqIds: DataFrame, qvec: Array[Double],
                         k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("cos"), col("vec_id")) // k rows — bounded window
    val brute = graft.pipeline.Similarity.bruteForceTopK(corpus,
        "vec_id", "embedding", qvec, k)
      .withColumn("rn", row_number().over(w))
      .select(col("rn"), col("cos").as("__bcos"))
    val nReturned = pqIds.count()
    val pqExact = graft.pipeline.Similarity.bruteForceTopK(
        corpus.join(pqIds, "vec_id"), "vec_id", "embedding", qvec, k)
      .withColumn("rn", row_number().over(w))
      .select(col("rn"), col("cos").as("__pcos"))
    brute.join(pqExact, Seq("rn"), "left")
      .select(col("rn"),
        round(col("__bcos"), 6).as("brute_cos"),
        (col("__pcos").isNull || col("__pcos") <= col("__bcos") + lit(1e-9))
          .as("pq_exact_le_brute"),
        lit(nReturned <= k).as("pq_returned_ok"))
      .orderBy("rn")
  }

  /** DuckDB replay of [[pqContract]]: the brute top-k per rank + the
    * flags the Spark side must have proven true. */
  val pqContractOracle: String =
    """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
        WHERE vec_id = 0),
      s AS (SELECT vec_id,
        list_cosine_similarity(embedding::DOUBLE[], qv) AS cos
        FROM embeddings, q WHERE vec_id != 0),
      b AS (SELECT cos, row_number() OVER (ORDER BY cos DESC, vec_id)
        AS rn FROM s)
      SELECT rn, round(cos, 6) AS brute_cos, true AS pq_exact_le_brute,
        true AS pq_returned_ok
      FROM b WHERE rn <= 10 ORDER BY rn"""
}
