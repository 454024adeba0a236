package graft.scale

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale techniques as first-class utilities (the 100-TB toolbox):
  * bucketed co-located joins and skew-salted joins. These do not change
  * query SEMANTICS — they shape the physical plan.
  */
object ScaleOps {

  /** Key-skew report for a prospective join/aggregation key: the
    * diagnostics that decide BETWEEN the tools in this toolbox (broadcast
    * vs salted vs plain shuffle). One row:
    *   n_rows, n_keys, max_key_count (the heaviest key's rows),
    *   top1_share (that key's fraction of all rows — the straggler-task
    *   share under a hash shuffle), avg_key_count.
    * Read: top1_share ≈ 1/partitions is balanced; top1_share ≫
    * 1/partitions means the heaviest key dominates one task — salt it
    * (`saltedJoin`) or broadcast the other side.
    *
    * Scale shape: one partial/final hash aggregate keyed on the key
    * (vocab-of-keys rows), then a scalar aggregate over the counts —
    * two shuffles of count rows, nothing driver-side. */
  def skewReport(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "skewReport needs at least one key column")
    val counts = df.na.drop(keys)
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
    // coalesce: sum/max over zero rows are null — an empty (or all-null-key)
    // frame must yield a well-defined all-zeros report, not NPE the caller
    // making the broadcast/salt decision
    counts.agg(
      coalesce(sum("__n"), lit(0L)).as("n_rows"),
      count(lit(1)).as("n_keys"),
      coalesce(max("__n"), lit(0L)).as("max_key_count"))
      .select(col("n_rows"), col("n_keys"), col("max_key_count"),
        (col("max_key_count").cast("double") /
          greatest(col("n_rows").cast("double"), lit(1.0))).as("top1_share"),
        (col("n_rows").cast("double") /
          greatest(col("n_keys").cast("double"), lit(1.0))).as("avg_key_count"))
  }

  /** Persist a frame as a bucketed+sorted table so repeated joins and
    * aggregations on `keys` read pre-shuffled data (no Exchange at query
    * time). The write pays one shuffle; every subsequent co-located join
    * on the bucket keys pays none. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket keys — with matching bucket
    * counts Catalyst plans a sort-merge join with NO shuffle on either
    * side. */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
                   left: String, right: String, keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)

  /** Skew-resistant join of a skewed fact table against a dimension:
    * the fact side gets a deterministic per-row salt in [0, buckets),
    * the dimension is exploded `buckets`× (dims are small — that's the
    * premise of the skew), and the join key becomes (key, salt) — a hot
    * key's rows now spread over `buckets` reducers instead of one.
    *
    * AQE's skew-join handling covers sort-merge joins at runtime; manual
    * salting remains the tool when AQE can't split (e.g. aggregations
    * after the join keyed on the hot key, or stream-static joins). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int = 16): DataFrame = {
    require(buckets > 0)
    // salt from the row's own content via a stable row-hash — deterministic
    // (no rand()), uniform enough to split a hot key
    val factCols = fact.columns.map(col).toSeq
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(factCols: _*), lit(buckets.toLong)).cast("int"))
    val dimExploded = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(dimExploded, Seq(key, "__salt")).drop("__salt")
  }
}
