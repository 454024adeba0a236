package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted INCREMENTAL aggregation state — the aggregates face of the
  * persisted-index family (TextIndex = minhash, VecIndex = embeddings,
  * SubstrIndex = exact substrings, this = per-key statistics): maintain
  * count/sum/min/max/mean/variance per key for an append-only table
  * WITHOUT rescanning history. Each batch appends one set of PARTIAL
  * aggregate rows (mergeable moments — the same algebra Spark's own
  * partial aggregation uses, made durable); reads merge the partials.
  *
  * Scale shape: `append` costs one hash aggregate of the BATCH only
  * (keys-bounded output appended as parquet); `stats` merges
  * accumulated partials — ≤ batches·keys rows, nothing touches the
  * raw history. `compact` folds the partials back to one row per key
  * (atomically: write aside, swap directories) when many appends have
  * accumulated. Exactness: n/min/max are exact; sum/sumsq merge in
  * whatever order the partial files arrive, so mean/variance carry the
  * usual last-ulp reduce-order noise — identical to what any engine's
  * parallel aggregate produces.
  */
object AggIndex {

  private val StateCols = Seq("__n", "__sum", "__min", "__max", "__sumsq")

  private def partials(df: DataFrame, keys: Seq[String],
                       valueCol: String): DataFrame = {
    require(keys.nonEmpty, "AggIndex needs at least one key column")
    require(!keys.exists(_.startsWith("__")),
      s"key columns must not start with '__': $keys")
    val v = col(valueCol).cast("double")
    df.na.drop(keys :+ valueCol)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(v).as("__sum"),
        min(v).as("__min"), max(v).as("__max"),
        sum(v * v).as("__sumsq"))
  }

  /** Initialize (or reset) the state from a first batch. */
  def write(df: DataFrame, keys: Seq[String], valueCol: String,
            path: String): Unit =
    partials(df, keys, valueCol)
      .write.mode("overwrite").parquet(s"$path/state")

  /** Fold one more batch in: ONE batch-sized hash aggregate, one
    * parquet append. History is never read. */
  def append(batch: DataFrame, keys: Seq[String], valueCol: String,
             path: String): Unit =
    partials(batch, keys, valueCol)
      .write.mode("append").parquet(s"$path/state")

  /** Merged per-key statistics from the files alone: (keys…, n, sum,
    * min, max, mean, variance) — variance is the population form
    * Σx²/n − mean². Key columns are whatever the state carries (every
    * non-`__` column). */
  def stats(spark: SparkSession, path: String): DataFrame = {
    val st = spark.read.parquet(s"$path/state")
    val keys = st.columns.filterNot(_.startsWith("__")).toSeq
    val mean = col("sum") / col("n")
    st.groupBy(keys.map(col): _*)
      .agg(sum("__n").as("n"), sum("__sum").as("sum"),
        min("__min").as("min"), max("__max").as("max"),
        sum("__sumsq").as("sumsq"))
      .select(keys.map(col) ++ Seq(col("n"), col("sum"), col("min"),
        col("max"), mean.as("mean"),
        (col("sumsq") / col("n") - mean * mean).as("variance")): _*)
  }

  /** Fold accumulated partials back to one row per key. Atomic via
    * write-aside + directory swap — a crash leaves either the old or
    * the new state, never a half-written one. */
  def compact(spark: SparkSession, path: String): Unit = {
    val st = spark.read.parquet(s"$path/state")
    val keys = st.columns.filterNot(_.startsWith("__")).toSeq
    val merged = st.groupBy(keys.map(col): _*)
      .agg(sum("__n").as("__n"), sum("__sum").as("__sum"),
        min("__min").as("__min"), max("__max").as("__max"),
        sum("__sumsq").as("__sumsq"))
    merged.write.mode("overwrite").parquet(s"$path/state_compacting")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path + "/state"),
      spark.sparkContext.hadoopConfiguration)
    val cur = new org.apache.hadoop.fs.Path(s"$path/state")
    val next = new org.apache.hadoop.fs.Path(s"$path/state_compacting")
    val old = new org.apache.hadoop.fs.Path(s"$path/state_old")
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(cur, old))
      throw new java.io.IOException(s"compact: cannot move $cur aside")
    if (!fs.rename(next, cur)) {
      fs.rename(old, cur) // roll back
      throw new java.io.IOException(s"compact: cannot activate $next")
    }
    fs.delete(old, true)
  }
}
