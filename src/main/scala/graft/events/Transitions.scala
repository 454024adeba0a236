package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition profile of an event stream: for every
  * consecutive event pair within a key (user/session), count
  * (from_type → to_type) and row-normalize into transition
  * probabilities — the "what do users do next" matrix that feeds
  * journey analysis and next-event baselines.
  *
  * Scale shape: ONE keyed window (lead over the key's time order) on the
  * event stream, then a hash aggregate onto at most |types|² rows; the
  * row normalization windows over that tiny aggregate, never the stream.
  * `tieCol` breaks equal-timestamp orderings (an event id) — without a
  * total order the lead pairing, and therefore the counts, would be
  * nondeterministic. */
object Transitions {

  /** (from_type, to_type, n, p) with p = n / Σ n over the from_type row.
    * Null key/type/ts rows are dropped; each key's last event has no
    * successor and contributes no pair. */
  def transitionMatrix(df: DataFrame, keyCol: String, typeCol: String,
                       tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val pairs = df.na.drop(Seq(keyCol, typeCol, tsCol))
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
    val counts = pairs
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    counts.withColumn("p",
      col("n") / sum("n").over(Window.partitionBy("from_type")))
  }

  /** Top session paths: the first `k` event types of each gap-delimited
    * session, joined with `>` into a path string, counted across
    * sessions — the n-gram generalization of [[transitionMatrix]]'s
    * bigrams (which path prefixes dominate, not just which single hop).
    * `tsCol` is NUMERIC (epoch micros — the [[Sessionize]] contract)
    * and `gap` shares its unit; `tieCol` totalizes the order so the
    * session split, the rank, and therefore every path string are
    * deterministic.
    *
    * Scale shape: three windows (lag → running-sum session id → rank),
    * every one KEYED on the session keys; the path assembly is one
    * (keys, session) aggregate over ≤ k rows each (collect_list is
    * bounded by the rn ≤ k filter before it), then one path-keyed
    * count. No global window, no unbounded collect. Returns the
    * `topN` (path, n) rows, count-desc with a path tie-break. */
  def sessionPaths(df: DataFrame, keys: Seq[String], tsCol: String,
                   tieCol: String, typeCol: String, gap: Long,
                   k: Int = 3, topN: Int = 20): DataFrame = {
    require(k >= 1, s"sessionPaths: k must be >= 1, got $k")
    require(topN >= 1, s"sessionPaths: topN must be >= 1, got $topN")
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col(tsCol), col(tieCol))
    val sid = df.na.drop(keys ++ Seq(tsCol, tieCol, typeCol))
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new_s", (col("__prev").isNull ||
        col(tsCol) - col("__prev") > gap).cast("int"))
      .withColumn("__sid", sum("__new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wS = Window.partitionBy(kc :+ col("__sid"): _*)
      .orderBy(col(tsCol), col(tieCol))
    val ranked = sid
      .withColumn("__rn", row_number().over(wS))
      .filter(col("__rn") <= k)
    val paths = ranked
      .groupBy(kc :+ col("__sid"): _*)
      .agg(concat_ws(">", expr(
        s"transform(array_sort(collect_list(struct(__rn, $typeCol))), " +
          s"s -> s.$typeCol)")).as("path"))
    paths.groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(topN)
  }
}
