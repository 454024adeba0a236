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
}
