package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.MisraGries

/** Exact heavy hitters at scale: one bounded-state Misra–Gries pass for
  * candidates, then an exact recount restricted to them.
  *
  * Why not `groupBy(col).count().filter(_ >= t)`: that shuffles the FULL
  * key cardinality (every distinct token of a 100-TB corpus) to find a
  * handful of frequent keys. Here the first pass aggregates into O(k)
  * state per partition (shuffle = partitions × k rows → one reducer),
  * and the second pass recounts only the ≤ k candidate keys after a
  * broadcast semi join — both passes scale with data volume, neither
  * with key cardinality.
  *
  * Exactness: MG guarantees every item with true count > n/(k+1)
  * survives the sketch. `heavyHitters` sizes k so that the requested
  * support threshold clears that bound, making candidates a SUPERSET of
  * the true answer; the exact recount then makes the OUTPUT exactly
  * "all values with count ≥ ⌈support·n⌉" — deterministic and
  * independent of partitioning/merge order even though the candidate
  * set itself is not. Extension tier — no reference analog.
  */
object Frequency {

  /** MG candidate (item, cnt-lower-bound) rows for `valueCol`, capacity
    * k. Diagnostic / building block — counts are lower bounds and the
    * set depends on merge order; use [[heavyHitters]] for exact output. */
  def mgCandidates(df: DataFrame, valueCol: String, k: Int): DataFrame =
    df.select(explode(MisraGries.of(col(valueCol), k)).as("__graft_mg"))
      .select(col("__graft_mg.item").as("item"), col("__graft_mg.cnt").as("cnt"))

  /** All values of `valueCol` occurring in at least `support` fraction
    * of non-null rows, with their EXACT counts: (value, cnt),
    * cnt ≥ ⌈support·n⌉. `slack` (> 1) multiplies the sketch capacity
    * above the 1/support minimum so the MG bound n/(k+1) sits safely
    * under the threshold. */
  def heavyHitters(df: DataFrame, valueCol: String, support: Double,
                   slack: Double = 2.0): DataFrame = {
    require(support > 0 && support <= 1,
      s"heavyHitters needs support in (0,1], got $support")
    require(slack > 1, s"heavyHitters needs slack > 1, got $slack")
    graft.util.Errors.context("heavyHitters", Seq(valueCol)) {
    val spark = df.sparkSession
    import spark.implicits._
    val k = math.min(math.ceil(slack / support).toLong, 10000000L).toInt
    // one pass: sketch + exact n in the same aggregate (no extra scan)
    val row = df.agg(
      MisraGries.of(col(valueCol), k).as("mg"),
      count(col(valueCol)).as("n")).head()
    val n = row.getLong(1)
    if (n == 0)
      return Seq.empty[(String, Long)].toDF("value", "cnt")
    val threshold = math.ceil(support * n).toLong
    val cands = row.getSeq[org.apache.spark.sql.Row](0)
      .map(_.getString(0))
    val candDf = cands.toDF("value")
    // exact recount of candidates only: broadcast semi join keeps the
    // scan full-speed; the groupBy shuffles ≤ k distinct keys
    df.select(col(valueCol).cast("string").as("value"))
      .join(broadcast(candDf), Seq("value"), "left_semi")
      .groupBy("value").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  } }

  /** Per-GROUP heavy hitters: within every `groupCol` value, the
    * `valueCol` values occurring in ≥ `support` fraction of that group's
    * non-null rows, with EXACT counts — (group, value, cnt). The
    * per-source stop-word / boilerplate-token report ("which tokens
    * dominate THIS crawl") without shuffling any group's full value
    * distribution.
    *
    * Scale shape: one grouped sketch aggregate (state O(groups · k),
    * map-side combined — the same [[graft.expr.MisraGries]] buffer per
    * group), candidates exploded to a (group, value) frame of ≤ groups·k
    * rows (broadcast into the recount join), then an exact recount
    * keyed (group, value) that shuffles only candidate matches. The MG
    * guarantee is per group: capacity ⌈slack/support⌉ keeps every value
    * above its own group's threshold in the candidate set. */
  def heavyHittersByGroup(df: DataFrame, groupCol: String, valueCol: String,
                          support: Double, slack: Double = 2.0): DataFrame = {
    require(support > 0 && support <= 1,
      s"heavyHittersByGroup needs support in (0,1], got $support")
    require(slack > 1, s"heavyHittersByGroup needs slack > 1, got $slack")
    graft.util.Errors.context("heavyHittersByGroup", Seq(groupCol, valueCol)) {
    val k = math.min(math.ceil(slack / support).toLong, 10000000L).toInt
    val clean = df.na.drop(Seq(groupCol))
    val sk = clean.groupBy(col(groupCol).as("__graft_g"))
      .agg(MisraGries.of(col(valueCol), k).as("__graft_mg"),
        count(col(valueCol)).as("__graft_n"))
    val cands = sk.select(col("__graft_g"),
        ceil(col("__graft_n") * lit(support)).cast("long").as("__graft_thr"),
        explode(col("__graft_mg")).as("__graft_c"))
      .select(col("__graft_g"), col("__graft_thr"),
        col("__graft_c.item").as("__graft_v"))
    clean.select(col(groupCol).as("__graft_g"),
        col(valueCol).cast("string").as("__graft_v"))
      .join(broadcast(cands), Seq("__graft_g", "__graft_v"))
      .groupBy("__graft_g", "__graft_v")
      .agg(count(lit(1)).as("cnt"), first(col("__graft_thr")).as("__graft_thr"))
      .filter(col("cnt") >= greatest(col("__graft_thr"), lit(1L)))
      .select(col("__graft_g").as(groupCol), col("__graft_v").as("value"),
        col("cnt"))
  } }
}
