package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-facing query registry. Each entry pairs a Spark implementation
  * (built on the graft library) with an equivalent DuckDB SQL oracle.
  *
  * Determinism rules (the driver hash-compares values):
  *  - every multi-row result is ORDER BY'd on its key columns in BOTH sides;
  *  - every floating-point aggregate is rounded the same way on both sides
  *    (sums of doubles are order-dependent in the last ulps);
  *  - DuckDB `sum(int)` yields HUGEINT — always cast to BIGINT/DOUBLE to
  *    match Spark's types.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Gate-only rows carry an exact-verification HARNESS (e.g. a guarded
      * all-pairs baseline) alongside the operator: they run in Verify —
      * hash-checked — but are excluded from Bench, whose numbers should
      * measure operator cost, not the harness. Each gate-only row has a
      * cheap operator-cost twin that IS benched. */
    gateOnly: Boolean = false)

object Queries {

  /** The full gate, tier files concatenated in their original order
    * (split from one 11k-line file, r11 VERDICT #8 — relocation only).
    * Add new queries to the matching tier file; the name guard below
    * still fails loudly on any cross-file duplicate. */
  val defs: Seq[QueryDef] = QueriesCore.defs ++
    QueriesDedup.defs ++
    QueriesEmbed.defs ++
    QueriesCorpus.defs ++
    QueriesCuration.defs ++
    QueriesEvents.defs ++
    QueriesInference.defs ++
    QueriesEr.defs ++
    QueriesAnalytics.defs

  // A duplicated QueryDef name silently SHADOWS the earlier row in the
  // Maps below (fn and oracle together, so the gate still "passes" while
  // a query vanishes) — fail loudly at first use instead (the round-11
  // q_ngram_novelty collision lesson).
  private lazy val nameGuard: Unit = {
    val dups = defs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate QueryDef names: ${dups.mkString(", ")}")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    nameGuard
    defs.map(q => q.name -> q.fn).toMap
  }
  /** Bench subset: everything except the gate-only verification rows. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] = {
    nameGuard
    defs.filterNot(_.gateOnly).map(q => q.name -> q.fn).toMap
  }
  def oracleSql: Map[String, String] = {
    nameGuard
    defs.flatMap(q => q.oracle.map(o => q.name -> o.linesIterator
      .map(_.trim).mkString(" "))).toMap
  }
}

