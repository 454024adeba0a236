package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank/score fusion for hybrid retrieval — combining a lexical run
  * (BM25) with a semantic run (embedding cosine), or any N scored runs
  * over the same (query, doc) key space, into one ranking. The missing
  * half of the retrieval tier: [[graft.pipeline.Relevance]] and
  * [[graft.pipeline.Similarity]] produce runs, [[RankingMetrics]]
  * evaluates them, this fuses them.
  *
  * Scale shape (both methods): each run takes ONE query-keyed window
  * pass (rank / min-max bounds — parallelism is query cardinality, the
  * right partitioning for a retrieval batch of millions of queries),
  * then the runs union and fold into ONE (query, doc) hash aggregate.
  * Nothing global ever sorts; no run is collected. `depth` cuts each
  * run's tail BEFORE the union so the shuffle carries top-N·runs rows
  * per query, not whole corpora — at 100 TB the fused frame is bounded
  * by queries × depth × runs regardless of corpus size.
  */
object Fusion {

  /** Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    *
    *   rrf(q, d) = Σ_runs 1 / (k + rank_run(q, d))
    *
    * Ranks are per-run, per-query `row_number` ordered by
    * (score DESC, doc ASC) — exact score ties break on the doc id so
    * both ranking and fusion are fully deterministic. A doc absent from
    * a run contributes nothing for that run (standard RRF; no imputed
    * tail rank). `k` damps the top-rank dominance (60 is the paper's
    * value and the de-facto default everywhere); `depth` > 0 keeps only
    * each run's top-`depth` rows per query before fusing.
    *
    * Output: (queryCol, docCol, n_runs, rrf_score, fused_rank) with
    * fused_rank a per-query row_number over (rrf_score DESC, doc ASC).
    * The score is a sum of exact reciprocals 1/(k+r) — identical IEEE
    * ops in any engine, so results replay bit-for-bit.
    */
  def rrf(runs: Seq[DataFrame], queryCol: String, docCol: String,
          scoreCol: String, k: Int = 60, depth: Int = 0): DataFrame = {
    require(runs.nonEmpty, "rrf needs at least one run")
    require(k >= 1, s"rrf damping k must be >= 1, got $k")
    require(depth >= 0, s"depth must be >= 0 (0 = no cut), got $depth")
    graft.util.Errors.context("rrf", Seq(queryCol, docCol, scoreCol)) {
      val w = Window.partitionBy("__graft_q")
        .orderBy(col("__graft_s").desc, col("__graft_d"))
      val ranked = runs.map { run =>
        val r = run.na.drop(Seq(queryCol, docCol, scoreCol))
          .select(col(queryCol).as("__graft_q"), col(docCol).as("__graft_d"),
            col(scoreCol).cast("double").as("__graft_s"))
          .withColumn("__graft_r", row_number().over(w))
        if (depth > 0) r.filter(col("__graft_r") <= depth) else r
      }
      val fusedW = Window.partitionBy("__graft_q")
        .orderBy(col("rrf_score").desc, col("__graft_d"))
      ranked.reduce(_ unionByName _)
        .groupBy("__graft_q", "__graft_d")
        .agg(count(lit(1)).as("n_runs"),
          sum(lit(1.0) / (lit(k.toDouble) + col("__graft_r")))
            .as("rrf_score"))
        .withColumn("fused_rank", row_number().over(fusedW))
        .select(col("__graft_q").as(queryCol), col("__graft_d").as(docCol),
          col("n_runs"), col("rrf_score"), col("fused_rank"))
    }
  }

  /** Convex score fusion after per-query min-max normalization:
    *
    *   fused(q, d) = Σ_i w_i · (s_i(q,d) − min_i(q)) / (max_i(q) − min_i(q))
    *
    * — the CombSUM-with-normalization family; use when the runs' score
    * SCALES carry information RRF's rank-only view throws away (a cosine
    * of 0.99 vs 0.71 at ranks 1-2 fuses differently from 0.72 vs 0.71).
    * A run whose per-query scores are all equal normalizes to 0 (its
    * evidence is uninformative for that query, matching CombSUM on a
    * constant run). Docs absent from a run contribute 0 for that run.
    * `weights` must match `runs` in length; they are NOT renormalized —
    * pass weights summing to 1 if a [0,1] fused score is wanted.
    *
    * Output: (queryCol, docCol, n_runs, fused_score, fused_rank); ties
    * in fused_score break on the doc id. Bit-exactness caveat: the
    * normalized terms replay exactly only when the input scores do
    * (cosine/dot via [[graft.pipeline.Dedup.cosine]] do; scores built
    * from engine-varying `ln`/aggregation orders carry last-ulp noise —
    * round downstream when comparing across engines).
    */
  def weightedFuse(runs: Seq[DataFrame], weights: Seq[Double],
                   queryCol: String, docCol: String, scoreCol: String,
                   depth: Int = 0): DataFrame = {
    require(runs.nonEmpty, "weightedFuse needs at least one run")
    require(runs.length == weights.length,
      s"got ${runs.length} runs but ${weights.length} weights")
    require(depth >= 0, s"depth must be >= 0 (0 = no cut), got $depth")
    graft.util.Errors.context("weightedFuse",
        Seq(queryCol, docCol, scoreCol)) {
      val rankW = Window.partitionBy("__graft_q")
        .orderBy(col("__graft_s").desc, col("__graft_d"))
      val boundsW = Window.partitionBy("__graft_q")
      val normalized = runs.zip(weights).map { case (run, wgt) =>
        val r0 = run.na.drop(Seq(queryCol, docCol, scoreCol))
          .select(col(queryCol).as("__graft_q"), col(docCol).as("__graft_d"),
            col(scoreCol).cast("double").as("__graft_s"))
        val r = if (depth > 0)
          r0.withColumn("__graft_r", row_number().over(rankW))
            .filter(col("__graft_r") <= depth).drop("__graft_r")
        else r0
        // min/max over the (depth-cut) run itself: normalization bounds
        // come from what is being fused, so a run's tail can't stretch
        // the scale of its head
        r.withColumn("__graft_lo", min("__graft_s").over(boundsW))
          .withColumn("__graft_hi", max("__graft_s").over(boundsW))
          .select(col("__graft_q"), col("__graft_d"),
            when(col("__graft_hi") === col("__graft_lo"), lit(0.0))
              .otherwise(lit(wgt) * (col("__graft_s") - col("__graft_lo")) /
                (col("__graft_hi") - col("__graft_lo")))
              .as("__graft_c"))
      }
      val fusedW = Window.partitionBy("__graft_q")
        .orderBy(col("fused_score").desc, col("__graft_d"))
      normalized.reduce(_ unionByName _)
        .groupBy("__graft_q", "__graft_d")
        .agg(count(lit(1)).as("n_runs"),
          sum(col("__graft_c")).as("fused_score"))
        .withColumn("fused_rank", row_number().over(fusedW))
        .select(col("__graft_q").as(queryCol), col("__graft_d").as(docCol),
          col("n_runs"), col("fused_score"), col("fused_rank"))
    }
  }
}
