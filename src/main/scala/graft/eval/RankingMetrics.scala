package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking-quality metrics for the retrieval tier (BM25, IVF/PQ ANN,
  * kNN graphs): per-query recall@k, precision@k, MRR, and nDCG@k of a
  * ranked result set against a relevance truth set. The evaluation side
  * of the similarity-search tier, the way [[BinaryMetrics]] is the
  * evaluation side of the classifier tier.
  *
  * Scale shape: one (query, doc) equi-join of the rank-≤-k results
  * against the truth set, then two query-keyed aggregates and one
  * query-keyed window (ideal-DCG ranks within each query's truth list) —
  * everything keyed on the query, so parallelism is query cardinality
  * and nothing global ever sorts. Works unchanged whether `results`
  * holds 10 queries or 10 million.
  */
object RankingMetrics {

  /** Per-query metrics. `results`: (queryCol, docCol, rankCol) with
    * 1-based ranks (ties must already be broken — ranks unique per
    * query). `truth`: (queryCol, docCol [, gradeCol]) — relevant docs;
    * without `gradeCol` every truth row has grade 1 (binary relevance).
    * Non-positive grades are dropped. Queries with NO truth rows are
    * dropped (their metrics are undefined); queries with truth but no
    * hits score 0. Output: (queryCol, n_truth, n_hits, recall_at_k,
    * precision_at_k, mrr, ndcg_at_k).
    *
    *  - recall@k   = |relevant ∩ top-k| / |relevant|
    *  - precision@k = |relevant ∩ top-k| / k
    *  - MRR        = 1 / rank of the first relevant result (0 if none)
    *  - nDCG@k     = Σ grade/log2(rank+1) over relevant top-k hits,
    *                 normalized by the ideal DCG of the query's own
    *                 truth list truncated at k. */
  def perQuery(results: DataFrame, truth: DataFrame, queryCol: String,
               docCol: String, rankCol: String, k: Int,
               gradeCol: Option[String] = None): DataFrame = {
    require(k >= 1, s"RankingMetrics needs k >= 1, got $k")
    graft.util.Errors.context("rankingMetrics",
        Seq(queryCol, docCol, rankCol)) {
    val res = results.na.drop(Seq(queryCol, docCol, rankCol))
      .filter(col(rankCol) <= k)
      .select(col(queryCol).as("__graft_q"), col(docCol).as("__graft_d"),
        col(rankCol).cast("long").as("__graft_rank"))
    val tr0 = gradeCol match {
      case Some(g) => truth.na.drop(Seq(queryCol, docCol, g))
        .select(col(queryCol).as("__graft_q"), col(docCol).as("__graft_d"),
          col(g).cast("double").as("__graft_grade"))
      case None => truth.na.drop(Seq(queryCol, docCol))
        .select(col(queryCol).as("__graft_q"), col(docCol).as("__graft_d"),
          lit(1.0).as("__graft_grade"))
    }
    val tr = tr0.filter(col("__graft_grade") > 0)
    // ideal DCG: each query's own truth grades, best-first, cut at k
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__graft_q")
      .orderBy(col("__graft_grade").desc, col("__graft_d"))
    val truthAgg = tr
      .withColumn("__graft_irank", row_number().over(w))
      .groupBy("__graft_q")
      .agg(count(lit(1)).as("n_truth"),
        sum(when(col("__graft_irank") <= k,
          col("__graft_grade") /
            log(2.0, col("__graft_irank") + 1)).otherwise(0.0))
          .as("__graft_idcg"))
    val hits = res.join(tr, Seq("__graft_q", "__graft_d"))
      .groupBy("__graft_q")
      .agg(count(lit(1)).as("n_hits"),
        min("__graft_rank").as("__graft_first"),
        sum(col("__graft_grade") / log(2.0, col("__graft_rank") + 1))
          .as("__graft_dcg"))
    truthAgg.join(hits, Seq("__graft_q"), "left")
      .select(col("__graft_q").as(queryCol),
        col("n_truth"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_truth")).as("recall_at_k"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") /
          lit(k.toDouble)).as("precision_at_k"),
        coalesce(lit(1.0) / col("__graft_first"), lit(0.0)).as("mrr"),
        (coalesce(col("__graft_dcg"), lit(0.0)) / col("__graft_idcg"))
          .as("ndcg_at_k"))
  } }

  /** Per-query rank-biased overlap (Webber et al. 2010), truncated at
    * depth `k` and normalized so identical rankings score exactly 1:
    *
    *   RBO@k = (1−p)/(1−p^k) · Σ_{d=1..k} p^(d−1) · |A_d ∩ B_d| / d
    *
    * — the top-weighted way to compare two RANKINGS with no truth set
    * (ANN run vs exact run, yesterday's index vs today's): agreement at
    * rank 1 outweighs agreement at rank k by p^(1−k). `p` is the
    * persistence (≈ how deep a user looks; 0.9 ⇒ ~top-10 dominate).
    *
    * Scale shape: a shared (query, doc) pair enters every depth
    * d ≥ m = max(rank_A, rank_B), so its total contribution is the
    * CLOSED weight g(m) = Σ_{d=m..k} p^(d−1)/d — precomputed as a
    * k-entry literal array indexed per pair. The plan is one equi-join
    * of the two rank-≤-k runs on (query, doc) and one query-keyed
    * aggregate: no per-depth explosion, no window, parallelism = query
    * cardinality. Ranks must be 1-based and unique per query within
    * each run (break ties upstream). Queries appearing in either run
    * with no shared docs score 0. Lists SHORTER than k score < 1 even
    * when identical — the truncated (RBO_min) form keeps dividing by
    * the full depth d, charging the unobserved tail; compare runs at
    * the same k they were cut to. */
  def rbo(runA: DataFrame, runB: DataFrame, queryCol: String,
          docCol: String, rankCol: String, k: Int,
          p: Double = 0.9, universe: Option[DataFrame] = None): DataFrame = {
    graft.util.Errors.context("rbo", Seq(queryCol, docCol, rankCol)) {
    require(k >= 1, s"rbo needs k >= 1, got $k")
    require(p > 0.0 && p < 1.0, s"rbo needs p in (0,1), got $p")
    def side(df: DataFrame, tag: String) =
      df.na.drop(Seq(queryCol, docCol, rankCol))
        .filter(col(rankCol) <= k && col(rankCol) >= 1)
        .select(col(queryCol).as("__graft_q"),
          col(docCol).as("__graft_d"),
          col(rankCol).cast("long").as(s"__graft_r$tag"))
    val a = side(runA, "a")
    val b = side(runB, "b")
    // g(m) = Σ_{d=m..k} p^(d-1)/d, tail-summed once on the driver
    val g = new Array[Double](k + 1)
    var d = k
    var tail = 0.0
    while (d >= 1) { tail += math.pow(p, d - 1) / d; g(d) = tail; d -= 1 }
    val weights = array((1 to k).map(m => lit(g(m))): _*)
    val norm = (1.0 - p) / (1.0 - math.pow(p, k))
    val pairs = a.join(b, Seq("__graft_q", "__graft_d"))
      .withColumn("__graft_w", element_at(weights,
        greatest(col("__graft_ra"), col("__graft_rb")).cast("int")))
      .groupBy("__graft_q")
      .agg(count(lit(1)).as("n_common"),
        (sum(col("__graft_w")) * norm).as("rbo"))
    // the query universe decides which zero-overlap queries surface with
    // rbo 0. Derived from the runs by default — but that recomputes the
    // callers' ranking lineage (typically a window over the full corpus)
    // a SECOND time per side; callers with an expensive ranking should
    // pass `universe` (e.g. the raw table's distinct query keys) so the
    // runs are each computed exactly once
    val qs = universe match {
      case Some(u) => u.na.drop(Seq(queryCol))
        .select(col(queryCol).as("__graft_q")).distinct()
      case None => runA.na.drop(Seq(queryCol))
        .select(col(queryCol).as("__graft_q"))
        .union(runB.na.drop(Seq(queryCol))
          .select(col(queryCol).as("__graft_q")))
        .distinct()
    }
    qs.join(pairs, Seq("__graft_q"), "left")
      .select(col("__graft_q").as(queryCol),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("rbo"), lit(0.0)).as("rbo"))
  } }

  /** Intra-list diversity of top-k result lists: per query, the mean
    * pairwise cosine DISTANCE (1 − cos) between the embedding vectors
    * of its top-k items — the "did we recommend ten copies of the same
    * thing" metric that precision can't see. Items missing from `vecs`
    * are skipped (n_items reports those that scored). Single-item and
    * empty lists yield ild null with n_pairs 0 — no pairs, no claim.
    * Returns (queryCol, n_items, n_pairs, ild).
    *
    * Scale shape: one rank-cut + equi-join against the vector table,
    * then a query-keyed self-join — pair mass is queries × k², with k
    * caller-bounded (the depth cut happens BEFORE the join). Everything
    * keyed on the query. */
  def intraListDiversity(run: DataFrame, queryCol: String, itemCol: String,
                         rankCol: String, vecs: DataFrame, vecIdCol: String,
                         vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"intraListDiversity needs k >= 1, got $k")
    val top = run.na.drop(Seq(queryCol, itemCol, rankCol))
      .filter(col(rankCol) <= k)
      .select(col(queryCol).as("__q"), col(itemCol).as("__i"))
    val vv = vecs.na.drop(Seq(vecIdCol, vecCol))
      .select(col(vecIdCol).as("__i"),
        col(vecCol).cast("array<double>").as("__v"))
    val scored = top.join(vv, "__i")
    val a = scored.select(col("__q"), col("__i").as("__ia"),
      col("__v").as("__va"))
    val b = scored.select(col("__q"), col("__i").as("__ib"),
      col("__v").as("__vb"))
    val dot = graft.expr.DotProduct.of(col("__va"), col("__vb"))
    val cos = dot / (sqrt(graft.expr.DotProduct.of(col("__va"), col("__va"))) *
      sqrt(graft.expr.DotProduct.of(col("__vb"), col("__vb"))))
    val pairs = a.join(b, Seq("__q")).filter(col("__ia") < col("__ib"))
      .select(col("__q"), (lit(1.0) - cos).as("__d"))
    val nItems = scored.groupBy("__q")
      .agg(count(lit(1)).as("n_items"))
    val agg = pairs.groupBy("__q")
      .agg(count(lit(1)).as("n_pairs"), avg("__d").as("ild"))
    nItems.join(agg, Seq("__q"), "left")
      .select(col("__q").as(queryCol), col("n_items"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"), col("ild"))
  }

  /** Catalog coverage of a result set: what share of the catalog is
    * recommended at all (aggregate diversity). One row:
    * (n_recommended, catalog_size, coverage). Items outside the
    * catalog (stale run vs current catalog) count in n_recommended but
    * coverage is distinct-RECOMMENDED-∩-catalog / catalog — stale items
    * must not inflate the share.
    *
    * Scale shape: two distinct-count aggregates plus one semi-join;
    * scalars cross-joined. */
  def catalogCoverage(run: DataFrame, itemCol: String,
                      catalog: DataFrame, catIdCol: String): DataFrame = {
    val items = run.na.drop(Seq(itemCol)).select(col(itemCol).as("__i"))
      .distinct()
    val cat = catalog.na.drop(Seq(catIdCol))
      .select(col(catIdCol).as("__c")).distinct()
    val nRec = items.agg(count(lit(1)).as("n_recommended"))
    val inCat = items.join(cat, col("__i") === col("__c"), "left_semi")
      .agg(count(lit(1)).as("__hit"))
    val nCat = cat.agg(count(lit(1)).as("catalog_size"))
    nRec.crossJoin(inCat).crossJoin(nCat)
      .select(col("n_recommended"), col("catalog_size"),
        when(col("catalog_size") > 0,
          col("__hit").cast("double") / col("catalog_size"))
          .otherwise(lit(0.0)).as("coverage"))
  }
}
