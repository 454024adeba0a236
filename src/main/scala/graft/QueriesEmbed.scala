package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.agg.Stats
import graft.clean.Clean
import graft.core.HandyFrame
import graft.ml.{HandyFencer, HandyImputer}
import graft.plotdata.PlotData
import graft.strata.{Bucket, ColStratum, Quantile, StratifiedFrame}

/** Gate tier 3/9 — embedding + text-pipeline tier: k-means/SemDeDup, ANN top-k/IVF, text quality, decontamination, packing/chunking, multimodal, lang-id, PII, fuzzy join, link graph, privacy.
  *
  * Split from the 11k-line Queries.scala (r11 VERDICT #8): pure
  * relocation, zero semantic movement — [[Queries.defs]] concatenates
  * the nine tiers in the original order and the duplicate-name guard
  * still covers the whole set. All determinism rules live in the
  * [[Queries]] scaladoc; table readers and shared contracts in
  * [[QueryHelpers]]. 49 queries. */
private[graft] object QueriesEmbed {
  import QueryHelpers._

  val defs: Seq[QueryDef] = Seq(

    // ---- distributed Lloyd k-means (cluster sizes after one update) -------
    // init = the k lowest-id vectors (deterministic); the oracle replays
    // init-assign → per-cluster centroid means → re-assign entirely in SQL;
    // assignment margins are >= 1e-5 at every SF, far above fp-reorder noise
    // ---- coverage sampling (one representative per k-means cell) ----------
    // k docs that SPAN the embedding space: nearest-to-centroid per cell,
    // ties -> lowest id, selection via one min(struct) hash aggregate (no
    // per-cluster window). iters=0 pins the deterministic lowest-id init
    // so the oracle replays assignment + selection with list_distance
    QueryDef("q_coverage_sample",
      (s, d) => graft.pipeline.Clustering.coverageSample(
          embeddings(s, d), "vec_id", "embedding", k = 16, iters = 0)
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
          round(col("dist"), 6).as("dist"))
        .orderBy("cluster"),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
               FROM embeddings
               WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
             c AS (SELECT vec_id AS cid, v AS cv FROM e
               ORDER BY vec_id LIMIT 16),
             cc AS (SELECT cv, row_number() OVER (ORDER BY cid) - 1
               AS cluster FROM c),
             a AS (SELECT e.vec_id, cc.cluster,
               list_distance(e.v, cc.cv) AS d FROM e CROSS JOIN cc),
             best AS (SELECT vec_id, cluster, d, row_number() OVER
               (PARTITION BY vec_id ORDER BY d, cluster) AS rn FROM a),
             asg AS (SELECT vec_id, cluster, d FROM best WHERE rn = 1),
             sel AS (SELECT cluster, vec_id, d, row_number() OVER
               (PARTITION BY cluster ORDER BY d, vec_id) AS rn FROM asg)
             SELECT vec_id, cluster::BIGINT AS cluster,
               round(d, 6) AS dist
             FROM sel WHERE rn = 1 ORDER BY cluster""")),

    QueryDef("q_kmeans",
      (s, d) => {
        val (assigned, _) = graft.pipeline.Clustering.kmeans(
          embeddings(s, d), "vec_id", "embedding", k = 8, iters = 1)
        assigned.groupBy("cluster").agg(count(lit(1)).as("n"))
          .select(col("cluster").cast("long").as("cid"), col("n"))
          .orderBy("cid")
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
             d0 AS (SELECT e.vec_id, c0.cid, list_distance(e.v, c0.cv) AS dd
               FROM e CROSS JOIN c0),
             a0 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dd, cid) AS rn
               FROM d0) WHERE rn = 1),
             c1 AS (SELECT cid, list(m ORDER BY i) AS cv FROM (
                 SELECT a0.cid, t.i, avg(e.v[t.i+1]) AS m
                 FROM a0 JOIN e USING (vec_id), range(64) t(i)
                 GROUP BY a0.cid, t.i) GROUP BY cid),
             /* Lloyd degeneracy parity: a cluster that empties after the
                first assignment keeps its PREVIOUS center (as kmeansFit
                does) instead of vanishing from the re-assignment */
             c1k AS (SELECT c0.cid, coalesce(c1.cv, c0.cv) AS cv
               FROM c0 LEFT JOIN c1 USING (cid)),
             d1 AS (SELECT e.vec_id, c1k.cid, list_distance(e.v, c1k.cv) AS dd
               FROM e CROSS JOIN c1k),
             a1 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dd, cid) AS rn
               FROM d1) WHERE rn = 1)
             SELECT cid::BIGINT AS cid, count(*)::BIGINT AS n
             FROM a1 GROUP BY cid ORDER BY cid""")),

    // ---- SemDeDup: semantic near-dup pairs within k-means clusters --------
    // cluster boundaries depend on iterated fp centroids, but the tier's
    // guarantee does not: within-cluster comparison is EXACT cosine, so
    // the emitted pairs are a subset of the exact all-pairs set — the
    // same contract-check pattern as q_embedding_dedup_lsh; recall is
    // RecallSpec-measured (0.30 → 0.80 at probes=2)
    QueryDef("q_semdedup",
      (s, d) => {
        val e = embeddings(s, d)
        val sd = graft.pipeline.Clustering.semDedup(
          e, "vec_id", "embedding", k = 8,
          threshold = 0.45, iters = 2, probes = 2)
        val exact = graft.pipeline.Similarity.allPairsCosine(e,
          "vec_id", "embedding", 0.45)
          .select(col("id_a").as("__ea"), col("id_b").as("__eb"))
        exact.agg(count(lit(1)).as("n_exact_pairs"))
          .crossJoin(sd.join(exact,
              col("id_a") === col("__ea") && col("id_b") === col("__eb"),
              "left_anti")
            .agg(count(lit(1)).as("__fp")))
          .select(col("n_exact_pairs"),
            (col("__fp") === 0).as("no_false_positives"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
               FROM embeddings WHERE vec_id IS NOT NULL),
             p AS (SELECT a.vec_id AS ia, b.vec_id AS ib
               FROM e a JOIN e b ON a.vec_id < b.vec_id
               WHERE list_cosine_similarity(a.v, b.v) >= 0.45)
             SELECT count(*)::BIGINT AS n_exact_pairs,
               true AS no_false_positives FROM p"""),
      gateOnly = true),

    // operator-cost twin of q_semdedup: cluster + within-cluster exact
    // cosine alone, no all-pairs harness. k tracks corpus size (kFor —
    // fixed k=8 makes within-cluster pair mass probes·n²/8, 10 BILLION
    // cosines at the 100× corpus; kFor resolves to the same k=8 at
    // sf0.1 and below, so gate-era numbers are untouched)
    QueryDef("q_semdedup_op",
      (s, d) => {
        val e = embeddings(s, d)
        val k = graft.pipeline.Clustering.kFor(e.count())
        graft.pipeline.Clustering.semDedup(
            e, "vec_id", "embedding", k,
            threshold = 0.45, iters = 2, probes = 2)
          .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
          .orderBy("id_a", "id_b")
      },
      None),

    // ---- per-group embedding mean-pool (chunk→doc rollup) -----------------
    // typed streaming per-group sum (one shuffle, array-of-state per
    // group); the oracle rebuilds the element-wise means positionally;
    // array columns don't survive check.py's string compare, so the
    // result projects to (first component, L2 norm, n)
    QueryDef("q_embed_pool",
      (s, d) => graft.pipeline.Clustering.meanPool(
          embeddings(s, d), "label", "embedding")
        .select(col("label"),
          round(element_at(col("vec"), 1), 6).as("v0"),
          round(sqrt(aggregate(transform(col("vec"), x => x * x),
            lit(0.0), _ + _)), 6).as("norm"),
          col("n"))
        .orderBy("label"),
      Some("""WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings
               WHERE label IS NOT NULL AND embedding IS NOT NULL),
             m AS (SELECT label, t.i, avg(v[t.i+1]) AS m
               FROM e, range(64) t(i) GROUP BY 1, 2),
             p AS (SELECT label, list(m ORDER BY i) AS vec FROM m GROUP BY 1),
             n AS (SELECT label, count(*) AS n FROM e GROUP BY 1)
             SELECT p.label::BIGINT AS label, round(vec[1], 6) AS v0,
               round(sqrt(list_sum(list_transform(vec, x -> x*x))), 6) AS norm,
               n.n::BIGINT AS n
             FROM p JOIN n USING (label) ORDER BY label""")),

    // ---- kNN graph (exact tier) -------------------------------------------
    // 5 nearest neighbors per vector under cosine, rank ordered
    // (cos desc, nid asc) — ties must break identically to the oracle's
    // row_number, which the TopK insertion order guarantees
    QueryDef("q_knn_graph",
      (s, d) => graft.pipeline.Similarity.knnGraphExact(
          embeddings(s, d), "vec_id", "embedding", k = 5)
        .select(col("vec_id"), col("nid"), round(col("cos"), 6).as("cos"),
          col("rank").cast("long").as("rank"))
        .orderBy("vec_id", "rank"),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
               FROM embeddings
               WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
             p AS (SELECT a.vec_id AS vec_id, b.vec_id AS nid,
               list_cosine_similarity(a.v, b.v) AS cos
               FROM e a JOIN e b ON a.vec_id <> b.vec_id),
             r AS (SELECT vec_id, nid, cos, row_number() OVER
               (PARTITION BY vec_id ORDER BY cos DESC, nid) AS rank FROM p)
             SELECT vec_id, nid, round(cos, 6) AS cos, rank
             FROM r WHERE rank <= 5 ORDER BY vec_id, rank""")),

    // ---- hard-negative mining (contrastive/retrieval training) ------------
    // per row: top-5 highest-cosine neighbors with a DIFFERENT label —
    // the near-misses a metric-learning objective trains against. Exact
    // guarded baseline; oracle = the kNN replay plus the label-mismatch
    // predicate. hardNegatives (LSH + oversample) is the scale path,
    // spec-pinned against this tier
    QueryDef("q_hard_negatives",
      (s, d) => graft.pipeline.Similarity.hardNegativesExact(
          embeddings(s, d), "vec_id", "embedding", "label", k = 5)
        .select(col("vec_id"), col("nid"), round(col("cos"), 6).as("cos"),
          col("rank").cast("long").as("rank"))
        .orderBy("vec_id", "rank"),
      Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings
               WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
                 AND label IS NOT NULL),
             p AS (SELECT a.vec_id AS vec_id, b.vec_id AS nid,
               list_cosine_similarity(a.v, b.v) AS cos
               FROM e a JOIN e b
               ON a.vec_id <> b.vec_id AND a.label <> b.label),
             r AS (SELECT vec_id, nid, cos, row_number() OVER
               (PARTITION BY vec_id ORDER BY cos DESC, nid) AS rank FROM p)
             SELECT vec_id, nid, round(cos, 6) AS cos, rank
             FROM r WHERE rank <= 5 ORDER BY vec_id, rank""")),

    // LSH-bucketed kNN graph: the scale path. Hash-green since r11 via the
    // pqContract pattern, per (node, rank): the LSH list at any rank is
    // drawn from a subset of the node's neighbors under the SAME ordering
    // (cos desc, nid asc), so its rank-r cosine is dominated by the exact
    // kNN's rank-r cosine (order statistics of a subset) — and every
    // returned edge's cosine is re-derived from the base vectors in-query
    // and must equal the reported value (also proving nid ∈ corpus).
    // exact_cos is the per-rank value DuckDB replays; absent LSH ranks
    // (dry buckets) pass both flags vacuously. Recall is
    // SimilaritySpec-measured vs the exact tier.
    QueryDef("q_knn_graph_lsh",
      (s, d) => {
        val e = embeddings(s, d)
        val lsh = graft.pipeline.Similarity.knnGraph(e,
            "vec_id", "embedding", dim = 64, k = 5, bits = 4, tables = 4)
          .select(col("vec_id"), col("nid").as("__lnid"),
            col("cos").as("__lcos"), col("rank"))
        val ev = e.na.drop(Seq("vec_id", "embedding"))
          .select(col("vec_id").as("__vid"),
            transform(col("embedding"), _.cast("double")).as("__v"))
        val rescored = lsh
          .join(ev.select(col("__vid").as("__a"), col("__v").as("__va")),
            col("vec_id") === col("__a"), "left")
          .join(ev.select(col("__vid").as("__b"), col("__v").as("__vb")),
            col("__lnid") === col("__b"), "left")
          .withColumn("__rcos",
            graft.pipeline.Dedup.cosine(col("__va"), col("__vb")))
          .select(col("vec_id"), col("rank"), col("__lcos"), col("__rcos"))
        graft.pipeline.Similarity.knnGraphExact(e,
            "vec_id", "embedding", k = 5)
          .join(rescored, Seq("vec_id", "rank"), "left")
          .select(col("vec_id"), col("rank").cast("long").as("rank"),
            round(col("cos"), 6).as("exact_cos"),
            (col("__lcos").isNull ||
              col("__lcos") <= col("cos") + lit(1e-9)).as("lsh_le_exact"),
            (col("__lcos").isNull || (col("__rcos").isNotNull &&
              abs(col("__rcos") - col("__lcos")) <= lit(1e-9)))
              .as("lsh_cos_exact"))
          .orderBy("vec_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
               FROM embeddings
               WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
             p AS (SELECT a.vec_id AS vec_id, b.vec_id AS nid,
               list_cosine_similarity(a.v, b.v) AS cos
               FROM e a JOIN e b ON a.vec_id <> b.vec_id),
             r AS (SELECT vec_id, cos, row_number() OVER
               (PARTITION BY vec_id ORDER BY cos DESC, nid) AS rank FROM p)
             SELECT vec_id, rank, round(cos, 6) AS exact_cos,
               true AS lsh_le_exact, true AS lsh_cos_exact
             FROM r WHERE rank <= 5 ORDER BY vec_id, rank""")),

    // ---- similarity search: brute-force cosine top-k ----------------------
    QueryDef("q_sim_topk",
      (s, d) => {
        val e = embeddings(s, d)
        val qvec = e.filter(col("vec_id") === 0)
          .select(expr("transform(embedding, x -> cast(x as double))"))
          .head().getSeq[Double](0).toArray
        graft.pipeline.Similarity.bruteForceTopK(
            e.filter(col("vec_id") =!= 0), "vec_id", "embedding", qvec, 10)
          .select(col("vec_id"), round(col("cos"), 6).as("cos"))
      },
      Some("""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
               WHERE vec_id = 0)
             SELECT vec_id,
               round(list_cosine_similarity(embedding::DOUBLE[], qv), 6) AS cos
             FROM embeddings, q WHERE vec_id != 0
             ORDER BY list_cosine_similarity(embedding::DOUBLE[], qv) DESC,
               vec_id LIMIT 10""")),

    // ---- similarity search: multi-query top-k via broadcast join ----------
    QueryDef("q_sim_topk_multi",
      (s, d) => {
        val e = embeddings(s, d)
        graft.pipeline.Similarity.topKJoin(e,
            e.filter(col("vec_id") < 5), "vec_id", "embedding", 5, dim = 64)
          .select(col("query_id"), col("rn"), col("corpus_id"),
            round(col("cos"), 6).as("cos"))
          .orderBy("query_id", "rn")
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
             scored AS (SELECT query_id, e.vec_id AS corpus_id,
               list_cosine_similarity(e.v, qv) AS cos
               FROM e, q WHERE e.vec_id != query_id),
             ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, corpus_id) AS rn FROM scored)
             SELECT query_id, rn, corpus_id, round(cos, 6) AS cos
             FROM ranked WHERE rn <= 5 ORDER BY query_id, rn""")),

    // batch IVF: many queries, one corpus pass, per-query probe cells.
    // The probe-SUBSET result is engine-specific (which cells get probed
    // depends on the quantizer), but its CONTRACT is not: the IVF top-k of
    // a corpus subset is rank-wise dominated by the brute-force top-k of
    // the full corpus, and wherever both agree on a neighbor the cosine
    // must reproduce exactly. Per (query, rank) the row carries the
    // brute-force cosine (DuckDB reproduces it) plus the two dominance/
    // reproduction flags — hash-green like the GK/HLL/bloom contract rows;
    // recall itself is RecallSpec-measured, and the full-probe tier
    // (q_sim_ivf_full) pins exact equality end to end.
    QueryDef("q_sim_ivf_multi",
      (s, d) => {
        val e = embeddings(s, d)
        val queries = e.filter(col("vec_id") < 5)
        val (assigned, centers) = graft.pipeline.Similarity.ivfAssign(
          e, "vec_id", "embedding", nCells = 8)
        val ivf = graft.pipeline.Similarity.ivfTopKMulti(assigned, centers,
            "vec_id", queries, "embedding", k = 5, nProbe = 3)
          .select(col("query_id").as("__iq"), col("rn").as("__ir"),
            col("corpus_id").as("__icid"), col("cos").as("__icos"))
        val brute = graft.pipeline.Similarity.topKJoin(e, queries,
          "vec_id", "embedding", k = 5, dim = 64)
        brute.join(ivf,
            col("query_id") === col("__iq") && col("rn") === col("__ir"),
            "left")
          .select(col("query_id"), col("rn"),
            round(col("cos"), 6).as("brute_cos"),
            (col("__icos").isNull || col("__icos") <= col("cos") + lit(1e-9))
              .as("ivf_le_brute"),
            (col("__icid").isNull || col("__icid") =!= col("corpus_id") ||
              round(col("__icos"), 6) === round(col("cos"), 6))
              .as("cos_match_on_same_id"))
          .orderBy("query_id", "rn")
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
             scored AS (SELECT query_id, e.vec_id AS corpus_id,
               list_cosine_similarity(e.v, qv) AS cos
               FROM e, q WHERE e.vec_id != query_id),
             ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, corpus_id) AS rn FROM scored)
             SELECT query_id, rn, round(cos, 6) AS brute_cos,
               true AS ivf_le_brute, true AS cos_match_on_same_id
             FROM ranked WHERE rn <= 5 ORDER BY query_id, rn""")),

    // full-probe IVF (nProbe = nCells): probing every cell scans the whole
    // corpus, so the two-stage machinery (quantizer assignment, cell
    // inversion, per-query heaps, rank window) must reproduce brute force
    // EXACTLY — hash-checked against the same SQL oracle as
    // q_sim_topk_multi. The approximate tiers (nProbe < nCells) stay
    // RecallSpec-measured.
    QueryDef("q_sim_ivf_full",
      (s, d) => {
        val e = embeddings(s, d)
        val queries = e.filter(col("vec_id") < 5)
        val (assigned, centers) = graft.pipeline.Similarity.ivfAssign(
          e, "vec_id", "embedding", nCells = 8)
        graft.pipeline.Similarity.ivfTopKMulti(assigned, centers, "vec_id",
          queries, "embedding", k = 5, nProbe = 8)
          .select(col("query_id"), col("rn"), col("corpus_id"),
            round(col("cos"), 6).as("cos"))
          .orderBy("query_id", "rn")
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
             scored AS (SELECT query_id, e.vec_id AS corpus_id,
               list_cosine_similarity(e.v, qv) AS cos
               FROM e, q WHERE e.vec_id != query_id),
             ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, corpus_id) AS rn FROM scored)
             SELECT query_id, rn, corpus_id, round(cos, 6) AS cos
             FROM ranked WHERE rn <= 5 ORDER BY query_id, rn""")),

    // ---- IVF two-stage ANN (single query, probe subset) -------------------
    // same contract conversion as q_sim_ivf_multi, rank-free because
    // ivfTopK emits no rank column: the oracle reproduces the brute-force
    // top-k's best and kth cosines, and the flags pin (a) |result| <= k,
    // (b) cosine reproduction on every neighbor shared with the brute
    // top-k, (c) every neighbor OUTSIDE the brute top-k scoring at most
    // the brute kth cosine (subset dominance)
    QueryDef("q_sim_ivf",
      (s, d) => {
        val e = embeddings(s, d)
        val qvec = e.filter(col("vec_id") === 0)
          .select(expr("transform(embedding, x -> cast(x as double))"))
          .head().getSeq[Double](0).toArray
        val corpus = e.filter(col("vec_id") =!= 0)
        val (assigned, centers) = graft.pipeline.Similarity.ivfAssign(
          corpus, "vec_id", "embedding", nCells = 8)
        val ivf = graft.pipeline.Similarity.ivfTopK(assigned, centers,
            "vec_id", qvec, 10, nProbe = 3)
          .select(col("vec_id").as("__iid"), col("cos").as("__icos"))
        val brute = graft.pipeline.Similarity.bruteForceTopK(corpus,
            "vec_id", "embedding", qvec, 10)
          .select(col("vec_id").as("__bid"), col("cos").as("__bcos"))
        val bAgg = broadcast(brute.agg(
          round(max(col("__bcos")), 6).as("top_brute_cos"),
          round(min(col("__bcos")), 6).as("kth_brute_cos"),
          min(col("__bcos")).as("__kth_raw")))
        // flags aggregate separately (agg over an empty IVF result still
        // yields one row — count 0, violation sums coalesced to 0)
        val flags = ivf.join(brute, col("__iid") === col("__bid"), "left")
          .crossJoin(bAgg)
          .agg(
            (count(lit(1)) <= 10).as("k_bound_ok"),
            (coalesce(sum(when(col("__bid").isNotNull &&
                round(col("__icos"), 6) =!= round(col("__bcos"), 6), 1)
              .otherwise(0)), lit(0L)) === 0).as("topk_cos_match"),
            (coalesce(sum(when(col("__bid").isNull &&
                col("__icos") > col("__kth_raw") + lit(1e-9), 1)
              .otherwise(0)), lit(0L)) === 0).as("outside_le_kth"))
        bAgg.select(col("top_brute_cos"), col("kth_brute_cos"))
          .crossJoin(flags)
      },
      Some("""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
               WHERE vec_id = 0),
             s AS (SELECT vec_id,
               list_cosine_similarity(embedding::DOUBLE[], qv) AS cos
               FROM embeddings, q WHERE vec_id != 0),
             b AS (SELECT cos FROM s ORDER BY cos DESC, vec_id LIMIT 10)
             SELECT round(max(cos), 6) AS top_brute_cos,
               round(min(cos), 6) AS kth_brute_cos, true AS k_bound_ok,
               true AS topk_cos_match, true AS outside_le_kth FROM b""")),

    // ---- text analysis: token counts / quality ----------------------------
    QueryDef("q_text_stats",
      (s, d) => {
        import graft.pipeline.TextAnalysis._
        documents(s, d).select(col("doc_id"),
          tokenCount(col("text")).as("n_tokens"),
          round(punctRatio(col("text")), 6).as("punct_ratio"),
          round(stopwordRatio(col("text")), 6).as("stopword_ratio"),
          round(meanWordLen(col("text")), 6).as("mean_word_len"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, text,
               regexp_split_to_array(trim(text), '\s+') AS toks
               FROM documents)
             SELECT doc_id, len(toks) AS n_tokens,
               round((length(text) - length(regexp_replace(text,
                 '[.,!?;:]', '', 'g'))) / greatest(length(text), 1)::DOUBLE, 6)
                 AS punct_ratio,
               round(len(list_filter(toks, x -> x IN ('the','a','an','of','to',
                 'and','in','is','it','that','for','on','with','as','at','by')))
                 / greatest(len(toks), 1)::DOUBLE, 6) AS stopword_ratio,
               round(list_sum(list_transform(toks, x -> length(x)))
                 / greatest(len(toks), 1)::DOUBLE, 6) AS mean_word_len
             FROM t ORDER BY doc_id""")),

    // ---- composite document quality score ---------------------------------
    QueryDef("q_quality",
      (s, d) => {
        import graft.pipeline.TextAnalysis._
        documents(s, d).select(col("doc_id"),
          round(qualityScore(col("text")), 6).as("quality"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, text,
               regexp_split_to_array(trim(text), '\s+') AS toks
               FROM documents),
             c AS (SELECT doc_id,
               least(length(text) / 500.0, 1.0) AS len_score,
               1.0 - least(abs(list_sum(list_transform(toks, x -> length(x)))
                 / greatest(len(toks), 1)::DOUBLE - 5.0) / 5.0, 1.0)
                 AS word_score,
               1.0 - least(((length(text) - length(regexp_replace(text,
                 '[.,!?;:]', '', 'g'))) / greatest(length(text), 1)::DOUBLE)
                 * 10.0, 1.0) AS punct_score,
               least((len(list_filter(toks, x -> x IN ('the','a','an','of',
                 'to','and','in','is','it','that','for','on','with','as',
                 'at','by'))) / greatest(len(toks), 1)::DOUBLE) * 4.0, 1.0)
                 AS stop_score
               FROM t)
             SELECT doc_id, round((len_score + word_score + punct_score
               + stop_score) / 4.0, 6) AS quality
             FROM c ORDER BY doc_id""")),

    // ---- per-document n-gram novelty vs a standing corpus ------------------
    // novelty = fraction of a batch doc's DISTINCT 3-grams absent from
    // the corpus gram set — the "is this re-crawl new text?" curation
    // signal. BOTH sides corpus-sized: no broadcast, one gram-keyed
    // co-partitioned left join (8-byte hash keys engine-side; the oracle
    // joins the shingle STRINGS — counts agree absent 64-bit collisions,
    // the shingled() contract). novelty is one exact-long division →
    // compares UNROUNDED (avg_gap precedent)
    QueryDef("q_novelty_vs_corpus",
      (s, d) => {
        val docs = documents(s, d)
        graft.pipeline.Decontaminate.noveltyAgainst(
            docs.filter(col("doc_id") % 5 === 0), "doc_id", "text",
            docs.filter(col("doc_id") % 5 =!= 0), "text", n = 3)
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS t
               FROM documents
               WHERE doc_id IS NOT NULL AND text IS NOT NULL),
             sh AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_transform(generate_series(1, len(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS s
               FROM tok),
             cg AS (SELECT DISTINCT s FROM sh WHERE doc_id % 5 <> 0),
             b AS (SELECT doc_id, s FROM sh WHERE doc_id % 5 = 0)
             SELECT b.doc_id, count(*)::BIGINT AS n_grams,
               sum(CASE WHEN cg.s IS NULL THEN 1 ELSE 0 END)::BIGINT
                 AS n_novel,
               sum(CASE WHEN cg.s IS NULL THEN 1 ELSE 0 END)::DOUBLE
                 / count(*) AS novelty
             FROM b LEFT JOIN cg ON b.s = cg.s
             GROUP BY 1 ORDER BY doc_id""")),

    // ---- benchmark decontamination -----------------------------------------
    // Standard eval-leakage guard: drop training docs sharing any word
    // n-gram with a benchmark set (GPT-3 used 13-grams; 4 here so the
    // synthetic near-dups actually collide). Benchmark = every 97th doc;
    // its distinct n-gram set is broadcast, the corpus never shuffles.
    QueryDef("q_decontaminate",
      (s, d) => {
        val docs = documents(s, d)
        val bench = docs.filter(col("doc_id") % 97 === 0)
        graft.pipeline.Decontaminate
          .contaminated(docs, "doc_id", "text", bench, "text", n = 4)
          .filter(col("doc_id") % 97 =!= 0) // benchmark rows trivially overlap
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
             sh AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(t) < 4 THEN [array_to_string(t, ' ')]
               ELSE list_transform(generate_series(1, len(t) - 3),
                 i -> array_to_string(t[i:i+3], ' ')) END)) AS s
               FROM tok),
             bg AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0)
             SELECT doc_id, count(*) AS overlap
             FROM sh JOIN bg USING (s)
             WHERE doc_id % 97 <> 0
             GROUP BY 1 ORDER BY 1""")),

    // the end-to-end remove: clean corpus = docs with zero benchmark
    // overlap (benchmark members self-overlap and are dropped too).
    QueryDef("q_decontaminate_keep",
      (s, d) => {
        val docs = documents(s, d)
        val bench = docs.filter(col("doc_id") % 97 === 0)
        graft.pipeline.Decontaminate
          .decontaminate(docs, "doc_id", "text", bench, "text", n = 4)
          .select("doc_id").orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
             sh AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(t) < 4 THEN [array_to_string(t, ' ')]
               ELSE list_transform(generate_series(1, len(t) - 3),
                 i -> array_to_string(t[i:i+3], ' ')) END)) AS s
               FROM tok),
             bg AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0)
             SELECT doc_id FROM documents
             WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM sh JOIN bg USING (s))
             ORDER BY doc_id""")),

    // ---- SEMANTIC decontamination (embedding-space benchmark overlap) -----
    // the paraphrase-level leak n-grams can't see: flag corpus vectors
    // within cosine `threshold` of ANY benchmark vector — benchmark
    // broadcast (small by nature), one map-side typed pass, no shuffle
    QueryDef("q_decontaminate_semantic",
      (s, d) => {
        val e = embeddings(s, d)
        graft.pipeline.Decontaminate.semanticContaminated(
            e.filter(col("vec_id") >= 20), "vec_id", "embedding",
            e.filter(col("vec_id") < 20), "embedding", threshold = 0.4)
          .select(col("vec_id"), round(col("max_cos"), 6).as("max_cos"))
          .orderBy("vec_id")
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             b AS (SELECT v FROM e WHERE vec_id < 20),
             c AS (SELECT vec_id, v FROM e WHERE vec_id >= 20),
             m AS (SELECT c.vec_id, max(list_cosine_similarity(c.v, b.v)) AS mc
               FROM c CROSS JOIN b GROUP BY c.vec_id)
             SELECT vec_id, round(mc, 6) AS max_cos FROM m
             WHERE mc >= 0.4 ORDER BY vec_id""")),

    // ---- sequence packing (training context-window layout) -----------------
    // GPT-style concatenate-and-chunk: docs laid out in id order, cut every
    // 512 tokens; a doc may straddle a cut. Pure prefix sum — computed with
    // the engine's range-sort + per-partition-offset scaffold (no
    // unpartitioned window), and exactly reproducible as a SQL window.
    QueryDef("q_pack_chunked",
      (s, d) => {
        val docs = documents(s, d).select(col("doc_id"),
          graft.pipeline.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        graft.pipeline.Packing.chunkedPack(docs, "doc_id", "n_tokens",
            budget = 512)
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS tokens
               FROM documents),
             c AS (SELECT doc_id, tokens,
               coalesce(sum(tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
                 AS start_token FROM tok)
             SELECT doc_id, tokens, start_token,
               start_token // 512 AS first_bin,
               (start_token + greatest(tokens, 1) - 1) // 512 AS last_bin
             FROM c ORDER BY doc_id""")),

    // ---- shard-export manifest (no-split token-budget shards) -------------
    // shard = the stream cut where the doc STARTS; the manifest is the
    // per-shard rollup of the same prefix-sum layout as q_pack_chunked
    QueryDef("q_shard_plan",
      (s, d) => {
        val docs = documents(s, d).select(col("doc_id"),
          graft.pipeline.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        graft.pipeline.Packing.shardPlan(docs, "doc_id", "n_tokens",
            shardTokens = 4096)
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"), sum("tokens").as("tokens"))
          .orderBy("shard")
      },
      Some("""WITH tok AS (SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS tokens
               FROM documents),
             c AS (SELECT doc_id, tokens,
               coalesce(sum(tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
                 AS start_token FROM tok)
             SELECT start_token // 4096 AS shard,
               count(*)::BIGINT AS n_docs, sum(tokens)::BIGINT AS tokens
             FROM c GROUP BY 1 ORDER BY 1""")),

    // first-fit packing WITHOUT splitting docs (BERT/T5-style): greedy
    // per-partition first-fit — bin ASSIGNMENT is partition-local and not
    // SQL-expressible, so the driver records the one-row invariant summary
    // ---- per-doc sliding-window chunking (overlap, right-aligned tail) ----
    // chunks of 32 tokens advancing by 24; the last chunk right-aligns to
    // the final 32 tokens (full width, no sub-overlap tail) — chunk count
    // 1 + ceil((n-32)/24) is closed-form, so the oracle replays every
    // chunk string verbatim. ZERO shuffles: one typed flatMap per row.
    QueryDef("q_chunk_split",
      (s, d) => graft.pipeline.Packing.chunkSplit(documents(s, d),
          "doc_id", "text", window = 32, overlap = 8)
        .orderBy("doc_id", "chunk_id"),
      Some("""WITH tok AS (SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
             par AS (SELECT doc_id, t, len(t) AS n,
               CASE WHEN len(t) <= 32 THEN 1
                 ELSE 1 + CAST(ceil((len(t) - 32) / 24.0) AS INT) END AS m
               FROM tok),
             ks AS (SELECT doc_id, t, n, m,
               unnest(generate_series(0, m - 1)) AS k FROM par),
             c AS (SELECT doc_id, t, n, m, k,
               CASE WHEN n <= 32 THEN 0
                 WHEN k = m - 1 THEN n - 32 ELSE k * 24 END AS s,
               CASE WHEN n <= 32 THEN n ELSE 32 END AS w
               FROM ks)
             SELECT doc_id, k::INT AS chunk_id, s::INT AS start_token,
               w::INT AS n_tokens,
               array_to_string(list_slice(t, s + 1, s + w), ' ') AS chunk
             FROM c ORDER BY doc_id, chunk_id""")),

    // (rows-only); PackingSpec pins the invariants (no bin over budget,
    // no doc lost, deterministic reruns, oversize isolation).
    // bin ASSIGNMENT stays partition-local / engine-specific, but the
    // summary's conservation laws are not: doc count, token mass and
    // overfull count are SQL-reproducible VALUES, and the bin bounds
    // (lower bound on n_bins; max bin = max oversize doc when overfull,
    // else <= budget) become flags the oracle asserts true — same
    // contract-check pattern as the GK/HLL rows
    QueryDef("q_pack_greedy",
      (s, d) => {
        val docs = documents(s, d).select(col("doc_id"),
          graft.pipeline.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        val packed = graft.pipeline.Packing.packGreedy(docs, "doc_id",
          "n_tokens", budget = 512)
        val summary = graft.pipeline.Packing.packingSummary(packed, 512)
        val docStats = docs.agg(
          max(col("n_tokens").cast("long")).as("__max_doc"),
          sum(when(col("n_tokens") > 512, col("n_tokens").cast("long"))
            .otherwise(0L)).as("__oversize_mass"))
        summary.crossJoin(broadcast(docStats))
          .select(col("n_docs"), col("total_tokens"), col("n_overfull"),
            when(col("n_overfull") > 0,
                col("max_bin_tokens") === col("__max_doc"))
              .otherwise(col("max_bin_tokens") <= 512L).as("max_bin_ok"),
            (col("n_bins") >=
              ceil((col("total_tokens") - col("__oversize_mass"))
                .cast("double") / 512.0) + col("n_overfull"))
              .as("bins_lower_ok"))
      },
      Some("""WITH tok AS (SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS tokens
               FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL)
             SELECT count(*)::BIGINT AS n_docs,
               sum(tokens)::BIGINT AS total_tokens,
               sum((tokens > 512)::INT)::BIGINT AS n_overfull,
               true AS max_bin_ok, true AS bins_lower_ok FROM tok""")),

    // ---- Gopher-style repetition quality signals ---------------------------
    // The synthetic corpus has no newlines and no repeated >=5-grams, so the
    // query synthesizes repetition DETERMINISTICALLY on both sides: ' a ' is
    // turned into line breaks, and every third doc re-appends its first line
    // — exercising the dup-line, dup-line-char, and dup-ngram paths with
    // per-doc-varying nonzero values. All ratios are exact integer quotients
    // so the hash compare is bitwise.
    QueryDef("q_repetition",
      (s, d) => {
        val base = documents(s, d)
          .withColumn("text", expr("replace(text, ' a ', chr(10))"))
        val prepared = base.withColumn("text",
          when(col("doc_id") % 3 === 0,
            concat(col("text"), lit("\n"), expr("split_part(text, chr(10), 1)")))
          .otherwise(col("text")))
        graft.pipeline.TextAnalysis.repetitionSignals(prepared, "doc_id", "text")
          .select(col("doc_id"), col("n_lines"),
            round(col("dup_line_frac"), 6).as("dup_line_frac"),
            round(col("dup_line_char_frac"), 6).as("dup_line_char_frac"),
            round(col("top_2gram_char_frac"), 6).as("top_2gram_char_frac"),
            round(col("top_3gram_char_frac"), 6).as("top_3gram_char_frac"),
            round(col("dup_5gram_char_frac"), 6).as("dup_5gram_char_frac"),
            round(col("dup_10gram_char_frac"), 6).as("dup_10gram_char_frac"))
          .orderBy("doc_id")
      },
      Some("""WITH docs2 AS (SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                 THEN t || chr(10) || split_part(t, chr(10), 1)
                 ELSE t END AS text
               FROM (SELECT doc_id, replace(text, ' a ', chr(10)) AS t
                     FROM documents)),
             lraw AS (SELECT doc_id, trim(x) AS line
               FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS x
                     FROM docs2)
               WHERE trim(x) <> ''),
             lstat AS (SELECT doc_id, count(*) AS nl,
                 count(DISTINCT line) AS nd, sum(length(line)) AS lchars
               FROM lraw GROUP BY 1),
             lcnt AS (SELECT doc_id, line, count(*) AS c
               FROM lraw GROUP BY 1, 2),
             ldup AS (SELECT doc_id, sum(CASE WHEN c > 1
                 THEN c * length(line) ELSE 0 END) AS dchars
               FROM lcnt GROUP BY 1),
             tok AS (SELECT doc_id, list_filter(
                 regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS t
               FROM docs2),
             g2c AS (SELECT doc_id, g, count(*) AS c
               FROM (SELECT doc_id, unnest(list_transform(
                 generate_series(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i+1])) AS g FROM tok)
               GROUP BY 1, 2),
             top2 AS (SELECT doc_id, c * length(g) AS cov FROM g2c
               QUALIFY row_number() OVER (PARTITION BY doc_id
                 ORDER BY c DESC, g ASC) = 1),
             g3c AS (SELECT doc_id, g, count(*) AS c
               FROM (SELECT doc_id, unnest(list_transform(
                 generate_series(1, len(t) - 2),
                 i -> array_to_string(t[i:i+2], ' '))) AS g FROM tok)
               GROUP BY 1, 2),
             top3 AS (SELECT doc_id, c * length(g) AS cov FROM g3c
               QUALIFY row_number() OVER (PARTITION BY doc_id
                 ORDER BY c DESC, g ASC) = 1),
             d5 AS (SELECT doc_id, sum(CASE WHEN c > 1
                 THEN (c - 1) * length(g) ELSE 0 END) AS dup
               FROM (SELECT doc_id, g, count(*) AS c
                 FROM (SELECT doc_id, unnest(list_transform(
                   generate_series(1, len(t) - 4),
                   i -> array_to_string(t[i:i+4], ' '))) AS g FROM tok)
                 GROUP BY 1, 2) GROUP BY 1),
             d10 AS (SELECT doc_id, sum(CASE WHEN c > 1
                 THEN (c - 1) * length(g) ELSE 0 END) AS dup
               FROM (SELECT doc_id, g, count(*) AS c
                 FROM (SELECT doc_id, unnest(list_transform(
                   generate_series(1, len(t) - 9),
                   i -> array_to_string(t[i:i+9], ' '))) AS g FROM tok)
                 GROUP BY 1, 2) GROUP BY 1)
             SELECT d.doc_id,
               coalesce(ls.nl, 0) AS n_lines,
               round(coalesce((ls.nl - ls.nd)::DOUBLE / ls.nl, 0), 6)
                 AS dup_line_frac,
               round(coalesce(ld.dchars::DOUBLE / nullif(ls.lchars, 0), 0), 6)
                 AS dup_line_char_frac,
               round(coalesce(t2.cov::DOUBLE / length(d.text), 0), 6)
                 AS top_2gram_char_frac,
               round(coalesce(t3.cov::DOUBLE / length(d.text), 0), 6)
                 AS top_3gram_char_frac,
               round(coalesce(d5.dup::DOUBLE / length(d.text), 0), 6)
                 AS dup_5gram_char_frac,
               round(coalesce(d10.dup::DOUBLE / length(d.text), 0), 6)
                 AS dup_10gram_char_frac
             FROM docs2 d
             LEFT JOIN lstat ls ON ls.doc_id = d.doc_id
             LEFT JOIN ldup ld ON ld.doc_id = d.doc_id
             LEFT JOIN top2 t2 ON t2.doc_id = d.doc_id
             LEFT JOIN top3 t3 ON t3.doc_id = d.doc_id
             LEFT JOIN d5 ON d5.doc_id = d.doc_id
             LEFT JOIN d10 ON d10.doc_id = d.doc_id
             ORDER BY d.doc_id""")),

    // ---- multimodal plumbing: payload -> batched decode -> frame sample ---
    // The documents' text bytes stand in for media payloads (the container
    // ships no codecs; decode is the documented deterministic stub). This
    // exercises the real Spark-side contract — binary column + typed
    // metadata struct, mapPartitions batch decode, explode frame sampling —
    // in the driver flow; rows-only since the stub hash is engine-specific.
    // REAL image decode, hash-checked end-to-end: each doc gets a
    // deterministic 8×4 grayscale PNG test pattern; javax.imageio decodes
    // it and the pooled luminance features must reproduce the analytic
    // formula the oracle computes directly from doc_id. PNG is lossless,
    // so any drift in decode/pooling breaks the hash.
    // exact binary payload dedup: payloads derived from doc_id % 50, so
    // byte-content grouping must reproduce the id-class structure the
    // oracle computes directly (the payload bytes themselves are not
    // SQL-reachable — the CONTRACT is the group structure)
    QueryDef("q_payload_dedup",
      (s, d) => {
        // 50 id classes -> 50 distinct payloads: the memoized encode
        // (bit-identical bytes) removes 10k re-encodes per class per
        // sf0.1 run — the dedup contract is the byte-GROUPING, which is
        // what remains timed
        val pngOf = udf((id: Long) =>
          graft.pipeline.Multimodal.syntheticPngMemo(id % 50))
        graft.pipeline.Multimodal.payloadDedup(
            documents(s, d).na.drop(Seq("doc_id")).select(col("doc_id"))
              .withColumn("payload", pngOf(col("doc_id"))),
            "doc_id", "payload")
          .select("keep_id", "dup_count")
          .orderBy("keep_id")
      },
      Some("""SELECT min(doc_id)::BIGINT AS keep_id,
               count(*)::BIGINT AS dup_count
             FROM documents WHERE doc_id IS NOT NULL
             GROUP BY doc_id % 50 ORDER BY keep_id""")),

    QueryDef("q_multimodal",
      (s, d) => {
        import graft.pipeline.Multimodal._
        val pngOf = udf((id: Long) => syntheticPng(id))
        val media = asMediaFrame(
          documents(s, d).select("doc_id").withColumn("payload",
            pngOf(col("doc_id"))),
          "doc_id", "payload", "png")
        decodeAndExtract(media, dim = 8)
          .select(col("media_id").as("doc_id"),
            col("meta.width").as("width"), col("meta.height").as("height"),
            posexplode(col("features")).as(Seq("bucket", "feat")))
          .select(col("doc_id"), col("width"), col("height"), col("bucket"),
            round(col("feat"), 6).as("feat"))
          .orderBy("doc_id", "bucket")
      },
      Some("""SELECT d.doc_id, 8 AS width, 4 AS height,
             CAST(p // 4 AS INT) AS bucket,
             round(avg(((d.doc_id * 7 + p * 13) % 256) / 255.0), 6) AS feat
             FROM documents d CROSS JOIN generate_series(0, 31) AS t(p)
             GROUP BY 1, 2, 3, 4 ORDER BY doc_id, bucket""")),

    // frame-sampling / resize plumbing: the stub feature VALUES are a
    // byte-fold hash (engine-specific; the real-codec feature math is
    // hash-checked in q_multimodal), but the frame-explode arithmetic,
    // media counts, resize metadata and feature presence ARE
    // SQL-reproducible — oracle-checked like the other contract rows
    QueryDef("q_multimodal_frames",
      (s, d) => {
        import graft.pipeline.Multimodal._
        val media = asMediaFrame(
          documents(s, d).filter(col("text").isNotNull)
            .withColumn("payload", encode(col("text"), "utf-8")),
          "doc_id", "payload", "txt")
        val feats = extractFeatures(resize(media, 32, 32), dim = 8)
        sampleFrames(feats.withColumn("meta", struct(
            col("meta.format").as("format"), col("meta.width").as("width"),
            col("meta.height").as("height"), lit(6).as("n_frames"))),
            everyNth = 2)
          .agg(count(lit(1)).as("n_frame_rows"),
            countDistinct(col("media_id")).as("n_media"),
            max(col("meta.width")).as("width"),
            (count(lit(1)) === sum((size(col("features")) === 8).cast("long")))
              .as("features_ok"))
      },
      Some("""SELECT (3 * count(*))::BIGINT AS n_frame_rows,
             count(*)::BIGINT AS n_media, 32 AS width, true AS features_ok
             FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL""")),

    // ---- language ID (marker-word heuristic) ------------------------------
    QueryDef("q_lang_id",
      (s, d) => {
        import graft.pipeline.TextAnalysis._
        withLanguageId(documents(s, d).select("lang", "text"), "text")
          .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
          .orderBy("lang", "lang_pred")
      },
      Some("""WITH sc AS (SELECT lang,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                 x -> x IN ('the','and','of','to','in','is','that','it','with','for')))::DOUBLE AS s_en,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                 x -> x IN ('der','die','das','und','ist','nicht','ein','mit','von','zu')))::DOUBLE AS s_de,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                 x -> x IN ('le','la','les','et','est','une','des','dans','que','pour')))::DOUBLE AS s_fr,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                 x -> x IN ('el','los','las','es','una','del','por','con','para','como')))::DOUBLE AS s_es,
               (length(text) - length(replace(text, '的', ''))
                + length(text) - length(replace(text, '是', ''))
                + length(text) - length(replace(text, '在', ''))
                + length(text) - length(replace(text, '了', ''))
                + length(text) - length(replace(text, '我', ''))
                + length(text) - length(replace(text, '有', ''))
                + length(text) - length(replace(text, '和', ''))
                + length(text) - length(replace(text, '不', ''))
                + length(text) - length(replace(text, '这', ''))
                + length(text) - length(replace(text, '中', '')))::DOUBLE AS s_zh
               FROM documents),
             pred AS (SELECT lang, CASE
               WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'und'
               WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'en'
               WHEN s_de = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'de'
               WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'fr'
               WHEN s_es = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'es'
               ELSE 'zh' END AS lang_pred FROM sc)
             SELECT lang, lang_pred, count(*) AS n FROM pred
             GROUP BY lang, lang_pred ORDER BY lang, lang_pred""")),

    // the engine evaluating itself: Multiclass.summary over the marker-
    // word language-ID's predictions vs the dataset's lang labels — both
    // halves are independently hash-green (q_lang_id, q_multiclass_sum),
    // so their composition replays end-to-end too
    QueryDef("q_langid_eval",
      (s, d) => {
        import graft.pipeline.TextAnalysis._
        val preds = withLanguageId(
          documents(s, d).select("lang", "text"), "text")
        graft.eval.Multiclass.summary(preds, "lang_pred", "lang")
          .select(col("n"), round(col("accuracy"), 6).as("accuracy"),
            round(col("macro_precision"), 6).as("macro_precision"),
            round(col("macro_recall"), 6).as("macro_recall"),
            round(col("macro_f1"), 6).as("macro_f1"),
            round(col("weighted_f1"), 6).as("weighted_f1"))
      },
      Some("""WITH sc AS (SELECT lang,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                 x -> x IN ('the','and','of','to','in','is','that','it','with','for')))::DOUBLE AS s_en,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                 x -> x IN ('der','die','das','und','ist','nicht','ein','mit','von','zu')))::DOUBLE AS s_de,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                 x -> x IN ('le','la','les','et','est','une','des','dans','que','pour')))::DOUBLE AS s_fr,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                 x -> x IN ('el','los','las','es','una','del','por','con','para','como')))::DOUBLE AS s_es,
               (length(text) - length(replace(text, '的', ''))
                + length(text) - length(replace(text, '是', ''))
                + length(text) - length(replace(text, '在', ''))
                + length(text) - length(replace(text, '了', ''))
                + length(text) - length(replace(text, '我', ''))
                + length(text) - length(replace(text, '有', ''))
                + length(text) - length(replace(text, '和', ''))
                + length(text) - length(replace(text, '不', ''))
                + length(text) - length(replace(text, '这', ''))
                + length(text) - length(replace(text, '中', '')))::DOUBLE AS s_zh
               FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL),
             d2 AS (SELECT lang AS label, CASE
               WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'und'
               WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'en'
               WHEN s_de = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'de'
               WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'fr'
               WHEN s_es = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'es'
               ELSE 'zh' END AS pred FROM sc),
             c AS (SELECT label, pred, count(*)::BIGINT AS n FROM d2
               GROUP BY 1, 2),
             sup AS (SELECT label AS cls, sum(n)::BIGINT AS support FROM c
               GROUP BY 1),
             prd AS (SELECT pred AS cls, sum(n)::BIGINT AS predicted
               FROM c GROUP BY 1),
             tpc AS (SELECT label AS cls, n AS tp FROM c
               WHERE label = pred),
             j AS (SELECT coalesce(sup.cls, prd.cls) AS cls,
               coalesce(support, 0) AS support,
               coalesce(predicted, 0) AS predicted, coalesce(tp, 0) AS tp
               FROM sup FULL OUTER JOIN prd ON sup.cls = prd.cls
               LEFT JOIN tpc ON coalesce(sup.cls, prd.cls) = tpc.cls),
             m AS (SELECT cls, support, tp,
               CASE WHEN predicted > 0 THEN tp / predicted::DOUBLE END AS p,
               CASE WHEN support > 0 THEN tp / support::DOUBLE END AS r
               FROM j),
             m2 AS (SELECT cls, support, tp, p, r,
               CASE WHEN p IS NULL OR r IS NULL THEN NULL
                 WHEN p + r = 0 THEN 0.0
                 ELSE 2.0 * p * r / (p + r) END AS f1 FROM m)
             SELECT sum(support)::BIGINT AS n,
               round(sum(tp) / sum(support)::DOUBLE, 6) AS accuracy,
               round(avg(p), 6) AS macro_precision,
               round(avg(r), 6) AS macro_recall,
               round(avg(f1), 6) AS macro_f1,
               round(sum(f1 * support) / sum(support)::DOUBLE, 6)
                 AS weighted_f1
             FROM m2""")),

    // ---- PII scrubbing (emails / IPs / long digit runs) -------------------
    // the fixture docs carry no PII, so deterministic PII is appended from
    // doc_id first; the scrub must then strip it back out — oracle runs
    // the same append + replace chain in DuckDB (dialect-safe patterns)
    QueryDef("q_pii_scrub",
      (s, d) => {
        import graft.pipeline.TextAnalysis.scrubPii
        val withPii = documents(s, d).select(col("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id"), lit("@example.com from "),
            lit("10.0.0."), pmod(col("doc_id"), lit(200L)),
            lit(" acct "), col("doc_id") + lit(10000000L)).as("text"))
        withPii.select(col("doc_id"), scrubPii(col("text")).as("scrubbed"))
          .withColumn("has_pii_left",
            (col("scrubbed").rlike("@example\\.com") ||
              col("scrubbed").rlike("10\\.0\\.0\\.")).cast("int"))
          .select(col("doc_id"),
            substring(col("scrubbed"), -40, 40).as("tail"),
            col("has_pii_left"))
          .orderBy("doc_id")
      },
      Some("""WITH withpii AS (SELECT doc_id,
               text || ' contact user' || doc_id || '@example.com from ' ||
               '10.0.0.' || (doc_id % 200) || ' acct ' ||
               (doc_id + 10000000) AS text FROM documents),
             scrubbed AS (SELECT doc_id, regexp_replace(regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g'),
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                 '\b\d{7,}\b', '<NUM>', 'g') AS s FROM withpii)
             SELECT doc_id, CASE WHEN length(s) >= 40
                 THEN substring(s, length(s) - 39, 40) ELSE s END AS tail,
               (regexp_matches(s, '@example\.com') OR
                regexp_matches(s, '10\.0\.0\.'))::INT AS has_pii_left
             FROM scrubbed ORDER BY doc_id""")),

    // ---- multi-pattern blocklist screen (Aho-Corasick) --------------------
    // one automaton pass per doc counts every overlapping occurrence of
    // every pattern; the oracle brute-counts match positions per (doc,
    // pattern) with a position-list comprehension. "table table" on a
    // "table table table" run exercises self-overlap (2 hits where a
    // non-overlapping replace() count would say 1).
    QueryDef("q_blocklist",
      (s, d) => graft.pipeline.Blocklist.matches(documents(s, d),
          "doc_id", "text",
          Seq("spark", "merge batch", "table table", "scan"))
        .orderBy("doc_id", "pattern"),
      Some("""WITH pats(pattern) AS (VALUES ('spark'), ('merge batch'),
               ('table table'), ('scan')),
             h AS (SELECT doc_id, pattern,
               len([i FOR i IN range(1, length(text) - length(pattern) + 2)
                    IF substr(text, i, length(pattern)) = pattern])::BIGINT
                 AS hits
               FROM documents, pats
               WHERE text IS NOT NULL AND doc_id IS NOT NULL)
             SELECT doc_id, pattern, hits FROM h WHERE hits > 0
             ORDER BY doc_id, pattern""")),

    // the screen itself: zero-shuffle early-exit filter — NOT matches() +
    // anti-join. Patterns chosen so a meaningful fraction survives.
    QueryDef("q_blocklist_clean",
      (s, d) => graft.pipeline.Blocklist.screen(documents(s, d),
          "doc_id", "text", Seq("merge batch", "table table"))
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, n_chars FROM documents
             WHERE doc_id IS NOT NULL AND text IS NOT NULL
               AND NOT contains(text, 'merge batch')
               AND NOT contains(text, 'table table')
             ORDER BY doc_id""")),

    // ---- fuzzy string join (edit distance <= k) ----------------------------
    // q-gram count-filter candidates + levenshtein verify; the oracle is
    // the brute-force quadratic join (exact-recall contract — the filter
    // is a theorem). Supplier names differ only in their digit tail, so
    // k=1 exercises substitution-heavy mass.
    QueryDef("q_fuzzy_join",
      (s, d) => graft.pipeline.FuzzyJoin.fuzzyPairs(
          s.read.parquet(s"$d/supplier.parquet"), "s_suppkey", "s_name",
          maxDist = 1)
        .orderBy("id_a", "id_b"),
      Some("""WITH s AS (SELECT s_suppkey AS id, s_name AS nm FROM supplier
               WHERE s_suppkey IS NOT NULL AND s_name IS NOT NULL)
             SELECT a.id AS id_a, b.id AS id_b,
               levenshtein(a.nm, b.nm)::INT AS dist
             FROM s a JOIN s b ON a.id < b.id
             WHERE levenshtein(a.nm, b.nm) <= 1
             ORDER BY id_a, id_b""")),

    // cross-table reconciliation: right side = names with the first char
    // dropped (every row is a deletion-distance-1 partner of its source),
    // so the insert/delete + length-difference path is exercised
    QueryDef("q_fuzzy_cross",
      (s, d) => {
        val sup = s.read.parquet(s"$d/supplier.parquet")
        val mutated = sup.select((col("s_suppkey") + lit(100000L)).as("mid"),
          substring(col("s_name"), 2, 1000).as("mname"))
        graft.pipeline.FuzzyJoin.fuzzyJoin(sup, "s_suppkey", "s_name",
            mutated, "mid", "mname", maxDist = 1)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH l AS (SELECT s_suppkey AS id, s_name AS nm FROM supplier
               WHERE s_suppkey IS NOT NULL AND s_name IS NOT NULL),
             r AS (SELECT id + 100000 AS id, substr(nm, 2) AS nm FROM l)
             SELECT l.id AS id_a, r.id AS id_b,
               levenshtein(l.nm, r.nm)::INT AS dist
             FROM l JOIN r ON levenshtein(l.nm, r.nm) <= 1
             ORDER BY id_a, id_b""")),

    // entity resolution: fuzzy pairs closed into transitive clusters;
    // oracle = quadratic levenshtein join + recursive min-label closure
    // (the q_dedup_cc pattern), singletons self-labeled
    QueryDef("q_entity_clusters",
      (s, d) => graft.pipeline.FuzzyJoin.entityClusters(
          s.read.parquet(s"$d/supplier.parquet"), "s_suppkey", "s_name",
          maxDist = 1)
        .orderBy("id"),
      Some("""WITH RECURSIVE s AS (SELECT s_suppkey AS id, s_name AS nm
               FROM supplier
               WHERE s_suppkey IS NOT NULL AND s_name IS NOT NULL),
             p AS (SELECT a.id AS id_a, b.id AS id_b FROM s a JOIN s b
               ON a.id < b.id AND levenshtein(a.nm, b.nm) <= 1),
             edges AS (SELECT id_a AS u, id_b AS v FROM p
               UNION SELECT id_b, id_a FROM p),
             reach(id, r) AS (
               SELECT u, u FROM edges
               UNION
               SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v),
             lab AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
             SELECT s.id AS id, coalesce(lab.component, s.id)::BIGINT AS entity
             FROM s LEFT JOIN lab ON lab.id = s.id ORDER BY s.id""")),

    // ---- link-graph signals (PageRank / degrees) ---------------------------
    // supplier→part bipartite graph from distinct lineitem pairs; the
    // oracle unrolls the SAME three iterations (teleport written as
    // (1 - 0.85) on both sides so the constant is bit-identical; round(9)
    // absorbs sum-order ulps). Parts have no out-edges, so the dangling
    // correction carries real mass here, not just a code path.
    QueryDef("q_pagerank",
      (s, d) => {
        val edges = lineitem(s, d)
          .select(col("l_suppkey").as("src"),
            (col("l_partkey") + lit(1000000L)).as("dst"))
          .distinct()
        graft.pipeline.Graph.pageRank(edges, "src", "dst", iters = 3)
          .select(col("node"), round(col("rank"), 9).as("rank"))
          .orderBy("node")
      },
      Some("""WITH e AS (SELECT DISTINCT l_suppkey AS src,
               l_partkey + 1000000 AS dst FROM lineitem
               WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL),
             n AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
             c AS (SELECT count(*)::DOUBLE AS nn FROM n),
             deg AS (SELECT src, count(*)::DOUBLE AS d FROM e GROUP BY 1),
             r0 AS (SELECT v, 1.0/nn AS r FROM n, c),
             d0 AS (SELECT coalesce(sum(r), 0) AS dm FROM r0
               WHERE v NOT IN (SELECT src FROM e)),
             c0 AS (SELECT e.dst AS v, sum(r0.r / deg.d) AS cb FROM e
               JOIN r0 ON e.src = r0.v JOIN deg ON deg.src = e.src
               GROUP BY 1),
             r1 AS (SELECT n.v,
               (1 - 0.85)/c.nn + 0.85*(coalesce(c0.cb, 0) + d0.dm/c.nn) AS r
               FROM n LEFT JOIN c0 ON n.v = c0.v, c, d0),
             d1 AS (SELECT coalesce(sum(r), 0) AS dm FROM r1
               WHERE v NOT IN (SELECT src FROM e)),
             c1 AS (SELECT e.dst AS v, sum(r1.r / deg.d) AS cb FROM e
               JOIN r1 ON e.src = r1.v JOIN deg ON deg.src = e.src
               GROUP BY 1),
             r2 AS (SELECT n.v,
               (1 - 0.85)/c.nn + 0.85*(coalesce(c1.cb, 0) + d1.dm/c.nn) AS r
               FROM n LEFT JOIN c1 ON n.v = c1.v, c, d1),
             d2 AS (SELECT coalesce(sum(r), 0) AS dm FROM r2
               WHERE v NOT IN (SELECT src FROM e)),
             c2 AS (SELECT e.dst AS v, sum(r2.r / deg.d) AS cb FROM e
               JOIN r2 ON e.src = r2.v JOIN deg ON deg.src = e.src
               GROUP BY 1),
             r3 AS (SELECT n.v,
               (1 - 0.85)/c.nn + 0.85*(coalesce(c2.cb, 0) + d2.dm/c.nn) AS r
               FROM n LEFT JOIN c2 ON n.v = c2.v, c, d2)
             SELECT v AS node, round(r, 9) AS rank FROM r3 ORDER BY node""")),

    // weighted PageRank: rank splits over out-edges by quantity flow; the
    // oracle unrolls the SAME two iterations with w/d contribution shares
    // (weights summed exactly from decimals, cast to DOUBLE once)
    QueryDef("q_pagerank_weighted",
      (s, d) => {
        val edges = lineitem(s, d)
          .groupBy(col("l_suppkey").as("src"),
            (col("l_partkey") + lit(1000000L)).as("dst"))
          .agg(sum(col("l_quantity")).cast("double").as("w"))
        graft.pipeline.Graph.pageRankWeighted(edges, "src", "dst", "w",
            iters = 2)
          .select(col("node"), round(col("rank"), 9).as("rank"))
          .orderBy("node")
      },
      Some("""WITH e AS (SELECT l_suppkey AS src,
               l_partkey + 1000000 AS dst,
               sum(l_quantity)::DOUBLE AS w FROM lineitem
               WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL
               GROUP BY 1, 2),
             n AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
             c AS (SELECT count(*)::DOUBLE AS nn FROM n),
             deg AS (SELECT src, sum(w) AS d FROM e GROUP BY 1),
             r0 AS (SELECT v, 1.0/nn AS r FROM n, c),
             d0 AS (SELECT coalesce(sum(r), 0) AS dm FROM r0
               WHERE v NOT IN (SELECT src FROM e)),
             c0 AS (SELECT e.dst AS v, sum(r0.r * e.w / deg.d) AS cb FROM e
               JOIN r0 ON e.src = r0.v JOIN deg ON deg.src = e.src
               GROUP BY 1),
             r1 AS (SELECT n.v,
               (1 - 0.85)/c.nn + 0.85*(coalesce(c0.cb, 0) + d0.dm/c.nn) AS r
               FROM n LEFT JOIN c0 ON n.v = c0.v, c, d0),
             d1 AS (SELECT coalesce(sum(r), 0) AS dm FROM r1
               WHERE v NOT IN (SELECT src FROM e)),
             c1 AS (SELECT e.dst AS v, sum(r1.r * e.w / deg.d) AS cb FROM e
               JOIN r1 ON e.src = r1.v JOIN deg ON deg.src = e.src
               GROUP BY 1),
             r2 AS (SELECT n.v,
               (1 - 0.85)/c.nn + 0.85*(coalesce(c1.cb, 0) + d1.dm/c.nn) AS r
               FROM n LEFT JOIN c1 ON n.v = c1.v, c, d1)
             SELECT v AS node, round(r, 9) AS rank FROM r2 ORDER BY node""")),

    // HITS hubs/authorities, 1 iteration unrolled: supplier hubs score by
    // summed part authority then L2-normalize; parts re-score from the
    // UPDATED hubs (suppliers have authority 0, parts hub 0 — both sides
    // of the bipartite split carry real zeros); multi-iteration behavior
    // is spec-pinned against a driver reference
    QueryDef("q_hits",
      (s, d) => {
        val edges = lineitem(s, d)
          .select(col("l_suppkey").as("src"),
            (col("l_partkey") + lit(1000000L)).as("dst"))
          .distinct()
        graft.pipeline.Graph.hits(edges, "src", "dst", iters = 1)
          .select(col("node"), round(col("hub"), 9).as("hub"),
            round(col("authority"), 9).as("authority"))
          .orderBy("node")
      },
      Some("""WITH e AS (SELECT DISTINCT l_suppkey AS src,
               l_partkey + 1000000 AS dst FROM lineitem
               WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL),
             n AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
             c AS (SELECT count(*)::DOUBLE AS nn FROM n),
             a0 AS (SELECT v, 1.0/sqrt(nn) AS a FROM n, c),
             hu AS (SELECT e.src AS v, sum(a0.a) AS s FROM e
               JOIN a0 ON a0.v = e.dst GROUP BY 1),
             h1u AS (SELECT n.v, coalesce(hu.s, 0) AS h FROM n
               LEFT JOIN hu ON hu.v = n.v),
             hn AS (SELECT sqrt(sum(h*h)) AS s FROM h1u),
             h1 AS (SELECT v, h/hn.s AS h FROM h1u, hn),
             au AS (SELECT e.dst AS v, sum(h1.h) AS s FROM e
               JOIN h1 ON h1.v = e.src GROUP BY 1),
             a1u AS (SELECT n.v, coalesce(au.s, 0) AS a FROM n
               LEFT JOIN au ON au.v = n.v),
             an AS (SELECT sqrt(sum(a*a)) AS s FROM a1u),
             a1 AS (SELECT v, a/an.s AS a FROM a1u, an)
             SELECT h1.v AS node, round(h1.h, 9) AS hub,
               round(a1.a, 9) AS authority
             FROM h1 JOIN a1 ON a1.v = h1.v ORDER BY node""")),

    // ---- label propagation (deterministic synchronous LPA) ----------------
    // labels init to node ids; each iteration every node adopts its
    // neighbors' most frequent label, ties to the smallest — the oracle
    // replays the three synchronous rounds CTE-for-CTE
    QueryDef("q_label_prop",
      (s, d) => {
        val edges = lineitem(s, d)
          .select(col("l_suppkey").as("src"),
            (col("l_partkey") + lit(1000000L)).as("dst"))
          .distinct()
        graft.pipeline.Graph.labelPropagation(edges, "src", "dst", iters = 3)
          .orderBy("node")
      },
      Some("""WITH e0 AS (SELECT DISTINCT l_suppkey AS a,
               l_partkey + 1000000 AS b FROM lineitem
               WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL),
             sym AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
             l0 AS (SELECT DISTINCT a AS node, a AS label FROM sym),
             c1 AS (SELECT s.a AS node, l.label, count(*) AS c FROM sym s
               JOIN l0 l ON s.b = l.node GROUP BY 1, 2),
             l1 AS (SELECT node, label FROM (SELECT node, label,
                 row_number() OVER (PARTITION BY node
                   ORDER BY c DESC, label) AS rn FROM c1) WHERE rn = 1),
             c2 AS (SELECT s.a AS node, l.label, count(*) AS c FROM sym s
               JOIN l1 l ON s.b = l.node GROUP BY 1, 2),
             l2 AS (SELECT node, label FROM (SELECT node, label,
                 row_number() OVER (PARTITION BY node
                   ORDER BY c DESC, label) AS rn FROM c2) WHERE rn = 1),
             c3 AS (SELECT s.a AS node, l.label, count(*) AS c FROM sym s
               JOIN l2 l ON s.b = l.node GROUP BY 1, 2),
             l3 AS (SELECT node, label FROM (SELECT node, label,
                 row_number() OVER (PARTITION BY node
                   ORDER BY c DESC, label) AS rn FROM c3) WHERE rn = 1)
             SELECT node, label FROM l3 ORDER BY node""")),

    QueryDef("q_graph_degree",
      (s, d) => graft.pipeline.Graph.degrees(
          lineitem(s, d)
            .select(col("l_suppkey").as("src"),
              (col("l_partkey") + lit(1000000L)).as("dst"))
            .distinct(),
          "src", "dst")
        .orderBy("node"),
      Some("""WITH e AS (SELECT DISTINCT l_suppkey AS src,
               l_partkey + 1000000 AS dst FROM lineitem
               WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL),
             o AS (SELECT src AS node, count(*)::BIGINT AS od
               FROM e GROUP BY 1),
             i AS (SELECT dst AS node, count(*)::BIGINT AS id
               FROM e GROUP BY 1)
             SELECT coalesce(o.node, i.node) AS node,
               coalesce(od, 0)::BIGINT AS out_degree,
               coalesce(id, 0)::BIGINT AS in_degree
             FROM o FULL OUTER JOIN i ON o.node = i.node
             ORDER BY node""")),

    // ---- k-anonymity / rare-category suppression ---------------------------
    // quasi-identifier = (segment, nation, account-balance band): plenty of
    // sub-k groups at every SF (485 singletons at sf0.01)
    QueryDef("q_k_anon",
      (s, d) => graft.pipeline.Privacy.kAnonymityViolations(
          s.read.parquet(s"$d/customer.parquet")
            .withColumn("acct_band",
              floor(col("c_acctbal") / lit(1000.0))),
          Seq("c_mktsegment", "c_nationkey", "acct_band"), k = 5)
        .orderBy("c_mktsegment", "c_nationkey", "acct_band"),
      Some("""SELECT c_mktsegment, c_nationkey,
               floor(c_acctbal/1000)::BIGINT AS acct_band,
               count(*)::BIGINT AS n
             FROM customer GROUP BY 1, 2, 3 HAVING count(*) < 5
             ORDER BY 1, 2, 3""")),

    // suppression release: violating rows' quasi columns nulled; the
    // oracle replays the window-count CASE
    QueryDef("q_k_anonymize",
      (s, d) => graft.pipeline.Privacy.kAnonymize(
          s.read.parquet(s"$d/customer.parquet")
            .withColumn("acct_band",
              floor(col("c_acctbal") / lit(1000.0)))
            .select("c_custkey", "c_mktsegment", "c_nationkey", "acct_band"),
          Seq("c_mktsegment", "c_nationkey", "acct_band"), k = 5)
        .orderBy("c_custkey"),
      Some("""WITH c AS (SELECT c_custkey, c_mktsegment, c_nationkey,
               floor(c_acctbal/1000)::BIGINT AS acct_band FROM customer),
             w AS (SELECT *, count(*) OVER (PARTITION BY c_mktsegment,
               c_nationkey, acct_band) AS n FROM c)
             SELECT c_custkey,
               CASE WHEN n >= 5 THEN c_mktsegment END AS c_mktsegment,
               CASE WHEN n >= 5 THEN c_nationkey END AS c_nationkey,
               CASE WHEN n >= 5 THEN acct_band END AS acct_band
             FROM w ORDER BY c_custkey""")),

    // rare-category suppression on a long-tailed derived column (first two
    // tokens — ~40² combos, singletons at every SF); result = post-
    // suppression category histogram
    QueryDef("q_suppress_rare",
      (s, d) => {
        val docs = documents(s, d).na.drop(Seq("doc_id", "text"))
          .withColumn("bigram", concat_ws(" ",
            slice(split(trim(col("text")), "\\s+"), 1, 2)))
        graft.pipeline.Privacy.suppressRare(docs, "bigram", minCount = 3L)
          .groupBy("bigram").agg(count(lit(1)).as("n"))
          .orderBy("bigram")
      },
      Some("""WITH t AS (SELECT array_to_string(
               regexp_split_to_array(trim(text), '\s+')[1:2], ' ')
                 AS bigram
               FROM documents
               WHERE doc_id IS NOT NULL AND text IS NOT NULL),
             cnt AS (SELECT bigram, count(*) AS n FROM t GROUP BY 1),
             s AS (SELECT CASE WHEN cnt.n < 3 THEN 'OTHER'
                 ELSE t.bigram END AS bigram
               FROM t JOIN cnt USING (bigram))
             SELECT bigram, count(*)::BIGINT AS n FROM s
             GROUP BY 1 ORDER BY 1""")),

    // l-diversity on the same quasi key as q_k_anon: sensitive value =
    // custkey mod 7 (deterministic, 7 classes) — small bands can't reach
    // 4 distinct classes, so violations exist at every SF
    QueryDef("q_l_diversity",
      (s, d) => graft.pipeline.Privacy.lDiversityViolations(
          s.read.parquet(s"$d/customer.parquet")
            .withColumn("acct_band",
              floor(col("c_acctbal") / lit(1000.0)))
            .withColumn("cls", col("c_custkey") % lit(7L)),
          Seq("c_mktsegment", "c_nationkey", "acct_band"), "cls", l = 4)
        .orderBy("c_mktsegment", "c_nationkey", "acct_band"),
      Some("""SELECT c_mktsegment, c_nationkey,
               floor(c_acctbal/1000)::BIGINT AS acct_band,
               count(DISTINCT c_custkey % 7)::BIGINT AS distinct_sensitive
             FROM customer GROUP BY 1, 2, 3
             HAVING count(DISTINCT c_custkey % 7) < 4
             ORDER BY 1, 2, 3""")),

    // ---- t-closeness (categorical variational distance) -------------------
    // absent-value terms folded algebraically (0.5*(1 + Σ(|p−q|−q)) over
    // the group's PRESENT values) — the oracle computes the naive full-sum
    // form over the value universe, pinning the fold's equivalence
    QueryDef("q_t_closeness",
      (s, d) => graft.pipeline.Privacy.tCloseness(
          s.read.parquet(s"$d/orders.parquet"),
          Seq("o_orderpriority"), "o_orderstatus")
        .select(col("o_orderpriority"), col("n"),
          round(col("emd"), 6).as("emd"))
        .orderBy("o_orderpriority"),
      Some("""WITH nn AS (SELECT o_orderpriority, o_orderstatus FROM orders
               WHERE o_orderstatus IS NOT NULL),
             q AS (SELECT o_orderstatus AS v,
               count(*)::DOUBLE / (SELECT count(*) FROM nn) AS qv
               FROM nn GROUP BY 1),
             gs AS (SELECT o_orderpriority, count(*)::BIGINT AS gn
               FROM nn GROUP BY 1),
             cell AS (SELECT o_orderpriority, o_orderstatus AS v,
               count(*) AS cn FROM nn GROUP BY 1, 2),
             grid AS (SELECT gs.o_orderpriority, gs.gn, q.v, q.qv,
               coalesce(cell.cn, 0)::DOUBLE / gs.gn AS pv
               FROM gs CROSS JOIN q
               LEFT JOIN cell ON cell.o_orderpriority = gs.o_orderpriority
                 AND cell.v = q.v)
             SELECT o_orderpriority, max(gn) AS n,
               round(0.5 * sum(abs(pv - qv)), 6) AS emd
             FROM grid GROUP BY 1 ORDER BY 1""")),

    // ---- t-closeness (ordered EMD over the banded value universe) ---------
    QueryDef("q_t_closeness_ord",
      (s, d) => graft.pipeline.Privacy.tClosenessOrdered(
          s.read.parquet(s"$d/customer.parquet")
            .withColumn("acct_band",
              floor(col("c_acctbal") / lit(2000.0))),
          Seq("c_mktsegment"), "acct_band")
        .select(col("c_mktsegment"), col("n"),
          round(col("emd"), 6).as("emd"))
        .orderBy("c_mktsegment"),
      Some("""WITH nn AS (SELECT c_mktsegment,
               floor(c_acctbal/2000)::DOUBLE AS v FROM customer
               WHERE c_acctbal IS NOT NULL),
             u AS (SELECT v, count(*)::DOUBLE AS gn FROM nn GROUP BY 1),
             q AS (SELECT v, gn / (SELECT sum(gn) FROM u) AS qv FROM u),
             m AS (SELECT count(*)::DOUBLE AS m FROM u),
             gs AS (SELECT c_mktsegment, count(*)::BIGINT AS gsz
               FROM nn GROUP BY 1),
             cell AS (SELECT c_mktsegment, v, count(*) AS cn
               FROM nn GROUP BY 1, 2),
             grid AS (SELECT gs.c_mktsegment, gs.gsz, q.v, q.qv,
               coalesce(cell.cn, 0)::DOUBLE / gs.gsz AS pv
               FROM gs CROSS JOIN q
               LEFT JOIN cell ON cell.c_mktsegment = gs.c_mktsegment
                 AND cell.v = q.v),
             cum AS (SELECT c_mktsegment, gsz,
               sum(pv - qv) OVER (PARTITION BY c_mktsegment
                 ORDER BY v ROWS UNBOUNDED PRECEDING) AS cd
               FROM grid)
             SELECT c_mktsegment, max(gsz) AS n,
               round(sum(abs(cd)) / (max(m.m) - 1), 6) AS emd
             FROM cum, m GROUP BY 1 ORDER BY 1""")),

    // seeded-Laplace DP release counts: the md5 draw and the inverse CDF
    // replay bit-for-bit in DuckDB (ln last-ulp differences absorbed by
    // round(6) — the entropy-row precedent)
    QueryDef("q_dp_counts",
      (s, d) => graft.pipeline.Privacy.dpCounts(
          s.read.parquet(s"$d/customer.parquet"),
          Seq("c_mktsegment"), epsilon = 0.5, seed = 42L)
        .select(col("c_mktsegment"), col("n"),
          round(col("noisy_count"), 6).as("noisy_count"))
        .orderBy("c_mktsegment"),
      Some("""WITH g AS (SELECT c_mktsegment, count(*)::BIGINT AS n
               FROM customer GROUP BY 1),
             u AS (SELECT c_mktsegment, n,
               ((('0x' || substr(md5('42' || chr(1) || c_mktsegment), 1, 15))
                 ::UBIGINT::DOUBLE) + 0.5) / 1.152921504606846976e18 AS uv
               FROM g)
             SELECT c_mktsegment, n,
               round(n + (-1.0/0.5) * sign(uv - 0.5) *
                 ln(1 - 2*abs(uv - 0.5)), 6) AS noisy_count
             FROM u ORDER BY 1""")),

    // ---- personalized PageRank (TrustRank) ---------------------------------
    // seeds = suppliers 1-3 on the supplier→part graph; the oracle unrolls
    // the SAME two iterations with the seed restart distribution (dangling
    // mass returns to the seeds); round(9) absorbs sum-order ulps
    QueryDef("q_ppr",
      (s, d) => {
        val edges = lineitem(s, d)
          .select(col("l_suppkey").as("src"),
            (col("l_partkey") + lit(1000000L)).as("dst"))
          .distinct()
        graft.pipeline.Graph.personalizedPageRank(edges, "src", "dst",
            seeds = Seq(1L, 2L, 3L), iters = 2)
          .select(col("node"), round(col("rank"), 9).as("rank"))
          .filter(col("rank") > 0)
          .orderBy("node")
      },
      Some("""WITH e AS (SELECT DISTINCT l_suppkey AS src,
               l_partkey + 1000000 AS dst FROM lineitem
               WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL),
             n AS (SELECT src AS v FROM e UNION SELECT dst FROM e
               UNION SELECT v FROM (VALUES (1), (2), (3)) t(v)),
             sd AS (SELECT v, CASE WHEN v IN (1, 2, 3) THEN 1.0/3
               ELSE 0.0 END AS sv FROM n),
             deg AS (SELECT src, count(*)::DOUBLE AS d FROM e GROUP BY 1),
             r0 AS (SELECT v, sv AS r FROM sd),
             d0 AS (SELECT coalesce(sum(r), 0) AS dm FROM r0
               WHERE v NOT IN (SELECT src FROM e)),
             c0 AS (SELECT e.dst AS v, sum(r0.r / deg.d) AS cb FROM e
               JOIN r0 ON e.src = r0.v JOIN deg ON deg.src = e.src
               GROUP BY 1),
             r1 AS (SELECT sd.v,
               (1 - 0.85)*sd.sv + 0.85*(coalesce(c0.cb, 0) + d0.dm*sd.sv) AS r
               FROM sd LEFT JOIN c0 ON sd.v = c0.v, d0),
             d1 AS (SELECT coalesce(sum(r), 0) AS dm FROM r1
               WHERE v NOT IN (SELECT src FROM e)),
             c1 AS (SELECT e.dst AS v, sum(r1.r / deg.d) AS cb FROM e
               JOIN r1 ON e.src = r1.v JOIN deg ON deg.src = e.src
               GROUP BY 1),
             r2 AS (SELECT sd.v,
               (1 - 0.85)*sd.sv + 0.85*(coalesce(c1.cb, 0) + d1.dm*sd.sv) AS r
               FROM sd LEFT JOIN c1 ON sd.v = c1.v, d1)
             SELECT v AS node, round(r, 9) AS rank FROM r2
             WHERE round(r, 9) > 0 ORDER BY node""")),

    // ---- bipartite co-occurrence projection --------------------------------
    // suppliers appearing in the same ORDER (src = orderkey, deg ≤ 7, so
    // pair generation is bounded); result = the top pairs by shared-order
    // count with a full deterministic tiebreak
    QueryDef("q_cooccur",
      (s, d) => graft.pipeline.Graph.coOccurrence(
          lineitem(s, d).select(col("l_orderkey").as("src"),
            col("l_suppkey").as("dst")),
          "src", "dst")
        .orderBy(col("shared").desc, col("node_a"), col("node_b"))
        .limit(100),
      Some("""WITH e AS (SELECT DISTINCT l_orderkey AS src,
               l_suppkey AS dst FROM lineitem
               WHERE l_orderkey IS NOT NULL AND l_suppkey IS NOT NULL)
             SELECT a.dst AS node_a, b.dst AS node_b,
               count(*)::BIGINT AS shared
             FROM e a JOIN e b ON a.src = b.src AND a.dst < b.dst
             GROUP BY 1, 2
             ORDER BY shared DESC, node_a, node_b LIMIT 100""")),
  )
}
