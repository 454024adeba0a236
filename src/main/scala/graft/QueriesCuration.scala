package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.agg.Stats
import graft.clean.Clean
import graft.core.HandyFrame
import graft.ml.{HandyFencer, HandyImputer}
import graft.plotdata.PlotData
import graft.strata.{Bucket, ColStratum, Quantile, StratifiedFrame}

/** Gate tier 5/9 — curation tier: SCD2, PCA/JL, PQ/IVF-PQ, token budgets, curation funnel, weighted samples, chunk/substring/line dedup, fingerprinting.
  *
  * Split from the 11k-line Queries.scala (r11 VERDICT #8): pure
  * relocation, zero semantic movement — [[Queries.defs]] concatenates
  * the nine tiers in the original order and the duplicate-name guard
  * still covers the whole set. All determinism rules live in the
  * [[Queries]] scaladoc; table readers and shared contracts in
  * [[QueryHelpers]]. 28 queries. */
private[graft] object QueriesCuration {
  import QueryHelpers._

  val defs: Seq[QueryDef] = Seq(

    // ---- SCD2 validity intervals from a versioned change log --------------
    // key = customer, version = orderkey, tracked = order status: runs of
    // unchanged status collapse to one interval; exact struct<=>lag change
    // detection, no fingerprints — the oracle replays lag/run-sum/lead
    QueryDef("q_scd2",
      (s, d) => graft.pipeline.Snapshot.scd2(
          orders(s, d).select("o_custkey", "o_orderkey", "o_orderstatus"),
          "o_custkey", "o_orderkey", Seq("o_orderstatus"))
        .select(col("o_custkey"), col("o_orderstatus"), col("valid_from"),
          col("valid_to"), col("n_versions"), col("is_current"))
        .orderBy("o_custkey", "valid_from"),
      Some("""WITH o AS (SELECT o_custkey AS k, o_orderkey AS ver,
               o_orderstatus AS v FROM orders
               WHERE o_custkey IS NOT NULL AND o_orderkey IS NOT NULL),
             g AS (SELECT k, ver, v,
               CASE WHEN lag(v) OVER w IS NULL
                 OR v IS DISTINCT FROM lag(v) OVER w THEN 1 ELSE 0 END AS chg
               FROM o WINDOW w AS (PARTITION BY k ORDER BY ver)),
             s AS (SELECT k, ver, v, sum(chg) OVER (PARTITION BY k
               ORDER BY ver ROWS UNBOUNDED PRECEDING) AS seg FROM g),
             c AS (SELECT k, seg, v, min(ver) AS valid_from,
               count(*)::BIGINT AS n_versions FROM s GROUP BY 1, 2, 3)
             SELECT k AS o_custkey, v AS o_orderstatus, valid_from,
               lead(valid_from) OVER w2 AS valid_to, n_versions,
               (lead(valid_from) OVER w2 IS NULL) AS is_current
             FROM c WINDOW w2 AS (PARTITION BY k ORDER BY valid_from)
             ORDER BY o_custkey, valid_from""")),

    // ---- int8 embedding quantization --------------------------------------
    // per-dim (lo, hi) via one treeAggregate fold (2*dim doubles to the
    // driver, no dimension shuffle), then a pure-projection transform;
    // q = round((v-lo)/span*255) in double is a fixed IEEE expression
    // tree DuckDB reproduces bit-for-bit
    QueryDef("q_embed_quantize",
      (s, d) => graft.pipeline.Quantize.quantizeInt8(
          embeddings(s, d), "vec_id", "embedding")
        .select(col("vec_id"), posexplode(col("qvec")).as(Seq("pos", "q")))
        .orderBy("vec_id", "pos"),
      Some("""WITH e AS (SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS pos,
               unnest(embedding)::DOUBLE AS v
               FROM embeddings WHERE embedding IS NOT NULL),
             s AS (SELECT pos, min(v) AS lo, max(v) AS hi
               FROM e GROUP BY pos)
             SELECT e.vec_id, e.pos,
               round((e.v - s.lo) /
                 (CASE WHEN s.hi = s.lo THEN 1 ELSE s.hi - s.lo END)
                 * 255)::INT AS q
             FROM e JOIN s USING (pos) ORDER BY vec_id, pos""")),

    // ---- distributed PCA: covariance pass (the oracle-facing half) --------
    // ROUNDING-FREE contract (the round-9 red row): elements quantize to
    // exact longs q = floor(v·2^20) (power-of-two scaling of a float is
    // exact, so both engines floor the identical double), the co-moment
    // sums n/Σx/Σy/Σxy are exact longs (order-independent — unlike double
    // sums), and cov derives through one fixed IEEE chain
    // (Sxy − Sx·Sy/n)/(n−1)/2^40 that DuckDB replays term-for-term.
    // Every compared column is exact or chain-derived → compares
    // UNROUNDED (no round(6) half-boundary flips across engine builds).
    // CovExactSpec pins the double-path covFrame to this frame at 1e-6.
    QueryDef("q_pca_cov",
      (s, d) => graft.pipeline.Pca.covFrameExact(
          embeddings(s, d), "vec_id", "embedding", scaleBits = 20)
        .orderBy("i", "j"),
      Some("""WITH e AS (SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS pos,
               floor(unnest(embedding)::DOUBLE * 1048576.0)::BIGINT AS q
               FROM embeddings WHERE embedding IS NOT NULL)
             SELECT a.pos AS i, b.pos AS j, count(*)::BIGINT AS n,
               sum(a.q)::BIGINT AS sx, sum(b.q)::BIGINT AS sy,
               sum(a.q * b.q)::BIGINT AS sxy,
               (sum(a.q * b.q)::BIGINT::DOUBLE
                 - sum(a.q)::BIGINT::DOUBLE * sum(b.q)::BIGINT::DOUBLE
                   / count(*)::BIGINT::DOUBLE)
                 / (count(*)::BIGINT - 1)::DOUBLE
                 / 1099511627776.0 AS cov
             FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.pos <= b.pos
             GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- PCA eigensolve integrity contract --------------------------------
    // the driver-side Jacobi solve can't be replayed in SQL, but its
    // invariants can: the eigenvalue sum must reproduce the covariance
    // trace (rotation invariance — drifts iff the solve lost mass; the
    // oracle recomputes the trace as sum of per-dim var_samp and expects
    // eig_sum to match it), eigenvalues sorted desc, components
    // orthonormal to 1e-9. Projection exactness lives in PcaSpec
    // (projected variance == eigenvalue, reconstruction, whitening)
    QueryDef("q_pca_check",
      (s, d) => graft.pipeline.Pca.fitCheck(
          embeddings(s, d), "vec_id", "embedding")
        .select(col("dim").cast("long").as("dim"),
          round(col("trace_cov"), 6).as("trace_cov"),
          round(col("eig_sum"), 6).as("eig_sum"),
          col("monotone"), col("orthonormal")),
      Some("""WITH e AS (SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS pos,
               unnest(embedding)::DOUBLE AS v
               FROM embeddings WHERE embedding IS NOT NULL),
             t AS (SELECT pos, var_samp(v) AS vs FROM e GROUP BY pos)
             SELECT (SELECT max(len(embedding)) FROM embeddings)::BIGINT AS dim,
               round(sum(vs), 6) AS trace_cov,
               round(sum(vs), 6) AS eig_sum,
               true AS monotone, true AS orthonormal
             FROM t""")),

    // fit + project to the top-8 components (the OPQ-lite rotation ahead
    // of PQ subspace splits), contracted per component: the DISTRIBUTED
    // sample variance of each projected coordinate must equal the
    // model's eigenvalue (pins projection + eigensolve jointly — the
    // rotation-invariance identity), variances monotone desc, projected
    // means ~0 (centering), and the kept mass at most the trace. The
    // oracle reproduces the trace (sum of per-dim var_samp) and the
    // flags; the eigenvectors themselves stay driver-side (SQL can't
    // derive them — their exactness is what the identities pin).
    QueryDef("q_pca_project",
      (s, d) => {
        val e = embeddings(s, d)
        val m = graft.pipeline.Pca.fit(e, "vec_id", "embedding", k = 8)
        val spark = s
        import spark.implicits._
        val eig = m.eigenvalues.zipWithIndex
          .map { case (v, i) => (i.toLong, v) }.toSeq
          .toDF("pos", "eig")
        val perComp = graft.pipeline.Pca.transform(e, "vec_id", "embedding", m)
          .select(posexplode(col("projection")).as(Seq("pos", "y")))
          .groupBy(col("pos").cast("long").as("pos"))
          .agg(var_samp("y").as("v"), avg("y").as("mu"))
        val total = perComp.agg(sum("v").as("kept")).head().getDouble(0)
        perComp.join(broadcast(eig), "pos")
          .withColumn("v_next", lead("v", 1).over(
            org.apache.spark.sql.expressions.Window.orderBy("pos")))
          .select(col("pos"),
            round(lit(m.totalVariance), 6).as("trace_cov"),
            (abs(col("v") - col("eig")) <=
              lit(1e-8) * greatest(col("eig"), lit(1.0))).as("var_eq_eig"),
            (col("v_next").isNull || col("v") >= col("v_next") - lit(1e-12))
              .as("var_monotone"),
            (abs(col("mu")) <= lit(1e-9)).as("mean_zero"),
            lit(total <= m.totalVariance * (1.0 + 1e-9)).as("kept_le_trace"))
          .orderBy("pos")
      },
      Some("""WITH e AS (SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS pos,
               unnest(embedding)::DOUBLE AS v
               FROM embeddings WHERE embedding IS NOT NULL),
             t AS (SELECT pos, var_samp(v) AS vs FROM e GROUP BY pos),
             g AS (SELECT round(sum(vs), 6) AS trace_cov FROM t)
             SELECT r.range::BIGINT AS pos, g.trace_cov,
               true AS var_eq_eig, true AS var_monotone,
               true AS mean_zero, true AS kept_le_trace
             FROM range(8) r, g ORDER BY pos""")),

    // ---- Product-quantization ANN (memory tier under IVF) -----------------
    // 8 codes/vector instead of 64 floats; ADC scoring (per-query lookup
    // tables, m adds per corpus row). The returned ids are codebook-
    // dependent, so the gate contract re-scores them EXACTLY in-query
    // and compares rank-wise against the brute-force top-k: the i-th
    // best exact cosine of ANY k-subset is at most the i-th brute cosine
    // (order-statistic dominance), which pins id validity + exact-cosine
    // reproduction while the brute column gives DuckDB a replayable
    // value per rank. Recall itself is gate-checked via q_pq_recall.
    QueryDef("q_pq_topk",
      (s, d) => {
        val e = embeddings(s, d)
        val qvec = e.filter(col("vec_id") === 0)
          .select(expr("transform(embedding, x -> cast(x as double))"))
          .head().getSeq[Double](0).toArray
        val corpus = e.filter(col("vec_id") =!= 0)
        val cb = graft.pipeline.Quantize.pqTrain(corpus, "vec_id",
          "embedding", m = 16, ksub = 256)
        val enc = graft.pipeline.Quantize.pqEncode(corpus, "vec_id",
          "embedding", cb)
        val pqIds = graft.pipeline.Quantize.pqTopK(enc, cb, "vec_id",
          qvec, k = 10).select(col("vec_id"))
        pqContract(s, corpus, pqIds, qvec, k = 10)
      },
      Some(pqContractOracle)),

    // IVF-routed ADC search (the composed production shape): coarse cells
    // prune the scan to nProbe/nCells, PQ codes price each survivor at m
    // adds. Same rank-wise dominance contract as q_pq_topk (the routed
    // tier may return < k rows when the probed cells run dry — absent
    // ranks pass dominance vacuously). Full-probe == pqTopK is
    // spec-pinned; recall via q_pq_recall.
    QueryDef("q_pq_ivf",
      (s, d) => {
        val e = embeddings(s, d)
        val qvec = e.filter(col("vec_id") === 0)
          .select(expr("transform(embedding, x -> cast(x as double))"))
          .head().getSeq[Double](0).toArray
        val corpus = e.filter(col("vec_id") =!= 0)
        val (index, ivfC, cb) = graft.pipeline.Quantize.ivfPqIndex(corpus,
          "vec_id", "embedding", nCells = 16, m = 16, ksub = 256)
        val pqIds = graft.pipeline.Quantize.ivfPqTopK(index, ivfC, cb,
          "vec_id", qvec, k = 10, nProbe = 4).select(col("vec_id"))
        pqContract(s, corpus, pqIds, qvec, k = 10)
      },
      Some(pqContractOracle)),

    // ---- IVF-PQ persistence contract --------------------------------------
    // write the trained index + both model halves to parquet, reload, and
    // require the routed ADC search to reproduce the in-memory results
    // EXACTLY (ids and cos, full-precision join); also append one known
    // vector under the persisted models and require it findable. The
    // deterministic columns (corpus size, parity flags) are what the
    // oracle reproduces — same triple-contract style as q_text_index
    QueryDef("q_pq_persist",
      (s, d) => {
        implicit val sp: SparkSession = s
        val e = embeddings(s, d)
        val qvec = e.filter(col("vec_id") === 0)
          .select(expr("transform(embedding, x -> cast(x as double))"))
          .head().getSeq[Double](0).toArray
        val corpus = e.filter(col("vec_id") =!= 0)
        val (index, ivfC, cb) = graft.pipeline.Quantize.ivfPqIndex(corpus,
          "vec_id", "embedding", nCells = 16, m = 16, ksub = 256)
        val path = graft.util.Scratch.dir("graft-q-pqpersist")
        graft.pipeline.Quantize.writeIvfPq(index, ivfC, cb, "vec_id", path)
        val (index2, ivfC2, cb2) = graft.pipeline.Quantize.readIvfPq(path, "vec_id")
        def top(ix: DataFrame, cs: Array[Array[Double]],
                book: graft.pipeline.Quantize.PQCodebook) =
          graft.pipeline.Quantize.ivfPqTopK(ix, cs, book, "vec_id", qvec,
            k = 10, nProbe = 4)
        val mism = top(index, ivfC, cb)
          .select(col("vec_id"), col("cos"))
          .join(top(index2, ivfC2, cb2)
              .select(col("vec_id").as("__i2"), col("cos").as("__c2")),
            col("vec_id") === col("__i2") && col("cos") === col("__c2"),
            "full_outer")
          .filter(col("vec_id").isNull || col("__i2").isNull)
          .agg(count(lit(1)).as("__mism"))
        // append the query vector itself under the persisted models — the
        // reloaded index must serve it back as its own nearest neighbor
        graft.pipeline.Quantize.appendIvfPq(
          e.filter(col("vec_id") === 0)
            .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")),
          "vec_id", "embedding", path)
        val (index3, ivfC3, cb3) = graft.pipeline.Quantize.readIvfPq(path, "vec_id")
        val served = graft.pipeline.Quantize.ivfPqTopK(index3, ivfC3, cb3,
            "vec_id", qvec, k = 1, nProbe = 4)
          .agg(max((col("vec_id") === 1000000L).cast("int")).as("__hit"))
        corpus.agg(count(lit(1)).as("n_corpus"))
          .crossJoin(mism).crossJoin(served)
          .select(col("n_corpus"),
            (col("__mism") === 0).as("roundtrip_identical"),
            (col("__hit") === 1).as("appended_served"))
      },
      Some("""SELECT count(*)::BIGINT AS n_corpus,
             true AS roundtrip_identical, true AS appended_served
             FROM embeddings WHERE vec_id <> 0""")),

    // gate: PQ top-10 must overlap the EXACT brute-force top-10 by >= 0.5
    // on average over 8 queries (same subset-style contract as the LSH
    // gates — the oracle reproduces the query count; the floor is a Spark-
    // side assertion). The synthetic embeddings are near-random (top-10
    // cosines ~0.27-0.33, barely separated — PQ's adversarial case), so
    // dsub=4 resolution is needed: PqProbe measures mean recall@10
    // 0.85 / 0.85 / 0.725 at sf0.001 / 0.01 / 0.1 with m=16, ksub=256
    QueryDef("q_pq_recall",
      (s, d) => {
        val s2 = s
        import s2.implicits._
        val e = embeddings(s, d)
        val qs = e.filter(col("vec_id") < 8)
          .select(col("vec_id").cast("long"),
            expr("transform(embedding, x -> cast(x as double))"))
          .as[(Long, Seq[Double])].collect().sortBy(_._1)
        val corpus = e.filter(col("vec_id") >= 8)
        val cb = graft.pipeline.Quantize.pqTrain(corpus, "vec_id",
          "embedding", m = 16, ksub = 256)
        val enc = graft.pipeline.Quantize.pqEncode(corpus, "vec_id",
          "embedding", cb)
        val recalls = qs.map { case (_, qv) =>
          val q = qv.toArray
          val approx = graft.pipeline.Quantize.pqTopK(enc, cb, "vec_id",
            q, k = 10).collect().map(_.getLong(0)).toSet
          val exact = graft.pipeline.Similarity.bruteForceTopK(corpus,
            "vec_id", "embedding", q, 10).collect().map(_.getLong(0)).toSet
          (approx & exact).size / 10.0
        }
        val mean = recalls.sum / recalls.length
        Seq((qs.length.toLong, mean >= 0.5))
          .toDF("n_queries", "recall_floor_ok")
      },
      Some("""SELECT count(*)::BIGINT AS n_queries,
             true AS recall_floor_ok FROM embeddings WHERE vec_id < 8"""),
      gateOnly = true),

    // ---- Token-budget selection (fill a training budget) ------------------
    // maximal score-descending prefix under a cumulative token budget;
    // Spark side = one range-sort + partition-offset running sums (no
    // global window), oracle = the equivalent window-sum filter
    QueryDef("q_token_budget",
      (s, d) => graft.pipeline.Sampling.tokenBudgetSelect(
          documents(s, d).withColumn("n_toks",
            graft.pipeline.TextAnalysis.tokenCount(col("text"))),
          "doc_id", "n_chars", "n_toks", budget = 12000L)
        .select(col("doc_id"), col("cum_tokens"))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, n_chars,
               len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS toks
               FROM documents WHERE text IS NOT NULL)
             SELECT doc_id, cum_tokens FROM (
               SELECT doc_id, sum(toks) OVER (ORDER BY n_chars DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 ::BIGINT AS cum_tokens FROM t)
             WHERE cum_tokens <= 12000 ORDER BY doc_id""")),

    QueryDef("q_token_budget_grouped",
      (s, d) => graft.pipeline.Sampling.tokenBudgetPerGroup(
          documents(s, d).withColumn("n_toks",
            graft.pipeline.TextAnalysis.tokenCount(col("text"))),
          "doc_id", "source", "n_chars", "n_toks", budget = 600L)
        .select(col("doc_id"), col("source"), col("cum_tokens"))
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, source, n_chars,
               len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS toks
               FROM documents
               WHERE text IS NOT NULL AND source IS NOT NULL)
             SELECT doc_id, source, cum_tokens FROM (
               SELECT doc_id, source, sum(toks) OVER (PARTITION BY source
                 ORDER BY n_chars DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 ::BIGINT AS cum_tokens FROM t)
             WHERE cum_tokens <= 600 ORDER BY doc_id""")),

    // per-group budgets from a plan table (the mixture-plan -> selection
    // composition); plan budgets vary by source (300 + 40*(src# % 7)) so
    // distinct budgets are actually exercised
    QueryDef("q_token_budget_plan",
      (s, d) => {
        val plan = documents(s, d).select(col("source")).distinct()
          .withColumn("token_budget",
            lit(300L) + lit(40L) * pmod(substring(col("source"), 4, 10)
              .cast("long"), lit(7L)))
        graft.pipeline.Sampling.tokenBudgetFromPlan(
            documents(s, d).withColumn("n_toks",
              graft.pipeline.TextAnalysis.tokenCount(col("text"))),
            "doc_id", "source", "n_chars", "n_toks", plan)
          .select(col("doc_id"), col("source"), col("cum_tokens"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, source, n_chars,
               len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS toks
               FROM documents
               WHERE text IS NOT NULL AND source IS NOT NULL),
             p AS (SELECT source, 300 + 40 * (substr(source, 4)::BIGINT % 7)
               AS token_budget FROM (SELECT DISTINCT source FROM documents))
             SELECT doc_id, source, cum_tokens FROM (
               SELECT t.doc_id, t.source, p.token_budget,
                 sum(t.toks) OVER (PARTITION BY t.source
                   ORDER BY t.n_chars DESC, t.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   ::BIGINT AS cum_tokens
               FROM t JOIN p ON t.source = p.source)
             WHERE cum_tokens <= token_budget ORDER BY doc_id""")),

    // ---- Percent-rank score normalization ---------------------------------
    // per-group percent_rank over (score, id) makes scores comparable
    // across sources; (n_chars, doc_id) is a total order so the value is
    // (rn-1)/(n-1), engine-exact
    QueryDef("q_rank_normalize",
      (s, d) => graft.pipeline.Sampling.rankNormalize(
          documents(s, d), "doc_id", "source", "n_chars")
        .select(col("doc_id"), col("source"),
          round(col("score_pct"), 6).as("score_pct"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, source,
               round(percent_rank() OVER (PARTITION BY source
                 ORDER BY n_chars, doc_id), 6) AS score_pct
             FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL
             ORDER BY doc_id""")),

    QueryDef("q_train_test_split",
      (s, d) => graft.pipeline.Sampling.trainTestSplit(
          documents(s, d), "doc_id", valFraction = 0.1, testFraction = 0.1,
          seed = 3)
        .groupBy("split").agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"))
        .orderBy("split"),
      Some("""WITH s1 AS (SELECT doc_id,
               (doc_id % 2147483648 + (doc_id // 2147483648) * 48271)
                 % 2147483646 + 1 AS x
               FROM documents WHERE doc_id IS NOT NULL),
             s2 AS (SELECT doc_id, ((x * 48271 % 2147483647)
               * 48271 % 2147483647) * 48271 % 2147483647 AS x3 FROM s1),
             s3 AS (SELECT doc_id,
               ((((x3 + 3) % 2147483646 + 1) * 48271 % 2147483647)
                 * 48271 % 2147483647)::DOUBLE / 2147483647.0 AS k FROM s2)
             SELECT CASE
               WHEN k < 0.1 THEN 'test'
               WHEN k < 0.2 THEN 'val'
               ELSE 'train' END AS split,
             count(*)::BIGINT AS n, sum(doc_id)::BIGINT AS id_sum
             FROM s3 GROUP BY 1 ORDER BY 1""")),

    // ---- k-fold assignment (equal-width cut of the same Lehmer key) -------
    QueryDef("q_kfold",
      (s, d) => graft.pipeline.Sampling.kFold(
          documents(s, d), "doc_id", k = 5, seed = 3)
        .groupBy("fold").agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"))
        .orderBy("fold"),
      Some("""WITH s1 AS (SELECT doc_id,
               (doc_id % 2147483648 + (doc_id // 2147483648) * 48271)
                 % 2147483646 + 1 AS x
               FROM documents WHERE doc_id IS NOT NULL),
             s2 AS (SELECT doc_id, ((x * 48271 % 2147483647)
               * 48271 % 2147483647) * 48271 % 2147483647 AS x3 FROM s1),
             s3 AS (SELECT doc_id,
               ((((x3 + 3) % 2147483646 + 1) * 48271 % 2147483647)
                 * 48271 % 2147483647)::DOUBLE / 2147483647.0 AS k FROM s2)
             SELECT least(floor(k * 5), 4)::INT AS fold,
             count(*)::BIGINT AS n, sum(doc_id)::BIGINT AS id_sum
             FROM s3 GROUP BY 1 ORDER BY 1""")),

    // ---- contamination-safe split (near-dup groups move as one unit) ------
    // hash key = the connected-component representative (min id) of the
    // near-dup graph, so a clique can never straddle train/val; oracle
    // replays the q_dedup_cc recursive-CTE closure, the left join, and
    // the Lehmer hash on the representative verbatim
    QueryDef("q_cc_split",
      (s, d) => {
        val docs = documents(s, d)
        val pairs = graft.pipeline.Dedup
          .ngramJaccard(docs, "doc_id", "text", 3, maxDf = 20)
          .filter(col("jaccard") >= 0.3)
        val comps = graft.pipeline.Components.connectedComponents(pairs)
        graft.pipeline.Sampling.componentSafeSplit(docs, comps, "doc_id",
            valFraction = 0.15, testFraction = 0.1, seed = 7)
          .groupBy("split")
          .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"))
          .orderBy("split")
      },
      Some("""WITH RECURSIVE tok AS (SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
             shall AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_transform(generate_series(1, len(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS s
               FROM tok),
             dfreq AS (SELECT s, count(*) AS c FROM shall GROUP BY 1),
             sh AS (SELECT doc_id, s FROM shall
               WHERE s NOT IN (SELECT s FROM dfreq WHERE c > 20)),
             sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
             com AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
             pairs AS (SELECT id_a, id_b
               FROM com JOIN sz sa ON sa.doc_id = id_a
               JOIN sz sb ON sb.doc_id = id_b
               WHERE c::DOUBLE / (sa.sz + sb.sz - c) >= 0.3),
             edges AS (SELECT id_a AS u, id_b AS v FROM pairs
               UNION SELECT id_b, id_a FROM pairs),
             reach(id, r) AS (
               SELECT u, u FROM edges
               UNION
               SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v),
             comp AS (SELECT id, min(r) AS rep FROM reach GROUP BY id),
             j AS (SELECT d.doc_id,
                 coalesce(comp.rep, d.doc_id) AS rep
               FROM documents d LEFT JOIN comp ON comp.id = d.doc_id
               WHERE d.doc_id IS NOT NULL),
             s1 AS (SELECT doc_id,
               (rep % 2147483648 + (rep // 2147483648) * 48271)
                 % 2147483646 + 1 AS x FROM j),
             s2 AS (SELECT doc_id, ((x * 48271 % 2147483647)
               * 48271 % 2147483647) * 48271 % 2147483647 AS x3 FROM s1),
             s3 AS (SELECT doc_id,
               ((((x3 + 7) % 2147483646 + 1) * 48271 % 2147483647)
                 * 48271 % 2147483647)::DOUBLE / 2147483647.0 AS k FROM s2)
             SELECT CASE
               WHEN k < 0.1 THEN 'test'
               WHEN k < 0.25 THEN 'val'
               ELSE 'train' END AS split,
             count(*)::BIGINT AS n, sum(doc_id)::BIGINT AS id_sum
             FROM s3 GROUP BY 1 ORDER BY 1""")),

    // ---- composed curation funnel (end-to-end attrition report) -----------
    // length filter -> exact dedup -> 4-gram decontamination -> split,
    // each stage the engine's own operator; the oracle replays the WHOLE
    // chain (dedup survivor ids feed the shingle join feed the split
    // hash), so the funnel counts are verified as a pipeline, not just
    // as independent stages
    QueryDef("q_curation_funnel",
      (s, d) => {
        val docs = documents(s, d)
        val bench = docs.filter(col("doc_id") % 97 === 0)
        graft.pipeline.Curate.funnel(docs, "doc_id", "text", bench,
            minWords = 30, valFraction = 0.15, testFraction = 0.1, seed = 7)
          .orderBy("stage")
      },
      Some("""WITH input AS (SELECT doc_id, text FROM documents
               WHERE doc_id IS NOT NULL AND text IS NOT NULL),
             minw AS (SELECT doc_id, text FROM input
               WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 30),
             ded AS (SELECT min(doc_id) AS doc_id, text FROM minw
               GROUP BY text),
             tok AS (SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS t FROM ded),
             sh AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(t) < 4 THEN [array_to_string(t, ' ')]
               ELSE list_transform(generate_series(1, len(t) - 3),
                 i -> array_to_string(t[i:i+3], ' ')) END)) AS s
               FROM tok),
             btok AS (SELECT regexp_split_to_array(trim(text), '\s+') AS t
               FROM documents WHERE doc_id % 97 = 0 AND text IS NOT NULL),
             bg AS (SELECT DISTINCT unnest(list_distinct(
               CASE WHEN len(t) < 4 THEN [array_to_string(t, ' ')]
               ELSE list_transform(generate_series(1, len(t) - 3),
                 i -> array_to_string(t[i:i+3], ' ')) END)) AS s
               FROM btok),
             bad AS (SELECT DISTINCT doc_id FROM sh JOIN bg USING (s)),
             clean AS (SELECT doc_id FROM ded
               WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
             s1 AS (SELECT doc_id,
               (doc_id % 2147483648 + (doc_id // 2147483648) * 48271)
                 % 2147483646 + 1 AS x FROM clean),
             s2 AS (SELECT doc_id, ((x * 48271 % 2147483647)
               * 48271 % 2147483647) * 48271 % 2147483647 AS x3 FROM s1),
             s3 AS (SELECT doc_id,
               ((((x3 + 7) % 2147483646 + 1) * 48271 % 2147483647)
                 * 48271 % 2147483647)::DOUBLE / 2147483647.0 AS k FROM s2)
             SELECT stage, n FROM (
               SELECT '1_input' AS stage, count(*)::BIGINT AS n FROM input
               UNION ALL
               SELECT '2_min_words', count(*)::BIGINT FROM minw
               UNION ALL
               SELECT '3_exact_dedup', count(*)::BIGINT FROM ded
               UNION ALL
               SELECT '4_decontaminated', count(*)::BIGINT FROM clean
               UNION ALL
               SELECT '5_train', count(*)::BIGINT FROM s3 WHERE k >= 0.25
               UNION ALL
               SELECT '6_val', count(*)::BIGINT FROM s3
                 WHERE k >= 0.1 AND k < 0.25
               UNION ALL
               SELECT '7_test', count(*)::BIGINT FROM s3 WHERE k < 0.1)
             ORDER BY stage""")),

    // the funnel with the ExactSubstr stage on: exact dedup, then
    // cross-doc repeated-span rewrite + min-words recheck, then
    // decontamination — every stage count replayed (the q_substr_dedup
    // rewrite SQL spliced between the dedup and decontamination CTEs)
    QueryDef("q_curation_funnel_substr",
      (s, d) => {
        val docs = documents(s, d)
        val bench = docs.filter(col("doc_id") % 97 === 0)
        graft.pipeline.Curate.funnel(docs, "doc_id", "text", bench,
            minWords = 30, valFraction = 0.15, testFraction = 0.1,
            seed = 7, substrMinLen = 60)
          .orderBy("stage")
      },
      Some("""WITH input AS (SELECT doc_id, text FROM documents
               WHERE doc_id IS NOT NULL AND text IS NOT NULL),
             minw AS (SELECT doc_id, text FROM input
               WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 30),
             ded AS (SELECT min(doc_id) AS doc_id, text FROM minw
               GROUP BY text),
             sw AS (SELECT doc_id AS id,
               unnest(range(1, length(text) - 58)) AS pos, text
               FROM ded WHERE length(text) >= 60),
             ss AS (SELECT id, pos, substr(text, pos::INT, 60) AS sub
               FROM sw),
             sd AS (SELECT sub FROM ss GROUP BY sub HAVING count(*) >= 2),
             sm AS (SELECT ss.id, ss.pos, row_number() OVER (
                 PARTITION BY ss.sub ORDER BY ss.id, ss.pos) AS rn
               FROM ss JOIN sd USING (sub)),
             srem AS (SELECT id, pos FROM sm WHERE rn > 1),
             sb AS (SELECT id, pos, CASE WHEN pos > coalesce(
                 max(pos + 60) OVER (PARTITION BY id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               THEN 1 ELSE 0 END AS brk FROM srem),
             sg AS (SELECT id, pos, sum(brk) OVER (PARTITION BY id
               ORDER BY pos) AS grp FROM sb),
             sp AS (SELECT id, min(pos) AS s0, max(pos) + 59 AS e0
               FROM sg GROUP BY id, grp),
             bef AS (SELECT id, coalesce(lag(e0) OVER (PARTITION BY id
                 ORDER BY s0), 0) + 1 AS ks, s0 - 1 AS ke FROM sp),
             aft AS (SELECT sp.id, max(e0) + 1 AS ks,
                 length(dd.text)::BIGINT AS ke
               FROM sp JOIN ded dd ON dd.doc_id = sp.id
               GROUP BY sp.id, length(dd.text)),
             segs AS (SELECT * FROM bef WHERE ks <= ke
               UNION ALL SELECT * FROM aft WHERE ks <= ke),
             pieces AS (SELECT segs.id, ks,
                 substr(dd.text, ks::INT, (ke - ks + 1)::INT) AS piece
               FROM segs JOIN ded dd ON dd.doc_id = segs.id),
             rew AS (SELECT id, string_agg(piece, '' ORDER BY ks) AS t
               FROM pieces GROUP BY id),
             sids AS (SELECT DISTINCT id FROM sp),
             red AS (SELECT dd.doc_id, CASE WHEN sids.id IS NOT NULL
                 THEN coalesce(rew.t, '') ELSE dd.text END AS text
               FROM ded dd
               LEFT JOIN sids ON sids.id = dd.doc_id
               LEFT JOIN rew ON rew.id = dd.doc_id),
             resub AS (SELECT doc_id, text FROM red
               WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 30),
             tok AS (SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS t FROM resub),
             sh AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(t) < 4 THEN [array_to_string(t, ' ')]
               ELSE list_transform(generate_series(1, len(t) - 3),
                 i -> array_to_string(t[i:i+3], ' ')) END)) AS s
               FROM tok),
             btok AS (SELECT regexp_split_to_array(trim(text), '\s+') AS t
               FROM documents WHERE doc_id % 97 = 0 AND text IS NOT NULL),
             bg AS (SELECT DISTINCT unnest(list_distinct(
               CASE WHEN len(t) < 4 THEN [array_to_string(t, ' ')]
               ELSE list_transform(generate_series(1, len(t) - 3),
                 i -> array_to_string(t[i:i+3], ' ')) END)) AS s
               FROM btok),
             bad AS (SELECT DISTINCT doc_id FROM sh JOIN bg USING (s)),
             clean AS (SELECT doc_id FROM resub
               WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
             s1 AS (SELECT doc_id,
               (doc_id % 2147483648 + (doc_id // 2147483648) * 48271)
                 % 2147483646 + 1 AS x FROM clean),
             s2 AS (SELECT doc_id, ((x * 48271 % 2147483647)
               * 48271 % 2147483647) * 48271 % 2147483647 AS x3 FROM s1),
             s3 AS (SELECT doc_id,
               ((((x3 + 7) % 2147483646 + 1) * 48271 % 2147483647)
                 * 48271 % 2147483647)::DOUBLE / 2147483647.0 AS k FROM s2)
             SELECT stage, n FROM (
               SELECT '1_input' AS stage, count(*)::BIGINT AS n FROM input
               UNION ALL
               SELECT '2_min_words', count(*)::BIGINT FROM minw
               UNION ALL
               SELECT '3_exact_dedup', count(*)::BIGINT FROM ded
               UNION ALL
               SELECT '3b_substr_rewrite', count(*)::BIGINT FROM resub
               UNION ALL
               SELECT '4_decontaminated', count(*)::BIGINT FROM clean
               UNION ALL
               SELECT '5_train', count(*)::BIGINT FROM s3 WHERE k >= 0.25
               UNION ALL
               SELECT '6_val', count(*)::BIGINT FROM s3
                 WHERE k >= 0.1 AND k < 0.25
               UNION ALL
               SELECT '7_test', count(*)::BIGINT FROM s3 WHERE k < 0.1)
             ORDER BY stage""")),

    // deterministic in-group negative sampling (contrastive pairs): rank
    // arithmetic + md5 offset draw replayed verbatim; offsets in
    // [1, n-1] make self-pairs impossible by construction
    QueryDef("q_negative_pairs",
      (s, d) => graft.pipeline.Sampling.negativePairs(
          documents(s, d), "doc_id", Seq("source"), k = 2, seed = 11L)
        .select(col("source"), col("id"), col("j").cast("long").as("j"),
          col("neg_id"))
        .orderBy("source", "id", "j"),
      Some("""WITH dd AS (SELECT source, doc_id FROM documents
               WHERE doc_id IS NOT NULL AND source IS NOT NULL),
             r AS (SELECT source, doc_id,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1
                 AS r,
               count(*) OVER (PARTITION BY source) AS n FROM dd),
             e AS (SELECT source, doc_id, r, n, unnest(range(1, 3)) AS j
               FROM r WHERE n >= 2),
             p AS (SELECT source, doc_id, j,
               (r + 1 + (('0x' || substr(md5('11:' || doc_id || ':' || j),
                 1, 15))::UBIGINT % (n - 1))::BIGINT) % n AS pr
               FROM e)
             SELECT p.source, p.doc_id AS id, p.j::BIGINT AS j,
               r2.doc_id AS neg_id
             FROM p JOIN r r2 ON r2.source = p.source AND r2.r = p.pr
             ORDER BY 1, 2, 3""")),

    // ---- weighted Bernoulli sampling (quality-weighted downsampling) ------
    // oracle replays the Lehmer hash verbatim (see q_hash_sample) with the
    // keep-probability min(1, rate·weight) clamp
    QueryDef("q_weighted_sample",
      (s, d) => graft.pipeline.Sampling.weightedSample(
          documents(s, d), "doc_id", "n_chars", rate = 0.002, seed = 11)
        .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum")),
      Some("""WITH s1 AS (SELECT doc_id, n_chars,
               (doc_id % 2147483648 + (doc_id // 2147483648) * 48271)
                 % 2147483646 + 1 AS x FROM documents),
             s2 AS (SELECT doc_id, n_chars, ((x * 48271 % 2147483647)
               * 48271 % 2147483647) * 48271 % 2147483647 AS x3 FROM s1),
             s3 AS (SELECT doc_id, n_chars,
               ((((x3 + 11) % 2147483646 + 1) * 48271 % 2147483647)
                 * 48271 % 2147483647)::DOUBLE / 2147483647.0 AS k FROM s2)
             SELECT count(*)::BIGINT AS n, sum(doc_id)::BIGINT AS id_sum
             FROM s3 WHERE k < least(1.0, n_chars * 0.002)""")),

    // ---- fixed-size weighted sample without replacement (A-ES) ------------
    // Efraimidis–Spirakis priorities u^(1/w) on the same deterministic
    // hash; the oracle reproduces the full priority ordering in SQL
    QueryDef("q_weighted_topk",
      (s, d) => graft.pipeline.Sampling.weightedTopK(
          documents(s, d), "doc_id", "n_chars", k = 50, seed = 5)
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id"),
      Some("""WITH s1 AS (SELECT doc_id, n_chars,
               (doc_id % 2147483648 + (doc_id // 2147483648) * 48271)
                 % 2147483646 + 1 AS x
               FROM documents WHERE n_chars > 0),
             s2 AS (SELECT doc_id, n_chars, ((x * 48271 % 2147483647)
               * 48271 % 2147483647) * 48271 % 2147483647 AS x3 FROM s1),
             s3 AS (SELECT doc_id, n_chars,
               ((((x3 + 5) % 2147483646 + 1) * 48271 % 2147483647)
                 * 48271 % 2147483647)::DOUBLE / 2147483647.0 AS k FROM s2),
             top AS (SELECT doc_id, n_chars
               FROM s3 ORDER BY pow(k, 1.0 / n_chars) DESC, doc_id LIMIT 50)
             SELECT doc_id, n_chars FROM top ORDER BY doc_id""")),

    // ---- balanced per-stratum weighted sample -----------------------------
    // k quality-weighted docs from EVERY source: Efraimidis–Spirakis
    // priorities ranked by a strata-keyed row_number window (one shuffle on
    // the stratum key, no global sort); arithmetic replayed in the oracle
    QueryDef("q_stratified_topk",
      (s, d) => graft.pipeline.Sampling.stratifiedTopK(
          documents(s, d), "doc_id", "n_chars", Seq("lang"), k = 5, seed = 5)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id"),
      Some("""WITH s1 AS (SELECT doc_id, lang, n_chars,
               (doc_id % 2147483648 + (doc_id // 2147483648) * 48271)
                 % 2147483646 + 1 AS x
               FROM documents WHERE n_chars > 0),
             s2 AS (SELECT doc_id, lang, n_chars, ((x * 48271 % 2147483647)
               * 48271 % 2147483647) * 48271 % 2147483647 AS x3 FROM s1),
             s3 AS (SELECT doc_id, lang, n_chars,
               ((((x3 + 5) % 2147483646 + 1) * 48271 % 2147483647)
                 * 48271 % 2147483647)::DOUBLE / 2147483647.0 AS k FROM s2),
             r AS (SELECT doc_id, lang, n_chars, row_number() OVER (
                 PARTITION BY lang
                 ORDER BY pow(k, 1.0 / n_chars) DESC, doc_id) AS rn FROM s3)
             SELECT doc_id, lang, n_chars FROM r WHERE rn <= 5
             ORDER BY doc_id""")),

    // ---- corpus composition report (mix rebalancing input) ----------------
    QueryDef("q_corpus_mix",
      (s, d) => graft.pipeline.TextAnalysis.corpusMix(
          documents(s, d), "source", "n_chars")
        .select(col("source"), col("n_docs"), col("weight_sum"),
          round(col("doc_share"), 6).as("doc_share"),
          round(col("weight_share"), 6).as("weight_share"))
        .orderBy("source"),
      Some("""SELECT source, count(*)::BIGINT AS n_docs,
             sum(n_chars)::DOUBLE AS weight_sum,
             round(count(*)::DOUBLE / (SELECT count(*) FROM documents), 6)
               AS doc_share,
             round(sum(n_chars)::DOUBLE /
               (SELECT sum(n_chars) FROM documents), 6) AS weight_share
             FROM documents GROUP BY source ORDER BY source""")),

    // ---- chunk-level exact dedup (sequence-level, Lee et al. 2021) --------
    // every distinct 8-word chunk survives only at its first corpus-wide
    // occurrence; documents are reassembled from their surviving chunks
    QueryDef("q_chunk_dedup",
      (s, d) => graft.pipeline.Dedup.chunkDedup(
          documents(s, d), "doc_id", "text", chunkWords = 8)
        .orderBy("doc_id"),
      Some("""WITH toks AS (SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS ws
               FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
             idx AS (SELECT doc_id, ws, (len(ws) + 7) // 8 AS nc,
               unnest(generate_series(0, (len(ws)+7)//8 - 1)) AS chunk_idx
               FROM toks),
             chunks AS (SELECT doc_id, chunk_idx, nc,
               array_to_string(ws[(chunk_idx*8+1):(chunk_idx*8+8)], ' ')
                 AS chunk
               FROM idx),
             ranked AS (SELECT *, row_number() OVER
               (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn
               FROM chunks)
             SELECT doc_id,
               string_agg(chunk, ' ' ORDER BY chunk_idx) AS text_dedup,
               count(*)::BIGINT AS chunks_kept,
               min(nc)::BIGINT AS chunks_total
             FROM ranked WHERE rn = 1
             GROUP BY doc_id ORDER BY doc_id""")),

    // ---- exact-substring dedup (Lee et al. ExactSubstr, stride 1) ---------
    // every token covered by an 8-token window occurring >1 time in the
    // corpus is removed (symmetric across occurrences); kept text is
    // canonically single-space-joined on BOTH sides. A doc vanishes into
    // empty text only if every position is covered
    QueryDef("q_substring_dedup",
      (s, d) => graft.pipeline.Dedup.substringDedup(
          documents(s, d), "doc_id", "text", minTokens = 8)
        .orderBy("doc_id"),
      Some("""WITH tok AS (SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS t FROM documents
               WHERE doc_id IS NOT NULL AND text IS NOT NULL),
             tokp AS (SELECT doc_id, t, unnest(generate_series(1, len(t)))
               AS i FROM tok),
             g AS (SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS gram
               FROM tokp WHERE i + 7 <= len(t)),
             dup AS (SELECT gram FROM g GROUP BY 1 HAVING count(*) > 1),
             ds AS (SELECT g.doc_id, g.i FROM g
               JOIN dup ON g.gram = dup.gram),
             keptp AS (SELECT p.doc_id, p.i, p.t[p.i] AS tk,
               EXISTS (SELECT 1 FROM ds WHERE ds.doc_id = p.doc_id
                 AND ds.i BETWEEN p.i - 7 AND p.i) AS cov
               FROM tokp p)
             SELECT doc_id,
               coalesce(string_agg(tk, ' ' ORDER BY i)
                 FILTER (WHERE NOT cov), '') AS text,
               count(*) FILTER (WHERE cov)::BIGINT AS n_removed
             FROM keptp GROUP BY doc_id ORDER BY doc_id""")),

    // ---- line-level dedup (C4/RefinedWeb boilerplate-line removal) --------
    // the corpus has no newlines, so the query synthesizes them like
    // q_repetition (' a ' -> chr(10)) on BOTH sides; every distinct line
    // survives only at its first corpus-wide (id, position) occurrence
    QueryDef("q_line_dedup",
      (s, d) => {
        val prepared = documents(s, d)
          .withColumn("text", expr("replace(text, ' a ', chr(10))"))
        graft.pipeline.Dedup.lineDedup(prepared, "doc_id", "text")
          .select(col("doc_id"), sha2(col("text_dedup"), 256).as("text_sha"),
            col("lines_kept"), col("lines_total"))
          .orderBy("doc_id")
      },
      Some("""WITH d2 AS (SELECT doc_id, replace(text, ' a ', chr(10)) AS text
               FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
             l AS (SELECT doc_id, line_idx, line FROM (
                 SELECT doc_id, unnest(ls) AS line,
                   unnest(generate_series(0, len(ls) - 1)) AS line_idx
                 FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
                   FROM d2))
               WHERE trim(line) != ''),
             cnt AS (SELECT doc_id, count(*)::BIGINT AS lines_total
               FROM l GROUP BY doc_id),
             ranked AS (SELECT *, row_number() OVER
               (PARTITION BY line ORDER BY doc_id, line_idx) AS rn FROM l)
             SELECT r.doc_id,
               sha256(string_agg(line, chr(10) ORDER BY line_idx)) AS text_sha,
               count(*)::BIGINT AS lines_kept, min(cnt.lines_total) AS lines_total
             FROM ranked r JOIN cnt ON cnt.doc_id = r.doc_id
             WHERE rn = 1 GROUP BY r.doc_id ORDER BY r.doc_id""")),

    // ---- INTRA-doc repeated-line removal (zero-shuffle cleaning step) -----
    // same synthetic-newline preparation as q_line_dedup; first occurrence
    // per line WITHIN each doc only — pure per-row HOFs, no shuffle
    QueryDef("q_line_dedup_doc",
      (s, d) => {
        val prepared = documents(s, d)
          .withColumn("text", expr("replace(text, ' a ', chr(10))"))
        graft.pipeline.Dedup.lineDedupInDoc(prepared, "doc_id", "text")
          .select(col("doc_id"), sha2(col("text_dedup"), 256).as("text_sha"),
            col("lines_kept"), col("lines_total"))
          .orderBy("doc_id")
      },
      Some("""WITH d2 AS (SELECT doc_id, replace(text, ' a ', chr(10)) AS text
               FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
             l AS (SELECT doc_id, line_idx, line FROM (
                 SELECT doc_id, unnest(ls) AS line,
                   unnest(generate_series(0, len(ls) - 1)) AS line_idx
                 FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
                   FROM d2))
               WHERE trim(line) != ''),
             cnt AS (SELECT doc_id, count(*)::BIGINT AS lines_total
               FROM l GROUP BY doc_id),
             firsts AS (SELECT doc_id, line, min(line_idx) AS line_idx
               FROM l GROUP BY 1, 2)
             SELECT f.doc_id,
               sha256(string_agg(line, chr(10) ORDER BY line_idx)) AS text_sha,
               count(*)::BIGINT AS lines_kept,
               min(cnt.lines_total) AS lines_total
             FROM firsts f JOIN cnt ON cnt.doc_id = f.doc_id
             GROUP BY f.doc_id ORDER BY f.doc_id""")),

    // ---- document fingerprinting ------------------------------------------
    // the hash VALUES are engine-specific, but the fingerprint function's
    // contract is not: deterministic (one fp per distinct text) and
    // collision-free on this corpus (#fp == #texts) — emitted as exact
    // counts + a functional-dependence flag the oracle asserts true
    QueryDef("q_fingerprint",
      (s, d) => {
        import graft.pipeline.TextAnalysis._
        documents(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"), col("text"), fingerprint(col("text")).as("fp"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("text")).as("n_distinct_text"),
            countDistinct(col("fp")).as("__n_fp"),
            countDistinct(col("text"), col("fp")).as("__n_pairs"))
          .select(col("n_docs"), col("n_distinct_text"),
            (col("__n_fp") === col("n_distinct_text") &&
              col("__n_pairs") === col("n_distinct_text"))
              .as("fp_bijective_ok"))
      },
      Some("""SELECT count(*)::BIGINT AS n_docs,
             count(DISTINCT text)::BIGINT AS n_distinct_text,
             true AS fp_bijective_ok
             FROM documents WHERE text IS NOT NULL""")),
  )
}
