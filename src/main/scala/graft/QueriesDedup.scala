package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.agg.Stats
import graft.clean.Clean
import graft.core.HandyFrame
import graft.ml.{HandyFencer, HandyImputer}
import graft.plotdata.PlotData
import graft.strata.{Bucket, ColStratum, Quantile, StratifiedFrame}

/** Gate tier 2/9 — dedup tier: incremental screens, persisted indexes, exact/normalized/near dedup, BPE, n-gram Jaccard/containment, connected components, MinHash/SimHash/embedding pairs.
  *
  * Split from the 11k-line Queries.scala (r11 VERDICT #8): pure
  * relocation, zero semantic movement — [[Queries.defs]] concatenates
  * the nine tiers in the original order and the duplicate-name guard
  * still covers the whole set. All determinism rules live in the
  * [[Queries]] scaladoc; table readers and shared contracts in
  * [[QueryHelpers]]. 35 queries. */
private[graft] object QueriesDedup {
  import QueryHelpers._

  val defs: Seq[QueryDef] = Seq(

    // ---- incremental NEAR-dup screen (semantic companion of the bloom) ----
    // cross-side LSH candidates are exact-verified, so the match set is a
    // subset of the exact batch×corpus pair set, whose size DuckDB
    // reproduces — same contract pattern as q_embedding_dedup_lsh
    QueryDef("q_near_new",
      (s, d) => {
        val e = embeddings(s, d)
        val batchE = e.filter(col("vec_id") % 5 === 0)
        val corpusE = e.filter(col("vec_id") % 5 =!= 0)
        val hits = graft.pipeline.Dedup.embeddingDedupAgainst(
          batchE, corpusE, "vec_id", "embedding", dim = 64,
          threshold = 0.4, bits = 4, tables = 4)
        val exact = batchE.select(col("vec_id").as("__b"),
            transform(col("embedding"), _.cast("double")).as("__bv"))
          .crossJoin(corpusE.select(col("vec_id").as("__c"),
            transform(col("embedding"), _.cast("double")).as("__cv")))
          .filter(graft.pipeline.Dedup.cosine(col("__bv"), col("__cv")) >= 0.4)
          .select(col("__b"), col("__c"))
        exact.agg(count(lit(1)).as("n_exact_matches"))
          .crossJoin(hits.join(exact,
              col("batch_id") === col("__b") && col("corpus_id") === col("__c"),
              "left_anti")
            .agg(count(lit(1)).as("__fp")))
          .select(col("n_exact_matches"),
            (col("__fp") === 0).as("no_false_positives"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
               FROM embeddings WHERE vec_id IS NOT NULL),
             p AS (SELECT b.vec_id AS ib, c.vec_id AS ic
               FROM e b JOIN e c
               ON b.vec_id % 5 = 0 AND c.vec_id % 5 <> 0
               WHERE list_cosine_similarity(b.v, c.v) >= 0.4)
             SELECT count(*)::BIGINT AS n_exact_matches,
               true AS no_false_positives FROM p"""),
      gateOnly = true),

    // operator-cost twin of q_near_new: the incremental semantic screen
    // alone (LSH bucket join + cross-side verify), no exact batch×corpus
    // harness — the bench row that should stay sf-linear. Signature width
    // tracks corpus size (lshBitsFor: fixed bits=4 OOMed the sf10 probe —
    // 16 cells over 400k vectors is a quadratic bucket, not an index);
    // at sf0.1 and below this resolves to the same bits=4 as the gate row.
    QueryDef("q_near_new_op",
      (s, d) => {
        val e = embeddings(s, d)
        val corpus = e.filter(col("vec_id") % 5 =!= 0)
        val bits = graft.pipeline.Dedup.lshBitsFor(corpus.count())
        graft.pipeline.Dedup.embeddingDedupAgainst(
            e.filter(col("vec_id") % 5 === 0), corpus,
            "vec_id", "embedding", dim = 64,
            threshold = 0.4, bits = bits, tables = 4)
          .select(col("batch_id"), col("corpus_id"),
            round(col("cos"), 6).as("cos"))
          .orderBy("batch_id", "corpus_id")
      },
      None),

    // ---- PERSISTED embedding index: screen against files ------------------
    // q_near_new's contract (exact match count + FP-freedom) plus
    // matches_direct: the files-based screen must equal the in-memory
    // embeddingDedupAgainst pair-for-pair at the same pinned config,
    // proving the parquet round-trip (vectors, norms, bucket keys)
    // changes nothing
    QueryDef("q_vec_index",
      (s, d) => {
        val e = embeddings(s, d)
        val batchE = e.filter(col("vec_id") % 5 === 0)
        val corpusE = e.filter(col("vec_id") % 5 =!= 0)
        val path = graft.util.Scratch.dir("graft-q-vecindex")
        graft.pipeline.VecIndex.write(corpusE, "vec_id", "embedding",
          dim = 64, path, bits = 4, tables = 4)
        val indexed = graft.pipeline.VecIndex.dedupAgainst(
          batchE, "vec_id", "embedding", path, threshold = 0.4)
        val direct = graft.pipeline.Dedup.embeddingDedupAgainst(
          batchE, corpusE, "vec_id", "embedding", dim = 64,
          threshold = 0.4, bits = 4, tables = 4)
        val mism = indexed.select(col("batch_id"), col("corpus_id"))
          .join(direct.select(col("batch_id").as("__db"),
              col("corpus_id").as("__dc")),
            col("batch_id") === col("__db") &&
              col("corpus_id") === col("__dc"),
            "full_outer")
          .filter(col("batch_id").isNull || col("__db").isNull)
          .agg(count(lit(1)).as("__mism"))
        val exact = batchE.select(col("vec_id").as("__b"),
            transform(col("embedding"), _.cast("double")).as("__bv"))
          .crossJoin(corpusE.select(col("vec_id").as("__c"),
            transform(col("embedding"), _.cast("double")).as("__cv")))
          .filter(graft.pipeline.Dedup.cosine(col("__bv"), col("__cv")) >= 0.4)
          .select(col("__b"), col("__c"))
        exact.agg(count(lit(1)).as("n_exact_matches"))
          .crossJoin(indexed.join(exact,
              col("batch_id") === col("__b") && col("corpus_id") === col("__c"),
              "left_anti")
            .agg(count(lit(1)).as("__fp")))
          .crossJoin(mism)
          .select(col("n_exact_matches"),
            (col("__fp") === 0).as("no_false_positives"),
            (col("__mism") === 0).as("matches_direct"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
               FROM embeddings WHERE vec_id IS NOT NULL),
             p AS (SELECT b.vec_id AS ib, c.vec_id AS ic
               FROM e b JOIN e c
               ON b.vec_id % 5 = 0 AND c.vec_id % 5 <> 0
               WHERE list_cosine_similarity(b.v, c.v) >= 0.4)
             SELECT count(*)::BIGINT AS n_exact_matches,
               true AS no_false_positives, true AS matches_direct FROM p"""),
      gateOnly = true),

    // ---- incremental TEXT near-dup screen (minhash companion) -------------
    // same contract pattern as q_near_new: the screen's matches are
    // exact-verified (candidate-driven jaccard), so they are a subset of
    // the exact cross-side jaccard match set, whose size DuckDB reproduces
    QueryDef("q_text_near_new",
      (s, d) => {
        val docs = documents(s, d)
        val batch = docs.filter(col("doc_id") % 5 === 0)
        val corpus = docs.filter(col("doc_id") % 5 =!= 0)
        val hits = graft.pipeline.Dedup.minhashDedupAgainst(
          batch, corpus, "doc_id", "text", shingleSize = 3,
          threshold = 0.5)
        val isBatchA = col("id_a") % 5 === 0
        val exact = graft.pipeline.Dedup.ngramJaccard(docs, "doc_id", "text", 3)
          .filter(col("jaccard") >= 0.5)
          .filter(isBatchA =!= (col("id_b") % 5 === 0)) // cross-side only
          .select(when(isBatchA, col("id_a")).otherwise(col("id_b")).as("__b"),
            when(isBatchA, col("id_b")).otherwise(col("id_a")).as("__c"))
        exact.agg(count(lit(1)).as("n_exact_matches"))
          .crossJoin(hits.join(exact,
              col("id_a") === col("__b") && col("id_b") === col("__c"),
              "left_anti")
            .agg(count(lit(1)).as("__fp")))
          .select(col("n_exact_matches"),
            (col("__fp") === 0).as("no_false_positives"))
      },
      Some("""WITH tok AS (SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
             sh AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_transform(generate_series(1, len(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS s
               FROM tok),
             sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
             com AS (SELECT a.doc_id AS ib, b.doc_id AS ic, count(*) AS c
               FROM sh a JOIN sh b ON a.s = b.s
                 AND a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
               GROUP BY 1, 2)
             SELECT count(*)::BIGINT AS n_exact_matches,
               true AS no_false_positives
             FROM com JOIN sz sa ON sa.doc_id = ib
               JOIN sz sb ON sb.doc_id = ic
             WHERE c::DOUBLE / (sa.sz + sb.sz - c) >= 0.5"""),
      gateOnly = true),

    // operator-cost twin of q_text_near_new (the row Bench measures)
    QueryDef("q_text_near_new_op",
      (s, d) => {
        val docs = documents(s, d)
        graft.pipeline.Dedup.minhashDedupAgainst(
            docs.filter(col("doc_id") % 5 === 0),
            docs.filter(col("doc_id") % 5 =!= 0),
            "doc_id", "text", shingleSize = 3, threshold = 0.5)
          .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id_a", "id_b")
      },
      None),

    // ---- PERSISTED minhash index: screen against files, not a corpus scan --
    // same exactness contract as q_text_near_new (exact-path match count +
    // FP-freedom), plus matches_direct: the files-based screen must equal
    // the in-memory minhashDedupAgainst pair-for-pair (lazy full-outer
    // mismatch count), proving the parquet round-trip changes nothing
    QueryDef("q_text_index",
      (s, d) => {
        val docs = documents(s, d)
        val batch = docs.filter(col("doc_id") % 5 === 0)
        val corpus = docs.filter(col("doc_id") % 5 =!= 0)
        val path = graft.util.Scratch.dir("graft-q-textindex")
        graft.pipeline.TextIndex.write(corpus, "doc_id", "text", path)
        val indexed = graft.pipeline.TextIndex.dedupAgainst(
          batch, "doc_id", "text", path, threshold = 0.5)
        val direct = graft.pipeline.Dedup.minhashDedupAgainst(
          batch, corpus, "doc_id", "text", threshold = 0.5)
        val mism = indexed.select(col("id_a"), col("id_b"))
          .join(direct.select(col("id_a").as("__da"), col("id_b").as("__db")),
            col("id_a") === col("__da") && col("id_b") === col("__db"),
            "full_outer")
          .filter(col("id_a").isNull || col("__da").isNull)
          .agg(count(lit(1)).as("__mism"))
        val isBatchA = col("id_a") % 5 === 0
        val exact = graft.pipeline.Dedup.ngramJaccard(docs, "doc_id", "text", 3)
          .filter(col("jaccard") >= 0.5)
          .filter(isBatchA =!= (col("id_b") % 5 === 0))
          .select(when(isBatchA, col("id_a")).otherwise(col("id_b")).as("__b"),
            when(isBatchA, col("id_b")).otherwise(col("id_a")).as("__c"))
        exact.agg(count(lit(1)).as("n_exact_matches"))
          .crossJoin(indexed.join(exact,
              col("id_a") === col("__b") && col("id_b") === col("__c"),
              "left_anti")
            .agg(count(lit(1)).as("__fp")))
          .crossJoin(mism)
          .select(col("n_exact_matches"),
            (col("__fp") === 0).as("no_false_positives"),
            (col("__mism") === 0).as("matches_direct"))
      },
      Some("""WITH tok AS (SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
             sh AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_transform(generate_series(1, len(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS s
               FROM tok),
             sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
             com AS (SELECT a.doc_id AS ib, b.doc_id AS ic, count(*) AS c
               FROM sh a JOIN sh b ON a.s = b.s
                 AND a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
               GROUP BY 1, 2)
             SELECT count(*)::BIGINT AS n_exact_matches,
               true AS no_false_positives, true AS matches_direct
             FROM com JOIN sz sa ON sa.doc_id = ib
               JOIN sz sb ON sb.doc_id = ic
             WHERE c::DOUBLE / (sa.sz + sb.sz - c) >= 0.5"""),
      gateOnly = true),

    // ---- incremental dedup: Bloom-screen a new batch against a corpus -----
    // the bloom bits are engine-specific, but the CONTRACT is not: no
    // false survivals (guaranteed), wrongly-dropped new rows within the
    // 4-sigma fpp envelope — oracle emits the exact counts + true flags
    QueryDef("q_bloom_dedup",
      (s, d) => {
        val docs = documents(s, d).filter(col("text").isNotNull)
        val corpus = docs.filter(col("doc_id") % 5 =!= 0)
        val batch = docs.filter(col("doc_id") % 5 === 0)
        def keyed(f: DataFrame) = f.withColumn("__k", xxhash64(col("text")))
        val bloomNew = graft.pipeline.Dedup.bloomNewRows(
          keyed(batch), keyed(corpus), "__k",
          expectedItems = 1000000L, fpp = 0.01)
        val exactNew = batch.join(
          corpus.select(col("text").as("__ct")).distinct(),
          col("text") === col("__ct"), "left_anti")
        val fpBound = lit(0.01) * col("n_new_exact").cast("double") +
          lit(4.0) * sqrt(lit(0.01) * col("n_new_exact").cast("double")) +
          lit(1.0)
        batch.agg(count(lit(1)).as("n_batch"))
          .crossJoin(exactNew.agg(count(lit(1)).as("n_new_exact")))
          .crossJoin(bloomNew.agg(count(lit(1)).as("__n_bloom")))
          .crossJoin(bloomNew.select("doc_id")
            .join(exactNew.select(col("doc_id").as("__e")),
              col("doc_id") === col("__e"), "left_anti")
            .agg(count(lit(1)).as("__bad")))
          .select(col("n_batch"), col("n_new_exact"),
            (col("__bad") === 0).as("no_false_survivals"),
            ((col("n_new_exact") - col("__n_bloom")).cast("double") <= fpBound)
              .as("fp_dropped_ok"))
      },
      Some("""WITH c AS (SELECT DISTINCT text FROM documents
               WHERE doc_id % 5 <> 0 AND text IS NOT NULL),
             b AS (SELECT doc_id, text FROM documents
               WHERE doc_id % 5 = 0 AND text IS NOT NULL)
             SELECT (SELECT count(*) FROM b)::BIGINT AS n_batch,
               (SELECT count(*) FROM b
                 WHERE text NOT IN (SELECT text FROM c))::BIGINT AS n_new_exact,
               true AS no_false_survivals, true AS fp_dropped_ok""")),

    // ---- mixture plan: target composition -> per-source sampling rates ----
    QueryDef("q_mix_plan",
      (s, d) => graft.pipeline.TextAnalysis.mixPlan(
          documents(s, d), "source", "n_chars",
          targetShares = Map("src0" -> 0.4, "src1" -> 0.4,
            "src2" -> 0.2),
          targetTotal = 100000.0)
        .select(col("source"), col("current_mass"),
          round(col("target_mass"), 6).as("target_mass"),
          round(col("rate"), 6).as("rate"), col("achievable"))
        .orderBy("source"),
      Some("""WITH m AS (SELECT source,
               sum(n_chars)::DOUBLE AS current_mass FROM documents
               WHERE source IS NOT NULL AND n_chars IS NOT NULL
               GROUP BY source),
             t AS (SELECT source, current_mass,
               CASE source WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 0.4
                 WHEN 'src2' THEN 0.2 ELSE 0.0 END * 100000.0
                 AS target_mass FROM m)
             SELECT source, current_mass,
               round(target_mass, 6) AS target_mass,
               round(CASE WHEN current_mass > 0
                 THEN least(1.0, target_mass / current_mass) ELSE 0.0 END, 6)
                 AS rate,
               target_mass <= current_mass AS achievable
             FROM t ORDER BY source""")),

    // ---- cross-source n-gram overlap matrix -------------------------------
    // which sources re-host each other's content; oracle rebuilds the
    // per-source distinct gram sets and the pair join in SQL (same
    // shingle CASE as the jaccard oracles). Top-20 by jaccard keeps the
    // result stable and presentation-sized.
    QueryDef("q_source_overlap",
      (s, d) => graft.pipeline.Dedup.groupOverlap(
          documents(s, d), "source", "text", n = 3)
        .select(col("group_a"), col("group_b"), col("n_common"),
          round(col("jaccard"), 6).as("jaccard"),
          round(col("containment"), 6).as("containment"))
        .orderBy(desc("jaccard"), col("group_a"), col("group_b"))
        .limit(20),
      Some("""WITH tok AS (SELECT source,
               regexp_split_to_array(trim(text), '\s+') AS t FROM documents
               WHERE source IS NOT NULL AND text IS NOT NULL),
             sh AS (SELECT DISTINCT source, unnest(list_distinct(
               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_transform(generate_series(1, len(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS s
               FROM tok),
             sz AS (SELECT source, count(*)::BIGINT AS sz FROM sh GROUP BY 1),
             com AS (SELECT a.source AS group_a, b.source AS group_b,
               count(*)::BIGINT AS n_common
               FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
               GROUP BY 1, 2)
             SELECT group_a, group_b, n_common,
               round(n_common::DOUBLE / (sa.sz + sb.sz - n_common), 6)
                 AS jaccard,
               round(n_common::DOUBLE / least(sa.sz, sb.sz), 6)
                 AS containment
             FROM com JOIN sz sa ON sa.source = group_a
               JOIN sz sb ON sb.source = group_b
             ORDER BY jaccard DESC, group_a, group_b LIMIT 20""")),

    // ---- per-group duplication report (dedup-budget prioritization) -------
    QueryDef("q_dedup_report",
      (s, d) => graft.pipeline.Dedup.dedupReport(
          documents(s, d), "text", "source")
        .select(col("source"), col("n_docs"), col("n_distinct"),
          round(col("dup_rate"), 6).as("dup_rate"))
        .orderBy("source"),
      Some("""SELECT source, count(*)::BIGINT AS n_docs,
             count(DISTINCT text)::BIGINT AS n_distinct,
             round((count(*) - count(DISTINCT text))::DOUBLE / count(*), 6)
               AS dup_rate
             FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
             GROUP BY source ORDER BY source""")),

    // ---- exact dedup (duplicates synthesized deterministically) -----------
    QueryDef("q_dedup_exact",
      (s, d) => {
        val docs = documents(s, d)
        val withDups = docs.select(col("doc_id"), col("text"))
          .unionAll(docs.filter(col("doc_id") % 10 === 0)
            .select(col("doc_id") + 1000000, col("text")))
        graft.pipeline.Dedup.exact(withDups, "doc_id", "text")
          .select(col("doc_id"), col("dup_count")).orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, text FROM documents
               UNION ALL SELECT doc_id + 1000000, text FROM documents
               WHERE doc_id % 10 = 0)
             SELECT min(doc_id) AS doc_id, count(*) AS dup_count
             FROM t GROUP BY text ORDER BY doc_id""")),

    // ---- exact-dedup victim listing (window path) -------------------------
    QueryDef("q_dedup_dups",
      (s, d) => {
        val docs = documents(s, d)
        val withDups = docs.select(col("doc_id"), col("text"))
          .unionAll(docs.filter(col("doc_id") % 10 === 0)
            .select(col("doc_id") + 1000000, col("text")))
        graft.pipeline.Dedup.exactDuplicates(withDups, "doc_id", "text")
          .select("doc_id").orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, text FROM documents
               UNION ALL SELECT doc_id + 1000000, text FROM documents
               WHERE doc_id % 10 = 0),
             r AS (SELECT doc_id, row_number() OVER (PARTITION BY text
               ORDER BY doc_id) AS rn FROM t)
             SELECT doc_id FROM r WHERE rn > 1 ORDER BY doc_id""")),

    // ---- normalized ("fuzzy-exact") dedup ---------------------------------
    // re-render churn: uppercased + punctuation-appended copies must fold
    // onto their originals through the canonical key; min-id survivor and
    // dup_count come out of the same one-shuffle aggregate
    QueryDef("q_norm_dedup",
      (s, d) => {
        val docs = documents(s, d)
        val mutated = docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            concat(upper(col("text")), lit("  !!")).as("text"))
        val withDups = docs.select(col("doc_id"), col("text"))
          .unionAll(mutated)
        graft.pipeline.Dedup.normalizedDedup(withDups, "doc_id", "text")
          .select(col("doc_id"), col("dup_count")).orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, text FROM documents
               UNION ALL SELECT doc_id + 1000000, upper(text) || '  !!'
               FROM documents WHERE doc_id % 7 = 0),
             n AS (SELECT doc_id, trim(regexp_replace(regexp_replace(
               lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))
               AS norm FROM t)
             SELECT min(doc_id) AS doc_id, count(*) AS dup_count
             FROM n GROUP BY norm ORDER BY doc_id""")),

    // ---- near-dup pair triage panel (why are these two docs similar?) -----
    // shingle overlap, bag-of-words cosine, and literal/normalized
    // equality for one (id, id) pair — two pushed-down point lookups,
    // never a corpus scan; every signal replayed by the oracle
    QueryDef("q_explain_pair",
      (s, d) => graft.pipeline.Dedup.explainPair(documents(s, d),
          "doc_id", "text", idA = 0L, idB = 1L, n = 3, dim = 256)
        .select(col("id_a"), col("id_b"), col("grams_a"), col("grams_b"),
          col("shared_grams"), round(col("jaccard"), 6).as("jaccard"),
          round(col("cos"), 6).as("cos"), col("exact_equal"),
          col("norm_equal")),
      Some("""WITH two AS (SELECT doc_id, text FROM documents
               WHERE doc_id IN (0, 1) AND text IS NOT NULL),
             tok AS (SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS t FROM two),
             sh AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_transform(generate_series(1, len(t) - 2),
                 i -> array_to_string(t[i:i+2], ' ')) END)) AS s FROM tok),
             g AS (SELECT doc_id, count(*)::BIGINT AS g FROM sh GROUP BY 1),
             shared AS (SELECT count(*)::BIGINT AS sg FROM sh a
               JOIN sh b ON a.s = b.s AND a.doc_id = 0 AND b.doc_id = 1),
             tok2 AS (SELECT doc_id, token FROM (SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS token
                 FROM two) WHERE token <> ''),
             e AS (SELECT doc_id,
                 (('0x' || substr(md5(token), 1, 15))::UBIGINT % 256)::INT
                   AS pos,
                 CASE WHEN ('0x' || substr(md5(token), 16, 1))::UBIGINT % 2
                   = 0 THEN 1.0 ELSE -1.0 END AS sgn FROM tok2),
             sums AS (SELECT doc_id, pos, sum(sgn) AS v FROM e GROUP BY 1, 2),
             nm AS (SELECT doc_id, sqrt(sum(v * v)) AS nm FROM sums
               GROUP BY 1),
             dt AS (SELECT coalesce(sum(a.v * b.v), 0) AS dot FROM sums a
               JOIN sums b ON a.pos = b.pos
               AND a.doc_id = 0 AND b.doc_id = 1),
             nrm AS (SELECT doc_id, trim(regexp_replace(regexp_replace(
               lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))
               AS norm FROM two)
             SELECT 0::BIGINT AS id_a, 1::BIGINT AS id_b,
               ga.g AS grams_a, gb.g AS grams_b, shared.sg AS shared_grams,
               round(shared.sg::DOUBLE
                 / (ga.g + gb.g - shared.sg), 6) AS jaccard,
               round(dt.dot / (na.nm * nb.nm), 6) AS cos,
               (SELECT text FROM two WHERE doc_id = 0)
                 = (SELECT text FROM two WHERE doc_id = 1) AS exact_equal,
               (SELECT norm FROM nrm WHERE doc_id = 0)
                 = (SELECT norm FROM nrm WHERE doc_id = 1) AS norm_equal
             FROM shared, dt, g ga, g gb, nm na, nm nb
             WHERE ga.doc_id = 0 AND gb.doc_id = 1
               AND na.doc_id = 0 AND nb.doc_id = 1""")),

    // ---- quality survivor: keep the BEST copy, not the first ---------------
    // exact dups injected with ids shifted by 1e6; score (doc_id*37)%1001
    // makes some copies beat their originals and (37*1e6 ≡ 963 mod 1001)
    // never ties, while %-7 originals vs their own text exercise the
    // one-group-per-text path; survivor = max score, ties broken min-id
    QueryDef("q_keep_best",
      (s, d) => {
        val docs = documents(s, d)
        val withDups = docs.select(col("doc_id"), col("text"))
          .unionAll(docs.filter(col("doc_id") % 7 === 0)
            .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
          .withColumn("score", (col("doc_id") * 37 % 1001).cast("double"))
        graft.pipeline.Dedup.exactKeepBest(withDups, "doc_id", "text",
            "score")
          .select(col("doc_id"), col("score"), col("dup_count"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, text FROM documents
               UNION ALL SELECT doc_id + 1000000, text FROM documents
               WHERE doc_id % 7 = 0),
             sc AS (SELECT doc_id, text,
               ((doc_id * 37) % 1001)::DOUBLE AS score FROM t),
             r AS (SELECT doc_id, score,
               row_number() OVER (PARTITION BY text
                 ORDER BY score DESC, doc_id) AS rn,
               count(*) OVER (PARTITION BY text) AS dup_count FROM sc)
             SELECT doc_id, score, dup_count FROM r WHERE rn = 1
             ORDER BY doc_id""")),

    // transitive near-dedup, quality survivor: same component closure as
    // q_dedup_cc, but each component keeps its max-score member (ties →
    // min id) instead of the min-id one; untouched docs are singleton
    // components and pass through with dup_count 1
    QueryDef("q_keep_best_cc",
      (s, d) => {
        val docs = documents(s, d)
          .select(col("doc_id"), col("text"))
          .withColumn("score", (col("doc_id") * 37 % 1001).cast("double"))
        val pairs = graft.pipeline.Dedup
          .ngramJaccard(docs, "doc_id", "text", 3, maxDf = 20)
          .filter(col("jaccard") >= 0.3)
        graft.pipeline.Dedup.nearDedupKeepBest(docs, "doc_id", pairs,
            "score")
          .select(col("doc_id"), col("score"), col("dup_count"))
          .orderBy("doc_id")
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
             comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
             lab AS (SELECT d.doc_id,
               ((d.doc_id * 37) % 1001)::DOUBLE AS score,
               coalesce(c.component, d.doc_id) AS grp
               FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
             r2 AS (SELECT doc_id, score,
               row_number() OVER (PARTITION BY grp
                 ORDER BY score DESC, doc_id) AS rn,
               count(*) OVER (PARTITION BY grp) AS dup_count FROM lab)
             SELECT doc_id, score, dup_count FROM r2 WHERE rn = 1
             ORDER BY doc_id""")),

    // ---- subword-count proxy (tokenizer load estimation) ------------------
    QueryDef("q_subwords",
      (s, d) => {
        import graft.pipeline.TextAnalysis._
        documents(s, d).select(col("doc_id"),
            subwordCount(col("text")).as("n_subwords"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
               x -> greatest(ceil(length(x) / 4.0), 1)))::BIGINT AS n_subwords
             FROM documents ORDER BY doc_id""")),

    // ---- learned BPE subword vocabulary (Sennrich merges) -----------------
    // rows-only: the merge loop is inherently iterative (not
    // SQL-expressible); SubwordSpec pins the published worked example and
    // the learn/apply invariants, and the merge table is deterministic
    // (frequency ties break lexicographically)
    QueryDef("q_bpe",
      (s, d) => {
        val merges = graft.pipeline.Subword.learnBpe(
          documents(s, d), "text", numMerges = 200)
        val spark = s
        import spark.implicits._
        merges.zipWithIndex
          .map { case ((l, r), i) => (i, l, r) }.toSeq
          .toDF("rank", "lhs", "rhs").orderBy("rank")
      },
      None),

    // ---- BPE learn-side contract (hash-green) -----------------------------
    // the merge TABLE is iterative, but three learn-side invariants are
    // checkable: merge #1 is the argmax adjacent symbol pair of the
    // INITIAL char+</w> histogram (one DuckDB aggregate, ties by
    // freq desc / lhs / rhs — the learner's own tie-break); selection-time
    // frequencies are non-increasing (step k's argmax is bounded by step
    // k−1's: surviving pairs only lost count, and a pair created by a
    // merge inherits at most the merged count); every merge operand is a
    // base symbol (corpus char or </w>) or the output of an EARLIER merge
    QueryDef("q_bpe_merges",
      (s, d) => {
        import graft.pipeline.Subword
        val docs = documents(s, d)
        val detailed = Subword.learnBpeDetailed(docs, "text", numMerges = 200)
        val freqs = detailed.map(_._3)
        val nonIncreasing = freqs.zip(freqs.drop(1)).forall { case (a, b) => a >= b }
        // base symbols: every distinct char of the corpus' words + </w>
        val spark = s
        import spark.implicits._
        val chars = Subword.wordHistogram(docs, "text")
          .select(explode(split(col("word"), "")).as("c"))
          .filter(col("c") =!= "").distinct().as[String].collect().toSet
        var vocab = chars + Subword.EndOfWord
        var inVocab = true
        detailed.foreach { case (l, r, _) =>
          if (!vocab.contains(l) || !vocab.contains(r)) inVocab = false
          vocab += (l + r)
        }
        val (l0, r0, f0) = detailed.head
        Seq((l0, r0, f0, nonIncreasing, inVocab))
          .toDF("first_lhs", "first_rhs", "first_freq",
            "freq_non_increasing", "pairs_in_vocab")
      },
      Some("""WITH w AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
               FROM documents WHERE text IS NOT NULL),
             wc AS (SELECT word, count(*) AS n FROM w WHERE word <> '' GROUP BY 1),
             sy AS (SELECT n, list_append(regexp_split_to_array(word, ''), '</w>') AS s
               FROM wc),
             pr AS (SELECT s[i] AS lhs, s[i+1] AS rhs, sum(n) AS freq
               FROM sy, unnest(generate_series(1, len(s) - 1)) AS t(i)
               GROUP BY 1, 2)
             SELECT lhs AS first_lhs, rhs AS first_rhs, freq::BIGINT AS first_freq,
               true AS freq_non_increasing, true AS pairs_in_vocab
             FROM pr ORDER BY freq DESC, lhs, rhs LIMIT 1""")),

    // ---- BPE apply: distributed tokenization under the learned merges -----
    // the merge TABLE is iterative (rows-only, q_bpe; SubwordSpec pins the
    // published worked corpus), but the APPLY step admits deterministic
    // per-doc invariants DuckDB can verify: concatenating a document's
    // subword tokens (end-of-word markers removed) reproduces the document
    // minus its whitespace; the token count is bounded by [n_words,
    // n_chars + n_words]; and n_words itself is SQL-reproducible. Exercises
    // the broadcast + per-partition-memo apply path at bench scale.
    QueryDef("q_bpe_tokens",
      (s, d) => {
        val docs = documents(s, d)
        val merges = graft.pipeline.Subword.learnBpe(docs, "text",
          numMerges = 200)
        val applied = graft.pipeline.Subword.applyBpe(
          docs, "doc_id", "text", merges)
        // unfiltered trim-split (q_text_stats parity with DuckDB len());
        // the flag bounds use the nonempty-word count applyBpe tokenizes
        val allToks = split(trim(col("text")), "\\s+")
        val realWords = size(filter(allToks, w => w =!= ""))
        val stripped = regexp_replace(col("text"), "\\s+", "")
        applied.join(docs.select(col("doc_id"), col("text")), "doc_id")
          .select(col("doc_id"), size(allToks).as("n_words"),
            (regexp_replace(array_join(col("tokens"), ""),
              graft.pipeline.Subword.EndOfWord, "") === stripped)
              .as("reassembled_ok"),
            (col("n_tokens") >= realWords &&
              col("n_tokens") <= length(stripped) + realWords)
              .as("token_count_ok"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_words,
             true AS reassembled_ok, true AS token_count_ok
             FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
             ORDER BY doc_id""")),

    // ---- exact n-gram Jaccard near-dup pairs ------------------------------
    QueryDef("q_ngram_jaccard",
      (s, d) => {
        val docs = documents(s, d)
        graft.pipeline.Dedup.ngramJaccard(docs, "doc_id", "text", 3)
          .filter(col("jaccard") >= 0.3)
          .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH tok AS (SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
             sh AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_transform(generate_series(1, len(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS s
               FROM tok),
             sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
             com AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
             SELECT id_a, id_b,
               round(c::DOUBLE / (sa.sz + sb.sz - c), 6) AS jaccard
             FROM com JOIN sz sa ON sa.doc_id = id_a
               JOIN sz sb ON sb.doc_id = id_b
             WHERE c::DOUBLE / (sa.sz + sb.sz - c) >= 0.3
             ORDER BY id_a, id_b""")),

    // the SCALE path for exact jaccard on boilerplate-heavy corpora:
    // shingles in > maxDf docs are dropped from the WHOLE computation (an
    // f-frequent shingle emits f²/2 pairs), giving jaccard over the
    // INFORMATIVE shingles; a pair disappears only when its entire overlap
    // is stop-listed boilerplate.
    QueryDef("q_ngram_stoplist",
      (s, d) => {
        val docs = documents(s, d)
        graft.pipeline.Dedup.ngramJaccard(docs, "doc_id", "text", 3, maxDf = 20)
          .filter(col("jaccard") >= 0.3)
          .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH tok AS (SELECT doc_id,
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
               GROUP BY 1, 2)
             SELECT id_a, id_b,
               round(c::DOUBLE / (sa.sz + sb.sz - c), 6) AS jaccard
             FROM com JOIN sz sa ON sa.doc_id = id_a
               JOIN sz sb ON sb.doc_id = id_b
             WHERE c::DOUBLE / (sa.sz + sb.sz - c) >= 0.3
             ORDER BY id_a, id_b""")),

    // ---- fractional df cut (the scale-stable form of the stop-list) -------
    // same operator through maxDfFraction: the cut resolves against the
    // shingled-doc count (max(1, floor(frac·nDocs)), the ngramJaccard
    // contract), so THIS oracle stays green at every SF — at sf0.01
    // (500 docs) the 0.04 fraction is the q_ngram_stoplist maxDf=20; at
    // sf0.1 it is 200. The oracle recomputes the same resolution in SQL.
    QueryDef("q_ngram_fraction",
      (s, d) => {
        val docs = documents(s, d)
        graft.pipeline.Dedup.ngramJaccard(docs, "doc_id", "text", 3,
            maxDfFraction = 0.04)
          .filter(col("jaccard") >= 0.3)
          .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH tok AS (SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
             shall AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_transform(generate_series(1, len(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS s
               FROM tok),
             cut AS (SELECT greatest(1, floor(0.04 *
                 count(DISTINCT doc_id))::BIGINT) AS max_df FROM shall),
             dfreq AS (SELECT s, count(*) AS c FROM shall GROUP BY 1),
             sh AS (SELECT doc_id, s FROM shall
               WHERE s NOT IN (SELECT s FROM dfreq, cut WHERE c > max_df)),
             sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
             com AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
             SELECT id_a, id_b,
               round(c::DOUBLE / (sa.sz + sb.sz - c), 6) AS jaccard
             FROM com JOIN sz sa ON sa.doc_id = id_a
               JOIN sz sb ON sb.doc_id = id_b
             WHERE c::DOUBLE / (sa.sz + sb.sz - c) >= 0.3
             ORDER BY id_a, id_b""")),

    // ---- asymmetric n-gram containment (subset/quote detection) -----------
    // containment(A in B) = |shingles(A) ∩ shingles(B)| / |shingles(A)| —
    // the signal jaccard misses: a doc fully quoted inside a longer one has
    // jaccard ≈ |A|/|B| but cont_a = 1. Pure projection on the exact
    // jaccard plan; oracle replays both quotients from the same CTEs.
    QueryDef("q_containment",
      (s, d) => {
        val docs = documents(s, d)
        graft.pipeline.Dedup.ngramContainment(docs, "doc_id", "text", 3)
          .filter(col("cont_a") >= 0.8 || col("cont_b") >= 0.8)
          .select(col("id_a"), col("id_b"), col("common"),
            col("sz_a"), col("sz_b"),
            round(col("cont_a"), 6).as("cont_a"),
            round(col("cont_b"), 6).as("cont_b"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH tok AS (SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
             sh AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_transform(generate_series(1, len(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS s
               FROM tok),
             sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
             com AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
             SELECT id_a, id_b, c::BIGINT AS common,
               sa.sz::BIGINT AS sz_a, sb.sz::BIGINT AS sz_b,
               round(c::DOUBLE / sa.sz, 6) AS cont_a,
               round(c::DOUBLE / sb.sz, 6) AS cont_b
             FROM com JOIN sz sa ON sa.doc_id = id_a
               JOIN sz sb ON sb.doc_id = id_b
             WHERE c::DOUBLE / sa.sz >= 0.8 OR c::DOUBLE / sb.sz >= 0.8
             ORDER BY id_a, id_b""")),

    // ---- prefix-filtered containment (exact-recall candidate path) --------
    // AllPairs/PPJoin prefix principle: a pair at containment >= t must
    // share one of the contained doc's |A|-ceil(t|A|)+1 RAREST shingles.
    // Recall is a theorem, and the oracle is the SAME all-pairs SQL as
    // q_containment — hash-green means the fast path reproduces the
    // brute path pair-for-pair. GATE-ONLY: on THIS corpus the filter is
    // weak (rare-shingle df ~7 -> 180k candidates / 256 pairs, measured
    // slower than all-pairs — see the containmentCandidates scaladoc),
    // so it is an exactness gate with q_containment as the benched twin
    QueryDef("q_containment_prefix",
      (s, d) => {
        val docs = documents(s, d)
        graft.pipeline.Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.8)
          .select(col("id_a"), col("id_b"), col("common"),
            col("sz_a"), col("sz_b"),
            round(col("cont_a"), 6).as("cont_a"),
            round(col("cont_b"), 6).as("cont_b"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH tok AS (SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
             sh AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_transform(generate_series(1, len(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS s
               FROM tok),
             sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
             com AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
             SELECT id_a, id_b, c::BIGINT AS common,
               sa.sz::BIGINT AS sz_a, sb.sz::BIGINT AS sz_b,
               round(c::DOUBLE / sa.sz, 6) AS cont_a,
               round(c::DOUBLE / sb.sz, 6) AS cont_b
             FROM com JOIN sz sa ON sa.doc_id = id_a
               JOIN sz sb ON sb.doc_id = id_b
             WHERE c::DOUBLE / sa.sz >= 0.8 OR c::DOUBLE / sb.sz >= 0.8
             ORDER BY id_a, id_b"""),
      gateOnly = true),

    // ---- containment victims (keep the superset doc) ----------------------
    // doc B beats doc A iff cont(A in B) >= t and (sz_b > sz_a or equal
    // size and id_b < id_a) — a STRICT order, so no removal cycles and one
    // member of every mutual-containment clique survives. kept_in = the
    // beating partner of highest containment (ties -> min partner id); the
    // oracle replays the orientation + row_number choice verbatim.
    QueryDef("q_contained_docs",
      (s, d) => {
        val docs = documents(s, d)
        graft.pipeline.Dedup.containedDocs(docs, "doc_id", "text", 3, 0.9)
          .select(col("id"), col("kept_in"),
            round(col("containment"), 6).as("containment"))
          .orderBy("id")
      },
      Some("""WITH tok AS (SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
             sh AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_transform(generate_series(1, len(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS s
               FROM tok),
             sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
             com AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
             p AS (SELECT id_a, id_b, sa.sz AS sz_a, sb.sz AS sz_b,
               c::DOUBLE / sa.sz AS ca, c::DOUBLE / sb.sz AS cb
               FROM com JOIN sz sa ON sa.doc_id = id_a
                 JOIN sz sb ON sb.doc_id = id_b),
             o AS (
               SELECT id_a AS id, id_b AS kept_in, ca AS containment FROM p
               WHERE ca >= 0.9 AND (sz_b > sz_a OR (sz_b = sz_a AND id_b < id_a))
               UNION ALL
               SELECT id_b, id_a, cb FROM p
               WHERE cb >= 0.9 AND (sz_a > sz_b OR (sz_a = sz_b AND id_a < id_b))),
             r AS (SELECT id, kept_in, containment, row_number() OVER
               (PARTITION BY id ORDER BY containment DESC, kept_in ASC) AS rn
               FROM o)
             SELECT id, kept_in, round(containment, 6) AS containment
             FROM r WHERE rn = 1 ORDER BY id""")),

    // ---- connected components over the near-dup pair graph ----------------
    // alternating large-star/small-star (SoCC'14) resolves PAIRS into
    // transitive clusters: the canonical label is the min doc id reachable
    // through the graph, even across chains with no direct pair. The pair
    // graph is the STOP-LISTED exact jaccard (maxDf=20) — the scale path
    // (1.3x for 10x data vs 15x for un-stop-listed all-pairs on the
    // dup-heavy sf1 corpus). Oracle: DuckDB recursive CTE computing the
    // min-label closure of the identical stop-listed >= 0.3 graph.
    QueryDef("q_dedup_cc",
      (s, d) => {
        val docs = documents(s, d)
        val pairs = graft.pipeline.Dedup
          .ngramJaccard(docs, "doc_id", "text", 3, maxDf = 20)
          .filter(col("jaccard") >= 0.3)
        graft.pipeline.Components.connectedComponents(pairs)
          .orderBy("id")
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
               SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v)
             SELECT id, min(r) AS component FROM reach
             GROUP BY id ORDER BY id""")),

    // ---- incremental CC: fold a batch of pairs into a standing labeling ---
    // the same near-dup graph split deterministically in two: labels from
    // the even-parity edges, then updateComponents folds the odd-parity
    // batch in — only AFFECTED components recompute (the standing labels
    // frame is touched by broadcast joins only). The result must be
    // hash-identical to the full-graph closure, which is exactly what the
    // oracle computes (same SQL as q_dedup_cc).
    QueryDef("q_cc_update",
      (s, d) => {
        val docs = documents(s, d)
        val pairs = graft.pipeline.Dedup
          .ngramJaccard(docs, "doc_id", "text", 3, maxDf = 20)
          .filter(col("jaccard") >= 0.3)
          .select("id_a", "id_b").cache()
        val base = pairs.filter((col("id_a") + col("id_b")) % 2 === 0)
        val batch = pairs.filter((col("id_a") + col("id_b")) % 2 =!= 0)
        val labels = graft.pipeline.Components.connectedComponents(base)
        graft.pipeline.Components.updateComponents(labels, batch)
          .orderBy("id")
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
               SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v)
             SELECT id, min(r) AS component FROM reach
             GROUP BY id ORDER BY id""")),

    // transitive near-dedup end-to-end: ONE representative (min id) kept
    // per component, untouched docs pass through; victims removed by a
    // broadcast anti-join (the corpus never shuffles).
    QueryDef("q_dedup_cc_keep",
      (s, d) => {
        val docs = documents(s, d)
        val pairs = graft.pipeline.Dedup
          .ngramJaccard(docs, "doc_id", "text", 3, maxDf = 20)
          .filter(col("jaccard") >= 0.3)
        graft.pipeline.Dedup.nearDedupByComponent(docs, "doc_id", pairs)
          .select("doc_id").orderBy("doc_id")
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
             victims AS (SELECT id FROM reach GROUP BY id
               HAVING id <> min(r))
             SELECT doc_id FROM documents
             WHERE doc_id NOT IN (SELECT id FROM victims)
             ORDER BY doc_id""")),

    // ---- MinHash + LSH near-dup pipeline ----------------------------------
    QueryDef("q_minhash_dedup",
      (s, d) => graft.pipeline.Dedup.minhashDedup(documents(s, d),
          "doc_id", "text", shingleSize = 3, numHashes = 63, bands = 21,
          threshold = 0.8)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b"),
      Some("""WITH tok AS (SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
             sh AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_transform(generate_series(1, len(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS s
               FROM tok),
             sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
             com AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
             SELECT id_a, id_b,
               round(c::DOUBLE / (sa.sz + sb.sz - c), 6) AS jaccard
             FROM com JOIN sz sa ON sa.doc_id = id_a
               JOIN sz sb ON sb.doc_id = id_b
             WHERE c::DOUBLE / (sa.sz + sb.sz - c) >= 0.8
             ORDER BY id_a, id_b""")),

    // ---- SimHash near-dup over the ENGINE hash (xxhash64 basis) -----------
    // The production signature basis isn't DuckDB-replayable, so the gate
    // contract brute-forces the SAME recall-mode semantics directly from
    // the engine signatures IN-QUERY: with chunks=4 < maxHamming+1 the
    // machinery's output is exactly {a<b : hamming(sig_a,sig_b) <= 8 AND
    // the pair shares >= 1 of the 4 16-bit signature chunks} — both
    // predicates are pure functions of the signatures, so a guarded n²
    // cross join replays them and the full-outer mismatch count must be
    // zero (ids AND hamming values). DuckDB replays n_docs and the proven
    // flag. gateOnly: the harness is the n² join, not the operator — the
    // machinery's benched cost row is q_simhash (same chunk-bucket path,
    // md5 basis, strictly higher per-token cost).
    QueryDef("q_simhash_dedup",
      (s, d) => {
        val sigs = documents(s, d).na.drop(Seq("doc_id", "text"))
          .select(col("doc_id").cast("long").as("__id"),
            graft.pipeline.Dedup.simhash(col("text")).as("__sig"))
          .na.drop(Seq("__sig"))
        val machine = graft.pipeline.Dedup.simhashPairsFromSig(sigs,
          maxHamming = 8, chunks = 4)
        val a = sigs.select(col("__id").as("__ia"), col("__sig").as("__sa"))
        val b = sigs.select(col("__id").as("__ib"), col("__sig").as("__sb"))
        val shareChunk = (0 until 4).map { i =>
          val lo = i * 16
          (shiftrightunsigned(col("__sa"), lo).bitwiseAND(lit(0xffffL))) ===
            (shiftrightunsigned(col("__sb"), lo).bitwiseAND(lit(0xffffL)))
        }.reduce(_ || _)
        val brute = a.join(b, col("__ia") < col("__ib"))
          .filter(graft.pipeline.Dedup.hammingDist(
            col("__sa"), col("__sb")) <= 8 && shareChunk)
          .select(col("__ia").as("__ba"), col("__ib").as("__bb"),
            graft.pipeline.Dedup.hammingDist(col("__sa"), col("__sb"))
              .as("__bh"))
        val mism = machine.join(brute,
            col("id_a") === col("__ba") && col("id_b") === col("__bb") &&
              col("hamming") === col("__bh"), "full_outer")
          .filter(col("id_a").isNull || col("__ba").isNull)
          .agg(count(lit(1)).as("__mism"))
        sigs.agg(count(lit(1)).as("n_docs"))
          .crossJoin(mism)
          .select(col("n_docs"), (col("__mism") === 0)
            .as("machinery_equals_brute"))
      },
      Some("""SELECT count(*)::BIGINT AS n_docs,
             true AS machinery_equals_brute
             FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
               AND trim(text) <> ''"""),
      gateOnly = true),

    // ---- SimHash EXACT Hamming-ball contract (hash-green) -----------------
    // signatures from md5 token hashes (simhashMd5 — first 16 hex chars of
    // md5(token), big-endian, a basis DuckDB reproduces bit-for-bit) fed
    // through the SAME distributed chunk-bucket machinery as
    // q_simhash_dedup; chunks = maxHamming + 1 makes the pigeonhole
    // candidate set complete, so the output is EXACTLY the Hamming ball
    // the oracle brute-forces with xor + bit_count over all pairs
    QueryDef("q_simhash",
      (s, d) => {
        val sigs = documents(s, d).na.drop(Seq("doc_id", "text"))
          .select(col("doc_id").cast("long").as("__id"),
            graft.pipeline.Dedup.simhashMd5(col("text")).as("__sig"))
          .na.drop(Seq("__sig"))
        // maxHamming=3/chunks=4 keeps the pigeonhole EXACT (chunks >=
        // h+1) on 16-bit chunk keys — buckets stay ~n/65536 rows at any
        // corpus. The r12 sf10d full-suite run caught the previous
        // maxHamming=8/chunks=9 setting: 7-bit chunk keys collapse to
        // 128 buckets per position, ~4k-row buckets at 500k docs, and
        // the O(bucket^2) scorer ran for HOURS. Radius 3 is also the
        // production near-dup setting; the wider-radius machinery stays
        // spec'd via q_simhash_dedup's n^2-replay contract.
        graft.pipeline.Dedup.simhashPairsFromSig(sigs,
            maxHamming = 3, chunks = 4)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH tok AS (SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS w
               FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
             th AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS h
               FROM tok WHERE w <> ''),
             bits AS (SELECT doc_id, b,
                 sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
               FROM th, unnest(generate_series(0, 63)) AS t(b) GROUP BY 1, 2),
             sig AS (SELECT doc_id, bit_or(CASE WHEN s > 0
                 THEN 1::UBIGINT << b ELSE 0::UBIGINT END) AS sig
               FROM bits GROUP BY 1)
             SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.sig, b.sig))::INTEGER AS hamming
             FROM sig a JOIN sig b ON a.doc_id < b.doc_id
             WHERE bit_count(xor(a.sig, b.sig)) <= 3
             ORDER BY id_a, id_b""")),

    // ---- embedding cosine near-dup: exact pairs ---------------------------
    QueryDef("q_embedding_pairs",
      (s, d) => graft.pipeline.Similarity.allPairsCosine(
          embeddings(s, d), "vec_id", "embedding", 0.45)
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
        .orderBy("id_a", "id_b"),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
             SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.v, b.v), 6) AS cos
             FROM e a JOIN e b ON a.vec_id < b.vec_id
             WHERE list_cosine_similarity(a.v, b.v) >= 0.45
             ORDER BY id_a, id_b""")),

    // ---- LSH-bucketed embedding near-dup (scale path — rows-only) ---------
    // LSH buckets are hyperplane-specific, but the tier's guarantees are
    // not: every emitted pair is exact-verified (no false positives = the
    // LSH output is a SUBSET of the exact all-pairs set, whose size DuckDB
    // reproduces) — same contract-check pattern as the GK/HLL/bloom rows;
    // recall itself is measured in RecallSpec against the collision model
    QueryDef("q_embedding_dedup_lsh",
      (s, d) => {
        val e = embeddings(s, d)
        val lsh = graft.pipeline.Dedup.embeddingDedup(e,
          "vec_id", "embedding", dim = 64, threshold = 0.4, bits = 4)
        val exact = graft.pipeline.Similarity.allPairsCosine(e,
          "vec_id", "embedding", 0.4)
          .select(col("id_a").as("__ea"), col("id_b").as("__eb"))
        exact.agg(count(lit(1)).as("n_exact_pairs"))
          .crossJoin(lsh.join(exact,
              col("id_a") === col("__ea") && col("id_b") === col("__eb"),
              "left_anti")
            .agg(count(lit(1)).as("__fp")))
          .select(col("n_exact_pairs"), (col("__fp") === 0)
            .as("no_false_positives"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
               FROM embeddings WHERE vec_id IS NOT NULL),
             p AS (SELECT a.vec_id AS ia, b.vec_id AS ib
               FROM e a JOIN e b ON a.vec_id < b.vec_id
               WHERE list_cosine_similarity(a.v, b.v) >= 0.4)
             SELECT count(*)::BIGINT AS n_exact_pairs,
               true AS no_false_positives FROM p"""),
      gateOnly = true),

    // the RECOMMENDED production configuration (tables=4: recall 0.15 → ~0.5
    // at cos >= 0.4 per RecallSpec's collision model) — benched so the cost
    // of the config callers should actually run is tracked, not just the
    // single-table floor. Signature width from lshBitsFor (resolves to the
    // spec'd bits=4 at sf0.1 and below; scales the cell count past that —
    // the sf10 lesson).
    // Hash-green since r11 via the q_embedding_dedup_lsh contract shape:
    // every emitted pair is exact-verified in the operator, so the output
    // must be a SUBSET of the exact all-pairs set — n_exact_pairs +
    // FP-freedom are engine-independent and DuckDB-replayable. Stays
    // benched (unlike the single-table gate row): the bench number now
    // prices operator + harness — the harness is the same allPairsCosine
    // q_embedding_pairs already prices alone, so the operator's own cost
    // is recoverable by subtraction. Recall is RecallSpec-measured.
    QueryDef("q_embedding_dedup_lsh_mt",
      (s, d) => {
        val e = embeddings(s, d)
        val lsh = graft.pipeline.Dedup.embeddingDedup(e,
          "vec_id", "embedding", dim = 64, threshold = 0.4,
          bits = graft.pipeline.Dedup.lshBitsFor(e.count()),
          tables = 4)
        val exact = graft.pipeline.Similarity.allPairsCosine(e,
          "vec_id", "embedding", 0.4)
          .select(col("id_a").as("__ea"), col("id_b").as("__eb"))
        exact.agg(count(lit(1)).as("n_exact_pairs"))
          .crossJoin(lsh.join(exact,
              col("id_a") === col("__ea") && col("id_b") === col("__eb"),
              "left_anti")
            .agg(count(lit(1)).as("__fp")))
          .select(col("n_exact_pairs"), (col("__fp") === 0)
            .as("no_false_positives"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
               FROM embeddings WHERE vec_id IS NOT NULL),
             p AS (SELECT a.vec_id AS ia, b.vec_id AS ib
               FROM e a JOIN e b ON a.vec_id < b.vec_id
               WHERE list_cosine_similarity(a.v, b.v) >= 0.4)
             SELECT count(*)::BIGINT AS n_exact_pairs,
               true AS no_false_positives FROM p""")),
  )
}
