package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.agg.Stats
import graft.clean.Clean
import graft.core.HandyFrame
import graft.ml.{HandyFencer, HandyImputer}
import graft.plotdata.PlotData
import graft.strata.{Bucket, ColStratum, Quantile, StratifiedFrame}

/** Gate tier 4/9 — corpus-statistics tier: ExactSubstr, vocabulary/Heaps/Zipf, sketches (CMS/HLL/Misra-Gries), TF-IDF/BM25/LM scoring, collocations, DSIR, sampling/shuffle.
  *
  * Split from the 11k-line Queries.scala (r11 VERDICT #8): pure
  * relocation, zero semantic movement — [[Queries.defs]] concatenates
  * the nine tiers in the original order and the duplicate-name guard
  * still covers the whole set. All determinism rules live in the
  * [[Queries]] scaladoc; table readers and shared contracts in
  * [[QueryHelpers]]. 35 queries. */
private[graft] object QueriesCorpus {
  import QueryHelpers._

  val defs: Seq[QueryDef] = Seq(

    // ---- exact repeated-substring dedup (ExactSubstr, Lee et al. 2022) -----
    // maximal removal spans: every 60-char window occurring >= 2 times
    // corpus-wide, min-(doc,pos) owner keeps, non-owner windows island-
    // merged per doc; the oracle replays windows -> dup strings -> owner
    // -> island merge with identical arithmetic
    QueryDef("q_substr_spans",
      (s, d) => graft.pipeline.SubstringDedup.repeatedSubstringSpans(
          documents(s, d).select("doc_id", "text"), "doc_id", "text",
          minLen = 60)
        .orderBy("doc_id", "span_start"),
      Some("""WITH w AS (SELECT doc_id AS id,
               unnest(range(1, length(text) - 58)) AS pos, text
               FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
                 AND length(text) >= 60),
             s AS (SELECT id, pos, substr(text, pos::INT, 60) AS sub FROM w),
             d AS (SELECT sub FROM s GROUP BY sub HAVING count(*) >= 2),
             m AS (SELECT s.id, s.pos, row_number() OVER (PARTITION BY s.sub
                 ORDER BY s.id, s.pos) AS rn
               FROM s JOIN d USING (sub)),
             rem AS (SELECT id, pos FROM m WHERE rn > 1),
             b AS (SELECT id, pos, CASE WHEN pos > coalesce(
                 max(pos + 60) OVER (PARTITION BY id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               THEN 1 ELSE 0 END AS brk FROM rem),
             g AS (SELECT id, pos, sum(brk) OVER (PARTITION BY id
               ORDER BY pos) AS grp FROM b)
             SELECT id AS doc_id, min(pos)::BIGINT AS span_start,
               (max(pos) + 59)::BIGINT AS span_end
             FROM g GROUP BY id, grp ORDER BY doc_id, span_start""")),

    // rewrite release: spans cut out, owner copy kept, fully-repeated docs
    // become '' — the whole segment algebra replayed in SQL
    QueryDef("q_substr_dedup",
      (s, d) => graft.pipeline.SubstringDedup.removeRepeatedSubstrings(
          documents(s, d).select("doc_id", "text"), "doc_id", "text",
          minLen = 60)
        .orderBy("doc_id"),
      Some("""WITH w AS (SELECT doc_id AS id,
               unnest(range(1, length(text) - 58)) AS pos, text
               FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
                 AND length(text) >= 60),
             s AS (SELECT id, pos, substr(text, pos::INT, 60) AS sub FROM w),
             d AS (SELECT sub FROM s GROUP BY sub HAVING count(*) >= 2),
             m AS (SELECT s.id, s.pos, row_number() OVER (PARTITION BY s.sub
                 ORDER BY s.id, s.pos) AS rn
               FROM s JOIN d USING (sub)),
             rem AS (SELECT id, pos FROM m WHERE rn > 1),
             b AS (SELECT id, pos, CASE WHEN pos > coalesce(
                 max(pos + 60) OVER (PARTITION BY id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               THEN 1 ELSE 0 END AS brk FROM rem),
             g AS (SELECT id, pos, sum(brk) OVER (PARTITION BY id
               ORDER BY pos) AS grp FROM b),
             sp AS (SELECT id, min(pos) AS s0, max(pos) + 59 AS e0
               FROM g GROUP BY id, grp),
             bef AS (SELECT id, coalesce(lag(e0) OVER (PARTITION BY id
                 ORDER BY s0), 0) + 1 AS ks, s0 - 1 AS ke FROM sp),
             aft AS (SELECT sp.id, max(e0) + 1 AS ks,
                 length(dd.text)::BIGINT AS ke
               FROM sp JOIN documents dd ON dd.doc_id = sp.id
               GROUP BY sp.id, length(dd.text)),
             segs AS (SELECT * FROM bef WHERE ks <= ke
               UNION ALL SELECT * FROM aft WHERE ks <= ke),
             pieces AS (SELECT segs.id, ks,
                 substr(dd.text, ks::INT, (ke - ks + 1)::INT) AS piece
               FROM segs JOIN documents dd ON dd.doc_id = segs.id),
             rew AS (SELECT id, string_agg(piece, '' ORDER BY ks) AS t
               FROM pieces GROUP BY id),
             ids AS (SELECT DISTINCT id FROM sp)
             SELECT dd.doc_id, CASE WHEN ids.id IS NOT NULL
                 THEN coalesce(rew.t, '') ELSE dd.text END AS text
             FROM documents dd
             LEFT JOIN ids ON ids.id = dd.doc_id
             LEFT JOIN rew ON rew.id = dd.doc_id
             WHERE dd.doc_id IS NOT NULL AND dd.text IS NOT NULL
             ORDER BY doc_id""")),

    // per-doc repeated-char fraction: the span pipeline rolled up into a
    // quality signal (same windows/ownership/islands SQL + one rollup)
    QueryDef("q_substr_fraction",
      (s, d) => graft.pipeline.SubstringDedup.repeatedFraction(
          documents(s, d).select("doc_id", "text"), "doc_id", "text",
          minLen = 60)
        .select(col("doc_id"), col("n_chars"), col("repeated_chars"),
          round(col("repeated_frac"), 6).as("repeated_frac"))
        .orderBy("doc_id"),
      Some("""WITH w AS (SELECT doc_id AS id,
               unnest(range(1, length(text) - 58)) AS pos, text
               FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
                 AND length(text) >= 60),
             s AS (SELECT id, pos, substr(text, pos::INT, 60) AS sub FROM w),
             d AS (SELECT sub FROM s GROUP BY sub HAVING count(*) >= 2),
             m AS (SELECT s.id, s.pos, row_number() OVER (PARTITION BY s.sub
                 ORDER BY s.id, s.pos) AS rn
               FROM s JOIN d USING (sub)),
             rem AS (SELECT id, pos FROM m WHERE rn > 1),
             b AS (SELECT id, pos, CASE WHEN pos > coalesce(
                 max(pos + 60) OVER (PARTITION BY id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               THEN 1 ELSE 0 END AS brk FROM rem),
             g AS (SELECT id, pos, sum(brk) OVER (PARTITION BY id
               ORDER BY pos) AS grp FROM b),
             sp AS (SELECT id, min(pos) AS s0, max(pos) + 59 AS e0
               FROM g GROUP BY id, grp),
             rc AS (SELECT id, sum(e0 - s0 + 1)::BIGINT AS repeated_chars
               FROM sp GROUP BY id)
             SELECT dd.doc_id, length(dd.text)::BIGINT AS n_chars,
               coalesce(rc.repeated_chars, 0)::BIGINT AS repeated_chars,
               round(CASE WHEN length(dd.text) > 0
                 THEN coalesce(rc.repeated_chars, 0)::DOUBLE / length(dd.text)
                 ELSE 0.0 END, 6) AS repeated_frac
             FROM documents dd LEFT JOIN rc ON rc.id = dd.doc_id
             WHERE dd.doc_id IS NOT NULL AND dd.text IS NOT NULL
             ORDER BY dd.doc_id""")),

    // persisted substring index: corpus (4/5 of docs) written to parquet
    // ONCE, batch (1/5) screened against the FILES; result = island-
    // merged spans of batch text already present in the corpus. The
    // oracle recomputes the screen from both halves directly — the index
    // round-trip must be invisible in the output
    QueryDef("q_substr_index",
      (s, d) => {
        val docs = documents(s, d).select("doc_id", "text")
        val batch = docs.filter(col("doc_id") % 5 === 0)
        val corpus = docs.filter(col("doc_id") % 5 =!= 0)
        val path = graft.util.Scratch.dir("graft-q-substridx")
        graft.pipeline.SubstrIndex.write(corpus, "doc_id", "text", path,
          minLen = 60)
        graft.pipeline.SubstrIndex.spansAgainst(batch, "doc_id", "text",
            path)
          .orderBy("doc_id", "span_start")
      },
      Some("""WITH b AS (SELECT doc_id AS id, text FROM documents
               WHERE doc_id IS NOT NULL AND text IS NOT NULL
                 AND doc_id % 5 = 0),
             c AS (SELECT doc_id AS id, text FROM documents
               WHERE doc_id IS NOT NULL AND text IS NOT NULL
                 AND doc_id % 5 <> 0),
             bw AS (SELECT id, unnest(range(1, length(text) - 58)) AS pos,
               text FROM b WHERE length(text) >= 60),
             bs AS (SELECT id, pos, substr(text, pos::INT, 60) AS sub
               FROM bw),
             cw AS (SELECT unnest(range(1, length(text) - 58)) AS pos,
               text FROM c WHERE length(text) >= 60),
             cs AS (SELECT DISTINCT substr(text, pos::INT, 60) AS sub
               FROM cw),
             rem AS (SELECT id, pos FROM bs JOIN cs USING (sub)),
             b2 AS (SELECT id, pos, CASE WHEN pos > coalesce(
                 max(pos + 60) OVER (PARTITION BY id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               THEN 1 ELSE 0 END AS brk FROM rem),
             g AS (SELECT id, pos, sum(brk) OVER (PARTITION BY id
               ORDER BY pos) AS grp FROM b2)
             SELECT id AS doc_id, min(pos)::BIGINT AS span_start,
               (max(pos) + 59)::BIGINT AS span_end
             FROM g GROUP BY id, grp ORDER BY doc_id, span_start""")),

    // ---- per-document n-gram novelty (contribution scoring) ---------------
    // fraction of a doc's distinct n-grams first seen in THIS doc (min-id
    // ownership); oracle rebuilds the shingle stream + first-occurrence
    // join in SQL (same shingle CASE as the jaccard oracles)
    QueryDef("q_ngram_novelty",
      (s, d) => graft.pipeline.TextAnalysis.ngramNovelty(
          documents(s, d), "doc_id", "text", n = 3)
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          round(col("novelty"), 6).as("novelty"))
        .orderBy("doc_id"),
      Some("""WITH tok AS (SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS t FROM documents
               WHERE doc_id IS NOT NULL AND text IS NOT NULL),
             sh AS (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_transform(generate_series(1, len(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END)) AS s
               FROM tok),
             fo AS (SELECT s, min(doc_id) AS f FROM sh GROUP BY s)
             SELECT sh.doc_id, count(*)::BIGINT AS n_grams,
               sum((sh.doc_id = fo.f)::INT)::BIGINT AS n_novel,
               round(sum((sh.doc_id = fo.f)::INT)::DOUBLE / count(*), 6)
                 AS novelty
             FROM sh JOIN fo ON sh.s = fo.s
             GROUP BY sh.doc_id ORDER BY sh.doc_id""")),

    // ---- corpus vocabulary (tokenizer-training feed) ----------------------
    QueryDef("q_vocab",
      (s, d) => graft.pipeline.TextAnalysis.vocabulary(
          documents(s, d), "doc_id", "text", minCount = 5)
        .orderBy(desc("count"), col("token"))
        .limit(100),
      Some("""SELECT token, count(*)::BIGINT AS count,
             count(DISTINCT doc_id)::BIGINT AS doc_freq
             FROM (SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS token
               FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL)
             WHERE token != ''
             GROUP BY token HAVING count(*) >= 5
             ORDER BY count DESC, token LIMIT 100""")),

    // ---- Exact heavy tokens via bounded-state Misra-Gries -----------------
    // one O(k)-state sketch pass for candidates + exact recount of the
    // <= k survivors: output is EXACTLY "tokens in >= 0.3% of the token
    // stream" (MG guarantees candidates cover everything above n/(k+1)),
    // so the full vocabulary-cardinality shuffle the oracle pays never
    // happens on the Spark side
    QueryDef("q_heavy_tokens",
      (s, d) => graft.pipeline.TextAnalysis.heavyTokens(
          documents(s, d), "text", support = 0.003)
        .orderBy("token"),
      Some("""WITH tt AS (SELECT token
               FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+'))
                 AS token FROM documents WHERE text IS NOT NULL)
               WHERE token != ''),
             n AS (SELECT count(*)::DOUBLE AS nn FROM tt)
             SELECT token, count(*)::BIGINT AS cnt
             FROM tt CROSS JOIN n GROUP BY token, n.nn
             HAVING count(*) >= ceil(0.003 * n.nn)
             ORDER BY token""")),

    // ---- Vocabulary growth curve (Heaps'-law empirics) --------------------
    // types attributed to their first document by a min(doc_id) aggregate
    // (no per-token ordering), running sums via range-sort + partition
    // offsets in one pass — the oracle pays a global window instead
    QueryDef("q_vocab_growth",
      (s, d) => graft.pipeline.TextAnalysis.vocabGrowth(
          documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH t2 AS (SELECT doc_id, token
               FROM (SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS token
                 FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL)
               WHERE token <> ''),
             perdoc AS (SELECT doc_id, count(*)::BIGINT AS doc_tokens
               FROM t2 GROUP BY 1),
             fd AS (SELECT token, min(doc_id) AS first_doc FROM t2 GROUP BY 1),
             nt AS (SELECT first_doc AS doc_id, count(*)::BIGINT AS new_types
               FROM fd GROUP BY 1)
             SELECT p.doc_id, p.doc_tokens,
               (sum(p.doc_tokens) OVER (ORDER BY p.doc_id))::BIGINT
                 AS cum_tokens,
               coalesce(nt.new_types, 0)::BIGINT AS new_types,
               (sum(coalesce(nt.new_types, 0)) OVER (ORDER BY p.doc_id))
                 ::BIGINT AS cum_types
             FROM perdoc p LEFT JOIN nt USING (doc_id)
             ORDER BY doc_id""")),

    // ---- Heaps'-law fit (vocabulary-growth health check) ------------------
    QueryDef("q_heaps_fit",
      (s, d) => graft.pipeline.TextAnalysis.heapsFit(
          documents(s, d), "doc_id", "text")
        .select(round(col("beta"), 6).as("beta"), round(col("k"), 6).as("k"),
          round(col("r2"), 6).as("r2"), col("n_docs")),
      Some("""WITH t2 AS (SELECT doc_id, token
               FROM (SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS token
                 FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL)
               WHERE token <> ''),
             perdoc AS (SELECT doc_id, count(*)::BIGINT AS doc_tokens
               FROM t2 GROUP BY 1),
             fd AS (SELECT token, min(doc_id) AS first_doc FROM t2 GROUP BY 1),
             nt AS (SELECT first_doc AS doc_id, count(*)::BIGINT AS new_types
               FROM fd GROUP BY 1),
             g AS (SELECT
                 ln((sum(p.doc_tokens) OVER (ORDER BY p.doc_id))::DOUBLE)
                   AS x,
                 ln((sum(coalesce(nt.new_types, 0)) OVER (ORDER BY p.doc_id))
                   ::DOUBLE) AS y
               FROM perdoc p LEFT JOIN nt USING (doc_id))
             SELECT round(regr_slope(y, x), 6) AS beta,
               round(exp(regr_intercept(y, x)), 6) AS k,
               round(regr_r2(y, x), 6) AS r2,
               count(*)::BIGINT AS n_docs FROM g""")),

    // ---- Count-Min sketch token frequencies (hash-green contract) ---------
    // one mapPartitions + treeReduce pass builds the depth x width counter
    // matrix with md5-basis cells DuckDB reproduces bit-for-bit:
    // cell(r, t) = ('0x' || substr(md5(r || ':' || t), 1, 16))::UBIGINT
    // % width. Estimates therefore hash-match EXACTLY (not just bounded).
    // Cell sums run over the FULL token stream (text non-null — the
    // sketch never sees doc_id); the reported token list follows
    // vocabulary() semantics (doc_id AND text non-null, cnt >= 20)
    QueryDef("q_cms",
      (s, d) => graft.agg.CountMin.cmsEstimates(documents(s, d),
          "doc_id", "text", depth = 3, width = 512, minCount = 20)
        .orderBy("token"),
      Some("""WITH tokAll AS (SELECT unnest(regexp_split_to_array(trim(text),
                 '\s+')) AS token FROM documents WHERE text IS NOT NULL),
             vAll AS (SELECT token, count(*)::BIGINT AS n FROM tokAll
               WHERE token <> '' GROUP BY 1),
             h AS (SELECT token, n, r,
                 ('0x' || substr(md5(r::VARCHAR || ':' || token), 1, 16))
                   ::UBIGINT % 512 AS cell
               FROM vAll, unnest(generate_series(0, 2)) AS t(r)),
             cells AS (SELECT r, cell, sum(n)::BIGINT AS c FROM h
               GROUP BY 1, 2),
             est AS (SELECT token, min(c)::BIGINT AS est
               FROM h JOIN cells USING (r, cell) GROUP BY 1),
             v AS (SELECT token, count(*)::BIGINT AS cnt
               FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+'))
                 AS token FROM documents
                 WHERE doc_id IS NOT NULL AND text IS NOT NULL)
               WHERE token <> '' GROUP BY 1 HAVING count(*) >= 20)
             SELECT v.token, v.cnt, est.est FROM v JOIN est USING (token)
             ORDER BY token""")),

    // ---- mergeable histogram sketch (cross-batch quantiles) ---------------
    // equal-width cells over a pinned range; the cell index is ONE fixed
    // IEEE double expression (floor((v-lo)/(hi-lo)*bins), clamped) so
    // DuckDB replays the whole counter table bit-for-bit — the quantile
    // analog of the q_cms cell contract. Cells merge by addition across
    // partitions AND persisted batches (q_hist_merge).
    QueryDef("q_hist_sketch",
      (s, d) => {
        implicit val sp: SparkSession = s
        graft.agg.CountHist.histFrame(graft.agg.CountHist.sketchCol(
            lineitem(s, d), "l_extendedprice", 900.0, 105000.0, 64))
          .select(col("bin"), col("n")).orderBy("bin")
      },
      Some("""WITH v AS (SELECT l_extendedprice::DOUBLE AS v FROM lineitem
               WHERE l_extendedprice IS NOT NULL),
             b AS (SELECT CASE WHEN v < 900.0 THEN -1
               WHEN v > 105000.0 THEN 64
               ELSE least(CAST(floor((v - 900.0) / (105000.0 - 900.0) * 64)
                 AS INT), 63) END AS bin FROM v),
             c AS (SELECT bin, count(*) AS n FROM b GROUP BY 1),
             g AS (SELECT unnest(generate_series(-1, 64)) AS bin)
             SELECT g.bin::INT AS bin, coalesce(c.n, 0)::BIGINT AS n
             FROM g LEFT JOIN c USING (bin) ORDER BY bin""")),

    // per-group sketches via the HistCounts aggregate expression: the
    // full counter table of every group (dense, incl. the -1/bins
    // out-of-range rows) replayed cell-for-cell — same arithmetic
    // contract as q_hist_sketch, but through groupBy partial aggregation
    QueryDef("q_hist_group",
      (s, d) => {
        val g = graft.agg.CountHist.byGroup(
          lineitem(s, d).na.drop(Seq("l_returnflag", "l_extendedprice")),
          Seq("l_returnflag"), "l_extendedprice", 900.0, 105000.0, 64)
        val cells = g.select(col("l_returnflag"),
          posexplode(col("counts")).as(Seq("bin", "n")))
        cells
          .unionAll(g.select(col("l_returnflag"), lit(-1).as("bin"),
            col("below").as("n")))
          .unionAll(g.select(col("l_returnflag"), lit(64).as("bin"),
            col("above").as("n")))
          .orderBy("l_returnflag", "bin")
      },
      Some("""WITH v AS (SELECT l_returnflag AS flag,
               l_extendedprice::DOUBLE AS v FROM lineitem
               WHERE l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL),
             b AS (SELECT flag, CASE WHEN v < 900.0 THEN -1
               WHEN v > 105000.0 THEN 64
               ELSE least(CAST(floor((v - 900.0) / (105000.0 - 900.0) * 64)
                 AS INT), 63) END AS bin FROM v),
             c AS (SELECT flag, bin, count(*) AS n FROM b GROUP BY 1, 2),
             g AS (SELECT flag, unnest(generate_series(-1, 64)) AS bin
               FROM (SELECT DISTINCT flag FROM v))
             SELECT g.flag AS l_returnflag, g.bin::INT AS bin,
               coalesce(c.n, 0)::BIGINT AS n
             FROM g LEFT JOIN c USING (flag, bin)
             ORDER BY 1, 2""")),

    // cross-batch persistence contract: sketch half the corpus, append
    // the other half into the parquet sketch, read back — the merged
    // cells must equal the whole-corpus single-pass cells, which is what
    // the oracle computes (addition is exact, so this is hash-green, not
    // bounded)
    QueryDef("q_hist_merge",
      (s, d) => {
        implicit val sp: SparkSession = s
        val li = lineitem(s, d)
        val path = graft.util.Scratch.dir("graft-q-histsketch")
        graft.agg.CountHist.write(graft.agg.CountHist.sketchCol(
          li.filter(col("l_orderkey") % 2 === 0),
          "l_extendedprice", 900.0, 105000.0, 64), path)
        graft.agg.CountHist.append(
          li.filter(col("l_orderkey") % 2 =!= 0), "l_extendedprice", path)
        graft.agg.CountHist.histFrame(graft.agg.CountHist.read(path))
          .select(col("bin"), col("n")).orderBy("bin")
      },
      Some("""WITH v AS (SELECT l_extendedprice::DOUBLE AS v FROM lineitem
               WHERE l_extendedprice IS NOT NULL),
             b AS (SELECT CASE WHEN v < 900.0 THEN -1
               WHEN v > 105000.0 THEN 64
               ELSE least(CAST(floor((v - 900.0) / (105000.0 - 900.0) * 64)
                 AS INT), 63) END AS bin FROM v),
             c AS (SELECT bin, count(*) AS n FROM b GROUP BY 1),
             g AS (SELECT unnest(generate_series(-1, 64)) AS bin)
             SELECT g.bin::INT AS bin, coalesce(c.n, 0)::BIGINT AS n
             FROM g LEFT JOIN c USING (bin) ORDER BY bin""")),

    // ---- cross-batch cardinality sketch (HLL union over parquet) ----------
    // the distinct-count member of the persisted-sketch trio: write the
    // even-orderkey batch, append the odd one, read back the running
    // union — BOTH the merged and the single-pass estimate must land
    // within the 4·rsd envelope of the whole-corpus exact count. (The two
    // estimates agree exactly only in the pre-promotion coupon regime —
    // DistinctSketchSpec pins that; once promoted to dense HLL the union
    // can differ from single-pass by mode/precision, so the cross-batch
    // contract is the envelope, not bit-equality.) Oracle reproduces the
    // exact count + flags
    QueryDef("q_distinct_sketch",
      (s, d) => {
        implicit val sp: SparkSession = s
        val li = lineitem(s, d)
        val path = graft.util.Scratch.dir("graft-q-hllsketch")
        graft.agg.DistinctSketch.write(graft.agg.DistinctSketch.sketchCol(
          li.filter(col("l_orderkey") % 2 === 0), "l_partkey"), path)
        graft.agg.DistinctSketch.append(
          li.filter(col("l_orderkey") % 2 =!= 0), "l_partkey", path)
        val merged = graft.agg.DistinctSketch.estimate(
          graft.agg.DistinctSketch.read(path))
        val single = graft.agg.DistinctSketch.estimate(
          graft.agg.DistinctSketch.sketchCol(li, "l_partkey"))
        val exact = li.na.drop(Seq("l_partkey"))
          .agg(countDistinct(col("l_partkey"))).head().getLong(0)
        val bound = 4.0 * graft.agg.DistinctSketch.rsd(12) * exact
        import s.implicits._
        Seq((exact, math.abs(merged - exact).toDouble <= bound,
            math.abs(single - exact).toDouble <= bound))
          .toDF("n_exact", "merged_within_envelope", "single_within_envelope")
      },
      Some("""SELECT count(DISTINCT l_partkey)::BIGINT AS n_exact,
             true AS merged_within_envelope, true AS single_within_envelope
             FROM lineitem""")),

    // sketch-quantile contract in the percentileApproxCheck style: the
    // deterministic column is the EXACT type-7 quantile (DuckDB
    // quantile_cont); the flag asserts the sketch estimate landed within
    // 2 cell widths of it (crossing cell or its neighbor)
    QueryDef("q_hist_quantile",
      (s, d) => graft.agg.CountHist.quantileCheck(lineitem(s, d),
          "l_extendedprice", 900.0, 105000.0, bins = 512,
          ps = Seq(0.25, 0.5, 0.9, 0.99))
        .select(col("p"), round(col("exact"), 6).as("exact"), col("ok"))
        .orderBy("p"),
      Some("""SELECT p, round(ex, 6) AS exact, true AS ok FROM (
               SELECT 0.25 AS p, quantile_cont(l_extendedprice, 0.25) AS ex
                 FROM lineitem
               UNION ALL SELECT 0.5, quantile_cont(l_extendedprice, 0.5)
                 FROM lineitem
               UNION ALL SELECT 0.9, quantile_cont(l_extendedprice, 0.9)
                 FROM lineitem
               UNION ALL SELECT 0.99, quantile_cont(l_extendedprice, 0.99)
                 FROM lineitem) ORDER BY p""")),

    // ---- Ranking metrics (recall@k / MRR / nDCG for the retrieval tier) ---
    // deterministic SQL-able fixture: ranked list = each source's top-20
    // docs by (n_chars desc, id); truth = that source's doc_id % 7 == 0
    // docs. The METRIC math is the contract under test — join, first-hit
    // rank, DCG against the per-query ideal — all replayed by the oracle
    QueryDef("q_ranking_metrics",
      (s, d) => {
        val docs = documents(s, d)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(desc("n_chars"), col("doc_id"))
        val results = docs.na.drop(Seq("doc_id", "source", "n_chars"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 20)
          .select("source", "doc_id", "rank")
        val truth = docs.na.drop(Seq("doc_id", "source"))
          .filter(col("doc_id") % 7 === 0)
          .select("source", "doc_id")
        graft.eval.RankingMetrics.perQuery(results, truth, "source",
            "doc_id", "rank", k = 20)
          .select(col("source"), col("n_truth"), col("n_hits"),
            round(col("recall_at_k"), 6).as("recall_at_k"),
            round(col("precision_at_k"), 6).as("precision_at_k"),
            round(col("mrr"), 6).as("mrr"),
            round(col("ndcg_at_k"), 6).as("ndcg_at_k"))
          .orderBy("source")
      },
      Some("""WITH res AS (SELECT source, doc_id,
               row_number() OVER (PARTITION BY source
                 ORDER BY n_chars DESC, doc_id) AS rank
               FROM documents
               WHERE doc_id IS NOT NULL AND source IS NOT NULL
                 AND n_chars IS NOT NULL
               QUALIFY rank <= 20),
             tr AS (SELECT source, doc_id FROM documents
               WHERE doc_id IS NOT NULL AND source IS NOT NULL
                 AND doc_id % 7 = 0),
             ta AS (SELECT source, count(*)::BIGINT AS n_truth,
                 sum(CASE WHEN irank <= 20
                   THEN 1.0 / log2(irank + 1) ELSE 0 END) AS idcg
               FROM (SELECT source, row_number() OVER (PARTITION BY source
                   ORDER BY doc_id) AS irank FROM tr)
               GROUP BY 1),
             h AS (SELECT res.source, count(*)::BIGINT AS n_hits,
                 min(rank) AS first_rank,
                 sum(1.0 / log2(rank + 1)) AS dcg
               FROM res JOIN tr ON res.source = tr.source
                 AND res.doc_id = tr.doc_id
               GROUP BY 1)
             SELECT ta.source, ta.n_truth,
               coalesce(h.n_hits, 0)::BIGINT AS n_hits,
               round(coalesce(h.n_hits, 0)::DOUBLE / ta.n_truth, 6)
                 AS recall_at_k,
               round(coalesce(h.n_hits, 0)::DOUBLE / 20.0, 6)
                 AS precision_at_k,
               round(coalesce(1.0 / h.first_rank, 0), 6) AS mrr,
               round(coalesce(h.dcg, 0) / ta.idcg, 6) AS ndcg_at_k
             FROM ta LEFT JOIN h ON ta.source = h.source
             ORDER BY ta.source""")),

    // ---- Hashed-TF document embedding (model-free text->vector) -----------
    // only built-in hash/string functions, so the oracle replays index,
    // sign and normalization bit-for-bit; output flattened to the
    // NON-ZERO (doc, pos, val) entries
    QueryDef("q_hash_embed",
      (s, d) => graft.pipeline.TextAnalysis.hashEmbed(
          documents(s, d), "doc_id", "text", dim = 64)
        .select(col("doc_id"), posexplode(col("vec")).as(Seq("pos", "val")))
        .filter(col("val") =!= 0.0)
        .select(col("doc_id"), col("pos"), round(col("val"), 6).as("val"))
        .orderBy("doc_id", "pos"),
      Some("""WITH tok AS (SELECT doc_id, token
               FROM (SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS token
                 FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL)
               WHERE token <> ''),
             e AS (SELECT doc_id,
                 (('0x' || substr(md5(token), 1, 15))::UBIGINT % 64)::INT
                   AS pos,
                 CASE WHEN ('0x' || substr(md5(token), 16, 1))::UBIGINT % 2
                   = 0 THEN 1.0 ELSE -1.0 END AS sgn
               FROM tok),
             sums AS (SELECT doc_id, pos, sum(sgn) AS v FROM e GROUP BY 1, 2),
             nm AS (SELECT doc_id, sqrt(sum(v * v)) AS nm FROM sums
               GROUP BY 1)
             SELECT s.doc_id, s.pos, round(s.v / nm.nm, 6) AS val
             FROM sums s JOIN nm ON nm.doc_id = s.doc_id
             WHERE s.v <> 0 AND nm.nm > 0
             ORDER BY s.doc_id, s.pos""")),

    // ---- Text SemDeDup over hashed-TF vectors (gate) ----------------------
    // the COMPOSITION contract: semDedupText pairs must be a subset of the
    // exact all-pairs cosine set over the same hashed vectors — and since
    // hashEmbed is SQL-replayable, the oracle reproduces that exact set's
    // size independently (stronger than the learned-embedding LSH gates,
    // whose vectors the oracle must take as given)
    QueryDef("q_semdedup_text",
      (s, d) => {
        val docs = documents(s, d)
        val vecs = graft.pipeline.TextAnalysis.hashEmbed(docs, "doc_id",
          "text", dim = 64)
        val pairs = graft.pipeline.Curate.semDedupText(docs, "doc_id",
          "text", k = 8, threshold = 0.85, dim = 64, probes = 2)
          .select(col("id_a").as("__pa"), col("id_b").as("__pb"))
        // integer-valued raw sums make cos == 0.85 an EXACT rational event
        // (dot^2*400 == 289*na*nb) that both engines evaluate one ulp
        // either side of 0.85 — threshold on round(cos, 6) so the ulp
        // can't flip membership (measured: 5 of ~180k sf0.1 pairs sit on
        // the exact boundary)
        val exact = graft.pipeline.Similarity.allPairsCosine(vecs,
            "doc_id", "vec", 0.8499)
          .filter(round(col("cos"), 6) >= 0.85)
          .select(col("id_a").as("__ea"), col("id_b").as("__eb"))
        exact.agg(count(lit(1)).as("n_exact_pairs"))
          .crossJoin(pairs.join(exact,
              col("__pa") === col("__ea") && col("__pb") === col("__eb"),
              "left_anti")
            .agg(count(lit(1)).as("__fp")))
          .select(col("n_exact_pairs"),
            (col("__fp") === 0).as("no_false_positives"))
      },
      Some("""WITH tok AS (SELECT doc_id, token
               FROM (SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS token
                 FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL)
               WHERE token <> ''),
             e AS (SELECT doc_id,
                 (('0x' || substr(md5(token), 1, 15))::UBIGINT % 64)::INT
                   AS pos,
                 CASE WHEN ('0x' || substr(md5(token), 16, 1))::UBIGINT % 2
                   = 0 THEN 1.0 ELSE -1.0 END AS sgn
               FROM tok),
             sums AS (SELECT doc_id, pos, sum(sgn) AS v FROM e
               WHERE 1 = 1 GROUP BY 1, 2 HAVING sum(sgn) <> 0),
             dots AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                 sum(a.v * b.v) AS dot
               FROM sums a JOIN sums b
                 ON a.pos = b.pos AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
             nrm AS (SELECT doc_id, sqrt(sum(v * v)) AS nm FROM sums
               GROUP BY 1)
             SELECT count(*)::BIGINT AS n_exact_pairs,
               true AS no_false_positives
             FROM dots JOIN nrm na ON na.doc_id = ia
             JOIN nrm nb ON nb.doc_id = ib
             WHERE round(dot / (na.nm * nb.nm), 6) >= 0.85"""),
      gateOnly = true),

    // ---- Per-source heavy tokens (grouped bounded-state sketch) -----------
    // one grouped MG aggregate + exact candidate recount: no group's full
    // token distribution ever shuffles; the oracle pays the full
    // (source, token) aggregate instead
    QueryDef("q_heavy_by_source",
      (s, d) => graft.pipeline.TextAnalysis.heavyTokensByGroup(
          documents(s, d), "source", "text", support = 0.004)
        .orderBy("source", "token"),
      Some("""WITH tt AS (SELECT source, token
               FROM (SELECT source,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS token
                 FROM documents
                 WHERE text IS NOT NULL AND source IS NOT NULL)
               WHERE token != ''),
             n AS (SELECT source, count(*)::DOUBLE AS nn FROM tt GROUP BY 1)
             SELECT tt.source, token, count(*)::BIGINT AS cnt
             FROM tt JOIN n USING (source)
             GROUP BY tt.source, token, n.nn
             HAVING count(*) >= greatest(ceil(0.004 * n.nn), 1)
             ORDER BY source, token""")),

    // ---- Zipf-law vocabulary fit (corpus health check) --------------------
    // rank assignment via range-sort + partition offsets (no global
    // window); oracle replays the fit with DuckDB's regr_* aggregates
    QueryDef("q_zipf_fit",
      (s, d) => graft.pipeline.TextAnalysis.zipfFit(
          documents(s, d), "doc_id", "text", minCount = 2)
        .select(round(col("slope"), 6).as("slope"),
          round(col("intercept"), 6).as("intercept"),
          round(col("r2"), 6).as("r2"), col("n_types")),
      Some("""WITH v AS (SELECT token, count(*)::BIGINT AS c
               FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+'))
                 AS token FROM documents
                 WHERE doc_id IS NOT NULL AND text IS NOT NULL)
               WHERE token != '' GROUP BY token HAVING count(*) >= 2),
             r AS (SELECT c,
               row_number() OVER (ORDER BY c DESC, token) AS rk FROM v)
             SELECT round(regr_slope(ln(c), ln(rk)), 6) AS slope,
               round(regr_intercept(ln(c), ln(rk)), 6) AS intercept,
               round(regr_r2(ln(c), ln(rk)), 6) AS r2,
               count(*)::BIGINT AS n_types FROM r""")),

    // ---- TF-IDF weights (smoothed, scikit convention) ---------------------
    // one explode + two hash aggregates; the df join is vocab-sized and
    // AQE-broadcast at this scale; N attaches as a broadcast scalar
    QueryDef("q_tfidf",
      (s, d) => graft.pipeline.Relevance.tfidf(
          documents(s, d), "doc_id", "text", minDf = 5)
        .select(col("doc_id"), col("token"), col("tf"), col("doc_freq"),
          round(col("tfidf"), 6).as("tfidf"))
        .orderBy("doc_id", "token"),
      Some("""WITH clean AS (SELECT doc_id, text FROM documents
               WHERE doc_id IS NOT NULL AND text IS NOT NULL),
             tok AS (SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS token
               FROM clean),
             tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
               WHERE token != '' GROUP BY 1, 2),
             dfreq AS (SELECT token, count(*) AS doc_freq FROM tf
               GROUP BY 1 HAVING count(*) >= 5),
             n AS (SELECT count(*) AS n FROM clean)
             SELECT tf.doc_id, tf.token, tf.tf, doc_freq,
               round(tf.tf * (ln((n.n + 1)::DOUBLE / (doc_freq + 1)) + 1), 6)
                 AS tfidf
             FROM tf JOIN dfreq USING (token), n
             ORDER BY doc_id, token""")),

    // ---- BM25 retrieval scores (targeted-subset mining) -------------------
    // token stream pruned to the query terms by a literal predicate BEFORE
    // the first shuffle; Lucene non-negative idf; k1=1.2, b=0.75
    QueryDef("q_bm25",
      (s, d) => graft.pipeline.Relevance.bm25(
          documents(s, d), "doc_id", "text", Seq("spark", "join"))
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy("doc_id"),
      Some("""WITH clean AS (SELECT doc_id, text FROM documents
               WHERE doc_id IS NOT NULL AND text IS NOT NULL),
             tok AS (SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS token
               FROM clean),
             lens AS (SELECT doc_id, count(*) AS len FROM tok
               WHERE token != '' GROUP BY 1),
             n AS (SELECT count(*) AS n FROM clean),
             avgdl AS (SELECT avg(len) AS avgdl FROM lens),
             qtf AS (SELECT doc_id, token, count(*) AS tf FROM tok
               WHERE token IN ('spark', 'join') GROUP BY 1, 2),
             dfreq AS (SELECT token, count(*) AS doc_freq FROM qtf GROUP BY 1)
             SELECT doc_id,
               round(sum(ln(1 + (n.n - doc_freq + 0.5) / (doc_freq + 0.5))
                 * tf * 2.2
                 / (tf + 1.2 * (1 - 0.75 + 0.75 * len / avgdl))), 6) AS score
             FROM qtf JOIN dfreq USING (token) JOIN lens USING (doc_id),
               n, avgdl
             GROUP BY doc_id ORDER BY doc_id""")),

    // ---- add-k bigram LM quality score (corpus self-scoring) --------------
    // the KenLM-shaped curation signal: mean bigram log-likelihood of each
    // doc under counts trained on the corpus itself; tokenization is
    // lowercased alphabetic runs so both engines' regex semantics coincide,
    // and the oracle replays counts, vocabulary, and smoothing verbatim
    QueryDef("q_lm_score",
      (s, d) => graft.pipeline.LanguageModel.lmScore(
          documents(s, d), "doc_id", "text", addK = 0.5)
        .select(col("doc_id"), col("n_bigrams"),
          round(col("lm_score"), 6).as("lm_score"))
        .orderBy("doc_id"),
      Some("""WITH toks AS (SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                 x -> x <> '') AS ts
               FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
             bi AS (SELECT doc_id, unnest(list_transform(range(len(ts)-1),
                 i -> {'w1': ts[i+1], 'w2': ts[i+2]})) AS bg
               FROM toks WHERE len(ts) >= 2),
             b AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM bi),
             c2 AS (SELECT w1, w2, count(*) AS c2 FROM b GROUP BY 1, 2),
             c1 AS (SELECT w1, count(*) AS c1 FROM b GROUP BY 1),
             v AS (SELECT count(DISTINCT tok) AS v FROM
               (SELECT unnest(ts) AS tok FROM toks)),
             ll AS (SELECT b.doc_id,
                 ln((c2.c2 + 0.5) / (c1.c1 + 0.5 * v.v)) AS ll
               FROM b JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
             SELECT doc_id, count(*)::BIGINT AS n_bigrams,
               round(avg(ll), 6) AS lm_score
             FROM ll GROUP BY doc_id ORDER BY doc_id""")),

    // ---- c-TF-IDF class topic terms ----------------------------------------
    // top-5 distinguishing terms per language class; scores round(6)
    // (ln + division ulps), ranks deterministic via the token tiebreak
    QueryDef("q_ctfidf",
      (s, d) => graft.pipeline.Relevance.classTfidf(
          documents(s, d), "lang", "text", topK = 5, minCount = 2)
        .select(col("lang"), col("token"), col("tf"), col("f_t"),
          round(col("ctfidf"), 6).as("ctfidf"), col("rank"))
        .orderBy("lang", "rank"),
      Some("""WITH toks AS (SELECT lang,
               unnest(list_filter(regexp_split_to_array(lower(text),
                 '[^a-z]+'), x -> x <> '')) AS token
               FROM documents
               WHERE lang IS NOT NULL AND text IS NOT NULL),
             full_tc AS (SELECT lang, token, count(*)::BIGINT AS tf
               FROM toks GROUP BY 1, 2),
             ft AS (SELECT token, sum(tf)::BIGINT AS f_t FROM full_tc
               GROUP BY 1),
             mass AS (SELECT lang, sum(tf)::BIGINT AS mass FROM full_tc
               GROUP BY 1),
             a AS (SELECT sum(mass)::DOUBLE / count(*) AS a FROM mass),
             scored AS (SELECT f.lang, f.token, f.tf, ft.f_t,
               (f.tf::DOUBLE / mass.mass) * ln(1.0 + a.a / ft.f_t)
                 AS ctfidf
               FROM full_tc f JOIN ft USING (token)
                 JOIN mass ON f.lang = mass.lang CROSS JOIN a
               WHERE f.tf >= 2),
             ranked AS (SELECT *, row_number() OVER (PARTITION BY lang
                 ORDER BY ctfidf DESC, token) AS rank FROM scored)
             SELECT lang, token, tf, f_t, round(ctfidf, 6) AS ctfidf,
               rank
             FROM ranked WHERE rank <= 5 ORDER BY lang, rank""")),

    // ---- add-k TRIGRAM LM quality score ------------------------------------
    // q_lm_score with one more order of context; the context count is
    // the trigram-prefix count (how often the bigram OPENS a trigram),
    // not the raw bigram count — the oracle derives both tables from
    // the same trigram CTE so the distinction is pinned
    QueryDef("q_lm_trigram",
      (s, d) => graft.pipeline.LanguageModel.trigramScore(
          documents(s, d), "doc_id", "text", addK = 0.5)
        .select(col("doc_id"), col("n_trigrams"),
          round(col("lm3_score"), 6).as("lm3_score"))
        .orderBy("doc_id"),
      Some("""WITH toks AS (SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                 x -> x <> '') AS ts
               FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
             tri AS (SELECT doc_id, unnest(list_transform(range(len(ts)-2),
                 i -> {'w1': ts[i+1], 'w2': ts[i+2], 'w3': ts[i+3]})) AS tg
               FROM toks WHERE len(ts) >= 3),
             t AS (SELECT doc_id, tg.w1 AS w1, tg.w2 AS w2, tg.w3 AS w3
               FROM tri),
             c3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM t GROUP BY 1, 2, 3),
             cc AS (SELECT w1, w2, count(*) AS cc FROM t GROUP BY 1, 2),
             v AS (SELECT count(DISTINCT tok) AS v FROM
               (SELECT unnest(ts) AS tok FROM toks)),
             ll AS (SELECT t.doc_id,
                 ln((c3.c3 + 0.5) / (cc.cc + 0.5 * v.v)) AS ll
               FROM t JOIN c3 USING (w1, w2, w3) JOIN cc USING (w1, w2)
                 CROSS JOIN v)
             SELECT doc_id, count(*)::BIGINT AS n_trigrams,
               round(avg(ll), 6) AS lm3_score
             FROM ll GROUP BY doc_id ORDER BY doc_id""")),

    // ---- deterministic upsampling (fractional replication) ----------------
    // per-group epochs: en 2.5x (2 copies + Bernoulli(0.5) third), fr 0.5x
    // (degrades to hashSample), other langs pass through once. The copy
    // decision reuses the Lehmer key the oracle replays in integer
    // arithmetic, and the fractional-part compare is IEEE-exact — the
    // full (doc_id, replica) set hash-matches
    QueryDef("q_upsample",
      (s, d) => graft.pipeline.Sampling.upsampleBy(documents(s, d),
          "doc_id", "lang", Map("en" -> 2.5, "fr" -> 0.5), seed = 11)
        .select(col("doc_id"), col("lang"), col("replica"))
        .orderBy("doc_id", "replica"),
      Some("""WITH f AS (SELECT doc_id, lang,
               CASE lang WHEN 'en' THEN 2.5 WHEN 'fr' THEN 0.5
                 ELSE 1.0 END AS fac
               FROM documents WHERE doc_id IS NOT NULL),
             s1 AS (SELECT doc_id, lang, fac,
               (doc_id % 2147483648 + (doc_id // 2147483648) * 48271)
                 % 2147483646 + 1 AS x FROM f),
             s2 AS (SELECT doc_id, lang, fac, ((x * 48271 % 2147483647)
               * 48271 % 2147483647) * 48271 % 2147483647 AS x3 FROM s1),
             s3 AS (SELECT doc_id, lang, fac,
               ((((x3 + 11) % 2147483646 + 1) * 48271 % 2147483647)
                 * 48271 % 2147483647)::DOUBLE / 2147483647.0 AS k FROM s2),
             n AS (SELECT doc_id, lang, (floor(fac) +
                 CASE WHEN k < fac - floor(fac) THEN 1 ELSE 0 END)::INT AS c
               FROM s3)
             SELECT doc_id, lang,
               unnest(generate_series(0, c - 1))::INT AS replica
             FROM n WHERE c > 0 ORDER BY doc_id, replica""")),

    // ---- PMI collocations (phrase detection) ------------------------------
    // adjacent pairs co-occurring beyond their unigram expectation:
    // pmi = ln((c12/N2) / ((c1/N1)(c2/N1))), bigram counts min-count
    // pruned BEFORE the joins. The only float is the final ln-ratio
    // (rounded); every count and both totals are integers the oracle
    // reproduces exactly
    QueryDef("q_collocations",
      (s, d) => graft.pipeline.LanguageModel.collocations(
          documents(s, d), "text", minCount = 10)
        .select(col("w1"), col("w2"), col("n_pair"),
          round(col("pmi"), 6).as("pmi"))
        .orderBy("w1", "w2"),
      Some("""WITH toks AS (SELECT list_filter(
               regexp_split_to_array(lower(text), '[^a-z]+'),
                 x -> x <> '') AS ts
               FROM documents WHERE text IS NOT NULL),
             b AS (SELECT unnest(list_transform(range(len(ts)-1),
                 i -> {'w1': ts[i+1], 'w2': ts[i+2]})) AS bg
               FROM toks WHERE len(ts) >= 2),
             bb AS (SELECT bg.w1 AS w1, bg.w2 AS w2 FROM b),
             c12 AS (SELECT w1, w2, count(*) AS n_pair FROM bb
               GROUP BY 1, 2 HAVING count(*) >= 10),
             uni AS (SELECT tok, count(*) AS n_w FROM
               (SELECT unnest(ts) AS tok FROM toks) GROUP BY 1),
             t AS (SELECT sum(len(ts))::BIGINT AS n1,
               sum(greatest(len(ts) - 1, 0))::BIGINT AS n2 FROM toks)
             SELECT w1, w2, n_pair::BIGINT AS n_pair,
               round(ln((n_pair::DOUBLE / n2::DOUBLE) /
                 ((u1.n_w::DOUBLE / n1::DOUBLE) *
                  (u2.n_w::DOUBLE / n1::DOUBLE))), 6) AS pmi
             FROM c12 JOIN uni u1 ON u1.tok = w1
               JOIN uni u2 ON u2.tok = w2 CROSS JOIN t
             ORDER BY w1, w2""")),

    // ---- DSIR importance weights (Xie et al. 2023) ------------------------
    // hashed-n-gram importance log-ratio of every doc: target = the 'en'
    // slice, raw = the whole corpus. Feature hashing on the md5 basis
    // DuckDB replays bit-for-bit; logw rounded at 1e-6 (sums of O(1)
    // doubles; cross-engine error ~1e-12)
    QueryDef("q_dsir",
      (s, d) => {
        val docs = documents(s, d)
        graft.pipeline.Dsir.dsirScores(docs,
            docs.filter(col("lang") === "en"), "doc_id", "text")
          .select(col("doc_id"), col("n_grams"),
            round(col("dsir_logw"), 6).as("dsir_logw"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                 x -> x <> '') AS ts, lang
               FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
             grams AS (
               SELECT doc_id, lang, unnest(ts) AS g FROM toks
               UNION ALL
               SELECT doc_id, lang, unnest(list_transform(range(len(ts)-1),
                   i -> ts[i+1] || ' ' || ts[i+2])) AS g
                 FROM toks WHERE len(ts) >= 2),
             gb AS (SELECT doc_id, lang,
                 ('0x' || substr(md5(g), 1, 15))::UBIGINT % 10000 AS b
               FROM grams),
             db AS (SELECT doc_id, b, count(*) AS c FROM gb GROUP BY 1, 2),
             qc AS (SELECT b, sum(c)::BIGINT AS cq FROM db GROUP BY 1),
             pc AS (SELECT b, count(*)::BIGINT AS cp FROM gb
               WHERE lang = 'en' GROUP BY 1),
             tot AS (SELECT (SELECT sum(cq) FROM qc)::DOUBLE AS tq,
               (SELECT coalesce(sum(cp), 0) FROM pc)::DOUBLE AS tp),
             w AS (SELECT qc.b,
                 ln((coalesce(pc.cp, 0) + 0.5) / (tot.tp + 0.5 * 10000)) -
                 ln((qc.cq + 0.5) / (tot.tq + 0.5 * 10000)) AS w
               FROM qc LEFT JOIN pc USING (b) CROSS JOIN tot)
             SELECT db.doc_id, sum(c)::BIGINT AS n_grams,
               round(sum(c * w), 6) AS dsir_logw
             FROM db JOIN w USING (b) GROUP BY 1 ORDER BY doc_id""")),

    // ---- DSIR Gumbel-top-k resample (deterministic) -----------------------
    // the selection step: top-k by logw + Gumbel noise derived from
    // md5(id:seed) — sampling without replacement with P ∝ exp(logw),
    // reproducible across runs AND engines, so the SELECTED SET itself is
    // the oracle contract (both sides break gumbel_key ties on doc_id)
    QueryDef("q_dsir_sample",
      (s, d) => {
        val docs = documents(s, d)
        graft.pipeline.Dsir.dsirResample(docs,
            docs.filter(col("lang") === "en"), "doc_id", "text", k = 50)
          .select(col("doc_id"), col("n_grams"),
            round(col("dsir_logw"), 6).as("dsir_logw"),
            round(col("gumbel_key"), 6).as("gumbel_key"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                 x -> x <> '') AS ts, lang
               FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
             grams AS (
               SELECT doc_id, lang, unnest(ts) AS g FROM toks
               UNION ALL
               SELECT doc_id, lang, unnest(list_transform(range(len(ts)-1),
                   i -> ts[i+1] || ' ' || ts[i+2])) AS g
                 FROM toks WHERE len(ts) >= 2),
             gb AS (SELECT doc_id, lang,
                 ('0x' || substr(md5(g), 1, 15))::UBIGINT % 10000 AS b
               FROM grams),
             db AS (SELECT doc_id, b, count(*) AS c FROM gb GROUP BY 1, 2),
             qc AS (SELECT b, sum(c)::BIGINT AS cq FROM db GROUP BY 1),
             pc AS (SELECT b, count(*)::BIGINT AS cp FROM gb
               WHERE lang = 'en' GROUP BY 1),
             tot AS (SELECT (SELECT sum(cq) FROM qc)::DOUBLE AS tq,
               (SELECT coalesce(sum(cp), 0) FROM pc)::DOUBLE AS tp),
             w AS (SELECT qc.b,
                 ln((coalesce(pc.cp, 0) + 0.5) / (tot.tp + 0.5 * 10000)) -
                 ln((qc.cq + 0.5) / (tot.tq + 0.5 * 10000)) AS w
               FROM qc LEFT JOIN pc USING (b) CROSS JOIN tot),
             s AS (SELECT db.doc_id, sum(c)::BIGINT AS n_grams,
                 sum(c * w) AS logw
               FROM db JOIN w USING (b) GROUP BY 1),
             g AS (SELECT doc_id, n_grams, logw,
                 logw - ln(-ln(least(
                   (('0x' || substr(md5(doc_id::VARCHAR || ':42'), 1, 15))
                      ::UBIGINT + 1) / 1152921504606846976.0,
                   1 - 1e-12))) AS gumbel_key
               FROM s),
             sel AS (SELECT * FROM g
               ORDER BY gumbel_key DESC, doc_id LIMIT 50)
             SELECT doc_id, n_grams, round(logw, 6) AS dsir_logw,
               round(gumbel_key, 6) AS gumbel_key
             FROM sel ORDER BY doc_id""")),

    // ---- Jensen–Shannon token-distribution divergence ---------------------
    // distributional drift for TEXT (companion of q_psi's numeric PSI):
    // JS between two corpus slices' token shares, 0·ln0 = 0 convention —
    // no smoothing constant, bounded by ln 2
    QueryDef("q_token_divergence",
      (s, d) => {
        val docs = documents(s, d)
        graft.pipeline.LanguageModel.tokenJsDivergence(
            docs.filter(col("lang") === "en"),
            docs.filter(col("lang") === "de"), "text")
          .select(round(col("js"), 6).as("js"), col("vocab_a"), col("vocab_b"))
      },
      Some("""WITH ta AS (SELECT unnest(list_filter(
                 regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> ''))
                 AS tok FROM documents WHERE text IS NOT NULL AND lang = 'en'),
             tb AS (SELECT unnest(list_filter(
                 regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> ''))
                 AS tok FROM documents WHERE text IS NOT NULL AND lang = 'de'),
             ca AS (SELECT tok, count(*) AS n_a FROM ta GROUP BY 1),
             cb AS (SELECT tok, count(*) AS n_b FROM tb GROUP BY 1),
             j AS (SELECT coalesce(ca.tok, cb.tok) AS tok,
                 coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
               FROM ca FULL OUTER JOIN cb ON ca.tok = cb.tok),
             t AS (SELECT greatest(sum(n_a)::DOUBLE, 1.0) AS t_a,
                 greatest(sum(n_b)::DOUBLE, 1.0) AS t_b FROM j)
             SELECT round(sum(
                 CASE WHEN n_a > 0 THEN (n_a/t_a) *
                   ln((n_a/t_a) / ((n_a/t_a + n_b/t_b)/2)) ELSE 0 END * 0.5
               + CASE WHEN n_b > 0 THEN (n_b/t_b) *
                   ln((n_b/t_b) / ((n_a/t_a + n_b/t_b)/2)) ELSE 0 END * 0.5
               ), 6) AS js,
               sum(CASE WHEN n_a > 0 THEN 1 ELSE 0 END)::BIGINT AS vocab_a,
               sum(CASE WHEN n_b > 0 THEN 1 ELSE 0 END)::BIGINT AS vocab_b
             FROM j, t""")),

    // ---- reproducible hash sampling (partitioning-independent) ------------
    // membership = Lehmer hash of the id, reproduced VERBATIM in the oracle
    // arithmetic — the decision is provably engine-independent
    QueryDef("q_hash_sample",
      (s, d) => graft.pipeline.Sampling.hashSample(
          documents(s, d), "doc_id", 0.2, seed = 7)
        .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum")),
      Some("""WITH s1 AS (SELECT doc_id,
               (doc_id % 2147483648 + (doc_id // 2147483648) * 48271)
                 % 2147483646 + 1 AS x FROM documents),
             s2 AS (SELECT doc_id, ((x * 48271 % 2147483647)
               * 48271 % 2147483647) * 48271 % 2147483647 AS x3 FROM s1),
             s3 AS (SELECT doc_id,
               ((((x3 + 7) % 2147483646 + 1) * 48271 % 2147483647)
                 * 48271 % 2147483647)::DOUBLE / 2147483647.0 AS k FROM s2)
             SELECT count(*)::BIGINT AS n, sum(doc_id)::BIGINT AS id_sum
             FROM s3 WHERE k < 0.2""")),

    // ---- temperature rebalancing (multilingual exponent smoothing) --------
    // per-group keep prob min(1, scale * share^(alpha-1)); oracle replays
    // the share computation + the Lehmer hash verbatim
    QueryDef("q_temperature_sample",
      (s, d) => graft.pipeline.Sampling.temperatureSample(
          documents(s, d), "doc_id", "source", alpha = 0.5, scale = 0.05,
          seed = 13)
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"))
        .orderBy("source"),
      Some("""WITH cnt AS (SELECT source, count(*)::DOUBLE AS n
               FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL
               GROUP BY source),
             tot AS (SELECT sum(n) AS nn FROM cnt),
             q AS (SELECT source, least(1.0, 0.05 * pow(n / nn, -0.5)) AS q
               FROM cnt, tot),
             s1 AS (SELECT doc_id, source,
               (doc_id % 2147483648 + (doc_id // 2147483648) * 48271)
                 % 2147483646 + 1 AS x FROM documents
               WHERE doc_id IS NOT NULL AND source IS NOT NULL),
             s2 AS (SELECT doc_id, source, ((x * 48271 % 2147483647)
               * 48271 % 2147483647) * 48271 % 2147483647 AS x3 FROM s1),
             s3 AS (SELECT doc_id, source,
               ((((x3 + 13) % 2147483646 + 1) * 48271 % 2147483647)
                 * 48271 % 2147483647)::DOUBLE / 2147483647.0 AS k FROM s2)
             SELECT s3.source, count(*)::BIGINT AS n,
               sum(doc_id)::BIGINT AS id_sum
             FROM s3 JOIN q ON s3.source = q.source WHERE k < q.q
             GROUP BY s3.source ORDER BY s3.source""")),

    // ---- Deterministic epoch shuffle (training order) ---------------------
    // (shard, pos) is a reproducible pseudorandom permutation keyed on
    // md5(id:epoch:seed) — one projection + one shard-keyed window; the
    // oracle replays the permutation bit-for-bit
    QueryDef("q_epoch_shuffle",
      (s, d) => graft.pipeline.Sampling.epochShuffle(
          documents(s, d), "doc_id", epoch = 1, numShards = 8, seed = 7)
        .select(col("doc_id"), col("shard"), col("order_key"), col("pos"))
        .orderBy("doc_id"),
      Some("""WITH h AS (SELECT doc_id,
               ('0x' || substr(md5(doc_id::VARCHAR || ':1:7'), 1, 15))
                 ::UBIGINT AS h
               FROM documents WHERE doc_id IS NOT NULL)
             SELECT doc_id, (h % 8)::BIGINT AS shard, h::BIGINT AS order_key,
               (row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id)
                 - 1)::BIGINT AS pos
             FROM h ORDER BY doc_id""")),

    // ---- Snapshot diff (incremental re-crawl delta) -----------------------
    // old = even ids, new = ids not div by 3 with text edited on ids div
    // by 5: ids hit every status class; both sides reduce to (id, md5)
    // before the one full-outer join
    QueryDef("q_snapshot_diff",
      (s, d) => {
        val base = documents(s, d)
        val old = base.filter(col("doc_id") % 2 === 0)
        val neu = base.filter(col("doc_id") % 3 =!= 0)
          .withColumn("text", when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text")))
        graft.pipeline.Snapshot.diff(old, neu, "doc_id", "text")
          .orderBy("doc_id")
      },
      Some("""WITH o AS (SELECT doc_id, coalesce(md5(text), '') AS fp
               FROM documents WHERE doc_id % 2 = 0),
             n AS (SELECT doc_id, coalesce(md5(CASE WHEN doc_id % 5 = 0
                 THEN text || ' v2' ELSE text END), '') AS fp
               FROM documents WHERE doc_id % 3 != 0)
             SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN o.fp = n.fp THEN 'unchanged'
                    ELSE 'changed' END AS status
             FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
             ORDER BY doc_id""")),

    QueryDef("q_snapshot_report",
      (s, d) => {
        val base = documents(s, d)
        val old = base.filter(col("doc_id") % 2 === 0)
        val neu = base.filter(col("doc_id") % 3 =!= 0)
          .withColumn("text", when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text")))
        graft.pipeline.Snapshot.diffReport(old, neu, "doc_id", "text")
          .orderBy("status")
      },
      Some("""WITH o AS (SELECT doc_id, coalesce(md5(text), '') AS fp
               FROM documents WHERE doc_id % 2 = 0),
             n AS (SELECT doc_id, coalesce(md5(CASE WHEN doc_id % 5 = 0
                 THEN text || ' v2' ELSE text END), '') AS fp
               FROM documents WHERE doc_id % 3 != 0)
             SELECT status, count(*)::BIGINT AS n FROM (
               SELECT CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN o.fp = n.fp THEN 'unchanged'
                    ELSE 'changed' END AS status
               FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
             GROUP BY status ORDER BY status""")),
  )
}
