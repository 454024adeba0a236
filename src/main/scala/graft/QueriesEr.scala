package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.agg.Stats
import graft.clean.Clean
import graft.core.HandyFrame
import graft.ml.{HandyFencer, HandyImputer}
import graft.plotdata.PlotData
import graft.strata.{Bucket, ColStratum, Quantile, StratifiedFrame}

/** Gate tier 8/9 — ER + retrieval + ingestion tier: Jaro-Winkler/SNM/multi-pass ER, rank fusion, JSONL/text ingestion, semi-structured, experimentation guards, data-quality checks, CDC, streaming twins.
  *
  * Split from the 11k-line Queries.scala (r11 VERDICT #8): pure
  * relocation, zero semantic movement — [[Queries.defs]] concatenates
  * the nine tiers in the original order and the duplicate-name guard
  * still covers the whole set. All determinism rules live in the
  * [[Queries]] scaladoc; table readers and shared contracts in
  * [[QueryHelpers]]. 35 queries. */
private[graft] object QueriesEr {
  import QueryHelpers._

  val defs: Seq[QueryDef] = Seq(

    // ---- Jaro-Winkler native expression (cross-engine scalar check) --------
    // each supplier name scored against its successor's name and a
    // char-dropped mutation of itself; the oracle is DuckDB's own
    // jaro_similarity / jaro_winkler_similarity — a genuine independent
    // implementation of the same standard, agreeing under round(6).
    // Successor lookup via RangeLead (distributed range-sort handoff) —
    // an ORDER BY-only window here would funnel the whole supplier
    // table through one partition (s_suppkey is unique, so the result
    // is bit-identical to SQL lead)
    QueryDef("q_jaro",
      (s, d) => {
        val sup = graft.util.RangeLead.lead1(
            s.read.parquet(s"$d/supplier.parquet")
              .select(col("s_suppkey"), col("s_name")),
            Seq("s_suppkey"), Seq("s_name"))
          .withColumnRenamed("__lead_s_name", "next_name")
          .withColumn("mut_name",
            concat(substring(col("s_name"), 1, 2),
              substring(col("s_name"), 4, 1000000)))
          .filter(col("next_name").isNotNull)
        sup.select(col("s_suppkey"),
            round(graft.expr.JaroWinkler.of(col("s_name"),
              col("next_name")), 6).as("jaro_next"),
            round(graft.expr.JaroWinkler.winkler(col("s_name"),
              col("next_name")), 6).as("jw_next"),
            round(graft.expr.JaroWinkler.winkler(col("s_name"),
              col("mut_name")), 6).as("jw_mut"))
          .orderBy("s_suppkey")
      },
      Some("""WITH sup AS (SELECT s_suppkey, s_name,
               lead(s_name) OVER (ORDER BY s_suppkey) AS next_name,
               concat(substr(s_name, 1, 2), substr(s_name, 4)) AS mut_name
               FROM supplier)
             SELECT s_suppkey,
               round(jaro_similarity(s_name, next_name), 6) AS jaro_next,
               round(jaro_winkler_similarity(s_name, next_name), 6)
                 AS jw_next,
               round(jaro_winkler_similarity(s_name, mut_name), 6) AS jw_mut
             FROM sup WHERE next_name IS NOT NULL ORDER BY s_suppkey""")),

    // ---- margin-based best-match mining (LASER/CCMatrix criterion) --------
    // hub-discounted best match for 30 query vectors against the rest;
    // both neighborhood means and the final margin ranking replayed in
    // SQL; cos/margin round(6) (cosine + small-avg engine ulps)
    QueryDef("q_margin_mine",
      (s, d) => {
        val e = embeddings(s, d)
        graft.pipeline.Similarity.marginMatches(
            e.filter(col("vec_id") < 30), "vec_id", "embedding",
            e.filter(col("vec_id") >= 30), "vec_id", "embedding", k = 4)
          .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"),
            round(col("margin"), 6).as("margin"))
          .orderBy("id_a")
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                 FROM embeddings),
             a AS (SELECT vec_id AS id_a, v FROM e WHERE vec_id < 30),
             b AS (SELECT vec_id AS id_b, v FROM e WHERE vec_id >= 30),
             p AS (SELECT id_a, id_b,
               list_cosine_similarity(a.v, b.v) AS cos FROM a, b),
             ra AS (SELECT id_a, id_b, cos, row_number()
                 OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS r
               FROM p),
             nx AS (SELECT id_a, avg(cos) AS nnx FROM ra WHERE r <= 4
               GROUP BY 1),
             rb AS (SELECT id_a, id_b, cos, row_number()
                 OVER (PARTITION BY id_b ORDER BY cos DESC, id_a) AS r
               FROM p),
             ny AS (SELECT id_b, avg(cos) AS nny FROM rb WHERE r <= 4
               GROUP BY 1),
             m AS (SELECT p.id_a, p.id_b, cos,
               cos / nullif((nnx + nny) / 2.0, 0) AS margin
               FROM p JOIN nx USING (id_a) JOIN ny USING (id_b)
               WHERE cos / nullif((nnx + nny) / 2.0, 0) IS NOT NULL),
             best AS (SELECT *, row_number() OVER (PARTITION BY id_a
                 ORDER BY margin DESC, id_b) AS rn FROM m)
             SELECT id_a, id_b, round(cos, 6) AS cos,
               round(margin, 6) AS margin
             FROM best WHERE rn = 1 ORDER BY id_a""")),

    // ---- per-doc character entropy (native codegen'd expression) -----------
    // codepoint-distribution Shannon entropy; both engines group the
    // same codepoint multiset, sum orders differ -> round(6)
    QueryDef("q_char_entropy",
      (s, d) => documents(s, d)
        .filter(col("text").isNotNull && length(col("text")) > 0)
        .select(col("doc_id"),
          round(graft.expr.CharEntropy.of(col("text")), 6)
            .as("char_entropy"))
        .orderBy("doc_id"),
      Some("""WITH ch AS (SELECT doc_id,
               unnest(regexp_split_to_array(text, '')) AS c
               FROM documents
               WHERE text IS NOT NULL AND len(text) > 0),
             cc AS (SELECT doc_id, c, count(*) AS k FROM ch
               WHERE c != '' GROUP BY 1, 2),
             n AS (SELECT doc_id, sum(k) AS n FROM cc GROUP BY 1)
             SELECT cc.doc_id,
               round(-sum((k::DOUBLE / n.n) * log2(k::DOUBLE / n.n)), 6)
                 AS char_entropy
             FROM cc JOIN n USING (doc_id)
             GROUP BY cc.doc_id ORDER BY cc.doc_id""")),

    // ---- MMR diversified re-ranking ----------------------------------------
    // top-8 cosine candidates per query re-ranked by maximal marginal
    // relevance, k = 3, λ = 0.7; the oracle UNROLLS the three greedy
    // steps (step-1 argmax, then penalty = 0.3·max cos to the selected
    // set, recomputed per step) — scores round(6), selection itself is
    // argmax over well-separated scores with doc-id tie-break
    QueryDef("q_mmr",
      (s, d) => {
        val e = embeddings(s, d)
        val q = e.filter(col("vec_id") < 3)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(col("rel").desc, col("doc_id"))
        val cands = e.filter(col("vec_id") >= 3).crossJoin(broadcast(q))
          .select(col("query_id"), col("vec_id").as("doc_id"),
            graft.pipeline.Dedup.cosine(col("embedding"), col("qv"))
              .as("rel"),
            col("embedding"))
          .withColumn("__r", row_number().over(w))
          .filter(col("__r") <= 8).drop("__r")
        graft.pipeline.Similarity.mmrRerank(cands, "query_id", "doc_id",
            "rel", "embedding", k = 3, lambda = 0.7)
          .select(col("query_id"), col("doc_id"),
            round(col("rel"), 6).as("rel"),
            round(col("mmr_score"), 6).as("mmr_score"), col("mmr_rank"))
          .orderBy("query_id", "mmr_rank")
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                 FROM embeddings),
             q AS (SELECT vec_id AS query_id, v AS qv FROM e
               WHERE vec_id < 3),
             c0 AS (SELECT query_id, e.vec_id AS doc_id,
               list_cosine_similarity(e.v, qv) AS rel, e.v AS v
               FROM e, q WHERE e.vec_id >= 3),
             c AS (SELECT * FROM (SELECT *, row_number() OVER (
                 PARTITION BY query_id ORDER BY rel DESC, doc_id) AS r
               FROM c0) WHERE r <= 8),
             s1 AS (SELECT * FROM (SELECT query_id, doc_id, rel, v,
                 0.7 * rel AS score, row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY 0.7 * rel DESC, doc_id) AS rn FROM c)
               WHERE rn = 1),
             s2 AS (SELECT * FROM (SELECT c.query_id, c.doc_id, c.rel,
                 c.v,
                 0.7 * c.rel - 0.3 * list_cosine_similarity(c.v, s1.v)
                   AS score,
                 row_number() OVER (PARTITION BY c.query_id ORDER BY
                   0.7 * c.rel - 0.3 * list_cosine_similarity(c.v, s1.v)
                     DESC, c.doc_id) AS rn
               FROM c JOIN s1 ON c.query_id = s1.query_id
                 AND c.doc_id != s1.doc_id)
               WHERE rn = 1),
             s3 AS (SELECT * FROM (SELECT c.query_id, c.doc_id, c.rel,
                 0.7 * c.rel - 0.3 * greatest(
                   list_cosine_similarity(c.v, s1.v),
                   list_cosine_similarity(c.v, s2.v)) AS score,
                 row_number() OVER (PARTITION BY c.query_id ORDER BY
                   0.7 * c.rel - 0.3 * greatest(
                     list_cosine_similarity(c.v, s1.v),
                     list_cosine_similarity(c.v, s2.v)) DESC,
                   c.doc_id) AS rn
               FROM c JOIN s1 ON c.query_id = s1.query_id
                 AND c.doc_id != s1.doc_id
               JOIN s2 ON c.query_id = s2.query_id
                 AND c.doc_id != s2.doc_id)
               WHERE rn = 1)
             SELECT query_id, doc_id, round(rel, 6) AS rel,
               round(score, 6) AS mmr_score, 1 AS mmr_rank FROM s1
             UNION ALL SELECT query_id, doc_id, round(rel, 6),
               round(score, 6), 2 FROM s2
             UNION ALL SELECT query_id, doc_id, round(rel, 6),
               round(score, 6), 3 FROM s3
             ORDER BY query_id, mmr_rank""")),

    // ---- embedding drift: cosine histogram vs a reference sample ----------
    // every M-th vector is the broadcast reference panel; the rest stream
    // through a broadcast-nested-loop + bins-bounded aggregate. Cosines
    // round to 6 decimals BEFORE binning so the bin edges replay across
    // engines; bin edges are the identical (-1 + 2·b/B) arithmetic.
    // M tracks corpus size (max(50, n/500) — a FIXED modulus makes the
    // reference a fixed FRACTION of the corpus, so the cross mass is
    // 0.02·n², quadratic: 784M cosines / 46 s at the 100× corpus; a
    // ~500-row panel keeps it n·500, linear, which is also the real
    // drift-detection semantic — the reference snapshot doesn't grow
    // with the corpus being screened). M resolves to 50 at every gate
    // SF, and the oracle replays the SAME count-derived modulus via a
    // scalar subquery, so the row stays hash-exact at ANY scale.
    QueryDef("q_cos_drift",
      (s, d) => {
        val e = embeddings(s, d)
        val m = math.max(50L, e.count() / 500L)
        graft.pipeline.Similarity.cosineHistogram(
            e.filter(col("vec_id") % m =!= 0), "vec_id", "embedding",
            e.filter(col("vec_id") % m === 0), "vec_id", "embedding",
            bins = 20)
          .orderBy("bin")
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                 FROM embeddings),
             mm AS (SELECT greatest(50, count(*) // 500) AS m FROM e),
             r AS (SELECT v FROM e, mm WHERE vec_id % m = 0),
             c AS (SELECT v FROM e, mm WHERE vec_id % m != 0),
             p AS (SELECT least(floor(
                 (round(list_cosine_similarity(c.v, r.v), 6) + 1.0)
                   / 2.0 * 20), 19)::INT AS bin
               FROM c, r),
             h AS (SELECT bin, count(*)::BIGINT AS n FROM p GROUP BY 1)
             SELECT b.bin::INT AS bin,
               -1.0 + 2.0 * b.bin / 20 AS lo,
               -1.0 + 2.0 * (b.bin + 1) / 20 AS hi,
               coalesce(n, 0)::BIGINT AS n
             FROM range(20) b(bin) LEFT JOIN h ON b.bin = h.bin
             ORDER BY 1""")),

    // ---- Jaro-Winkler blocked ER pairs -------------------------------------
    // ESCALATING prefix blocking (first 4 chars; blocks over maxBlock=100
    // rows re-block on the first 12 chars — the r11 VERDICT's Σ block²
    // decade fix: pair mass stays ≤ n·maxBlock instead of growing
    // quadratically as combination part-name prefixes crowd with the
    // corpus) + native codegen'd JW scoring. The escalation predicate is
    // a pure function of block sizes, so the oracle replays the whole
    // two-level keying (c1 → CASE → c2 → keep) and DuckDB's own
    // jaro_winkler_similarity — candidate sets coincide exactly and only
    // the score needs the round(6) engine-ulp guard. Threshold 0.92 sits
    // far from any pair's score at every SF (probed). At the gate SFs no
    // block exceeds 100 rows, so the pair set equals the plain-blocking
    // r11 output; escalation engages (and is measured) at sf1d+.
    QueryDef("q_jw_pairs",
      (s, d) => graft.pipeline.FuzzyJoin.jaroWinklerPairs(
          s.read.parquet(s"$d/part.parquet").filter(col("p_size") <= 3),
          "p_partkey", "p_name", minSim = 0.92, blockLen = 4,
          maxBlock = 100, escalateLen = 12)
        .select(col("id_a"), col("id_b"), round(col("jw"), 6).as("jw"))
        .orderBy("id_a", "id_b"),
      Some("""WITH p AS (SELECT p_partkey AS id, p_name AS s
               FROM part
               WHERE p_size <= 3 AND p_partkey IS NOT NULL
                 AND p_name IS NOT NULL),
             c1 AS (SELECT substr(s, 1, 4) AS b1, count(*) AS n1
               FROM p GROUP BY 1),
             k AS (SELECT p.id, p.s, substr(p.s, 1, 4) AS b1,
               CASE WHEN c1.n1 > 100 THEN substr(p.s, 1, 12)
                 ELSE '' END AS b2
               FROM p JOIN c1 ON substr(p.s, 1, 4) = c1.b1),
             c2 AS (SELECT b1, b2, count(*) AS n2 FROM k GROUP BY 1, 2),
             kk AS (SELECT k.id, k.s, k.b1, k.b2 FROM k
               JOIN c2 USING (b1, b2) WHERE c2.n2 <= 100)
             SELECT a.id AS id_a, b.id AS id_b,
               round(jaro_winkler_similarity(a.s, b.s), 6) AS jw
             FROM kk a JOIN kk b
               ON a.b1 = b.b1 AND a.b2 = b.b2 AND a.id < b.id
             WHERE jaro_winkler_similarity(a.s, b.s) >= 0.92
             ORDER BY 1, 2""")),

    // ---- JW skipped-blocks report (the maxBlock recall loss as DATA) ------
    // jaroWinklerSkippedBlocks with a cap tiny enough that skipping FIRES
    // at the gate SFs (first-char blocks of all part names → every block
    // over 5 rows escalates to the 2-char prefix, whose sub-blocks are
    // still over the cap and land in the report). Oracle replays the
    // two-level size predicate verbatim — the report is exactly the rows
    // the pairs path would drop, pinned as data per the r11 VERDICT
    // (silent-cap audit). At sf0.001 some level-2 blocks dip under the
    // cap; the predicate replay keeps both sides identical regardless.
    QueryDef("q_jw_skipped",
      (s, d) => graft.pipeline.FuzzyJoin.jaroWinklerSkippedBlocks(
          s.read.parquet(s"$d/part.parquet"),
          "p_partkey", "p_name", blockLen = 1, maxBlock = 5,
          escalateLen = 2)
        .orderBy("block", "level"),
      Some("""WITH p AS (SELECT p_partkey AS id, p_name AS s FROM part
               WHERE p_partkey IS NOT NULL AND p_name IS NOT NULL),
             c1 AS (SELECT substr(s, 1, 1) AS b1, count(*) AS n1
               FROM p GROUP BY 1),
             k AS (SELECT p.id, p.s, substr(p.s, 1, 1) AS b1,
               CASE WHEN c1.n1 > 5 THEN substr(p.s, 1, 2)
                 ELSE '' END AS b2,
               CASE WHEN c1.n1 > 5 THEN 2 ELSE 1 END AS lvl
               FROM p JOIN c1 ON substr(p.s, 1, 1) = c1.b1),
             c2 AS (SELECT b1, b2, lvl, count(*) AS n2
               FROM k GROUP BY 1, 2, 3)
             SELECT CASE WHEN lvl = 1 THEN b1 ELSE b2 END AS block,
               lvl::INT AS level, n2::BIGINT AS n_rows
             FROM c2 WHERE n2 > 5
             ORDER BY block, level""")),

    // ---- sorted-neighborhood near-dup pairs (SNM, multi-pass ER) ----------
    // the adjacency-in-sort companion to q_jw_pairs' prefix blocking:
    // global rank over (lower(name), id) via the RangeCum partition-offset
    // scaffold (no single-partition window), rank-gap <= window-1 pairs
    // exact-scored with the native JW expression. Deterministic pair set
    // (id tie-break), so the oracle replays rank + join + score whole
    QueryDef("q_sorted_neighborhood",
      (s, d) => graft.pipeline.FuzzyJoin.sortedNeighborhood(
          s.read.parquet(s"$d/part.parquet"),
          "p_partkey", "p_name", keyCol = lower(col("__s")),
          window = 6, minSim = 0.9)
        .select(col("id_a"), col("id_b"), round(col("jw"), 6).as("jw"))
        .orderBy("id_a", "id_b"),
      Some("""WITH s AS (SELECT p_partkey AS id, p_name AS str,
               lower(p_name) AS k FROM part
               WHERE p_partkey IS NOT NULL AND p_name IS NOT NULL),
             r AS (SELECT id, str,
               row_number() OVER (ORDER BY k, id) AS rk FROM s),
             p AS (SELECT a.id AS ia, b.id AS ib,
               jaro_winkler_similarity(a.str, b.str) AS jw
               FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 5)
             SELECT least(ia, ib) AS id_a, greatest(ia, ib) AS id_b,
               round(jw, 6) AS jw
             FROM p WHERE jw >= 0.9 ORDER BY id_a, id_b""")),

    // ---- raw-corpus ingestion: JSONL round-trip ----------------------------
    // the pipeline's missing FIRST stage (r11 VERDICT #6): documents
    // serialized to newline-delimited JSON on disk, read back through
    // Ingest.readJsonl with bounded-sample schema inference + PERMISSIVE
    // policy, compared row-for-row against the parquet source — a
    // lossless round-trip pins the reader end to end (types, escaping,
    // unicode) with the oracle reading the untouched parquet side
    QueryDef("q_jsonl_read",
      (s, d) => {
        val path =
          graft.util.Scratch.named(
          s"graft_ingest/${new java.io.File(d).getName}/docs_jsonl")
        documents(s, d).write.mode("overwrite").json(path)
        graft.sources.Ingest.readJsonl(s, path)
          .select("doc_id", "lang", "n_chars", "source", "text")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang, n_chars, source, text
             FROM documents ORDER BY doc_id""")),

    // ---- JSONL corrupt-record policy (gzip shards) --------------------------
    // a deterministic doc_id % 37 slice of lines is written BROKEN (junk
    // prefix) into gzip-compressed shards; PERMISSIVE + corruptReport
    // must surface exactly that slice as n_corrupt, and a DROPMALFORMED
    // re-read must keep exactly the complement — malformed input as
    // auditable DATA, the engine-wide silent-cap rule. count(doc_id)
    // (not count(*)) forces the DROPMALFORMED scan to actually parse
    // (an empty required schema lets the JSON reader count raw lines)
    QueryDef("q_jsonl_corrupt",
      (s, d) => {
        val path =
          graft.util.Scratch.named(
          s"graft_ingest/${new java.io.File(d).getName}/docs_jsonl_gz")
        val docs = documents(s, d)
        val line = to_json(struct(docs.columns.map(col): _*))
        docs.select(
            when(pmod(col("doc_id"), lit(37)) === 0,
              concat(lit("{oops "), line)).otherwise(line).as("value"))
          .write.mode("overwrite").option("compression", "gzip").text(path)
        val schema = Some(docs.schema)
        val rep = graft.sources.Ingest.corruptReport(
          graft.sources.Ingest.readJsonl(s, path, schema))
        val dropped = graft.sources.Ingest
          .readJsonl(s, path, schema, mode = "DROPMALFORMED")
          .agg(count(col("doc_id")).as("n_dropmalformed"))
        rep.crossJoin(dropped)
      },
      Some("""SELECT count(*)::BIGINT AS n_rows,
             sum(CASE WHEN doc_id % 37 = 0 THEN 1 ELSE 0 END)::BIGINT
               AS n_corrupt,
             sum(CASE WHEN doc_id % 37 <> 0 THEN 1 ELSE 0 END)::BIGINT
               AS n_good,
             sum(CASE WHEN doc_id % 37 <> 0 THEN 1 ELSE 0 END)::BIGINT
               AS n_dropmalformed
             FROM documents""")),

    // ---- text-shard ingestion: one doc per line, id = (file, offset) ------
    // documents written as raw text shards and read back through
    // Ingest.readTextDocs; the byte-offset ids aren't replayable on the
    // parquet side, so the gate pins them STRUCTURALLY (distinct ids =
    // rows, as one cross-joined flag every row carries) while the text
    // payload round-trips exactly against the parquet source
    QueryDef("q_text_read",
      (s, d) => {
        val path =
          graft.util.Scratch.named(
          s"graft_ingest/${new java.io.File(d).getName}/docs_text")
        documents(s, d).select(col("text"))
          .write.mode("overwrite").text(path)
        val docs = graft.sources.Ingest.readTextDocs(s, path)
        val uniq = docs.agg((count(lit(1)) ===
          countDistinct(col("file"), col("offset"))).as("ids_unique"))
        docs.select("text").crossJoin(uniq).orderBy("text")
      },
      Some("""SELECT text, true AS ids_unique
             FROM documents ORDER BY text""")),

    // ---- CSV ingestion round-trip (the reference's own test format) -------
    // customer serialized to headered CSV and read back through
    // Ingest.readCsv with bounded-sample schema INFERENCE (no explicit
    // schema — the gate pins that inference recovers the numeric/string
    // types well enough to round-trip every value); oracle reads the
    // untouched parquet side. c_comment carries commas — quoting must
    // survive the trip
    QueryDef("q_csv_read",
      (s, d) => {
        val path =
          graft.util.Scratch.named(
          s"graft_ingest/${new java.io.File(d).getName}/cust_csv")
        s.read.parquet(s"$d/customer.parquet")
          .write.mode("overwrite").option("header", true).csv(path)
        // inference picks the narrowest integer type that fits the
        // sample — cast the keys back to the parquet side's widths so
        // the value compare sees identical types at every SF
        graft.sources.Ingest.readCsv(s, path)
          .select(col("c_custkey").cast("long").as("c_custkey"),
            col("c_name"),
            col("c_nationkey").cast("long").as("c_nationkey"),
            col("c_acctbal").cast("double").as("c_acctbal"),
            col("c_mktsegment"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_nationkey, c_acctbal,
             c_mktsegment
             FROM customer ORDER BY c_custkey""")),

    // ---- CSV corrupt-record policy ------------------------------------------
    // a deterministic c_custkey % 41 slice of lines is written with a
    // broken arity (single junk field); PERMISSIVE + corruptReport must
    // count exactly that slice, DROPMALFORMED exactly the complement —
    // same damage-as-data contract as q_jsonl_corrupt, on the CSV parser
    QueryDef("q_csv_corrupt",
      (s, d) => {
        val path =
          graft.util.Scratch.named(
          s"graft_ingest/${new java.io.File(d).getName}/cust_csv_bad")
        val cust = s.read.parquet(s"$d/customer.parquet")
          .select("c_custkey", "c_name", "c_acctbal")
        val line = concat_ws(",", col("c_custkey"), col("c_name"),
          col("c_acctbal"))
        cust.select(
            when(pmod(col("c_custkey"), lit(41)) === 0, lit("garbage"))
              .otherwise(line).as("value"))
          .write.mode("overwrite").text(path)
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("c_custkey",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("c_name",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("c_acctbal",
            org.apache.spark.sql.types.DoubleType)))
        val rep = graft.sources.Ingest.corruptReport(
          graft.sources.Ingest.readCsv(s, path, Some(schema),
            header = false))
        val dropped = graft.sources.Ingest.readCsv(s, path, Some(schema),
            header = false, mode = "DROPMALFORMED")
          .agg(count(col("c_custkey")).as("n_dropmalformed"))
        rep.crossJoin(dropped)
      },
      Some("""SELECT count(*)::BIGINT AS n_rows,
             sum(CASE WHEN c_custkey % 41 = 0 THEN 1 ELSE 0 END)::BIGINT
               AS n_corrupt,
             sum(CASE WHEN c_custkey % 41 <> 0 THEN 1 ELSE 0 END)::BIGINT
               AS n_good,
             sum(CASE WHEN c_custkey % 41 <> 0 THEN 1 ELSE 0 END)::BIGINT
               AS n_dropmalformed
             FROM customer""")),

    // ---- multi-pass ER: prefix + SNM passes unioned, closed, labeled ------
    // the standard recipe end-to-end as ONE verified pipeline: prefix-
    // blocked JW pairs ∪ sorted-neighborhood pairs (each covering the
    // other's blind spot) → transitive closure → per-entity sizes. The
    // prefix member runs the ESCALATING form (maxBlock=100 → 12-char
    // re-block — the r11 VERDICT's Σ block² fix; the linear SNM member is
    // unchanged), and the oracle replays the two-level keying verbatim.
    // Both passes score lowered names so jaro_winkler_similarity replays
    // them; the closure replays as the recursive min-label CTE
    // (q_entity_clusters pattern); singletons self-label. At the gate SFs
    // no block exceeds 100 rows, so entities equal the r11 output.
    QueryDef("q_er_multipass",
      (s, d) => {
        val parts = s.read.parquet(s"$d/part.parquet")
          .filter(col("p_size") <= 3)
          .select(col("p_partkey"), lower(col("p_name")).as("nm"))
        val blk = graft.pipeline.FuzzyJoin.jaroWinklerPairs(parts,
          "p_partkey", "nm", minSim = 0.94, blockLen = 4,
          maxBlock = 100, escalateLen = 12)
        val snm = graft.pipeline.FuzzyJoin.sortedNeighborhood(parts,
          "p_partkey", "nm", keyCol = col("__s"), window = 4,
          minSim = 0.94)
        graft.pipeline.FuzzyJoin.multiPassClusters(parts,
            "p_partkey", "nm", Seq(blk, snm))
          .groupBy("entity")
          .agg(count(lit(1)).as("n_members"))
          .orderBy("entity")
      },
      Some("""WITH RECURSIVE s AS (SELECT p_partkey AS id,
               lower(p_name) AS nm FROM part
               WHERE p_size <= 3 AND p_partkey IS NOT NULL
                 AND p_name IS NOT NULL),
             c1 AS (SELECT substr(nm, 1, 4) AS b1, count(*) AS n1
               FROM s GROUP BY 1),
             k AS (SELECT s.id, s.nm, substr(s.nm, 1, 4) AS b1,
               CASE WHEN c1.n1 > 100 THEN substr(s.nm, 1, 12)
                 ELSE '' END AS b2
               FROM s JOIN c1 ON substr(s.nm, 1, 4) = c1.b1),
             c2 AS (SELECT b1, b2, count(*) AS n2 FROM k GROUP BY 1, 2),
             kk AS (SELECT k.id, k.nm, k.b1, k.b2 FROM k
               JOIN c2 USING (b1, b2) WHERE c2.n2 <= 100),
             blk AS (SELECT a.id AS ia, b.id AS ib FROM kk a JOIN kk b
               ON a.b1 = b.b1 AND a.b2 = b.b2 AND a.id < b.id
               WHERE jaro_winkler_similarity(a.nm, b.nm) >= 0.94),
             rr AS (SELECT id, nm,
               row_number() OVER (ORDER BY nm, id) AS rk FROM s),
             snm AS (SELECT a.id AS ia, b.id AS ib FROM rr a JOIN rr b
               ON b.rk - a.rk BETWEEN 1 AND 3
               WHERE jaro_winkler_similarity(a.nm, b.nm) >= 0.94),
             p AS (SELECT least(ia, ib) AS u, greatest(ia, ib) AS v
               FROM blk
               UNION SELECT least(ia, ib), greatest(ia, ib) FROM snm),
             edges AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
             reach(id, r) AS (
               SELECT u, u FROM edges
               UNION
               SELECT e.u, reach.r FROM edges e
                 JOIN reach ON reach.id = e.v),
             lab AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
             SELECT coalesce(lab.component, s.id)::BIGINT AS entity,
               count(*)::BIGINT AS n_members
             FROM s LEFT JOIN lab ON lab.id = s.id
             GROUP BY 1 ORDER BY entity""")),

    // ---- hybrid retrieval: reciprocal rank fusion --------------------------
    // lexical run (BM25, spark/join terms) fused with a semantic run
    // (embedding cosine vs vec 0) — the RAG hybrid-search shape. Ranks are
    // per-run row_number over (score desc, doc); the fused score is a sum
    // of exact reciprocals both engines compute bit-identically, so the
    // row compares UNROUNDED. The BM25 scores feeding run A's ranks carry
    // ln() last-ulp engine noise, but distinct docs' scores differ by
    // orders of magnitude more than an ulp (equal-score docs tie-break on
    // the id), so the integer ranks are stable across engines.
    QueryDef("q_rrf_hybrid",
      (s, d) => {
        val runA = graft.pipeline.Relevance.bm25(
            documents(s, d), "doc_id", "text", Seq("spark", "join"))
          .select(lit(0L).as("query_id"), col("doc_id"), col("score"))
        val e = embeddings(s, d)
        val qv = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("qv"))
        val runB = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
          .select(lit(0L).as("query_id"), col("vec_id").as("doc_id"),
            graft.pipeline.Dedup.cosine(col("embedding"), col("qv"))
              .as("score"))
        graft.eval.Fusion.rrf(Seq(runA, runB), "query_id", "doc_id",
            "score", k = 60, depth = 50)
          .orderBy("fused_rank")
      },
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
             dfreq AS (SELECT token, count(*) AS doc_freq FROM qtf GROUP BY 1),
             bm AS (SELECT doc_id,
               sum(ln(1 + (n.n - doc_freq + 0.5) / (doc_freq + 0.5))
                 * tf * 2.2
                 / (tf + 1.2 * (1 - 0.75 + 0.75 * len / avgdl))) AS score
               FROM qtf JOIN dfreq USING (token) JOIN lens USING (doc_id),
                 n, avgdl
               GROUP BY doc_id),
             ra AS (SELECT doc_id, row_number()
                 OVER (ORDER BY score DESC, doc_id) AS r FROM bm),
             e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             qv AS (SELECT v AS q FROM e WHERE vec_id = 0),
             cs AS (SELECT e.vec_id AS doc_id,
               list_cosine_similarity(e.v, qv.q) AS score
               FROM e, qv WHERE e.vec_id != 0),
             rb AS (SELECT doc_id, row_number()
                 OVER (ORDER BY score DESC, doc_id) AS r FROM cs),
             u AS (SELECT doc_id, r FROM ra WHERE r <= 50
               UNION ALL SELECT doc_id, r FROM rb WHERE r <= 50)
             SELECT 0::BIGINT AS query_id, doc_id,
               count(*)::BIGINT AS n_runs,
               sum(1.0 / (60 + r)) AS rrf_score,
               row_number() OVER (ORDER BY sum(1.0 / (60 + r)) DESC, doc_id)
                 AS fused_rank
             FROM u GROUP BY doc_id ORDER BY fused_rank""")),

    // ---- hybrid retrieval: weighted min-max score fusion -------------------
    // two semantic runs (cosine + inner product — they rank differently
    // whenever corpus norms differ) per-query min-max normalized and
    // convex-combined 0.7/0.3. The RANKS are stable across engines
    // (distinct vectors' scores differ far above ulp scale; exact ties
    // break on the id) but list_cosine_similarity's division order is
    // not bit-identical to dot/sqrt(na*nb), so the fused SCORE compares
    // under round(6) — the q_bm25 convention
    QueryDef("q_fuse_weighted",
      (s, d) => {
        val e = embeddings(s, d)
        val q = e.filter(col("vec_id") < 3)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        val pairs = e.filter(col("vec_id") >= 3).crossJoin(broadcast(q))
        val runCos = pairs.select(col("query_id"),
          col("vec_id").as("doc_id"),
          graft.pipeline.Dedup.cosine(col("embedding"), col("qv"))
            .as("score"))
        val runDot = pairs.select(col("query_id"),
          col("vec_id").as("doc_id"),
          graft.pipeline.Dedup.dotProduct(col("embedding"), col("qv"))
            .as("score"))
        graft.eval.Fusion.weightedFuse(Seq(runCos, runDot), Seq(0.7, 0.3),
            "query_id", "doc_id", "score", depth = 20)
          .filter(col("fused_rank") <= 10)
          .select(col("query_id"), col("doc_id"), col("n_runs"),
            round(col("fused_score"), 6).as("fused_score"),
            col("fused_rank"))
          .orderBy("query_id", "fused_rank")
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                 FROM embeddings),
             q AS (SELECT vec_id AS query_id, v AS qv FROM e
               WHERE vec_id < 3),
             cs AS (SELECT query_id, e.vec_id AS doc_id,
               list_cosine_similarity(e.v, qv) AS s
               FROM e, q WHERE e.vec_id >= 3),
             dp AS (SELECT query_id, e.vec_id AS doc_id,
               list_inner_product(e.v, qv) AS s
               FROM e, q WHERE e.vec_id >= 3),
             rc AS (SELECT query_id, doc_id, s, row_number()
                 OVER (PARTITION BY query_id ORDER BY s DESC, doc_id) AS r
               FROM cs),
             rd AS (SELECT query_id, doc_id, s, row_number()
                 OVER (PARTITION BY query_id ORDER BY s DESC, doc_id) AS r
               FROM dp),
             nc AS (SELECT query_id, doc_id,
               CASE WHEN max(s) OVER w = min(s) OVER w THEN 0.0
                 ELSE 0.7 * ((s - min(s) OVER w) /
                   (max(s) OVER w - min(s) OVER w)) END AS contrib
               FROM rc WHERE r <= 20
               WINDOW w AS (PARTITION BY query_id)),
             nd AS (SELECT query_id, doc_id,
               CASE WHEN max(s) OVER w = min(s) OVER w THEN 0.0
                 ELSE 0.3 * ((s - min(s) OVER w) /
                   (max(s) OVER w - min(s) OVER w)) END AS contrib
               FROM rd WHERE r <= 20
               WINDOW w AS (PARTITION BY query_id)),
             u AS (SELECT * FROM nc UNION ALL SELECT * FROM nd)
             SELECT query_id, doc_id, count(*)::BIGINT AS n_runs,
               round(sum(contrib), 6) AS fused_score,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY sum(contrib) DESC, doc_id) AS fused_rank
             FROM u GROUP BY query_id, doc_id
             QUALIFY fused_rank <= 10
             ORDER BY query_id, fused_rank""")),

    // ---- rank-biased overlap (ranking drift, no truth set) ----------------
    QueryDef("q_rbo",
      (s, d) => {
        val o = orders(s, d)
        val wA = org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val wB = org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderpriority")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val runA = o.withColumn("rank", row_number().over(wA))
          .filter(col("rank") <= 20)
          .select("o_orderpriority", "o_orderkey", "rank")
        val runB = o.withColumn("rank", row_number().over(wB))
          .filter(col("rank") <= 20)
          .select("o_orderpriority", "o_orderkey", "rank")
        graft.eval.RankingMetrics.rbo(runA, runB,
            "o_orderpriority", "o_orderkey", "rank", k = 20, p = 0.9,
            universe = Some(o.select("o_orderpriority")))
          .select(col("o_orderpriority"), col("n_common"),
            round(col("rbo"), 6).as("rbo"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH ra AS (SELECT o_orderpriority AS q, o_orderkey AS doc,
               row_number() OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey) AS r FROM orders),
             rb AS (SELECT o_orderpriority AS q, o_orderkey AS doc,
               row_number() OVER (PARTITION BY o_orderpriority
                 ORDER BY o_orderdate, o_orderkey) AS r FROM orders),
             j AS (SELECT ra.q, greatest(ra.r, rb.r) AS m
               FROM ra JOIN rb USING (q, doc)
               WHERE ra.r <= 20 AND rb.r <= 20),
             w AS (SELECT mm.m, sum(pow(0.9, d.d - 1) / d.d) AS g
               FROM (SELECT DISTINCT m FROM j) mm, range(1, 21) d(d)
               WHERE d.d >= mm.m GROUP BY 1),
             agg AS (SELECT q, count(*) AS n_common,
               sum(g) * (1 - 0.9) / (1 - pow(0.9, 20)) AS rbo
               FROM j JOIN w USING (m) GROUP BY q),
             qs AS (SELECT DISTINCT o_orderpriority AS q FROM orders
               WHERE o_orderpriority IS NOT NULL)
             SELECT qs.q AS o_orderpriority,
               coalesce(n_common, 0)::BIGINT AS n_common,
               round(coalesce(rbo, 0), 6) AS rbo
             FROM qs LEFT JOIN agg ON qs.q = agg.q ORDER BY 1""")),

    // ---- effective sample size (weighted-tier health) ---------------------
    QueryDef("q_ess",
      (s, d) => graft.pipeline.Sampling.effectiveSampleSize(
          documents(s, d), "n_chars", "source")
        .select(col("source"), col("n"),
          round(col("sum_w"), 6).as("sum_w"),
          round(col("ess"), 6).as("ess"),
          round(col("ess_ratio"), 6).as("ess_ratio"))
        .orderBy("source"),
      Some("""SELECT source, count(*)::BIGINT AS n,
               round(sum(n_chars::DOUBLE), 6) AS sum_w,
               round(sum(n_chars::DOUBLE) * sum(n_chars::DOUBLE) /
                 sum(n_chars::DOUBLE * n_chars::DOUBLE), 6) AS ess,
               round(sum(n_chars::DOUBLE) * sum(n_chars::DOUBLE) /
                 sum(n_chars::DOUBLE * n_chars::DOUBLE) / count(*), 6)
                 AS ess_ratio
             FROM documents
             WHERE source IS NOT NULL AND n_chars IS NOT NULL
               AND n_chars >= 0
             GROUP BY 1 ORDER BY source""")),

    // ---- JSON key profile (semi-structured tier) ---------------------------
    // one generic MAP<STRING,STRING> parse; DuckDB replays it with
    // json_keys + a dynamic json_extract_string path
    QueryDef("q_json_profile",
      (s, d) => graft.pipeline.Semistructured.jsonProfile(events(s, d), "props")
        .select(col("key"), col("cnt"), col("n_distinct"), col("n_numeric"),
          round(col("avg_num"), 6).as("avg_num"),
          round(col("share"), 6).as("share"))
        .orderBy("key"),
      Some("""WITH base AS (SELECT props FROM events WHERE props IS NOT NULL),
             kv AS (SELECT unnest(json_keys(props)) AS key, props FROM base),
             tot AS (SELECT count(*)::DOUBLE AS total FROM base)
             SELECT key, count(*)::BIGINT AS cnt,
               count(DISTINCT json_extract_string(props, '$.' || key))::BIGINT
                 AS n_distinct,
               count(TRY_CAST(json_extract_string(props, '$.' || key)
                 AS DOUBLE))::BIGINT AS n_numeric,
               round(avg(TRY_CAST(json_extract_string(props, '$.' || key)
                 AS DOUBLE)), 6) AS avg_num,
               round(count(*) / greatest((SELECT total FROM tot), 1.0), 6)
                 AS share
             FROM kv GROUP BY 1 ORDER BY 1""")),

    // ---- typed JSON field extraction (one parse, then plain agg) -----------
    QueryDef("q_json_extract",
      (s, d) => {
        val ex = graft.pipeline.Semistructured.extractFields(
          events(s, d), "props",
          Seq(("k_val", "k", org.apache.spark.sql.types.LongType)))
        ex.filter(col("event_type").isNotNull)
          .groupBy("event_type").agg(
            count(col("k_val")).as("n_k"),
            sum(col("k_val")).as("sum_k"),
            round(avg(col("k_val")), 6).as("avg_k"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
               count(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                 ::BIGINT AS n_k,
               sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                 ::BIGINT AS sum_k,
               round(avg(TRY_CAST(json_extract_string(props, '$.k')
                 AS BIGINT)), 6) AS avg_k
             FROM events WHERE event_type IS NOT NULL
             GROUP BY 1 ORDER BY 1""")),

    // ---- CUPED variance reduction (experimentation tier) -------------------
    // units = users; pre/post split on event_id parity (deterministic,
    // SF-independent); arm = user_id % 2. theta fit pooled; the oracle
    // replays the identical two-pass algebra
    QueryDef("q_cuped",
      (s, d) => {
        val units = events(s, d)
          .filter(col("user_id").isNotNull && col("value").isNotNull &&
            col("event_id").isNotNull)
          .groupBy(col("user_id"), (col("user_id") % 2).as("arm"))
          .agg(
            avg(when(col("event_id") % 2 === 0, col("value"))).as("pre"),
            avg(when(col("event_id") % 2 === 1, col("value"))).as("post"))
        graft.stat.Experiment.cuped(units, "arm", "pre", "post")
          .select(col("arm"), col("n"),
            round(col("mean_post"), 6).as("mean_post"),
            round(col("mean_cuped"), 6).as("mean_cuped"),
            round(col("var_post"), 6).as("var_post"),
            round(col("var_cuped"), 6).as("var_cuped"))
          .orderBy("arm")
      },
      Some("""WITH u AS (SELECT user_id, (user_id % 2)::BIGINT AS arm,
               avg(CASE WHEN event_id % 2 = 0 THEN value END) AS pre,
               avg(CASE WHEN event_id % 2 = 1 THEN value END) AS post
               FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
                 AND event_id IS NOT NULL
               GROUP BY 1, 2),
             c AS (SELECT * FROM u WHERE pre IS NOT NULL
               AND post IS NOT NULL),
             f AS (SELECT covar_pop(pre, post) / var_pop(pre) AS theta,
               avg(pre) AS mu FROM c)
             SELECT arm, count(*)::BIGINT AS n,
               round(avg(post), 6) AS mean_post,
               round(avg(post - coalesce(theta, 0) * (pre - mu)), 6)
                 AS mean_cuped,
               round(var_samp(post), 6) AS var_post,
               round(var_samp(post - coalesce(theta, 0) * (pre - mu)), 6)
                 AS var_cuped
             FROM c, f GROUP BY arm ORDER BY arm""")),

    // ---- sample-ratio mismatch guardrail -----------------------------------
    // chi2/dof oracle-replayed; the Wilson–Hilferty p-value is spec-pinned
    // (InferenceTests convention)
    QueryDef("q_srm",
      (s, d) => {
        val users = events(s, d).filter(col("user_id").isNotNull)
          .select(col("user_id")).distinct()
          .select((col("user_id") % 3).cast("string").as("arm"))
        graft.stat.Experiment.srmCheck(users, "arm",
            Seq("0" -> 1.0, "1" -> 1.0, "2" -> 1.0))
          .select(col("n"), col("n_arms"),
            round(col("chi2"), 6).as("chi2"), col("dof"))
      },
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events
               WHERE user_id IS NOT NULL),
             c AS (SELECT (user_id % 3)::VARCHAR AS arm,
               count(*)::DOUBLE AS o FROM u GROUP BY 1),
             t AS (SELECT sum(o) AS n FROM c)
             SELECT n::BIGINT AS n, 3::BIGINT AS n_arms,
               round(sum((o - n / 3) * (o - n / 3) / (n / 3)), 6) AS chi2,
               2::BIGINT AS dof
             FROM c, t GROUP BY n""")),

    // ---- table-health expectation suite ------------------------------------
    // testdata has no nulls/dirt, so the suite runs over deterministically
    // injected defects (mod-keyed nulls, a bad category, a collapsed key)
    QueryDef("q_expectations",
      (s, d) => {
        import graft.clean.Expectations._
        val base = orders(s, d)
          .withColumn("cust", when(col("o_orderkey") % 11 === 0, lit(null))
            .otherwise(col("o_custkey")))
          .withColumn("status2", when(col("o_orderkey") % 13 === 0, lit("X"))
            .otherwise(col("o_orderstatus")))
          .withColumn("dupkey", col("o_orderkey") % 1000)
        graft.clean.Expectations.run(base, Seq(
            Completeness("cust", 0.95),
            Uniqueness(Seq("o_orderkey")),
            Uniqueness(Seq("dupkey"), 0.5),
            AllowedValues("status2", Seq("P", "O", "F"), 0.95),
            InRange("o_totalprice", 0.0, 300000.0, 0.9),
            NonNegative("o_totalprice")))
          .select(col("check_id"), col("check"), col("column"),
            round(col("metric"), 6).as("metric"), col("threshold"),
            col("pass"))
          .orderBy("check_id")
      },
      Some("""WITH b AS (SELECT *,
               CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_custkey END
                 AS cust,
               CASE WHEN o_orderkey % 13 = 0 THEN 'X' ELSE o_orderstatus END
                 AS status2,
               o_orderkey % 1000 AS dupkey
               FROM orders),
             n AS (SELECT count(*)::DOUBLE AS n FROM b)
             SELECT * FROM (
               SELECT 0::BIGINT AS check_id, 'completeness' AS "check",
                 'cust' AS "column",
                 round(count(cust) / (SELECT n FROM n), 6) AS metric,
                 0.95::DOUBLE AS threshold,
                 count(cust) / (SELECT n FROM n) >= 0.95 AS pass FROM b
               UNION ALL
               SELECT 1, 'uniqueness', 'o_orderkey',
                 round(count(DISTINCT o_orderkey) / (SELECT n FROM n), 6),
                 1.0::DOUBLE,
                 count(DISTINCT o_orderkey) / (SELECT n FROM n) >= 1.0
                 FROM b
               UNION ALL
               SELECT 2, 'uniqueness', 'dupkey',
                 round(count(DISTINCT dupkey) / (SELECT n FROM n), 6),
                 0.5::DOUBLE,
                 count(DISTINCT dupkey) / (SELECT n FROM n) >= 0.5
                 FROM b
               UNION ALL
               SELECT 3, 'allowed_values', 'status2',
                 round(sum(CASE WHEN status2 IN ('P','O','F') THEN 1.0
                   ELSE 0.0 END) / count(status2), 6),
                 0.95::DOUBLE, sum(CASE WHEN status2 IN ('P','O','F')
                   THEN 1.0 ELSE 0.0 END) / count(status2) >= 0.95 FROM b
               UNION ALL
               SELECT 4, 'in_range', 'o_totalprice',
                 round(sum(CASE WHEN o_totalprice BETWEEN 0 AND 300000
                   THEN 1.0 ELSE 0.0 END) / count(o_totalprice), 6),
                 0.9::DOUBLE, sum(CASE WHEN o_totalprice BETWEEN 0 AND
                   300000 THEN 1.0 ELSE 0.0 END) / count(o_totalprice)
                   >= 0.9 FROM b
               UNION ALL
               SELECT 5, 'non_negative', 'o_totalprice',
                 round(sum(CASE WHEN o_totalprice >= 0 THEN 1.0 ELSE 0.0
                   END) / count(o_totalprice), 6),
                 1.0::DOUBLE, sum(CASE WHEN o_totalprice >= 0 THEN 1.0
                   ELSE 0.0 END) / count(o_totalprice) >= 1.0 FROM b
             ) ORDER BY check_id""")),

    // ---- functional-dependency violation report ----------------------------
    QueryDef("q_fd",
      (s, d) => graft.clean.Expectations.fdViolations(
          lineitem(s, d), Seq("l_orderkey"), "l_returnflag")
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey"), col("n_rows"), col("n_dependent"),
          col("example_min"), col("example_max"))
        .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey, count(*)::BIGINT AS n_rows,
               count(DISTINCT l_returnflag)::BIGINT AS n_dependent,
               min(l_returnflag) AS example_min,
               max(l_returnflag) AS example_max
             FROM lineitem WHERE l_orderkey IS NOT NULL
             GROUP BY 1
             HAVING count(DISTINCT l_returnflag) > 1 AND l_orderkey % 20 = 0
             ORDER BY 1""")),

    // ---- referential-integrity orphan check --------------------------------
    // parent thinned deterministically so orphans exist; output aggregated
    // per order status for a stable small frame
    QueryDef("q_fk_orphans",
      (s, d) => {
        val parent = s.read.parquet(s"$d/customer.parquet")
          .filter(col("c_custkey") % 3 =!= 0)
        graft.clean.Expectations.fkOrphans(
            orders(s, d), "o_custkey", parent, "c_custkey")
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orphans"),
            countDistinct(col("o_custkey")).as("n_orphan_keys"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*)::BIGINT AS n_orphans,
               count(DISTINCT o_custkey)::BIGINT AS n_orphan_keys
             FROM orders
             WHERE o_custkey IS NOT NULL AND o_custkey NOT IN
               (SELECT c_custkey FROM customer
                WHERE c_custkey IS NOT NULL AND c_custkey % 3 <> 0)
             GROUP BY 1 ORDER BY 1""")),

    // ---- event debounce (predecessor-gap throttle) -------------------------
    QueryDef("q_debounce",
      (s, d) => graft.events.Engagement.debounce(events(s, d),
          Seq("user_id"), "ts", "event_id", minGapUs = 600000000L)
        .groupBy("user_id").agg(count(lit(1)).as("n_kept"))
        .orderBy("user_id"),
      Some("""WITH g AS (SELECT user_id, epoch_us(ts) AS tsu,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id) AS gap
               FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
             SELECT user_id, count(*)::BIGINT AS n_kept FROM g
             WHERE gap IS NULL OR gap >= 600000000
             GROUP BY 1 ORDER BY 1""")),

    // ---- CDC apply (SCD1 upsert/delete merge) ------------------------------
    // change batch derived deterministically from orders: %10==3 updated
    // (+100), %10==7 deleted, %100==3 double-updated (+200 at seq 2 — the
    // last-writer-wins case); result spot-checked on a mod-97 key slice
    // (prices compare UNROUNDED: x+100.0 is one IEEE op, bit-identical)
    QueryDef("q_cdc_apply",
      (s, d) => {
        val snap = orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
        val o = orders(s, d)
        val changes =
          o.filter(col("o_orderkey") % 10 === 3)
            .select(col("o_orderkey"), lit("U").as("op"), lit(1L).as("seq"),
              (col("o_totalprice") + 100.0).as("o_totalprice"))
          .unionAll(o.filter(col("o_orderkey") % 10 === 7)
            .select(col("o_orderkey"), lit("D").as("op"), lit(1L).as("seq"),
              lit(0.0).as("o_totalprice")))
          .unionAll(o.filter(col("o_orderkey") % 100 === 3)
            .select(col("o_orderkey"), lit("U").as("op"), lit(2L).as("seq"),
              (col("o_totalprice") + 200.0).as("o_totalprice")))
        graft.pipeline.Snapshot.applyChanges(snap, changes,
            "o_orderkey", "op", "seq", Seq("o_totalprice"))
          .filter(col("o_orderkey") % 97 === 0)
          .orderBy("o_orderkey")
      },
      Some("""WITH ch AS (
               SELECT o_orderkey, 'U' AS op, 1 AS seq,
                 o_totalprice + 100.0 AS price FROM orders
                 WHERE o_orderkey % 10 = 3
               UNION ALL
               SELECT o_orderkey, 'D', 1, 0.0 FROM orders
                 WHERE o_orderkey % 10 = 7
               UNION ALL
               SELECT o_orderkey, 'U', 2, o_totalprice + 200.0 FROM orders
                 WHERE o_orderkey % 100 = 3),
             w AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
               ORDER BY seq DESC, op DESC, price DESC) AS rn FROM ch),
             win AS (SELECT o_orderkey, op, price FROM w WHERE rn = 1)
             SELECT coalesce(o.o_orderkey, win.o_orderkey) AS o_orderkey,
               CASE WHEN win.op IS NOT NULL THEN win.price
                 ELSE o.o_totalprice END AS o_totalprice
             FROM orders o FULL OUTER JOIN win USING (o_orderkey)
             WHERE coalesce(win.op, 'U') <> 'D'
               AND coalesce(o.o_orderkey, win.o_orderkey) % 97 = 0
             ORDER BY 1""")),

    // ---- cumulative distinct-user reach ------------------------------------
    QueryDef("q_reach",
      (s, d) => graft.events.Engagement.cumulativeReach(
          events(s, d), "user_id", "ts")
        .select(col("day").cast("string").as("day"), col("new_users"),
          col("cum_users"))
        .orderBy("day"),
      Some("""WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS day
               FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
               GROUP BY 1)
             SELECT day::VARCHAR AS day, count(*)::BIGINT AS new_users,
               sum(count(*)) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                 AS cum_users
             FROM f GROUP BY day ORDER BY day""")),

    // ---- trailing-window active users (exact WAU) --------------------------
    QueryDef("q_rolling_active",
      (s, d) => graft.events.Engagement.rollingActive(
          events(s, d), "user_id", "ts", windowDays = 7)
        .select(col("day").cast("string").as("day"), col("active_users"))
        .orderBy("day"),
      Some("""WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE)
               AS d FROM events
               WHERE user_id IS NOT NULL AND ts IS NOT NULL),
             span AS (SELECT unnest(generate_series(
               (SELECT min(d) FROM ud), (SELECT max(d) FROM ud),
               INTERVAL 1 DAY))::DATE AS day)
             SELECT s.day::VARCHAR AS day,
               count(DISTINCT ud.u)::BIGINT AS active_users
             FROM span s LEFT JOIN ud
               ON ud.d BETWEEN s.day - 6 AND s.day
             GROUP BY s.day ORDER BY s.day""")),

    // ---- ER survivorship (golden record) -----------------------------------
    // clusters = nations, attribute nulls injected mod-keyed; each attribute
    // independently survives from its best (non-null, priority, low-id) row
    QueryDef("q_golden",
      (s, d) => {
        val base = s.read.parquet(s"$d/customer.parquet")
          .select(col("c_nationkey").as("cluster"),
            col("c_custkey").as("id"),
            (col("c_custkey") % 5).as("prio"),
            when(col("c_custkey") % 7 === 0, lit(null))
              .otherwise(col("c_name")).as("name"),
            when(col("c_custkey") % 3 === 0, lit(null))
              .otherwise(col("c_mktsegment")).as("seg"))
        graft.pipeline.FuzzyJoin.survivorship(base, "cluster", "id",
            "prio", Seq("name", "seg"))
          .orderBy("cluster")
      },
      Some("""WITH b AS (SELECT c_nationkey AS cluster, c_custkey AS id,
               c_custkey % 5 AS prio,
               CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_name END
                 AS name,
               CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_mktsegment END
                 AS seg FROM customer),
             rn AS (SELECT cluster, name, row_number() OVER
               (PARTITION BY cluster ORDER BY (name IS NOT NULL) DESC,
                 prio DESC, id ASC) AS r FROM b),
             rs AS (SELECT cluster, seg, row_number() OVER
               (PARTITION BY cluster ORDER BY (seg IS NOT NULL) DESC,
                 prio DESC, id ASC) AS r FROM b),
             cnt AS (SELECT cluster, count(*)::BIGINT AS n_members
               FROM b GROUP BY 1)
             SELECT cnt.cluster, cnt.n_members, rn.name, rs.seg
             FROM cnt
             JOIN rn ON rn.cluster = cnt.cluster AND rn.r = 1
             JOIN rs ON rs.cluster = cnt.cluster AND rs.r = 1
             ORDER BY cnt.cluster""")),

    // ---- Poisson-bootstrap confidence intervals ----------------------------
    // Lehmer(id, replica, seed) uniforms (the q_hash_sample replay, with
    // the replica index injected at the seed stage) → hardcoded-literal
    // Poisson(1) CASE chain → per-replica weighted means → percentile
    // band; every step is fixed integer/IEEE arithmetic both engines
    // replay (CDF thresholds are decimal literals, NOT computed — libm
    // exp could differ by an ulp)
    QueryDef("q_bootstrap_ci",
      (s, d) => graft.stat.Resample.bootstrapMeanCI(events(s, d),
          "event_id", "value", Seq("event_type"), b = 100, alpha = 0.05,
          seed = 7)
        .select(col("event_type"), col("n"), round(col("mean"), 6).as("mean"),
          round(col("ci_lo"), 6).as("ci_lo"),
          round(col("ci_hi"), 6).as("ci_hi"), col("n_replicas"))
        .orderBy("event_type"),
      Some(s"""WITH base AS (SELECT event_type, event_id,
               value::DOUBLE AS x FROM events
               WHERE event_id IS NOT NULL AND value IS NOT NULL
                 AND event_type IS NOT NULL),
             s1 AS (SELECT event_type, b.b AS b, x,
               (event_id % 2147483648 + (event_id // 2147483648) * 48271)
                 % 2147483646 + 1 AS lx
               FROM base, range(0, 100) b(b)),
             s2 AS (SELECT event_type, b, x,
               ((lx * 48271 % 2147483647) * 48271 % 2147483647)
                 * 48271 % 2147483647 AS x3 FROM s1),
             s3 AS (SELECT event_type, b, x,
               (x3 + (7 + b * 48271) % 2147483646) % 2147483646 + 1 AS y0
               FROM s2),
             reps AS (SELECT event_type, b, x,
               (((y0 * 48271 % 2147483647) * 48271 % 2147483647)
                 * 48271 % 2147483647)::DOUBLE / 2147483647.0 AS u
               FROM s3),
             wts AS (SELECT event_type, b, x, CASE
               ${graft.stat.Resample.poisCdf.zipWithIndex.map { case (t, k) =>
                   s"WHEN u < $t THEN $k.0" }.mkString(" ")}
               ELSE 12.0 END AS w FROM reps),
             means AS (SELECT event_type, b, sum(w * x) / sum(w) AS m
               FROM wts GROUP BY 1, 2 HAVING sum(w) > 0),
             ci AS (SELECT event_type, quantile_cont(m, 0.025) AS lo,
               quantile_cont(m, 0.975) AS hi, count(*)::BIGINT AS n_replicas
               FROM means GROUP BY 1),
             pt AS (SELECT event_type, count(*)::BIGINT AS n, avg(x) AS mean
               FROM base GROUP BY 1)
             SELECT pt.event_type, n, round(mean, 6) AS mean,
               round(lo, 6) AS ci_lo, round(hi, 6) AS ci_hi, n_replicas
             FROM pt JOIN ci USING (event_type) ORDER BY 1""")),

    // ---- split-conformal prediction intervals ------------------------------
    // synthetic model pred = 0.8·value + 10 (one fixed IEEE op chain);
    // calibration = even event ids, target = odd; q = k-th smallest
    // |residual|, k = ceil(0.9·(n+1)) — an exact order statistic
    QueryDef("q_conformal",
      (s, d) => {
        val scored = events(s, d)
          .filter(col("event_id").isNotNull && col("value").isNotNull)
          .withColumn("pred", col("value") * 0.8 + 10.0)
        val calib = scored.filter(col("event_id") % 2 === 0)
        val target = scored.filter(col("event_id") % 2 === 1)
        graft.stat.Resample.conformalInterval(calib, target,
            "pred", "value", alpha = 0.1)
          .filter(col("event_id") % 31 === 5)
          .select(col("event_id"), round(col("pred"), 6).as("pred"),
            round(col("ci_lo"), 6).as("ci_lo"),
            round(col("ci_hi"), 6).as("ci_hi"))
          .orderBy("event_id")
      },
      Some("""WITH c AS (SELECT abs(value - (value * 0.8 + 10.0)) AS r
               FROM events WHERE event_id IS NOT NULL
                 AND value IS NOT NULL AND event_id % 2 = 0),
             d AS (SELECT r, count(*)::BIGINT AS c FROM c GROUP BY 1),
             nk AS (SELECT sum(c) AS n,
               ceil(0.9::DOUBLE * (sum(c) + 1)) AS k FROM d),
             cum AS (SELECT r, sum(c) OVER (ORDER BY r
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM d),
             q AS (SELECT min(r) AS q FROM cum, nk WHERE cum >= k)
             SELECT event_id, round(value * 0.8 + 10.0, 6) AS pred,
               round(value * 0.8 + 10.0 - q, 6) AS ci_lo,
               round(value * 0.8 + 10.0 + q, 6) AS ci_hi
             FROM events, q
             WHERE event_id IS NOT NULL AND value IS NOT NULL
               AND event_id % 2 = 1 AND event_id % 31 = 5
             ORDER BY event_id""")),

    // ---- pairwise 1-Wasserstein drift distances ----------------------------
    QueryDef("q_wasserstein",
      (s, d) => graft.stat.Drift.wasserstein1Pairs(events(s, d),
          "value", "event_type")
        .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
          round(col("w1"), 6).as("w1"))
        .orderBy("group_a", "group_b"),
      Some("""WITH gv AS (SELECT event_type AS g, value::DOUBLE AS v,
               count(*)::BIGINT AS c FROM events
               WHERE event_type IS NOT NULL AND value IS NOT NULL
               GROUP BY 1, 2),
             tot AS (SELECT g, sum(c)::BIGINT AS n FROM gv GROUP BY 1),
             pairs AS (SELECT a.g AS ga, b.g AS gb, a.n AS na, b.n AS nb
               FROM tot a JOIN tot b ON a.g < b.g),
             m AS (SELECT ga, gb, na, nb, v, sum(ca)::BIGINT AS ca,
               sum(cb)::BIGINT AS cb FROM (
                 SELECT p.ga, p.gb, p.na, p.nb, gv.v, gv.c AS ca, 0 AS cb
                   FROM gv JOIN pairs p ON gv.g = p.ga
                 UNION ALL
                 SELECT p.ga, p.gb, p.na, p.nb, gv.v, 0, gv.c
                   FROM gv JOIN pairs p ON gv.g = p.gb)
               GROUP BY 1, 2, 3, 4, 5),
             e AS (SELECT ga, gb, na, nb,
               (sum(ca) OVER w)::DOUBLE / na AS fa,
               (sum(cb) OVER w)::DOUBLE / nb AS fb,
               lead(v) OVER (PARTITION BY ga, gb ORDER BY v) - v AS dv
               FROM m WINDOW w AS (PARTITION BY ga, gb ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             SELECT ga AS group_a, gb AS group_b, max(na)::BIGINT AS n_a,
               max(nb)::BIGINT AS n_b,
               round(sum(CASE WHEN dv IS NOT NULL
                 THEN abs(fa - fb) * dv ELSE 0 END), 6) AS w1
             FROM e GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- grid-binned pairwise W1 (the continuous-value scale tier) --------
    // same pairs as q_wasserstein but through wasserstein1PairsBinned:
    // values snap UP to a 512-cell uniform grid (fixed IEEE chain, both
    // engines identical), then the exact pair sweep runs on the ≤512-
    // point support — the tier the maxDistinct guard points continuous
    // columns at. |W1_binned − W1| < 2 cells by construction.
    QueryDef("q_wasserstein_binned",
      (s, d) => graft.stat.Drift.wasserstein1PairsBinned(events(s, d),
          "value", "event_type", bins = 512)
        .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
          round(col("w1"), 6).as("w1"))
        .orderBy("group_a", "group_b"),
      Some("""WITH raw AS (SELECT event_type AS g, value::DOUBLE AS v0
               FROM events WHERE event_type IS NOT NULL
                 AND value IS NOT NULL),
             mm AS (SELECT min(v0) AS lo, max(v0) AS hi FROM raw),
             gv AS (SELECT g, CASE WHEN hi = lo THEN lo
                 ELSE lo + ceil((v0 - lo) / ((hi - lo) / 512)) *
                   ((hi - lo) / 512) END AS v, count(*)::BIGINT AS c
               FROM raw, mm GROUP BY 1, 2),
             tot AS (SELECT g, sum(c)::BIGINT AS n FROM gv GROUP BY 1),
             pairs AS (SELECT a.g AS ga, b.g AS gb, a.n AS na, b.n AS nb
               FROM tot a JOIN tot b ON a.g < b.g),
             m AS (SELECT ga, gb, na, nb, v, sum(ca)::BIGINT AS ca,
               sum(cb)::BIGINT AS cb FROM (
                 SELECT p.ga, p.gb, p.na, p.nb, gv.v, gv.c AS ca, 0 AS cb
                   FROM gv JOIN pairs p ON gv.g = p.ga
                 UNION ALL
                 SELECT p.ga, p.gb, p.na, p.nb, gv.v, 0, gv.c
                   FROM gv JOIN pairs p ON gv.g = p.gb)
               GROUP BY 1, 2, 3, 4, 5),
             e AS (SELECT ga, gb, na, nb,
               (sum(ca) OVER w)::DOUBLE / na AS fa,
               (sum(cb) OVER w)::DOUBLE / nb AS fb,
               lead(v) OVER (PARTITION BY ga, gb ORDER BY v) - v AS dv
               FROM m WINDOW w AS (PARTITION BY ga, gb ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             SELECT ga AS group_a, gb AS group_b, max(na)::BIGINT AS n_a,
               max(nb)::BIGINT AS n_b,
               round(sum(CASE WHEN dv IS NOT NULL
                 THEN abs(fa - fb) * dv ELSE 0 END), 6) AS w1
             FROM e GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- streaming twins, batch-executed against the oracle ---------------
    // These rows run the ACTUAL StreamingOps functions (watermarks are
    // no-ops in batch; flatMapGroupsWithState runs each group once) so
    // the gate hash-checks the very code the streams execute — the
    // strongest form of the MemoryStream batch-parity specs.

    // streaming twin: StreamingOps.streamingPsi (StreamingOps.scala) —
    // hourly event-time windows, fixed uniform reference shares; the
    // oracle replays the bin chain and the left-associated 10-term PSI
    // sum in the identical order
    QueryDef("q_streaming_psi",
      (s, d) => graft.streaming.StreamingOps.streamingPsi(
          events(s, d).na.drop(Seq("ts", "value")), "ts", "value",
          lo = 0.0, width = 50.0, refShares = Array.fill(10)(0.1),
          windowDur = "1 hour")
        .select(unix_micros(col("window.start")).as("ws"),
          round(col("psi"), 6).as("psi"), col("n"))
        .orderBy("ws"),
      Some("""WITH e AS (SELECT epoch_us(ts) // 3600000000 AS wh,
               least(greatest(floor((value::DOUBLE - 0.0) / 50.0),
                 0), 9)::BIGINT AS bin
               FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
             w AS (SELECT wh,
               sum(CASE WHEN bin = 0 THEN 1 ELSE 0 END)::BIGINT AS b0,
               sum(CASE WHEN bin = 1 THEN 1 ELSE 0 END)::BIGINT AS b1,
               sum(CASE WHEN bin = 2 THEN 1 ELSE 0 END)::BIGINT AS b2,
               sum(CASE WHEN bin = 3 THEN 1 ELSE 0 END)::BIGINT AS b3,
               sum(CASE WHEN bin = 4 THEN 1 ELSE 0 END)::BIGINT AS b4,
               sum(CASE WHEN bin = 5 THEN 1 ELSE 0 END)::BIGINT AS b5,
               sum(CASE WHEN bin = 6 THEN 1 ELSE 0 END)::BIGINT AS b6,
               sum(CASE WHEN bin = 7 THEN 1 ELSE 0 END)::BIGINT AS b7,
               sum(CASE WHEN bin = 8 THEN 1 ELSE 0 END)::BIGINT AS b8,
               sum(CASE WHEN bin = 9 THEN 1 ELSE 0 END)::BIGINT AS b9,
               count(*)::BIGINT AS n FROM e GROUP BY 1),
             t AS (SELECT wh, n, greatest(n::DOUBLE, 1.0) AS tot,
               b0, b1, b2, b3, b4, b5, b6, b7, b8, b9 FROM w)
             SELECT wh * 3600000000 AS ws,
               round(
                 (greatest(b0/tot,1e-6)-0.1)*ln(greatest(b0/tot,1e-6)/0.1)
                +(greatest(b1/tot,1e-6)-0.1)*ln(greatest(b1/tot,1e-6)/0.1)
                +(greatest(b2/tot,1e-6)-0.1)*ln(greatest(b2/tot,1e-6)/0.1)
                +(greatest(b3/tot,1e-6)-0.1)*ln(greatest(b3/tot,1e-6)/0.1)
                +(greatest(b4/tot,1e-6)-0.1)*ln(greatest(b4/tot,1e-6)/0.1)
                +(greatest(b5/tot,1e-6)-0.1)*ln(greatest(b5/tot,1e-6)/0.1)
                +(greatest(b6/tot,1e-6)-0.1)*ln(greatest(b6/tot,1e-6)/0.1)
                +(greatest(b7/tot,1e-6)-0.1)*ln(greatest(b7/tot,1e-6)/0.1)
                +(greatest(b8/tot,1e-6)-0.1)*ln(greatest(b8/tot,1e-6)/0.1)
                +(greatest(b9/tot,1e-6)-0.1)*ln(greatest(b9/tot,1e-6)/0.1),
               6) AS psi, n
             FROM t ORDER BY ws""")),

    // streaming twin: StreamingOps.streamingScoreDrift (via streamingPsi
    // over scoreColumn's sigmoid projection) — frozen weights, reference
    // shares from scoreShares over the same corpus (the train-time
    // snapshot); the oracle replays the sigmoid, BOTH bin chains
    // (scoreShares bins floor(score*10), the stream side bins
    // floor((score-0)/0.1) — mirrored exactly as written), and the PSI
    QueryDef("q_streaming_score_drift",
      (s, d) => {
        val ev = events(s, d).na.drop(Seq("ts", "value"))
          .withColumn("x",
            array(lit(1.0), col("value").cast("double") / 100.0))
        val weights = Array(0.2, -0.5)
        val ref = graft.streaming.StreamingOps.scoreShares(
          ev, "x", weights, bins = 10)
        graft.streaming.StreamingOps.streamingScoreDrift(ev, "ts", "x",
            weights, ref, windowDur = "1 hour")
          .select(unix_micros(col("window.start")).as("ws"),
            round(col("psi"), 6).as("psi"), col("n"))
          .orderBy("ws")
      },
      Some("""WITH e AS (SELECT epoch_us(ts) AS tsu,
               1.0/(1.0 + exp(-(0.0 + 1.0*0.2
                 + (value::DOUBLE/100.0)*(-0.5)))) AS score
               FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
             sh AS (SELECT
               sum(CASE WHEN least(floor(score*10), 9) = 0 THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE AS p0,
               sum(CASE WHEN least(floor(score*10), 9) = 1 THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE AS p1,
               sum(CASE WHEN least(floor(score*10), 9) = 2 THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE AS p2,
               sum(CASE WHEN least(floor(score*10), 9) = 3 THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE AS p3,
               sum(CASE WHEN least(floor(score*10), 9) = 4 THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE AS p4,
               sum(CASE WHEN least(floor(score*10), 9) = 5 THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE AS p5,
               sum(CASE WHEN least(floor(score*10), 9) = 6 THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE AS p6,
               sum(CASE WHEN least(floor(score*10), 9) = 7 THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE AS p7,
               sum(CASE WHEN least(floor(score*10), 9) = 8 THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE AS p8,
               sum(CASE WHEN least(floor(score*10), 9) = 9 THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE AS p9 FROM e),
             w AS (SELECT tsu // 3600000000 AS wh,
               sum(CASE WHEN least(greatest(floor((score - 0.0) / 0.1), 0), 9)
                 = 0 THEN 1 ELSE 0 END)::BIGINT AS b0,
               sum(CASE WHEN least(greatest(floor((score - 0.0) / 0.1), 0), 9)
                 = 1 THEN 1 ELSE 0 END)::BIGINT AS b1,
               sum(CASE WHEN least(greatest(floor((score - 0.0) / 0.1), 0), 9)
                 = 2 THEN 1 ELSE 0 END)::BIGINT AS b2,
               sum(CASE WHEN least(greatest(floor((score - 0.0) / 0.1), 0), 9)
                 = 3 THEN 1 ELSE 0 END)::BIGINT AS b3,
               sum(CASE WHEN least(greatest(floor((score - 0.0) / 0.1), 0), 9)
                 = 4 THEN 1 ELSE 0 END)::BIGINT AS b4,
               sum(CASE WHEN least(greatest(floor((score - 0.0) / 0.1), 0), 9)
                 = 5 THEN 1 ELSE 0 END)::BIGINT AS b5,
               sum(CASE WHEN least(greatest(floor((score - 0.0) / 0.1), 0), 9)
                 = 6 THEN 1 ELSE 0 END)::BIGINT AS b6,
               sum(CASE WHEN least(greatest(floor((score - 0.0) / 0.1), 0), 9)
                 = 7 THEN 1 ELSE 0 END)::BIGINT AS b7,
               sum(CASE WHEN least(greatest(floor((score - 0.0) / 0.1), 0), 9)
                 = 8 THEN 1 ELSE 0 END)::BIGINT AS b8,
               sum(CASE WHEN least(greatest(floor((score - 0.0) / 0.1), 0), 9)
                 = 9 THEN 1 ELSE 0 END)::BIGINT AS b9,
               count(*)::BIGINT AS n FROM e GROUP BY 1),
             t AS (SELECT wh, n, greatest(n::DOUBLE, 1.0) AS tot,
               b0, b1, b2, b3, b4, b5, b6, b7, b8, b9 FROM w)
             SELECT wh * 3600000000 AS ws,
               round(
                 (greatest(b0/tot,1e-6)-greatest(p0,1e-6))
                   *ln(greatest(b0/tot,1e-6)/greatest(p0,1e-6))
                +(greatest(b1/tot,1e-6)-greatest(p1,1e-6))
                   *ln(greatest(b1/tot,1e-6)/greatest(p1,1e-6))
                +(greatest(b2/tot,1e-6)-greatest(p2,1e-6))
                   *ln(greatest(b2/tot,1e-6)/greatest(p2,1e-6))
                +(greatest(b3/tot,1e-6)-greatest(p3,1e-6))
                   *ln(greatest(b3/tot,1e-6)/greatest(p3,1e-6))
                +(greatest(b4/tot,1e-6)-greatest(p4,1e-6))
                   *ln(greatest(b4/tot,1e-6)/greatest(p4,1e-6))
                +(greatest(b5/tot,1e-6)-greatest(p5,1e-6))
                   *ln(greatest(b5/tot,1e-6)/greatest(p5,1e-6))
                +(greatest(b6/tot,1e-6)-greatest(p6,1e-6))
                   *ln(greatest(b6/tot,1e-6)/greatest(p6,1e-6))
                +(greatest(b7/tot,1e-6)-greatest(p7,1e-6))
                   *ln(greatest(b7/tot,1e-6)/greatest(p7,1e-6))
                +(greatest(b8/tot,1e-6)-greatest(p8,1e-6))
                   *ln(greatest(b8/tot,1e-6)/greatest(p8,1e-6))
                +(greatest(b9/tot,1e-6)-greatest(p9,1e-6))
                   *ln(greatest(b9/tot,1e-6)/greatest(p9,1e-6)),
               6) AS psi, n
             FROM t, sh ORDER BY ws""")),

    // streaming twin: StreamingOps.trailingCounts (flatMapGroupsWithState)
    // — exact per-event trailing-hour counts; batch runs each user-group
    // once in timestamp order. Input deduped to distinct (user, micros)
    // so the oracle's RANGE window (which counts ALL rows at a tied
    // timestamp) agrees with the stream's strictly-sequential state scan
    QueryDef("q_trailing_counts",
      (s, d) => {
        implicit val sp: SparkSession = s
        import sp.implicits._
        val ev = events(s, d).na.drop(Seq("user_id", "ts"))
          .select(col("user_id").cast("string").as("k"),
            unix_micros(col("ts")).as("t"))
          .distinct()
          .as[(String, Long)]
        graft.streaming.StreamingOps.trailingCounts(ev,
            windowSec = 3600000000L)
          .toDF("user_id", "tsu", "n_win")
          .orderBy("user_id", "tsu")
      },
      Some("""WITH e AS (SELECT DISTINCT user_id::VARCHAR AS user_id,
               epoch_us(ts) AS tsu FROM events
               WHERE user_id IS NOT NULL AND ts IS NOT NULL)
             SELECT user_id, tsu,
               count(*) OVER (PARTITION BY user_id ORDER BY tsu
                 RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)::BIGINT
                 AS n_win
             FROM e ORDER BY user_id, tsu""")),
  )
}
