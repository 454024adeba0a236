package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.agg.Stats
import graft.clean.Clean
import graft.core.HandyFrame
import graft.ml.{HandyFencer, HandyImputer}
import graft.plotdata.PlotData
import graft.strata.{Bucket, ColStratum, Quantile, StratifiedFrame}

/** Gate tier 7/9 — inference tier: stratify API paths, approx sketch tiers, quality filters, classifier/AUC/calibration, the stat-test battery, survival analysis, target encodings.
  *
  * Split from the 11k-line Queries.scala (r11 VERDICT #8): pure
  * relocation, zero semantic movement — [[Queries.defs]] concatenates
  * the nine tiers in the original order and the duplicate-name guard
  * still covers the whole set. All determinism rules live in the
  * [[Queries]] scaladoc; table readers and shared contracts in
  * [[QueryHelpers]]. 43 queries. */
private[graft] object QueriesInference {
  import QueryHelpers._

  val defs: Seq[QueryDef] = Seq(

    // ---- stratify API round-trip: grouped-path median per stratum ---------
    QueryDef("q_stratify_api",
      (s, d) => {
        val sf = lineitem(s, d).toHandy
          .stratify(ColStratum("l_returnflag"), ColStratum("l_linestatus"))
        sf.agg((df, sc) => Stats.percentileExact(df,
            Seq("l_extendedprice"), Seq(0.5), sc))
          .select(col("l_returnflag"), col("l_linestatus"),
            round(col("l_extendedprice_p50"), 4).as("median"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             round(quantile_cont(l_extendedprice, 0.5), 4) AS median
             FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- mode fill on a categorical column (global + stratified) ----------
    QueryDef("q_fill_mode",
      (s, d) => {
        val withNulls = orders(s, d).withColumn("prio",
          when(col("o_orderkey") % 7 === 0, null)
            .otherwise(col("o_orderpriority")))
        val filled = Clean.fill(withNulls.toHandy, Clean.Mode, Seq("prio"),
          Seq(ColStratum("o_orderstatus")))
        filled.df.groupBy("o_orderstatus", "prio")
          .agg(count(lit(1)).as("n"))
          .orderBy("o_orderstatus", "prio")
      },
      Some("""WITH t AS (SELECT o_orderstatus,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL
                 ELSE o_orderpriority END AS prio FROM orders),
             m AS (SELECT o_orderstatus, prio AS mode_v, row_number() OVER (
               PARTITION BY o_orderstatus ORDER BY count(*) DESC, prio) AS rn
               FROM t WHERE prio IS NOT NULL GROUP BY o_orderstatus, prio),
             mv AS (SELECT o_orderstatus, mode_v FROM m WHERE rn = 1)
             SELECT t.o_orderstatus, coalesce(prio, mode_v) AS prio,
               count(*) AS n
             FROM t JOIN mv USING (o_orderstatus)
             GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- Mahalanobis outlier removal --------------------------------------
    QueryDef("q_mahalanobis_remove",
      (s, d) => {
        val ev = events(s, d)
          .withColumn("v2", col("value") * col("value") + col("user_id") % 7)
        val kept = graft.outlier.Mahalanobis.removeOutliers(ev,
          Seq("value", "v2"), 0.999)
        kept.agg(count(lit(1)).as("n_kept"),
          round(sum("value"), 2).as("value_sum"))
      },
      Some("""WITH t AS (SELECT value, value * value + user_id % 7 AS v2
               FROM events),
             m AS (SELECT avg(value) AS m1, stddev_samp(value) AS s1,
               avg(v2) AS m2, stddev_samp(v2) AS s2, corr(value, v2) AS r
               FROM t)
             SELECT count(*) AS n_kept, round(sum(value), 2) AS value_sum
             FROM (SELECT value, (value - m1) / s1 AS u, (v2 - m2) / s2 AS v, r
               FROM t, m)
             WHERE sqrt((u * u - 2 * r * u * v + v * v) / (1 - r * r)) <=
               sqrt(-2 * ln(1 - 0.999))""")),

    // ---- approximate distinct counts (HLL++ — engine sketch, rows-only) ---
    // the HLL++ sketch itself is engine-specific, but its ERROR CONTRACT is
    // not: emit exact counts + a within-4-rsd flag per column, which DuckDB
    // reproduces — the approximation bound is now hash-checked
    QueryDef("q_nunique_approx",
      (s, d) => Stats.nuniqueCheck(lineitem(s, d),
        Seq("l_orderkey", "l_partkey", "l_suppkey")),
      Some("""SELECT count(DISTINCT l_orderkey)::BIGINT AS l_orderkey,
             true AS l_orderkey_ok,
             count(DISTINCT l_partkey)::BIGINT AS l_partkey,
             true AS l_partkey_ok,
             count(DISTINCT l_suppkey)::BIGINT AS l_suppkey,
             true AS l_suppkey_ok
             FROM lineitem""")),

    // ---- stratify FILTERED path: per-stratum agg + clause recombination ----
    QueryDef("q_stratify_filtered",
      (s, d) => {
        val sf = StratifiedFrame(lineitem(s, d), Seq(ColStratum("l_returnflag")))
        sf.perStratum(child => child.agg(
            round(avg("l_extendedprice"), 4).as("price_mean"),
            count(lit(1)).as("n")))
          .orderBy("__stratum")
      },
      Some("""SELECT round(avg(l_extendedprice), 4) AS price_mean,
             count(*) AS n,
             'l_returnflag == "' || l_returnflag || '"' AS __stratum
             FROM lineitem GROUP BY l_returnflag ORDER BY __stratum""")),

    // ---- filtered path WITH the strata-union rewrite rule active ----------
    QueryDef("q_stratify_rewritten",
      (s, d) => {
        // activate the engine's optimizer rule on an ISOLATED child session
        // (same SparkContext, own SessionState): the per-stratum union below
        // is collapsed to one grouped agg when the plan executes, and the
        // opt-in rule/conf never touch the caller's session — the rewrite's
        // empty-stratum soundness guard stays scoped to this query.
        val s2 = s.newSession()
        s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        s2.experimental.extraOptimizations =
          s2.experimental.extraOptimizations :+ graft.plans.StrataUnionRewrite
        s2.conf.set("spark.graft.rewriteStrataUnion", "true")
        val sf = StratifiedFrame(orders(s2, d), Seq(ColStratum("o_orderstatus")))
        sf.perStratum(child => child.agg(
            round(sum("o_totalprice"), 2).as("total"),
            count(lit(1)).as("n")))
          .orderBy("__stratum")
      },
      Some("""SELECT round(sum(o_totalprice), 2) AS total, count(*) AS n,
             'o_orderstatus == "' || o_orderstatus || '"' AS __stratum
             FROM orders GROUP BY o_orderstatus ORDER BY __stratum""")),

    // ---- approx percentiles (GK sketch — the 100-TB default; rows-only) ---
    // GK sketch values are engine-specific, but the rank-error CONTRACT is
    // not: emit exact percentiles + a within-envelope flag per (col, p) —
    // the oracle reproduces both, so the GK bound is hash-checked
    QueryDef("q_median_approx",
      (s, d) => Stats.percentileApproxCheck(lineitem(s, d),
          Seq("l_extendedprice", "l_quantity"), Seq(0.25, 0.5, 0.75),
          precision = 1e-4, strata = Seq("l_returnflag"))
        .select(col("l_returnflag") +:
          (for { c <- Seq("l_extendedprice", "l_quantity"); p <- Seq(25, 50, 75) }
            yield Seq(round(col(s"${c}_p$p"), 4).as(s"${c}_p$p"),
              col(s"${c}_p${p}_ok"))).flatten: _*)
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.25), 4) AS l_extendedprice_p25,
             true AS l_extendedprice_p25_ok,
             round(quantile_cont(l_extendedprice, 0.50), 4) AS l_extendedprice_p50,
             true AS l_extendedprice_p50_ok,
             round(quantile_cont(l_extendedprice, 0.75), 4) AS l_extendedprice_p75,
             true AS l_extendedprice_p75_ok,
             round(quantile_cont(l_quantity, 0.25), 4) AS l_quantity_p25,
             true AS l_quantity_p25_ok,
             round(quantile_cont(l_quantity, 0.50), 4) AS l_quantity_p50,
             true AS l_quantity_p50_ok,
             round(quantile_cont(l_quantity, 0.75), 4) AS l_quantity_p75,
             true AS l_quantity_p75_ok
             FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- Mahalanobis with a full 3x3 inverse ------------------------------
    // Oracle replays the same algebra with the 3x3 correlation inverse
    // written out via cofactors; chi2(3).ppf(0.999) is inlined as a literal
    // (closed-form k=3 CDF: erf(sqrt(x/2)) - sqrt(2/pi)*sqrt(x)*exp(-x/2)).
    QueryDef("q_mahalanobis_3col",
      (s, d) => {
        val li = lineitem(s, d)
        val model = graft.outlier.Mahalanobis.fit(li,
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        li.agg(
          round(avg(model.distance), 6).as("mean_dist"),
          round(max(model.distance), 6).as("max_dist"),
          sum((model.distance > graft.outlier.Mahalanobis.chi2Threshold(3, 0.999))
            .cast("long")).as("n_outliers"))
      },
      Some("""WITH t AS (SELECT l_quantity AS x, l_extendedprice AS y,
               l_discount AS z FROM lineitem),
             m AS (SELECT avg(x) AS mx, stddev_samp(x) AS sx,
               avg(y) AS my, stddev_samp(y) AS sy,
               avg(z) AS mz, stddev_samp(z) AS sz,
               corr(x, y) AS r12, corr(x, z) AS r13, corr(y, z) AS r23 FROM t),
             u AS (SELECT (x - mx) / sx AS u, (y - my) / sy AS v,
               (z - mz) / sz AS w, r12, r13, r23,
               1 - r12*r12 - r13*r13 - r23*r23 + 2*r12*r13*r23 AS det
               FROM t, m),
             dist AS (SELECT sqrt(((1 - r23*r23)*u*u + (1 - r13*r13)*v*v
               + (1 - r12*r12)*w*w + 2*(r13*r23 - r12)*u*v
               + 2*(r12*r23 - r13)*u*w + 2*(r12*r13 - r23)*v*w) / det) AS dd
               FROM u)
             SELECT round(avg(dd), 6) AS mean_dist, round(max(dd), 6) AS max_dist,
               sum((dd > 4.0331422236561405)::BIGINT)::BIGINT AS n_outliers
             FROM dist""")),

    // ---- KS statistics vs closed-form CDFs (window-ECDF oracle) -----------
    // The p-value needs the Kolmogorov CDF (not SQL-expressible), so the
    // oracle-checked query emits the statistics only; q_ks_test keeps the
    // p-values as a rows-only check.
    QueryDef("q_ks_stat",
      (s, d) => {
        val spark = s
        import spark.implicits._
        graft.stat.StatTests.ksTestMulti(lineitem(s, d), "l_extendedprice",
            Seq(("exp30000", "exp", Seq(30000.0)),
              ("uniform", "uniform", Seq(0.0, 110000.0))))
          .map { case (label, r) => (label, r.statistic) }
          .toDF("dist", "ks_stat")
          .select(col("dist"), round(col("ks_stat"), 6).as("ks_stat"))
          .orderBy("dist")
      },
      Some("""WITH s AS (SELECT l_extendedprice::DOUBLE AS v FROM lineitem
               WHERE l_extendedprice IS NOT NULL),
             r AS (SELECT v, (row_number() OVER (ORDER BY v))::DOUBLE AS i,
               (count(*) OVER ())::DOUBLE AS n FROM s),
             d AS (SELECT
               max(greatest(abs((1 - exp(-v / 30000.0)) - (i - 1) / n),
                 abs((1 - exp(-v / 30000.0)) - i / n))) AS exp_d,
               max(greatest(
                 abs(least(greatest(v / 110000.0, 0), 1) - (i - 1) / n),
                 abs(least(greatest(v / 110000.0, 0), 1) - i / n))) AS uni_d
               FROM r)
             SELECT 'exp30000' AS dist, round(exp_d, 6) AS ks_stat FROM d
             UNION ALL
             SELECT 'uniform' AS dist, round(uni_d, 6) AS ks_stat FROM d
             ORDER BY dist""")),

    // ---- Gopher/C4 heuristic quality filters -------------------------------
    // Same newline synthesis as q_repetition (the raw corpus is single-line)
    // so the line-level signals vary. Keep flags compare the UNROUNDED
    // signals on both sides — the division arithmetic is identical
    // (int/double), so the IEEE results match bitwise.
    QueryDef("q_quality_filters",
      (s, d) => {
        val docs2 = documents(s, d)
          .withColumn("text", expr("replace(text, ' a ', chr(10))"))
        graft.pipeline.TextAnalysis.qualityFilters(docs2, "text", minWords = 30)
          .select(col("doc_id"), col("word_count"),
            round(col("mean_word_len"), 6).as("mean_word_len"),
            round(col("alpha_word_frac"), 6).as("alpha_word_frac"),
            round(col("symbol_word_ratio"), 6).as("symbol_word_ratio"),
            col("stopword_hits"),
            round(col("bullet_line_frac"), 6).as("bullet_line_frac"),
            round(col("ellipsis_line_frac"), 6).as("ellipsis_line_frac"),
            round(col("terminal_punct_line_frac"), 6)
              .as("terminal_punct_line_frac"),
            col("sentence_count"),
            col("keep_gopher").cast("int").as("keep_gopher"),
            col("keep_c4").cast("int").as("keep_c4"))
          .orderBy("doc_id")
      },
      Some("""WITH d2 AS (SELECT doc_id, replace(text, ' a ', chr(10)) AS text
               FROM documents),
             t AS (SELECT doc_id, text,
               list_filter(regexp_split_to_array(trim(text), '\s+'),
                 x -> x <> '') AS w,
               list_filter(list_transform(string_split(text, chr(10)),
                 x -> trim(x)), x -> x <> '') AS l
               FROM d2),
             m AS (SELECT doc_id, text, w, l, len(w) AS wc,
               greatest(len(w), 1)::DOUBLE AS wcd,
               greatest(len(l), 1)::DOUBLE AS lcd,
               coalesce(list_sum(list_transform(w, x -> length(x))), 0) /
                 greatest(len(w), 1)::DOUBLE AS mwl,
               len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) /
                 greatest(len(w), 1)::DOUBLE AS awf,
               ((length(text) - length(translate(text, '#', ''))) +
                CAST((length(text) - length(regexp_replace(text,
                  '\.\.\.', '', 'g'))) / 3 AS BIGINT) +
                (length(text) - length(translate(text, '…', '')))) /
                 greatest(len(w), 1)::DOUBLE AS swr,
               (list_contains(w, 'the')::INT + list_contains(w, 'be')::INT +
                list_contains(w, 'to')::INT + list_contains(w, 'of')::INT +
                list_contains(w, 'and')::INT + list_contains(w, 'that')::INT +
                list_contains(w, 'have')::INT + list_contains(w, 'with')::INT)
                 AS hits,
               len(list_filter(l, x -> regexp_matches(x, '^[-*•]'))) /
                 greatest(len(l), 1)::DOUBLE AS blf,
               len(list_filter(l, x -> regexp_matches(x, '(\.\.\.|…)$'))) /
                 greatest(len(l), 1)::DOUBLE AS elf,
               len(list_filter(l, x -> regexp_matches(x, '[.!?"'']$'))) /
                 greatest(len(l), 1)::DOUBLE AS tpf,
               length(text) - length(translate(text, '.!?', '')) AS sc,
               contains(lower(text), 'lorem ipsum') AS lorem,
               contains(text, '{') AS brace
               FROM t)
             SELECT doc_id, wc AS word_count,
               round(mwl, 6) AS mean_word_len,
               round(awf, 6) AS alpha_word_frac,
               round(swr, 6) AS symbol_word_ratio,
               hits AS stopword_hits,
               round(blf, 6) AS bullet_line_frac,
               round(elf, 6) AS ellipsis_line_frac,
               round(tpf, 6) AS terminal_punct_line_frac,
               sc AS sentence_count,
               CASE WHEN wc BETWEEN 30 AND 100000
                 AND mwl BETWEEN 3.0 AND 10.0 AND swr <= 0.1
                 AND blf <= 0.9 AND elf <= 0.3 AND awf >= 0.8
                 AND hits >= 2 THEN 1 ELSE 0 END AS keep_gopher,
               CASE WHEN sc >= 3 AND wc >= 5 AND NOT lorem AND NOT brace
                 THEN 1 ELSE 0 END AS keep_c4
             FROM m ORDER BY doc_id""")),

    // ---- logistic quality classifier (Classify) ---------------------------
    // two full-batch GD steps from zero init are exactly SQL-replayable:
    // step 1's sigmoid is the constant 0.5, step 2's runs through exp() —
    // both engines' IEEE doubles agree well inside the 1e-6 rounding.
    // Convergence/accuracy of longer trainings is spec-pinned
    // (ClassifySpec); this row pins the distributed gradient arithmetic.
    QueryDef("q_logreg_step",
      (s, d) => {
        import s.implicits._
        val docs = documents(s, d)
          .filter(col("lang").isNotNull && col("n_chars").isNotNull)
          .withColumn("y", (col("lang") === "en").cast("double"))
          .withColumn("x",
            array(lit(1.0), col("n_chars").cast("double") / 1000.0))
        val m = graft.pipeline.Classify.trainLogistic(
          docs, "x", "y", steps = 2, lr = 0.5)
        m.weights.zipWithIndex
          .map { case (w, j) =>
            (j, BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble) }
          .toSeq.toDF("dim", "weight").orderBy("dim")
      },
      Some("""WITH f AS (SELECT (lang = 'en')::INT::DOUBLE AS y, 1.0 AS x0,
               n_chars::DOUBLE / 1000.0 AS x1 FROM documents
               WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
             s1 AS (SELECT count(*)::DOUBLE AS n, sum((0.5 - y) * x0) AS g0,
               sum((0.5 - y) * x1) AS g1 FROM f),
             w1 AS (SELECT -0.5 * g0 / n AS w0, -0.5 * g1 / n AS w1 FROM s1),
             p AS (SELECT y, x0, x1,
               1.0 / (1.0 + exp(-(w1.w0 * x0 + w1.w1 * x1))) AS p
               FROM f, w1),
             s2 AS (SELECT count(*)::DOUBLE AS n, sum((p - y) * x0) AS g0,
               sum((p - y) * x1) AS g1 FROM p),
             w2 AS (SELECT w1.w0 - 0.5 * s2.g0 / s2.n AS w0,
               w1.w1 - 0.5 * s2.g1 / s2.n AS w1 FROM w1, s2)
             SELECT 0::INT AS dim, round(w0, 6) AS weight FROM w2
             UNION ALL SELECT 1::INT, round(w1, 6) FROM w2 ORDER BY dim""")),

    // corpus scoring through the SAME 2-step weights: the oracle recomputes
    // the weights in SQL and pushes every doc through the sigmoid — pins
    // the distributed scoreColumn projection end-to-end
    QueryDef("q_logreg_score",
      (s, d) => {
        val docs = documents(s, d)
          .filter(col("lang").isNotNull && col("n_chars").isNotNull)
          .withColumn("y", (col("lang") === "en").cast("double"))
          .withColumn("x",
            array(lit(1.0), col("n_chars").cast("double") / 1000.0))
        val m = graft.pipeline.Classify.trainLogistic(
          docs, "x", "y", steps = 2, lr = 0.5)
        graft.pipeline.Classify.scoreLogistic(docs, "x", m.weights)
          .select(col("doc_id"), round(col("score"), 6).as("score"))
          .orderBy("doc_id")
      },
      Some("""WITH f AS (SELECT doc_id, (lang = 'en')::INT::DOUBLE AS y,
               1.0 AS x0, n_chars::DOUBLE / 1000.0 AS x1 FROM documents
               WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
             s1 AS (SELECT count(*)::DOUBLE AS n, sum((0.5 - y) * x0) AS g0,
               sum((0.5 - y) * x1) AS g1 FROM f),
             w1 AS (SELECT -0.5 * g0 / n AS w0, -0.5 * g1 / n AS w1 FROM s1),
             p AS (SELECT y, x0, x1,
               1.0 / (1.0 + exp(-(w1.w0 * x0 + w1.w1 * x1))) AS p
               FROM f, w1),
             s2 AS (SELECT count(*)::DOUBLE AS n, sum((p - y) * x0) AS g0,
               sum((p - y) * x1) AS g1 FROM p),
             w2 AS (SELECT w1.w0 - 0.5 * s2.g0 / s2.n AS w0,
               w1.w1 - 0.5 * s2.g1 / s2.n AS w1 FROM w1, s2)
             SELECT doc_id, round(1.0 / (1.0 +
               exp(-(w2.w0 * x0 + w2.w1 * x1))), 6) AS score
             FROM f, w2 ORDER BY doc_id""")),

    // ---- cross-validated classifier AUC -----------------------------------
    // k=3 folds × 2-step training, fully replayed: folds via the q_kfold
    // Lehmer chain, leave-one-out step-1 sums by subtraction from the
    // totals, step 2 through exp() per (row, model) pair, per-fold AUC by
    // the q_auc_by rank identity. Ranks are engine-stable because the
    // sigmoid is monotone in the one varying feature — ulp-level weight
    // differences cannot reorder scores.
    QueryDef("q_crossval",
      (s, d) => {
        val docs = documents(s, d)
          .filter(col("lang").isNotNull && col("n_chars").isNotNull)
          .withColumn("y", (col("lang") === "en").cast("double"))
          .withColumn("x",
            array(lit(1.0), col("n_chars").cast("double") / 1000.0))
        graft.pipeline.Classify.crossValAuc(docs, "doc_id", "x", "y",
            k = 3, steps = 2, lr = 0.5, seed = 3L)
          .select(col("fold"), col("n_train"), col("pos"), col("neg"),
            round(col("auc_roc"), 6).as("auc_roc"))
          .orderBy("fold")
      },
      Some("""WITH base AS (SELECT doc_id, (lang = 'en')::INT::DOUBLE AS y,
               1.0 AS x0, n_chars::DOUBLE / 1000.0 AS x1 FROM documents
               WHERE lang IS NOT NULL AND n_chars IS NOT NULL
                 AND doc_id IS NOT NULL),
             k1 AS (SELECT *, (doc_id % 2147483648 +
                 (doc_id // 2147483648) * 48271) % 2147483646 + 1 AS xx
               FROM base),
             k2 AS (SELECT *, ((xx * 48271 % 2147483647) * 48271
                 % 2147483647) * 48271 % 2147483647 AS x3 FROM k1),
             f AS (SELECT doc_id, y, x0, x1, least(floor(
                 ((((x3 + 3) % 2147483646 + 1) * 48271 % 2147483647)
                   * 48271 % 2147483647)::DOUBLE / 2147483647.0 * 3), 2)
                 ::INT AS fold FROM k2),
             pf AS (SELECT fold, count(*)::DOUBLE AS n,
               sum((0.5 - y) * x0) AS g0, sum((0.5 - y) * x1) AS g1
               FROM f GROUP BY 1),
             tot AS (SELECT sum(n) AS n, sum(g0) AS g0, sum(g1) AS g1
               FROM pf),
             w1 AS (SELECT pf.fold,
               -0.5 * (tot.g0 - pf.g0) / (tot.n - pf.n) AS w0,
               -0.5 * (tot.g1 - pf.g1) / (tot.n - pf.n) AS w1
               FROM pf, tot),
             p2 AS (SELECT w1.fold AS m, f.y, f.x0, f.x1, 1.0 / (1.0 +
                 exp(-(w1.w0 * f.x0 + w1.w1 * f.x1))) AS p
               FROM f JOIN w1 ON f.fold <> w1.fold),
             s2 AS (SELECT m, count(*)::DOUBLE AS n,
               sum((p - y) * x0) AS g0, sum((p - y) * x1) AS g1
               FROM p2 GROUP BY 1),
             w2 AS (SELECT w1.fold, w1.w0 - 0.5 * s2.g0 / s2.n AS w0,
               w1.w1 - 0.5 * s2.g1 / s2.n AS w1x
               FROM w1 JOIN s2 ON w1.fold = s2.m),
             sc AS (SELECT f.fold, f.y, 1.0 / (1.0 +
                 exp(-(w2.w0 * f.x0 + w2.w1x * f.x1))) AS score
               FROM f JOIN w2 ON f.fold = w2.fold),
             ps AS (SELECT fold, score, sum(y) AS pos,
               count(*)::DOUBLE AS cnt FROM sc GROUP BY 1, 2),
             r AS (SELECT fold, pos, cnt, coalesce(sum(cnt) OVER
                 (PARTITION BY fold ORDER BY score ROWS BETWEEN UNBOUNDED
                  PRECEDING AND 1 PRECEDING), 0) AS below FROM ps),
             a AS (SELECT fold, sum(pos) AS p, sum(cnt - pos) AS n,
               sum(pos * (below + (cnt + 1) / 2.0)) AS prs FROM r
               GROUP BY 1),
             t2 AS (SELECT count(*) AS total FROM f)
             SELECT a.fold, (t2.total - a.p - a.n)::BIGINT AS n_train,
               a.p::BIGINT AS pos, a.n::BIGINT AS neg,
               round((prs - a.p * (a.p + 1) / 2.0) / (a.p * a.n), 6)
                 AS auc_roc
             FROM a, t2 ORDER BY fold""")),

    // ---- per-group AUC (Mann-Whitney rank identity) -----------------------
    QueryDef("q_auc_by",
      (s, d) => {
        val li = lineitem(s, d)
          .withColumn("label", (col("l_returnflag") === "R").cast("double"))
        graft.eval.BinaryMetrics.aucBy(li, "l_discount", "label",
            "l_linestatus")
          .select(col("l_linestatus"), col("pos"), col("neg"),
            round(col("auc_roc"), 6).as("auc_roc"))
          .orderBy("l_linestatus")
      },
      Some("""WITH sl AS (SELECT l_linestatus AS g, l_discount::DOUBLE
                 AS score, (l_returnflag = 'R')::INT::DOUBLE AS y
               FROM lineitem WHERE l_linestatus IS NOT NULL
                 AND l_discount IS NOT NULL AND l_returnflag IS NOT NULL),
             ps AS (SELECT g, score, sum(y) AS pos,
               count(*)::DOUBLE AS cnt FROM sl GROUP BY 1, 2),
             r AS (SELECT g, pos, cnt, coalesce(sum(cnt) OVER
                 (PARTITION BY g ORDER BY score ROWS BETWEEN UNBOUNDED
                  PRECEDING AND 1 PRECEDING), 0) AS below FROM ps),
             a AS (SELECT g, sum(pos) AS p, sum(cnt - pos) AS n,
               sum(pos * (below + (cnt + 1) / 2.0)) AS prs FROM r
               GROUP BY 1)
             SELECT g AS l_linestatus, p::BIGINT AS pos, n::BIGINT AS neg,
               round((prs - p * (p + 1) / 2.0) / (p * n), 6) AS auc_roc
             FROM a ORDER BY l_linestatus""")),

    // feature importance of the replayed 2-step model: |w|·σ normalized;
    // the constant bias feature exercises the σ=0 → importance-0 path
    QueryDef("q_feature_importance",
      (s, d) => {
        val docs = documents(s, d)
          .filter(col("lang").isNotNull && col("n_chars").isNotNull)
          .withColumn("y", (col("lang") === "en").cast("double"))
          .withColumn("x",
            array(lit(1.0), col("n_chars").cast("double") / 1000.0))
        val m = graft.pipeline.Classify.trainLogistic(
          docs, "x", "y", steps = 2, lr = 0.5)
        graft.pipeline.Classify.featureImportance(docs, "x", m.weights)
          .select(col("dim"), round(col("weight"), 6).as("weight"),
            round(col("raw_importance"), 6).as("raw_importance"),
            round(col("importance"), 6).as("importance"))
          .orderBy("dim")
      },
      Some("""WITH f AS (SELECT (lang = 'en')::INT::DOUBLE AS y, 1.0 AS x0,
               n_chars::DOUBLE / 1000.0 AS x1 FROM documents
               WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
             s1 AS (SELECT count(*)::DOUBLE AS n, sum((0.5 - y) * x0) AS g0,
               sum((0.5 - y) * x1) AS g1 FROM f),
             w1 AS (SELECT -0.5 * g0 / n AS w0, -0.5 * g1 / n AS w1 FROM s1),
             p AS (SELECT y, x0, x1, 1.0 / (1.0 +
               exp(-(w1.w0 * x0 + w1.w1 * x1))) AS p FROM f, w1),
             s2 AS (SELECT count(*)::DOUBLE AS n, sum((p - y) * x0) AS g0,
               sum((p - y) * x1) AS g1 FROM p),
             w2 AS (SELECT w1.w0 - 0.5 * s2.g0 / s2.n AS w0,
               w1.w1 - 0.5 * s2.g1 / s2.n AS w1 FROM w1, s2),
             sd AS (SELECT stddev_samp(x1) AS s FROM f)
             SELECT 0::INT AS dim, round(w0, 6) AS weight,
               0.0 AS raw_importance, 0.0 AS importance FROM w2
             UNION ALL
             SELECT 1::INT, round(w1, 6), round(abs(w1) * s, 6), 1.0
             FROM w2, sd ORDER BY dim""")),

    // ---- calibration curve + Brier score ----------------------------------
    QueryDef("q_calibration",
      (s, d) => {
        val li = lineitem(s, d)
          .withColumn("label", (col("l_returnflag") === "R").cast("double"))
          .withColumn("p", col("l_discount") * 10.0)
        graft.eval.BinaryMetrics.calibrationCurve(li, "p", "label", bins = 10)
          .select(col("bin"), col("n"),
            round(col("mean_pred"), 6).as("mean_pred"),
            round(col("frac_pos"), 6).as("frac_pos"))
          .orderBy("bin")
      },
      Some("""WITH sl AS (SELECT l_discount * 10.0 AS p,
               (l_returnflag = 'R')::INT::DOUBLE AS y FROM lineitem
               WHERE l_discount IS NOT NULL AND l_returnflag IS NOT NULL)
             SELECT least(floor(p * 10), 9)::INT AS bin,
               count(*)::BIGINT AS n,
               round(avg(p), 6) AS mean_pred,
               round(avg(y), 6) AS frac_pos
             FROM sl GROUP BY 1 ORDER BY 1""")),

    // ---- cumulative gains / lift table -------------------------------------
    // equal-frequency deciles of the (score desc, tie) ranking via the
    // range-sort + partition-offset scaffold (no single-partition
    // window); every ratio is ONE division of exact longs, identical op
    // order in both engines, so the row compares UNROUNDED
    QueryDef("q_lift",
      (s, d) => {
        val li = lineitem(s, d)
          .withColumn("label", (col("l_returnflag") === "R").cast("double"))
          .withColumn("tie",
            col("l_orderkey").cast("long") * 8 + col("l_linenumber"))
        graft.eval.BinaryMetrics.liftTable(li, "l_discount", "label",
            "tie", nBuckets = 10)
          .orderBy("bucket")
      },
      Some("""WITH sl AS (SELECT (l_returnflag = 'R')::INT::BIGINT AS y,
               l_discount AS s, l_orderkey * 8 + l_linenumber AS t
               FROM lineitem
               WHERE l_discount IS NOT NULL AND l_returnflag IS NOT NULL
                 AND l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL),
             r AS (SELECT y, row_number() OVER (ORDER BY s DESC, t) AS rn
               FROM sl),
             tot AS (SELECT count(*)::BIGINT AS tn, sum(y)::BIGINT AS tp
               FROM sl),
             bk AS (SELECT ((rn - 1) * 10) // tn AS bi,
               count(*)::BIGINT AS bn, sum(y)::BIGINT AS pos
               FROM r, tot GROUP BY 1),
             c AS (SELECT bi, bn, pos,
               sum(bn) OVER (ORDER BY bi)::BIGINT AS cum_n,
               sum(pos) OVER (ORDER BY bi)::BIGINT AS cum_pos FROM bk)
             SELECT (bi + 1)::INT AS bucket, bn AS n, pos,
               pos / bn AS rate,
               (pos / bn) / (tp / tn) AS lift,
               cum_n, cum_pos,
               cum_pos / tp AS gain,
               (cum_pos / cum_n) / (tp / tn) AS cum_lift
             FROM c, tot ORDER BY bucket""")),

    // isotonic calibration contract (the q_pca_check pattern): the PAV
    // solve itself is iterative pooling the oracle can't replay, but its
    // invariants are exact — bin census reproduced, mass conserved
    // (Σ n·calibrated = Σ pos), monotone, within [0,1]
    QueryDef("q_isotonic",
      (s, d) => {
        import s.implicits._
        val li = lineitem(s, d)
          .withColumn("label", (col("l_returnflag") === "R").cast("double"))
          .withColumn("p", col("l_discount") * 10.0)
        val fit = graft.eval.BinaryMetrics.isotonicCalibrate(
            li, "p", "label", bins = 10)
          .orderBy("bin")
          .as[(Int, Long, Long, Double, Double)].collect()
        val monotone = fit.sliding(2)
          .forall(w => w.length < 2 || w(0)._5 <= w(1)._5)
        val inBounds = fit.forall(r => r._5 >= 0.0 && r._5 <= 1.0)
        val massCal = fit.map(r => r._2 * r._5).sum
        Seq((fit.length, fit.map(_._3).sum,
            BigDecimal(massCal).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble, monotone, inBounds))
          .toDF("n_bins", "mass_pos", "mass_cal", "monotone", "in_bounds")
      },
      Some("""WITH sl AS (SELECT least(floor((l_discount * 10.0) * 10), 9)
                 ::INT AS bin, (l_returnflag = 'R')::INT AS y FROM lineitem
               WHERE l_discount IS NOT NULL AND l_returnflag IS NOT NULL),
             b AS (SELECT bin, count(*) AS n, sum(y) AS pos FROM sl
               GROUP BY 1)
             SELECT count(*)::INT AS n_bins, sum(pos)::BIGINT AS mass_pos,
               round(sum(pos)::DOUBLE, 6) AS mass_cal,
               true AS monotone, true AS in_bounds FROM b""")),

    QueryDef("q_brier",
      (s, d) => {
        val li = lineitem(s, d)
          .withColumn("label", (col("l_returnflag") === "R").cast("double"))
          .withColumn("p", col("l_discount") * 10.0)
        graft.eval.BinaryMetrics.brierScore(li, "p", "label")
          .select(round(col("brier"), 6).as("brier"), col("n"))
      },
      Some("""SELECT round(avg(pow(l_discount * 10.0 -
               (l_returnflag = 'R')::INT::DOUBLE, 2)), 6) AS brier,
             count(*)::BIGINT AS n FROM lineitem
             WHERE l_discount IS NOT NULL AND l_returnflag IS NOT NULL""")),

    // ---- JL random sign projection ----------------------------------------
    // the md5 sign basis makes the whole projection replayable in DuckDB
    // (the q_cms contract pattern); the JL distortion bound is spec-pinned.
    QueryDef("q_jl_project",
      (s, d) => graft.pipeline.Pca.jlProject(
          embeddings(s, d), "vec_id", "embedding", outDim = 16, seed = 7)
        .select(col("vec_id"), posexplode(col("projection")).as(Seq("j", "v")))
        .select(col("vec_id"), col("j"), round(col("v"), 6).as("v"))
        .orderBy("vec_id", "j"),
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
               FROM embeddings
               WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
             s AS (SELECT vec_id, j.j, sum(CASE WHEN
                 substr(md5('7:' || j.j || ':' || t.i), 1, 1)
                   BETWEEN '0' AND '7'
                 THEN v[t.i + 1] ELSE -v[t.i + 1] END) AS acc
               FROM e, range(16) j(j), range(64) t(i) GROUP BY 1, 2)
             SELECT vec_id, j::INT AS j, round(acc * 0.25, 6) AS v
             FROM s ORDER BY vec_id, j""")),

    // ---- Brier decomposition (Murphy) -------------------------------------
    QueryDef("q_brier_decomp",
      (s, d) => {
        val li = lineitem(s, d)
          .withColumn("label", (col("l_returnflag") === "R").cast("double"))
          .withColumn("p", col("l_discount") * 10.0)
        graft.eval.BinaryMetrics.brierDecomposition(li, "p", "label",
            bins = 10)
          .select(col("n"), round(col("brier"), 6).as("brier"),
            round(col("reliability"), 6).as("reliability"),
            round(col("resolution"), 6).as("resolution"),
            round(col("uncertainty"), 6).as("uncertainty"),
            round(col("within_bin_var"), 6).as("within_bin_var"),
            round(col("within_bin_cov"), 6).as("within_bin_cov"))
      },
      Some("""WITH sl AS (SELECT l_discount * 10.0 AS p,
               (l_returnflag = 'R')::INT::DOUBLE AS y FROM lineitem
               WHERE l_discount IS NOT NULL AND l_returnflag IS NOT NULL),
             c AS (SELECT least(floor(p * 10), 9)::INT AS bin,
               count(*)::DOUBLE AS n, avg(p) AS pbar, avg(y) AS ybarb,
               avg((p - y) * (p - y)) AS bs,
               avg(p * p) - avg(p) * avg(p) AS v,
               avg(p * y) - avg(p) * avg(y) AS cv FROM sl GROUP BY 1),
             t AS (SELECT sum(n) AS n,
               sum(n * ybarb) / sum(n) AS ybar,
               sum(n * bs) / sum(n) AS brier,
               sum(n * (pbar - ybarb) * (pbar - ybarb)) / sum(n) AS rel,
               sum(n * v) / sum(n) AS wv, sum(n * cv) / sum(n) AS wc
               FROM c),
             r AS (SELECT t.n, t.brier, t.rel,
               (SELECT sum(c.n * (c.ybarb - t.ybar) * (c.ybarb - t.ybar))
                FROM c) / t.n AS res,
               t.ybar * (1 - t.ybar) AS unc, t.wv, t.wc FROM t)
             SELECT n::BIGINT AS n, round(brier, 6) AS brier,
               round(rel, 6) AS reliability, round(res, 6) AS resolution,
               round(unc, 6) AS uncertainty,
               round(wv, 6) AS within_bin_var,
               round(wc, 6) AS within_bin_cov FROM r""")),

    // ---- multiclass metrics ----------------------------------------------
    QueryDef("q_multiclass",
      (s, d) => {
        val li = lineitem(s, d)
          .withColumn("pred", when(col("l_quantity") <= 17, "A")
            .when(col("l_quantity") <= 34, "N").otherwise("R"))
        graft.eval.Multiclass.perClass(li, "pred", "l_returnflag")
          .select(col("cls"), col("support"), col("predicted"), col("tp"),
            round(col("precision"), 6).as("precision"),
            round(col("recall"), 6).as("recall"),
            round(col("f1"), 6).as("f1"))
          .orderBy("cls")
      },
      Some("""WITH d AS (SELECT l_returnflag AS label,
               CASE WHEN l_quantity <= 17 THEN 'A'
                 WHEN l_quantity <= 34 THEN 'N' ELSE 'R' END AS pred
               FROM lineitem WHERE l_returnflag IS NOT NULL
                 AND l_quantity IS NOT NULL),
             c AS (SELECT label, pred, count(*)::BIGINT AS n FROM d
               GROUP BY 1, 2),
             sup AS (SELECT label AS cls, sum(n)::BIGINT AS support FROM c
               GROUP BY 1),
             prd AS (SELECT pred AS cls, sum(n)::BIGINT AS predicted
               FROM c GROUP BY 1),
             tpc AS (SELECT label AS cls, n AS tp FROM c
               WHERE label = pred),
             j AS (SELECT coalesce(sup.cls, prd.cls) AS cls,
               coalesce(support, 0) AS support,
               coalesce(predicted, 0) AS predicted,
               coalesce(tp, 0) AS tp
               FROM sup FULL OUTER JOIN prd ON sup.cls = prd.cls
               LEFT JOIN tpc ON coalesce(sup.cls, prd.cls) = tpc.cls)
             SELECT cls, support, predicted, tp,
               round(tp / predicted::DOUBLE, 6) AS precision,
               round(tp / support::DOUBLE, 6) AS recall,
               round(CASE WHEN tp = 0 THEN 0.0 ELSE
                 2.0 * (tp / predicted::DOUBLE) * (tp / support::DOUBLE) /
                 (tp / predicted::DOUBLE + tp / support::DOUBLE) END, 6)
                 AS f1
             FROM j ORDER BY cls""")),

    QueryDef("q_multiclass_sum",
      (s, d) => {
        val li = lineitem(s, d)
          .withColumn("pred", when(col("l_quantity") <= 17, "A")
            .when(col("l_quantity") <= 34, "N").otherwise("R"))
        graft.eval.Multiclass.summary(li, "pred", "l_returnflag")
          .select(col("n"), round(col("accuracy"), 6).as("accuracy"),
            round(col("macro_precision"), 6).as("macro_precision"),
            round(col("macro_recall"), 6).as("macro_recall"),
            round(col("macro_f1"), 6).as("macro_f1"),
            round(col("weighted_f1"), 6).as("weighted_f1"))
      },
      Some("""WITH d AS (SELECT l_returnflag AS label,
               CASE WHEN l_quantity <= 17 THEN 'A'
                 WHEN l_quantity <= 34 THEN 'N' ELSE 'R' END AS pred
               FROM lineitem WHERE l_returnflag IS NOT NULL
                 AND l_quantity IS NOT NULL),
             c AS (SELECT label, pred, count(*)::BIGINT AS n FROM d
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
               tp / predicted::DOUBLE AS p, tp / support::DOUBLE AS r,
               CASE WHEN tp = 0 THEN 0.0 ELSE
                 2.0 * (tp / predicted::DOUBLE) * (tp / support::DOUBLE) /
                 (tp / predicted::DOUBLE + tp / support::DOUBLE) END AS f1
               FROM j)
             SELECT sum(support)::BIGINT AS n,
               round(sum(tp) / sum(support)::DOUBLE, 6) AS accuracy,
               round(avg(p), 6) AS macro_precision,
               round(avg(r), 6) AS macro_recall,
               round(avg(f1), 6) AS macro_f1,
               round(sum(f1 * support) / sum(support)::DOUBLE, 6)
                 AS weighted_f1
             FROM m""")),

    // ---- operating-point selection (threshold at target precision) -------
    QueryDef("q_threshold_at",
      (s, d) => {
        val li = lineitem(s, d)
          .withColumn("label", (col("l_quantity") > 25).cast("double"))
          .withColumn("p", col("l_quantity") / 50.0)
        graft.eval.BinaryMetrics.thresholdAtPrecision(li, "p", "label",
            minPrecision = 0.9)
          .select(round(col("threshold"), 6).as("threshold"),
            round(col("precision"), 6).as("precision"),
            round(col("recall"), 6).as("recall"))
      },
      Some("""WITH sl AS (SELECT l_quantity / 50.0 AS score,
               (l_quantity > 25)::INT::DOUBLE AS label FROM lineitem
               WHERE l_quantity IS NOT NULL),
             per AS (SELECT score, sum(label)::DOUBLE AS pos,
               (count(*) - sum(label))::DOUBLE AS neg FROM sl GROUP BY 1),
             c AS (SELECT score,
               sum(pos) OVER (ORDER BY score DESC
                 ROWS UNBOUNDED PRECEDING) AS tp,
               sum(neg) OVER (ORDER BY score DESC
                 ROWS UNBOUNDED PRECEDING) AS fp,
               sum(pos) OVER () AS p FROM per),
             sel AS (SELECT score AS threshold, tp / (tp + fp) AS precision,
               tp / p AS recall FROM c WHERE tp / (tp + fp) >= 0.9)
             SELECT round(threshold, 6) AS threshold,
               round(precision, 6) AS precision, round(recall, 6) AS recall
             FROM sel ORDER BY threshold LIMIT 1""")),

    // ---- two-proportion z-test (curation A/B keep rates) ------------------
    QueryDef("q_prop_test",
      (s, d) => {
        val li = lineitem(s, d)
          .withColumn("kept", (col("l_returnflag") === "R").cast("int"))
        graft.stat.StatTests.propTestStats(li, "kept", Seq("l_linestatus"))
          .select(col("a_l_linestatus"), col("b_l_linestatus"),
            col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"),
            round(col("rate1"), 6).as("rate1"),
            round(col("rate2"), 6).as("rate2"),
            round(col("z_stat"), 6).as("z_stat"))
          .orderBy("a_l_linestatus", "b_l_linestatus")
      },
      Some("""WITH g AS (SELECT l_linestatus AS g,
               sum((l_returnflag = 'R')::INT)::DOUBLE AS s,
               count(*)::DOUBLE AS n FROM lineitem
               WHERE l_linestatus IS NOT NULL AND l_returnflag IS NOT NULL
               GROUP BY 1),
             pairs AS (SELECT a.g AS ga, b.g AS gb, a.s AS s1, a.n AS n1,
               b.s AS s2, b.n AS n2 FROM g a, g b WHERE a.g < b.g)
             SELECT ga AS a_l_linestatus, gb AS b_l_linestatus,
               n1::BIGINT AS n1, n2::BIGINT AS n2,
               round(s1 / n1, 6) AS rate1, round(s2 / n2, 6) AS rate2,
               round((s1 / n1 - s2 / n2) / sqrt(
                 ((s1 + s2) / (n1 + n2)) * (1 - (s1 + s2) / (n1 + n2)) *
                 (1 / n1 + 1 / n2)), 6) AS z_stat
             FROM pairs ORDER BY 1, 2""")),

    // ---- chi-square independence + Cramér's V -----------------------------
    // the zero-cell-free identity chi2 = N·(Σ o²/(row·col) − 1): both
    // engines replay it term-for-term over the observed cells only
    QueryDef("q_chi2",
      (s, d) => graft.stat.InferenceTests.chiSquare(
          lineitem(s, d), "l_returnflag", "l_linestatus")
        .select(col("n"), col("rows"), col("cols"), col("dof"),
          round(col("chi2"), 6).as("chi2"),
          round(col("cramers_v"), 6).as("cramers_v")),
      Some("""WITH cells AS (SELECT l_returnflag AS a, l_linestatus AS b,
               count(*)::DOUBLE AS n FROM lineitem
               WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
               GROUP BY 1, 2),
             m AS (SELECT a, b, n,
               sum(n) OVER (PARTITION BY a) AS rn,
               sum(n) OVER (PARTITION BY b) AS cn,
               sum(n) OVER () AS tot FROM cells),
             agg AS (SELECT max(tot)::BIGINT AS n,
               count(DISTINCT a)::BIGINT AS rows_,
               count(DISTINCT b)::BIGINT AS cols_,
               sum(n * n / (rn * cn)) AS s, max(tot) AS nd FROM m)
             SELECT n, rows_ AS "rows", cols_ AS cols,
               (rows_ - 1) * (cols_ - 1) AS dof,
               round(nd * (s - 1.0), 6) AS chi2,
               round(sqrt(nd * (s - 1.0) /
                 (nd * least(rows_ - 1, cols_ - 1))), 6) AS cramers_v
             FROM agg""")),

    // ---- one-way ANOVA F ---------------------------------------------------
    // ANOVA is shift-invariant, and the raw-sums identity on ~1e5-scale
    // prices suffers catastrophic cancellation (Σs²/n − S²/N agreed to
    // only ~0.03 absolute between engines at sf0.01) — center by a FIXED
    // literal near the mean on both sides so the identical statistics
    // come out with ~1e9× less cancellation error. SS columns are scaled
    // to per-row mean squares (magnitude ~1e5, engine diff ≪ 1e-6)
    QueryDef("q_anova",
      (s, d) => graft.stat.InferenceTests.anovaF(
          lineitem(s, d).withColumn("price_c",
            col("l_extendedprice") - 38000.0d),
          "price_c", "l_returnflag")
        .select(col("k"), col("n"),
          round(col("ss_between") / col("n"), 4).as("msb_per_row"),
          round(col("ss_within") / col("n"), 4).as("msw_per_row"),
          col("df_between"), col("df_within"),
          round(col("f_stat"), 6).as("f_stat")),
      Some("""WITH g AS (SELECT l_returnflag, count(*)::DOUBLE AS n,
               sum(l_extendedprice - 38000.0) AS s,
               sum((l_extendedprice - 38000.0) * (l_extendedprice - 38000.0))
                 AS ss
               FROM lineitem WHERE l_extendedprice IS NOT NULL
                 AND l_returnflag IS NOT NULL GROUP BY 1),
             t AS (SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS n,
               sum(s * s / n) - sum(s) * sum(s) / sum(n) AS ssb,
               sum(ss - s * s / n) AS ssw, sum(n) AS nd FROM g)
             SELECT k, n, round(ssb / nd, 4) AS msb_per_row,
               round(ssw / nd, 4) AS msw_per_row,
               (k - 1)::BIGINT AS df_between, (nd - k)::BIGINT AS df_within,
               round((ssb / (k - 1)) / (ssw / (nd - k)), 6) AS f_stat
             FROM t""")),

    // ---- Cohen's kappa (label agreement beyond chance) ---------------------
    // rater 2 is a deterministic derived label so both engines build the
    // identical contingency table
    QueryDef("q_kappa",
      (s, d) => {
        val li = lineitem(s, d).withColumn("flag2",
          when(col("l_tax") > 0.04, "R")
            .when(col("l_discount") > 0.05, "N").otherwise("A"))
        graft.stat.InferenceTests.cohenKappa(li, "l_returnflag", "flag2")
          .select(col("n"), round(col("po"), 6).as("po"),
            round(col("pe"), 6).as("pe"), round(col("kappa"), 6).as("kappa"))
      },
      Some("""WITH d2 AS (SELECT l_returnflag AS r1,
               CASE WHEN l_tax > 0.04 THEN 'R'
                 WHEN l_discount > 0.05 THEN 'N' ELSE 'A' END AS r2
               FROM lineitem WHERE l_returnflag IS NOT NULL),
             cells AS (SELECT r1, r2, count(*)::DOUBLE AS n FROM d2
               GROUP BY 1, 2),
             rm AS (SELECT r1 AS lbl, sum(n) AS rn FROM cells GROUP BY 1),
             cm AS (SELECT r2 AS lbl, sum(n) AS cn FROM cells GROUP BY 1),
             pe AS (SELECT coalesce(sum(rn * cn), 0) AS pen
               FROM rm JOIN cm USING (lbl)),
             po AS (SELECT sum(n)::BIGINT AS n,
               sum(CASE WHEN r1 = r2 THEN n ELSE 0 END) / sum(n) AS po,
               sum(n) AS nd FROM cells)
             SELECT n, round(po, 6) AS po,
               round(pen / (nd * nd), 6) AS pe,
               round((po - pen / (nd * nd)) / (1 - pen / (nd * nd)), 6)
                 AS kappa
             FROM po, pe""")),

    // ---- Mann-Whitney U (rank-sum with mid-rank ties) ----------------------
    // folds to the distinct-value frame; the cumulative mid-rank window
    // runs over values, not rows — both engines replay the identity
    QueryDef("q_mannwhitney",
      (s, d) => graft.stat.InferenceTests.mannWhitney(
          lineitem(s, d), "l_extendedprice", "l_linestatus", "O", "F")
        .select(col("n1"), col("n2"),
          round(col("u_stat"), 4).as("u_stat"),
          round(col("z_stat"), 6).as("z_stat")),
      Some("""WITH two AS (SELECT l_extendedprice AS v,
               (l_linestatus = 'O')::DOUBLE AS a FROM lineitem
               WHERE l_extendedprice IS NOT NULL
                 AND l_linestatus IN ('O', 'F')),
             bv AS (SELECT v, count(*)::DOUBLE AS n, sum(a) AS na FROM two
               GROUP BY 1),
             r AS (SELECT v, n, na, coalesce(sum(n) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS before FROM bv),
             agg AS (SELECT sum(na) AS n1, sum(n - na) AS n2,
               sum(na * (before + (n + 1) / 2)) AS ra,
               sum(n * n * n - n) AS ties FROM r)
             SELECT n1::BIGINT AS n1, n2::BIGINT AS n2,
               round(ra - n1 * (n1 + 1) / 2, 4) AS u_stat,
               round((ra - n1 * (n1 + 1) / 2 - n1 * n2 / 2) /
                 sqrt(n1 * n2 / 12 *
                   ((n1 + n2 + 1) - ties / ((n1 + n2) * (n1 + n2 - 1)))), 6)
                 AS z_stat
             FROM agg""")),

    // ---- Kruskal-Wallis H (k-group rank ANOVA) -----------------------------
    // integer-valued l_quantity keeps every mid-rank an exact half — the
    // rank sums are bit-deterministic and only the k-term H fold is float
    QueryDef("q_kruskal",
      (s, d) => graft.stat.InferenceTests.kruskalWallis(
          lineitem(s, d), "l_quantity", "l_returnflag")
        .select(col("k"), col("n"), col("dof"),
          round(col("h_stat"), 6).as("h_stat"),
          round(col("h_corrected"), 6).as("h_corrected")),
      Some("""WITH cells AS (SELECT l_returnflag AS g, l_quantity::DOUBLE AS v,
               count(*)::DOUBLE AS c FROM lineitem
               WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL
               GROUP BY 1, 2),
             bv AS (SELECT v, sum(c) AS n FROM cells GROUP BY 1),
             r AS (SELECT v, n, coalesce(sum(n) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (n + 1) / 2 AS mid FROM bv),
             pg AS (SELECT g, sum(c) AS ng, sum(c * mid) AS rg
               FROM cells JOIN r USING (v) GROUP BY 1),
             t AS (SELECT sum(n * n * n - n) AS ties FROM bv),
             a AS (SELECT count(*)::BIGINT AS k, sum(ng)::BIGINT AS n,
               sum(rg / ng * rg) AS r2n, sum(ng) AS nd FROM pg)
             SELECT k, n, (k - 1)::BIGINT AS dof,
               round(12.0 / (nd * (nd + 1)) * r2n - 3 * (nd + 1), 6) AS h_stat,
               round((12.0 / (nd * (nd + 1)) * r2n - 3 * (nd + 1)) /
                 (1.0 - ties / (nd * nd * nd - nd)), 6) AS h_corrected
             FROM a, t""")),

    // ---- Brown-Forsythe variance homogeneity -------------------------------
    // ANOVA F on |x − median_g|; integer l_quantity makes every median an
    // exact half and every deviation an exact multiple of 0.5 — the sums
    // feeding the F identity are engine-exact
    QueryDef("q_brown_forsythe",
      (s, d) => graft.stat.InferenceTests.brownForsythe(
          lineitem(s, d), "l_quantity", "l_returnflag")
        .select(col("k"), col("n"),
          round(col("ss_between") / col("n"), 6).as("msb_per_row"),
          round(col("ss_within") / col("n"), 6).as("msw_per_row"),
          col("df_between"), col("df_within"),
          round(col("f_stat"), 6).as("f_stat")),
      Some("""WITH med AS (SELECT l_returnflag AS g,
               quantile_cont(l_quantity::DOUBLE, 0.5) AS m FROM lineitem
               WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL
               GROUP BY 1),
             z AS (SELECT li.l_returnflag AS g,
               abs(li.l_quantity::DOUBLE - med.m) AS z
               FROM lineitem li JOIN med ON li.l_returnflag = med.g
               WHERE li.l_quantity IS NOT NULL),
             gg AS (SELECT g, count(*)::DOUBLE AS n, sum(z) AS s,
               sum(z * z) AS ss FROM z GROUP BY 1),
             t AS (SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS n,
               sum(s * s / n) - sum(s) * sum(s) / sum(n) AS ssb,
               sum(ss - s * s / n) AS ssw, sum(n) AS nd FROM gg)
             SELECT k, n, round(ssb / nd, 6) AS msb_per_row,
               round(ssw / nd, 6) AS msw_per_row,
               (k - 1)::BIGINT AS df_between, (nd - k)::BIGINT AS df_within,
               round((ssb / (k - 1)) / (ssw / (nd - k)), 6) AS f_stat
             FROM t""")),

    // ---- Jarque-Bera normality ---------------------------------------------
    // delegates to the centered two-pass moments (q_moments precedent);
    // the JB fold runs over the UNROUNDED skew/kurt
    QueryDef("q_jarque_bera",
      (s, d) => graft.stat.InferenceTests.jarqueBera(
          lineitem(s, d), "l_discount")
        .select(col("n"),
          round(col("skewness"), 6).as("skewness"),
          round(col("kurtosis"), 6).as("kurtosis"),
          round(col("jb_stat"), 6).as("jb_stat")),
      Some("""WITH clean AS (SELECT l_discount::DOUBLE AS x FROM lineitem
               WHERE l_discount IS NOT NULL),
             m AS (SELECT count(*) AS n, avg(x) AS mu FROM clean),
             p AS (SELECT any_value(n)::BIGINT AS n,
               avg(pow(x - mu, 2)) AS m2, avg(pow(x - mu, 3)) AS m3,
               avg(pow(x - mu, 4)) AS m4 FROM clean, m)
             SELECT n, round(m3 / pow(m2, 1.5), 6) AS skewness,
               round(m4 / (m2 * m2) - 3, 6) AS kurtosis,
               round(n / 6.0 * ((m3 / pow(m2, 1.5)) * (m3 / pow(m2, 1.5)) +
                 (m4 / (m2 * m2) - 3) * (m4 / (m2 * m2) - 3) / 4), 6)
                 AS jb_stat
             FROM p""")),

    // ---- Cohen's d / Hedges' g effect sizes (all group pairs) --------------
    // integer l_quantity → exact power sums; the d chain is division-only
    QueryDef("q_cohens_d",
      (s, d) => graft.stat.InferenceTests.cohensD(
          lineitem(s, d), "l_quantity", "l_returnflag")
        .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
          round(col("mean_a"), 6).as("mean_a"),
          round(col("mean_b"), 6).as("mean_b"),
          round(col("cohen_d"), 6).as("cohen_d"),
          round(col("hedges_g"), 6).as("hedges_g"))
        .orderBy("group_a", "group_b"),
      Some("""WITH g AS (SELECT l_returnflag AS g, count(*)::DOUBLE AS n,
               sum(l_quantity::DOUBLE) AS s,
               sum(l_quantity::DOUBLE * l_quantity::DOUBLE) AS ss
               FROM lineitem WHERE l_quantity IS NOT NULL
                 AND l_returnflag IS NOT NULL GROUP BY 1),
             p AS (SELECT a.g AS group_a, b.g AS group_b, a.n AS na,
               b.n AS nb, a.s AS sa, b.s AS sb,
               a.ss - a.s * a.s / a.n AS ssda,
               b.ss - b.s * b.s / b.n AS ssdb
               FROM g a, g b WHERE a.g < b.g)
             SELECT group_a, group_b, na::BIGINT AS n_a, nb::BIGINT AS n_b,
               round(sa / na, 6) AS mean_a, round(sb / nb, 6) AS mean_b,
               round((sa / na - sb / nb) /
                 sqrt((ssda + ssdb) / (na + nb - 2)), 6) AS cohen_d,
               round((sa / na - sb / nb) /
                 sqrt((ssda + ssdb) / (na + nb - 2)) *
                 (1.0 - 3.0 / (4 * (na + nb) - 9)), 6) AS hedges_g
             FROM p ORDER BY 1, 2""")),

    // ---- Kendall's tau-b (exact over the contingency cells) ----------------
    // 50×11 quantity×discount cells → ~150k cell pairs; every count is an
    // exact long, only the final ratio is float
    QueryDef("q_kendall_tau",
      (s, d) => graft.stat.InferenceTests.kendallTauB(
          lineitem(s, d), "l_quantity", "l_discount")
        .select(col("n"), col("cells"), col("concordant"), col("discordant"),
          round(col("tau_b"), 6).as("tau_b"),
          round(col("gamma"), 6).as("gamma"),
          round(col("somers_d_ba"), 6).as("somers_d_ba"),
          round(col("somers_d_ab"), 6).as("somers_d_ab")),
      Some("""WITH cells AS (SELECT l_quantity AS a, l_discount AS b,
               count(*)::BIGINT AS n FROM lineitem
               WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
               GROUP BY 1, 2),
             pr AS (SELECT
               coalesce(sum(CASE WHEN x.b < y.b THEN x.n * y.n END), 0)::BIGINT
                 AS c,
               coalesce(sum(CASE WHEN x.b > y.b THEN x.n * y.n END), 0)::BIGINT
                 AS d
               FROM cells x, cells y WHERE x.a < y.a),
             ta AS (SELECT sum(t * (t - 1) / 2) AS n1t FROM
               (SELECT sum(n) AS t FROM cells GROUP BY a)),
             tb AS (SELECT sum(t * (t - 1) / 2) AS n2t FROM
               (SELECT sum(n) AS t FROM cells GROUP BY b)),
             tot AS (SELECT sum(n) AS nt, count(*)::BIGINT AS cells
               FROM cells)
             SELECT nt::BIGINT AS n, cells, c AS concordant, d AS discordant,
               round((c - d)::DOUBLE / sqrt(
                 (nt * (nt - 1) / 2 - n1t)::DOUBLE *
                 (nt * (nt - 1) / 2 - n2t)::DOUBLE), 6) AS tau_b,
               round((c - d)::DOUBLE / (c + d), 6) AS gamma,
               round((c - d)::DOUBLE / (nt * (nt - 1) / 2 - n1t), 6)
                 AS somers_d_ba,
               round((c - d)::DOUBLE / (nt * (nt - 1) / 2 - n2t), 6)
                 AS somers_d_ab
             FROM tot, pr, ta, tb""")),

    // ---- Kaplan-Meier survival (time to first purchase, right-censored) ----
    // duration = hours from a user's first event to their first purchase,
    // censored at their last event otherwise; exact integer-hour ties give
    // the curve real event-time structure. The product-limit estimate is
    // exp(Σ ln(1−d/r)) with an explicit zero flag, replayed in identical
    // op order (ln's last-ulp engine differences sit under round(6) — the
    // entropy/dp_counts precedent)
    QueryDef("q_survival",
      (s, d) => {
        val ev = events(s, d)
        val perUser = ev
          .filter(col("user_id").isNotNull && col("ts").isNotNull &&
            col("event_type").isNotNull)
          .groupBy("user_id")
          .agg(min(unix_micros(col("ts"))).as("t0"),
            min(when(col("event_type") === "purchase",
              unix_micros(col("ts")))).as("tp"),
            max(unix_micros(col("ts"))).as("tmax"))
          .selectExpr(
            // `div` = exact integer division — a double divide + cast
            // could land a hair under the boundary one engine and not
            // the other
            "(coalesce(tp, tmax) - t0) div 3600000000 AS dur_h",
            "cast(tp IS NOT NULL AS int) AS ev")
        graft.events.Survival.kaplanMeier(perUser, "dur_h", "ev")
          .select(col("t").cast("long").as("t"), col("n_risk"),
            col("n_event"), col("n_censored"),
            round(col("survival"), 6).as("survival"))
          .orderBy("t")
      },
      Some("""WITH per AS (SELECT user_id, epoch_us(min(ts)) AS t0,
               epoch_us(min(CASE WHEN event_type = 'purchase' THEN ts END))
                 AS tp,
               epoch_us(max(ts)) AS tmax
               FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
                 AND event_type IS NOT NULL GROUP BY 1),
             dur AS (SELECT ((coalesce(tp, tmax) - t0) // 3600000000)::DOUBLE
                 AS t,
               (tp IS NOT NULL)::INT AS ev FROM per),
             byt AS (SELECT t, sum(ev)::DOUBLE AS d, count(*)::DOUBLE AS n
               FROM dur GROUP BY 1),
             w AS (SELECT t, d, n, sum(n) OVER () -
               coalesce(sum(n) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                 PRECEDING AND 1 PRECEDING), 0) AS risk FROM byt),
             c AS (SELECT t, risk, d, n,
               CASE WHEN sum(CASE WHEN 1.0 - d / risk <= 0 THEN 1
                   ELSE 0 END) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) > 0
                 THEN 0.0
                 ELSE exp(sum(CASE WHEN 1.0 - d / risk > 0
                   THEN ln(1.0 - d / risk) ELSE 0.0 END)
                   OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)) END AS surv
               FROM w)
             SELECT t::BIGINT AS t, risk::BIGINT AS n_risk,
               d::BIGINT AS n_event, (n - d)::BIGINT AS n_censored,
               round(surv, 6) AS survival
             FROM c ORDER BY t""")),

    // ---- grid-binned Kaplan-Meier (the continuous-duration scale tier) ----
    // same cohort as q_survival but on CONTINUOUS second-resolution
    // durations (distinct ≈ users — exactly what kaplanMeier's
    // maxDistinct guard refuses); kaplanMeierBinned snaps durations UP
    // to a 256-cell uniform grid (a fixed IEEE chain lo + ceil((t−lo)/w)·w
    // both engines replay identically) and runs the exact KM on ≤256
    // grid points. Survival under round(6), the q_survival precedent.
    QueryDef("q_survival_binned",
      (s, d) => {
        val ev = events(s, d)
        val perUser = ev
          .filter(col("user_id").isNotNull && col("ts").isNotNull &&
            col("event_type").isNotNull)
          .groupBy("user_id")
          .agg(min(unix_micros(col("ts"))).as("t0"),
            min(when(col("event_type") === "purchase",
              unix_micros(col("ts")))).as("tp"),
            max(unix_micros(col("ts"))).as("tmax"))
          .selectExpr(
            "cast(coalesce(tp, tmax) - t0 as double) / 1e6 AS dur_s",
            "cast(tp IS NOT NULL AS int) AS ev")
        graft.events.Survival.kaplanMeierBinned(perUser, "dur_s", "ev",
            bins = 256)
          .select(col("t"), col("n_risk"), col("n_event"),
            col("n_censored"), round(col("survival"), 6).as("survival"))
          .orderBy("t")
      },
      Some("""WITH per AS (SELECT user_id, epoch_us(min(ts)) AS t0,
               epoch_us(min(CASE WHEN event_type = 'purchase' THEN ts END))
                 AS tp,
               epoch_us(max(ts)) AS tmax
               FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
                 AND event_type IS NOT NULL GROUP BY 1),
             dur AS (SELECT (coalesce(tp, tmax) - t0)::DOUBLE / 1e6 AS t0v,
               (tp IS NOT NULL)::INT AS ev FROM per),
             mm AS (SELECT min(t0v) AS lo, max(t0v) AS hi FROM dur),
             snap AS (SELECT CASE WHEN hi = lo THEN lo
                 ELSE lo + ceil((t0v - lo) / ((hi - lo) / 256)) *
                   ((hi - lo) / 256) END AS t, ev FROM dur, mm),
             byt AS (SELECT t, sum(ev)::DOUBLE AS d, count(*)::DOUBLE AS n
               FROM snap GROUP BY 1),
             w AS (SELECT t, d, n, sum(n) OVER () -
               coalesce(sum(n) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                 PRECEDING AND 1 PRECEDING), 0) AS risk FROM byt),
             c AS (SELECT t, risk, d, n,
               CASE WHEN sum(CASE WHEN 1.0 - d / risk <= 0 THEN 1
                   ELSE 0 END) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) > 0
                 THEN 0.0
                 ELSE exp(sum(CASE WHEN 1.0 - d / risk > 0
                   THEN ln(1.0 - d / risk) ELSE 0.0 END)
                   OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)) END AS surv
               FROM w)
             SELECT t, risk::BIGINT AS n_risk,
               d::BIGINT AS n_event, (n - d)::BIGINT AS n_censored,
               round(surv, 6) AS survival
             FROM c ORDER BY t""")),

    // ---- Nelson-Aalen cumulative hazard (per user-parity group) ------------
    // additive companion of q_survival. NOT bit-exact despite the
    // deterministic fold order — Spark's running-window sum
    // accumulates differently than DuckDB's in the last ulp (measured
    // 4e-16 at sf0.01) — so hazard/survival compare under round(6),
    // the KM precedent
    QueryDef("q_nelson_aalen",
      (s, d) => {
        val ev = events(s, d)
        val perUser = ev
          .filter(col("user_id").isNotNull && col("ts").isNotNull &&
            col("event_type").isNotNull)
          .groupBy("user_id")
          .agg(min(unix_micros(col("ts"))).as("t0"),
            min(when(col("event_type") === "purchase",
              unix_micros(col("ts")))).as("tp"),
            max(unix_micros(col("ts"))).as("tmax"))
          .selectExpr("cast(user_id % 2 AS long) AS grp",
            "(coalesce(tp, tmax) - t0) div 3600000000 AS dur_h",
            "cast(tp IS NOT NULL AS int) AS ev")
        graft.events.Survival.nelsonAalenBy(perUser, "grp", "dur_h", "ev")
          .select(col("grp"), col("t").cast("long").as("t"),
            col("n_risk"), col("n_event"),
            round(col("hazard"), 6).as("hazard"),
            round(col("survival_breslow"), 6).as("survival_breslow"))
          .orderBy("grp", "t")
      },
      Some("""WITH per AS (SELECT user_id, epoch_us(min(ts)) AS t0,
               epoch_us(min(CASE WHEN event_type = 'purchase' THEN ts END))
                 AS tp,
               epoch_us(max(ts)) AS tmax
               FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
                 AND event_type IS NOT NULL GROUP BY 1),
             dur AS (SELECT user_id % 2 AS grp,
               ((coalesce(tp, tmax) - t0) // 3600000000)::DOUBLE AS t,
               (tp IS NOT NULL)::INT AS ev FROM per),
             byt AS (SELECT grp, t, sum(ev)::DOUBLE AS d,
               count(*)::DOUBLE AS n FROM dur GROUP BY 1, 2),
             w AS (SELECT grp, t, d, n,
               sum(n) OVER (PARTITION BY grp) -
               coalesce(sum(n) OVER (PARTITION BY grp ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS risk FROM byt),
             c AS (SELECT grp, t, risk, d,
               sum(d / risk) OVER (PARTITION BY grp ORDER BY t
                 ROWS UNBOUNDED PRECEDING) AS hazard FROM w)
             SELECT grp, t::BIGINT AS t, risk::BIGINT AS n_risk,
               d::BIGINT AS n_event, round(hazard, 6) AS hazard,
               round(exp(-hazard), 6) AS survival_breslow
             FROM c ORDER BY grp, t""")),

    // ---- log-rank test (per-group observed vs expected events) -------------
    // groups = user_id parity; the (group × time) frame is COMPLETED
    // before at-risk accounting (a group with no cell at t is still at
    // risk there) — mirrored by the SQL's cross join + left join
    QueryDef("q_logrank",
      (s, d) => {
        val ev = events(s, d)
        val perUser = ev
          .filter(col("user_id").isNotNull && col("ts").isNotNull &&
            col("event_type").isNotNull)
          .groupBy("user_id")
          .agg(min(unix_micros(col("ts"))).as("t0"),
            min(when(col("event_type") === "purchase",
              unix_micros(col("ts")))).as("tp"),
            max(unix_micros(col("ts"))).as("tmax"))
          .selectExpr("cast(user_id % 2 AS long) AS grp",
            "(coalesce(tp, tmax) - t0) div 3600000000 AS dur_h",
            "cast(tp IS NOT NULL AS int) AS ev")
        graft.events.Survival.logRank(perUser, "grp", "dur_h", "ev")
          .select(col("grp"), col("observed").cast("long").as("observed"),
            round(col("expected"), 6).as("expected"))
          .orderBy("grp")
      },
      Some("""WITH per AS (SELECT user_id, epoch_us(min(ts)) AS t0,
               epoch_us(min(CASE WHEN event_type = 'purchase' THEN ts END))
                 AS tp,
               epoch_us(max(ts)) AS tmax
               FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
                 AND event_type IS NOT NULL GROUP BY 1),
             dur AS (SELECT user_id % 2 AS g,
               ((coalesce(tp, tmax) - t0) // 3600000000)::DOUBLE AS t,
               (tp IS NOT NULL)::INT AS ev FROM per),
             times AS (SELECT DISTINCT t FROM dur),
             grps AS (SELECT g, count(*)::DOUBLE AS gtot FROM dur
               GROUP BY 1),
             cells AS (SELECT g, t, sum(ev)::DOUBLE AS d,
               count(*)::DOUBLE AS n FROM dur GROUP BY 1, 2),
             fullf AS (SELECT grps.g, times.t, grps.gtot,
               coalesce(cells.d, 0) AS d, coalesce(cells.n, 0) AS n
               FROM grps CROSS JOIN times
               LEFT JOIN cells ON cells.g = grps.g AND cells.t = times.t),
             w AS (SELECT g, t, d, gtot - coalesce(sum(n) OVER
               (PARTITION BY g ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS rg FROM fullf),
             tt AS (SELECT g, t, d, rg,
               sum(d) OVER (PARTITION BY t) AS dt,
               sum(rg) OVER (PARTITION BY t) AS rt FROM w)
             SELECT g AS grp, sum(d)::BIGINT AS observed,
               round(sum(dt * rg / rt), 6) AS expected
             FROM tt GROUP BY 1 ORDER BY 1""")),

    // ---- smoothed target encoding (category table) -------------------------
    // integer-valued quantities make every sum exact, so the smoothed
    // blend is a deterministic division in both engines
    QueryDef("q_target_encode",
      (s, d) => graft.ml.FeatureEncode.targetEncodeTable(
          lineitem(s, d), "l_returnflag", "l_quantity", smoothing = 20.0)
        .select(col("category"), col("n"), round(col("enc"), 6).as("enc"))
        .orderBy("category"),
      Some("""WITH g AS (SELECT l_returnflag AS category,
               count(*)::BIGINT AS n, sum(l_quantity) AS s FROM lineitem
               WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
               GROUP BY 1),
             p AS (SELECT sum(s) / sum(n) AS prior FROM g)
             SELECT category, n,
               round((s + 20.0 * prior) / (n + 20.0), 6) AS enc
             FROM g, p ORDER BY category""")),

    // ---- leave-one-out target encoding (per-row, aggregated to verify) ----
    // enc_i = (Σy_c − y_i)/(n_c − 1): the per-row frame is pinned through
    // its per-category profile. The distinct count runs on the UNROUNDED
    // encoding in both engines — exact-integer sums divided by an exact
    // integer are bit-identical IEEE divisions, while rounding first
    // would collapse adjacent encodings (spacing 1/(n−1) < 1e-6 at
    // sf0.1) differently than rounding after
    QueryDef("q_target_encode_loo",
      (s, d) => graft.ml.FeatureEncode.targetEncodeLoo(
          lineitem(s, d), "l_returnflag", "l_quantity", smoothing = 0.0)
        .groupBy("l_returnflag")
        .agg(countDistinct("l_returnflag_enc").as("n_distinct_enc"),
          round(min("l_returnflag_enc"), 6).as("min_enc"),
          round(max("l_returnflag_enc"), 6).as("max_enc"))
        .orderBy("l_returnflag"),
      Some("""WITH g AS (SELECT l_returnflag, count(*)::DOUBLE AS n,
               sum(l_quantity) AS s FROM lineitem
               WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
               GROUP BY 1),
             enc AS (SELECT li.l_returnflag,
               (g.s - li.l_quantity) / (g.n - 1) AS e
               FROM lineitem li JOIN g ON li.l_returnflag = g.l_returnflag
               WHERE li.l_quantity IS NOT NULL)
             SELECT l_returnflag, count(DISTINCT e)::BIGINT AS n_distinct_enc,
               round(min(e), 6) AS min_enc, round(max(e), 6) AS max_enc
             FROM enc GROUP BY 1 ORDER BY 1""")),

    // ---- weight of evidence per category ----------------------------------
    QueryDef("q_woe",
      (s, d) => graft.ml.FeatureEncode.woeTable(
          documents(s, d).withColumn("is_en",
            (col("lang") === "en").cast("int")),
          "source", "is_en", eps = 0.5)
        .select(col("category"), col("n_pos"), col("n_neg"),
          round(col("woe"), 6).as("woe"), round(col("iv"), 6).as("iv"))
        .orderBy("category"),
      Some("""WITH g AS (SELECT source AS category,
               sum((lang = 'en')::INT)::DOUBLE AS pos,
               sum((lang != 'en')::INT)::DOUBLE AS neg FROM documents
               WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1),
             t AS (SELECT sum(pos) AS pt, sum(neg) AS nt FROM g)
             SELECT category, pos::BIGINT AS n_pos, neg::BIGINT AS n_neg,
               round(ln(((pos + 0.5) / (pt + 1.0)) /
                 ((neg + 0.5) / (nt + 1.0))), 6) AS woe,
               round(((pos + 0.5) / (pt + 1.0) - (neg + 0.5) / (nt + 1.0)) *
                 ln(((pos + 0.5) / (pt + 1.0)) /
                   ((neg + 0.5) / (nt + 1.0))), 6) AS iv
             FROM g, t ORDER BY category""")),

    // ---- information value, k columns in ONE corpus pass -------------------
    // the (column, value) pairs explode from a map projection so three
    // columns cost one shuffle; the oracle replays each column separately
    // and unions — identical per-category terms, sum-order ulps under
    // round(6) (the entropy precedent)
    QueryDef("q_iv",
      (s, d) => graft.ml.FeatureEncode.informationValue(
          lineitem(s, d).withColumn("is_disc",
            (col("l_discount") > 0.05).cast("int")),
          Seq("l_returnflag", "l_linestatus", "l_linenumber"), "is_disc",
          eps = 0.5)
        .select(col("column"), col("n_categories"),
          round(col("iv"), 6).as("iv"))
        .orderBy("column"),
      Some("""WITH lab AS (SELECT (l_discount > 0.05)::INT::DOUBLE AS y,
               l_returnflag, l_linestatus, l_linenumber FROM lineitem
               WHERE l_discount IS NOT NULL),
             pairs AS (
               SELECT 'l_returnflag' AS col_, l_returnflag AS val, y
                 FROM lab WHERE l_returnflag IS NOT NULL
               UNION ALL
               SELECT 'l_linestatus', l_linestatus, y FROM lab
                 WHERE l_linestatus IS NOT NULL
               UNION ALL
               SELECT 'l_linenumber', l_linenumber::VARCHAR, y FROM lab
                 WHERE l_linenumber IS NOT NULL),
             g AS (SELECT col_, val, sum(y) AS pos,
               count(*) - sum(y) AS neg FROM pairs GROUP BY 1, 2),
             t AS (SELECT col_, sum(pos) AS pt, sum(neg) AS nt,
               count(*)::BIGINT AS n_categories FROM g GROUP BY 1)
             SELECT g.col_ AS "column", t.n_categories,
               round(sum(((pos + 0.5) / (pt + 1.0) -
                 (neg + 0.5) / (nt + 1.0)) *
                 ln(((pos + 0.5) / (pt + 1.0)) /
                   ((neg + 0.5) / (nt + 1.0)))), 6) AS iv
             FROM g JOIN t USING (col_)
             GROUP BY 1, 2 ORDER BY 1""")),

    // ---- one-hot encoding (explicit category list, zero-shuffle) -----------
    QueryDef("q_onehot",
      (s, d) => graft.ml.FeatureEncode.oneHot(
          lineitem(s, d), "l_returnflag", Seq("A", "N", "R"), "flag")
        .groupBy("l_linestatus")
        .agg(sum("flag_A").cast("long").as("n_a"),
          sum("flag_N").cast("long").as("n_n"),
          sum("flag_R").cast("long").as("n_r"),
          count(lit(1)).as("n"))
        .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
               sum((l_returnflag = 'A')::INT)::BIGINT AS n_a,
               sum((l_returnflag = 'N')::INT)::BIGINT AS n_n,
               sum((l_returnflag = 'R')::INT)::BIGINT AS n_r,
               count(*)::BIGINT AS n
             FROM lineitem GROUP BY 1 ORDER BY 1""")),
  )
}
