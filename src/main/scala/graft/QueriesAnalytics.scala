package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.agg.Stats
import graft.clean.Clean
import graft.core.HandyFrame
import graft.ml.{HandyFencer, HandyImputer}
import graft.plotdata.PlotData
import graft.strata.{Bucket, ColStratum, Quantile, StratifiedFrame}

/** Gate tier 9/9 — analytics tail: attribution, uplift/DiD/IPW, forecast metrics, PACF/CCF, geospatial, inequality, remaining inference rows.
  *
  * Split from the 11k-line Queries.scala (r11 VERDICT #8): pure
  * relocation, zero semantic movement — [[Queries.defs]] concatenates
  * the nine tiers in the original order and the duplicate-name guard
  * still covers the whole set. All determinism rules live in the
  * [[Queries]] scaladoc; table readers and shared contracts in
  * [[QueryHelpers]]. 36 queries. */
private[graft] object QueriesAnalytics {
  import QueryHelpers._

  val defs: Seq[QueryDef] = Seq(

    // ---- linear conversion attribution -------------------------------------
    // touch columns coalesced to −1 on unattributed conversions: the
    // compare sorts rows, and null sort position differs across engines
    QueryDef("q_attribution",
      (s, d) => graft.events.Attribution.attribute(events(s, d),
          Seq("user_id"), "ts", "event_id", "event_type",
          touchTypes = Seq("view", "click"), convType = "purchase",
          lookbackUs = 21600000000L, model = "linear")
        .select(col("user_id"), col("conv_tie"), col("conv_ts"),
          coalesce(col("touch_tie"), lit(-1L)).as("touch_tie"),
          coalesce(col("touch_ts"), lit(-1L)).as("touch_ts"),
          col("n_touches"), round(col("weight"), 6).as("weight"))
        .orderBy("user_id", "conv_tie", "touch_tie"),
      Some("""WITH base AS (SELECT user_id, epoch_us(ts) AS tsu, event_id,
               event_type FROM events
               WHERE user_id IS NOT NULL AND ts IS NOT NULL
                 AND event_id IS NOT NULL AND event_type IS NOT NULL),
             c AS (SELECT user_id, tsu AS conv_ts, event_id AS conv_tie
               FROM base WHERE event_type = 'purchase'),
             t AS (SELECT user_id, tsu AS touch_ts, event_id AS touch_tie
               FROM base WHERE event_type IN ('view', 'click')),
             cr AS (SELECT c.user_id, c.conv_tie, c.conv_ts, t.touch_tie,
               t.touch_ts
               FROM c JOIN t ON c.user_id = t.user_id
                 AND (t.touch_ts < c.conv_ts OR (t.touch_ts = c.conv_ts
                   AND t.touch_tie < c.conv_tie))
                 AND t.touch_ts >= c.conv_ts - 21600000000),
             w AS (SELECT *, count(*) OVER (PARTITION BY user_id,
               conv_tie) AS n FROM cr)
             SELECT user_id, conv_tie, conv_ts, touch_tie, touch_ts,
               n::BIGINT AS n_touches, round(1.0 / n, 6) AS weight FROM w
             UNION ALL
             SELECT c.user_id, c.conv_tie, c.conv_ts, -1, -1, 0, 0.0
             FROM c WHERE NOT EXISTS (SELECT 1 FROM cr
               WHERE cr.user_id = c.user_id AND cr.conv_tie = c.conv_tie)
             ORDER BY user_id, conv_tie, touch_tie""")),

    // ---- JSON schema drift between snapshots -------------------------------
    // new snapshot renames key k → k2 on a mod-keyed row slice: k stays
    // common (share drops), k2 appears as added
    QueryDef("q_json_drift",
      (s, d) => {
        val old = events(s, d)
        val neu = events(s, d).withColumn("props",
          when(col("event_id") % 5 === 0,
            expr("replace(props, '\"k\"', '\"k2\"')"))
            .otherwise(col("props")))
        graft.pipeline.Semistructured.jsonProfileDiff(old, neu, "props")
          .select(col("key"), col("status"), col("cnt_old"), col("cnt_new"),
            round(col("share_old"), 6).as("share_old"),
            round(col("share_new"), 6).as("share_new"),
            col("n_distinct_old"), col("n_distinct_new"))
          .orderBy("key")
      },
      Some("""WITH oldp AS (SELECT props FROM events
               WHERE props IS NOT NULL),
             newp AS (SELECT CASE WHEN event_id % 5 = 0
               THEN replace(props, '"k"', '"k2"') ELSE props END AS props
               FROM events WHERE props IS NOT NULL),
             po AS (SELECT key, count(*)::BIGINT AS cnt,
               count(DISTINCT json_extract_string(props, '$.' || key))
                 ::BIGINT AS nd,
               count(*) / (SELECT count(*)::DOUBLE FROM oldp) AS share
               FROM (SELECT unnest(json_keys(props)) AS key, props
                 FROM oldp) GROUP BY key),
             pn AS (SELECT key, count(*)::BIGINT AS cnt,
               count(DISTINCT json_extract_string(props, '$.' || key))
                 ::BIGINT AS nd,
               count(*) / (SELECT count(*)::DOUBLE FROM newp) AS share
               FROM (SELECT unnest(json_keys(props)) AS key, props
                 FROM newp) GROUP BY key)
             SELECT key,
               CASE WHEN po.cnt IS NULL THEN 'added'
                 WHEN pn.cnt IS NULL THEN 'removed'
                 ELSE 'common' END AS status,
               coalesce(po.cnt, 0) AS cnt_old,
               coalesce(pn.cnt, 0) AS cnt_new,
               round(coalesce(po.share, 0), 6) AS share_old,
               round(coalesce(pn.share, 0), 6) AS share_new,
               coalesce(po.nd, 0) AS n_distinct_old,
               coalesce(pn.nd, 0) AS n_distinct_new
             FROM po FULL OUTER JOIN pn USING (key) ORDER BY key""")),

    // ---- intra-list diversity of top-k lists -------------------------------
    // run = deterministic top-5 per embedding label; cosine via the same
    // dot/sqrt op chain on both sides, round(6) for the pair-sum order
    QueryDef("q_ild",
      (s, d) => {
        val e = s.read.parquet(s"$d/embeddings.parquet")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("label").orderBy("vec_id")
        val run = e.na.drop(Seq("label", "vec_id"))
          .withColumn("rank", row_number().over(w))
        graft.eval.RankingMetrics.intraListDiversity(run, "label",
            "vec_id", "rank", e, "vec_id", "embedding", k = 5)
          .select(col("label"), col("n_items"), col("n_pairs"),
            round(col("ild"), 6).as("ild"))
          .orderBy("label")
      },
      Some("""WITH r AS (SELECT label, vec_id, row_number() OVER
               (PARTITION BY label ORDER BY vec_id) AS rnk
               FROM embeddings WHERE label IS NOT NULL
                 AND vec_id IS NOT NULL),
             t AS (SELECT label, vec_id FROM r WHERE rnk <= 5),
             v AS (SELECT vec_id, embedding::DOUBLE[] AS v
               FROM embeddings
               WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
             sc AS (SELECT t.label, t.vec_id, v.v FROM t
               JOIN v USING (vec_id)),
             p AS (SELECT a.label,
               1 - list_dot_product(a.v, b.v) /
                 (sqrt(list_dot_product(a.v, a.v)) *
                  sqrt(list_dot_product(b.v, b.v))) AS dd
               FROM sc a JOIN sc b ON a.label = b.label
                 AND a.vec_id < b.vec_id),
             ni AS (SELECT label, count(*)::BIGINT AS n_items FROM sc
               GROUP BY 1),
             ag AS (SELECT label, count(*)::BIGINT AS n_pairs,
               avg(dd) AS ild FROM p GROUP BY 1)
             SELECT ni.label, n_items,
               coalesce(n_pairs, 0) AS n_pairs, round(ild, 6) AS ild
             FROM ni LEFT JOIN ag USING (label) ORDER BY label""")),

    // ---- catalog coverage of a result set ----------------------------------
    QueryDef("q_rec_coverage",
      (s, d) => {
        val e = s.read.parquet(s"$d/embeddings.parquet")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("label").orderBy("vec_id")
        val run = e.na.drop(Seq("label", "vec_id"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
        graft.eval.RankingMetrics.catalogCoverage(run, "vec_id",
            e, "vec_id")
          .select(col("n_recommended"), col("catalog_size"),
            round(col("coverage"), 6).as("coverage"))
      },
      Some("""WITH r AS (SELECT label, vec_id, row_number() OVER
               (PARTITION BY label ORDER BY vec_id) AS rnk
               FROM embeddings WHERE label IS NOT NULL
                 AND vec_id IS NOT NULL),
             items AS (SELECT DISTINCT vec_id FROM r WHERE rnk <= 5),
             cat AS (SELECT DISTINCT vec_id FROM embeddings
               WHERE vec_id IS NOT NULL)
             SELECT (SELECT count(*) FROM items)::BIGINT AS n_recommended,
               (SELECT count(*) FROM cat)::BIGINT AS catalog_size,
               round((SELECT count(*) FROM items
                 WHERE vec_id IN (SELECT vec_id FROM cat))::DOUBLE /
                 (SELECT count(*) FROM cat), 6) AS coverage""")),

    // ---- auto-binned histogram (Freedman–Diaconis) -------------------------
    QueryDef("q_auto_hist",
      (s, d) => PlotData.autoHistogram(lineitem(s, d), "l_extendedprice")
        .select(col("bucket"), col("cnt"),
          round(col("bin_lo"), 4).as("bin_lo"),
          round(col("bin_hi"), 4).as("bin_hi")),
      Some("""WITH st AS (SELECT count(l_extendedprice)::DOUBLE AS n,
               quantile_cont(l_extendedprice, 0.25) AS q1,
               quantile_cont(l_extendedprice, 0.75) AS q3,
               min(l_extendedprice)::DOUBLE AS lo,
               max(l_extendedprice)::DOUBLE AS hi FROM lineitem),
             bb AS (SELECT lo, hi, ceil((hi - lo) /
               (2 * (q3 - q1) / pow(n, 1.0 / 3.0)))::INT AS bins FROM st),
             c AS (SELECT least(greatest(floor((l_extendedprice - lo) /
               ((hi - lo) / bins)), 0), bins - 1)::INT AS bucket,
               count(*) AS cnt FROM lineitem, bb GROUP BY 1),
             g AS (SELECT t.range::INT AS bucket, lo, hi, bins
               FROM bb, range(0, 100000) t WHERE t.range < bb.bins)
             SELECT g.bucket, coalesce(cnt, 0) AS cnt,
               round(lo + g.bucket * ((hi - lo) / bins), 4) AS bin_lo,
               round(lo + (g.bucket + 1) * ((hi - lo) / bins), 4) AS bin_hi
             FROM g LEFT JOIN c USING (bucket) ORDER BY 1""")),

    // ---- Theil T inequality index (entropy companion of Gini/HHI) ---------
    QueryDef("q_theil",
      (s, d) => graft.agg.Stats.theil(documents(s, d), Seq("source"),
          "n_chars")
        .select(col("source"), col("n"), col("total"),
          round(col("theil"), 6).as("theil"))
        .orderBy("source"),
      Some("""SELECT source, count(*)::BIGINT AS n,
               sum(n_chars::DOUBLE) AS total,
               round(sum(CASE WHEN n_chars > 0 THEN n_chars::DOUBLE *
                 ln(n_chars::DOUBLE) ELSE 0 END) / sum(n_chars::DOUBLE)
                 - ln(sum(n_chars::DOUBLE) / count(*)), 6) AS theil
             FROM documents
             WHERE source IS NOT NULL AND n_chars IS NOT NULL
             GROUP BY 1 ORDER BY 1""")),

    // ---- Qini uplift curve by score bucket ---------------------------------
    // units = the q_cuped frame; score = pre, outcome = post > 50,
    // treated = odd user ids; thresholds via quantile_cont parity
    QueryDef("q_qini",
      (s, d) => {
        val units = events(s, d)
          .filter(col("user_id").isNotNull && col("value").isNotNull &&
            col("event_id").isNotNull)
          .groupBy(col("user_id"), (col("user_id") % 2).as("arm"))
          .agg(
            avg(when(col("event_id") % 2 === 0, col("value"))).as("pre"),
            avg(when(col("event_id") % 2 === 1, col("value"))).as("post"))
          .filter(col("pre").isNotNull && col("post").isNotNull)
          .withColumn("outcome",
            when(col("post") > 50.0, 1.0).otherwise(0.0))
        graft.stat.Experiment.upliftDeciles(units, "arm", "1",
            "outcome", "pre", buckets = 5)
          .select(col("bucket"), col("n_t"), col("n_c"),
            col("y_t"), col("y_c"),
            round(col("rate_t"), 6).as("rate_t"),
            round(col("rate_c"), 6).as("rate_c"),
            round(col("uplift"), 6).as("uplift"),
            round(col("qini"), 6).as("qini"))
          .orderBy("bucket")
      },
      Some("""WITH u AS (SELECT user_id, (user_id % 2)::BIGINT AS arm,
               avg(CASE WHEN event_id % 2 = 0 THEN value END) AS pre,
               avg(CASE WHEN event_id % 2 = 1 THEN value END) AS post
               FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
                 AND event_id IS NOT NULL
               GROUP BY 1, 2),
             c AS (SELECT arm, pre,
               (CASE WHEN post > 50.0 THEN 1.0 ELSE 0.0 END)::DOUBLE AS y
               FROM u WHERE pre IS NOT NULL AND post IS NOT NULL),
             th AS (SELECT quantile_cont(pre, 0.2) AS t1,
               quantile_cont(pre, 0.4) AS t2,
               quantile_cont(pre, 0.6) AS t3,
               quantile_cont(pre, 0.8) AS t4 FROM c),
             b AS (SELECT 5 - ((pre > t1)::INT + (pre > t2)::INT +
               (pre > t3)::INT + (pre > t4)::INT) AS bucket,
               (CASE WHEN arm = 1 THEN 1.0 ELSE 0.0 END)::DOUBLE AS t, y
               FROM c, th),
             per AS (SELECT bucket, sum(t) AS n_t, sum(1.0 - t) AS n_c,
               sum(t * y) AS y_t, sum((1.0 - t) * y) AS y_c
               FROM b GROUP BY 1),
             cum AS (SELECT *,
               sum(y_t) OVER w AS cyt, sum(y_c) OVER w AS cyc,
               sum(n_t) OVER w AS cnt_t, sum(n_c) OVER w AS cnt_c
               FROM per WINDOW w AS (ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             SELECT bucket::BIGINT AS bucket, n_t::BIGINT AS n_t,
               n_c::BIGINT AS n_c, y_t, y_c,
               round(CASE WHEN n_t > 0 THEN y_t / n_t END, 6) AS rate_t,
               round(CASE WHEN n_c > 0 THEN y_c / n_c END, 6) AS rate_c,
               round(CASE WHEN n_t > 0 AND n_c > 0
                 THEN y_t / n_t - y_c / n_c END, 6) AS uplift,
               round(cyt - cyc * (cnt_t / nullif(cnt_c, 0)), 6) AS qini
             FROM cum ORDER BY bucket""")),

    // ---- market-basket association rules -----------------------------------
    // order baskets x supplier items; counts exact, ratios division-only
    QueryDef("q_basket_rules",
      (s, d) => graft.pipeline.Basket.pairRules(
          lineitem(s, d), "l_orderkey", "l_suppkey", minCount = 3)
        .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
          col("n_ab"), col("n_baskets"), col("oversized_baskets"),
          col("excluded_items"),
          round(col("support"), 6).as("support"),
          round(col("conf_a_b"), 6).as("conf_a_b"),
          round(col("conf_b_a"), 6).as("conf_b_a"),
          round(col("lift"), 6).as("lift"))
        .orderBy("item_a", "item_b"),
      // excluded_items replays as literal 0: the stop-list is off
      // (maxItemDf = MaxValue), and the A-priori prune is output-
      // invariant by theorem — the oracle is the UNPRUNED computation
      Some("""WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_suppkey AS i
               FROM lineitem WHERE l_orderkey IS NOT NULL
                 AND l_suppkey IS NOT NULL),
             nb AS (SELECT count(DISTINCT b) AS n FROM bi),
             sz AS (SELECT b, count(*) AS s FROM bi GROUP BY 1),
             ovs AS (SELECT count(*) AS o FROM sz WHERE s > 1000),
             ok AS (SELECT bi.b, bi.i FROM bi JOIN sz ON bi.b = sz.b
               WHERE sz.s <= 1000),
             pr AS (SELECT x.i AS item_a, y.i AS item_b,
               count(*)::BIGINT AS n_ab
               FROM ok x JOIN ok y ON x.b = y.b AND x.i < y.i
               GROUP BY 1, 2 HAVING count(*) >= 3),
             mg AS (SELECT i, count(*)::BIGINT AS c FROM bi GROUP BY 1)
             SELECT item_a, item_b, ma.c AS n_a, mb.c AS n_b, n_ab,
               nb.n::BIGINT AS n_baskets, ovs.o::BIGINT AS oversized_baskets,
               0::BIGINT AS excluded_items,
               round(n_ab::DOUBLE / nb.n, 6) AS support,
               round(n_ab::DOUBLE / ma.c, 6) AS conf_a_b,
               round(n_ab::DOUBLE / mb.c, 6) AS conf_b_a,
               round(n_ab::DOUBLE * nb.n / (ma.c::DOUBLE * mb.c), 6) AS lift
             FROM pr JOIN mg ma ON pr.item_a = ma.i
               JOIN mg mb ON pr.item_b = mb.i, nb, ovs
             ORDER BY 1, 2""")),

    // head-item stop-list variant: suppliers in more than maxItemDf
    // baskets are excluded from pairing (excluded_items surfaces the
    // count); surviving pairs are EXACT (dropping an item never changes
    // another pair's co-occurrence) — the oracle replays the df filter
    // verbatim. maxItemDf sized so the stop-list FIRES at sf0.01 (the
    // q_jw_skipped precedent: a cap row must exercise the cap).
    QueryDef("q_basket_stoplist",
      (s, d) => graft.pipeline.Basket.pairRules(
          lineitem(s, d), "l_orderkey", "l_suppkey", minCount = 3,
          maxItemDf = 40L)
        .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
          col("n_ab"), col("n_baskets"), col("oversized_baskets"),
          col("excluded_items"),
          round(col("support"), 6).as("support"),
          round(col("conf_a_b"), 6).as("conf_a_b"),
          round(col("conf_b_a"), 6).as("conf_b_a"),
          round(col("lift"), 6).as("lift"))
        .orderBy("item_a", "item_b"),
      Some("""WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_suppkey AS i
               FROM lineitem WHERE l_orderkey IS NOT NULL
                 AND l_suppkey IS NOT NULL),
             nb AS (SELECT count(DISTINCT b) AS n FROM bi),
             sz AS (SELECT b, count(*) AS s FROM bi GROUP BY 1),
             ovs AS (SELECT count(*) AS o FROM sz WHERE s > 1000),
             mg AS (SELECT i, count(*)::BIGINT AS c FROM bi GROUP BY 1),
             exc AS (SELECT count(*) AS e FROM mg WHERE c > 40),
             ok AS (SELECT bi.b, bi.i FROM bi JOIN sz ON bi.b = sz.b
               JOIN mg ON bi.i = mg.i
               WHERE sz.s <= 1000 AND mg.c <= 40),
             pr AS (SELECT x.i AS item_a, y.i AS item_b,
               count(*)::BIGINT AS n_ab
               FROM ok x JOIN ok y ON x.b = y.b AND x.i < y.i
               GROUP BY 1, 2 HAVING count(*) >= 3)
             SELECT item_a, item_b, ma.c AS n_a, mb.c AS n_b, n_ab,
               nb.n::BIGINT AS n_baskets, ovs.o::BIGINT AS oversized_baskets,
               exc.e::BIGINT AS excluded_items,
               round(n_ab::DOUBLE / nb.n, 6) AS support,
               round(n_ab::DOUBLE / ma.c, 6) AS conf_a_b,
               round(n_ab::DOUBLE / mb.c, 6) AS conf_b_a,
               round(n_ab::DOUBLE * nb.n / (ma.c::DOUBLE * mb.c), 6) AS lift
             FROM pr JOIN mg ma ON pr.item_a = ma.i
               JOIN mg mb ON pr.item_b = mb.i, nb, ovs, exc
             ORDER BY 1, 2""")),

    // ---- difference-in-differences -----------------------------------------
    // deterministic 2x2 design derived from id parities (the q_cuped
    // arm-derivation precedent); the SE replays the four-cell sum in
    // identical term order
    QueryDef("q_did",
      (s, d) => graft.stat.Experiment.diffInDiff(
          events(s, d)
            .filter(col("user_id").isNotNull && col("event_id").isNotNull &&
              col("value").isNotNull)
            .withColumn("t", (col("user_id") % 2).cast("int"))
            .withColumn("p", (col("event_id") % 2).cast("int")),
          "t", "p", "value")
        .select(col("n_tpre"), col("n_tpost"), col("n_cpre"), col("n_cpost"),
          round(col("mean_tpre"), 6).as("mean_tpre"),
          round(col("mean_tpost"), 6).as("mean_tpost"),
          round(col("mean_cpre"), 6).as("mean_cpre"),
          round(col("mean_cpost"), 6).as("mean_cpost"),
          round(col("did"), 6).as("did"),
          round(col("se"), 6).as("se")),
      Some("""WITH d AS (SELECT (user_id % 2)::INT AS t,
               (event_id % 2)::INT AS p, value::DOUBLE AS y FROM events
               WHERE user_id IS NOT NULL AND event_id IS NOT NULL
                 AND value IS NOT NULL),
             a AS (SELECT
               sum(CASE WHEN t = 1 AND p = 0 THEN 1 ELSE 0 END)::BIGINT
                 AS n_tpre,
               sum(CASE WHEN t = 1 AND p = 0 THEN y END) AS s_tpre,
               sum(CASE WHEN t = 1 AND p = 0 THEN y * y END) AS ss_tpre,
               sum(CASE WHEN t = 1 AND p = 1 THEN 1 ELSE 0 END)::BIGINT
                 AS n_tpost,
               sum(CASE WHEN t = 1 AND p = 1 THEN y END) AS s_tpost,
               sum(CASE WHEN t = 1 AND p = 1 THEN y * y END) AS ss_tpost,
               sum(CASE WHEN t = 0 AND p = 0 THEN 1 ELSE 0 END)::BIGINT
                 AS n_cpre,
               sum(CASE WHEN t = 0 AND p = 0 THEN y END) AS s_cpre,
               sum(CASE WHEN t = 0 AND p = 0 THEN y * y END) AS ss_cpre,
               sum(CASE WHEN t = 0 AND p = 1 THEN 1 ELSE 0 END)::BIGINT
                 AS n_cpost,
               sum(CASE WHEN t = 0 AND p = 1 THEN y END) AS s_cpost,
               sum(CASE WHEN t = 0 AND p = 1 THEN y * y END) AS ss_cpost
               FROM d)
             SELECT n_tpre, n_tpost, n_cpre, n_cpost,
               round(s_tpre / n_tpre, 6) AS mean_tpre,
               round(s_tpost / n_tpost, 6) AS mean_tpost,
               round(s_cpre / n_cpre, 6) AS mean_cpre,
               round(s_cpost / n_cpost, 6) AS mean_cpost,
               round((s_tpost / n_tpost - s_tpre / n_tpre) -
                 (s_cpost / n_cpost - s_cpre / n_cpre), 6) AS did,
               round(sqrt(
                 (ss_tpost - s_tpost * s_tpost / n_tpost) / (n_tpost - 1)
                   / n_tpost +
                 (ss_tpre - s_tpre * s_tpre / n_tpre) / (n_tpre - 1)
                   / n_tpre +
                 (ss_cpost - s_cpost * s_cpost / n_cpost) / (n_cpost - 1)
                   / n_cpost +
                 (ss_cpre - s_cpre * s_cpre / n_cpre) / (n_cpre - 1)
                   / n_cpre), 6) AS se
             FROM a""")),

    // ---- IPW average treatment effect --------------------------------------
    // integer-derived propensities exercise BOTH clip edges (raw e spans
    // 0.00-0.99, clip 0.05); HT and Hajek estimators in one aggregate
    QueryDef("q_ipw",
      (s, d) => graft.stat.Experiment.ipwAte(
          events(s, d)
            .filter(col("user_id").isNotNull && col("event_id").isNotNull &&
              col("value").isNotNull)
            .withColumn("t", (col("event_id") % 2).cast("double"))
            .withColumn("e_raw", (col("user_id") % 100) / lit(100.0)),
          "t", "value", "e_raw", clip = 0.05)
        .select(col("n"), col("n_treat"), col("n_ctrl"),
          round(col("mean_w_treat"), 6).as("mean_w_treat"),
          round(col("mean_w_ctrl"), 6).as("mean_w_ctrl"),
          round(col("ate_ht"), 6).as("ate_ht"),
          round(col("ate_hajek"), 6).as("ate_hajek")),
      Some("""WITH d AS (SELECT (event_id % 2)::DOUBLE AS t,
               value::DOUBLE AS y,
               least(greatest((user_id % 100) / 100.0, 0.05), 0.95) AS e
               FROM events WHERE user_id IS NOT NULL
                 AND event_id IS NOT NULL AND value IS NOT NULL),
             a AS (SELECT count(*)::BIGINT AS n,
               sum(t)::BIGINT AS n_treat, sum(1.0 - t)::BIGINT AS n_ctrl,
               sum(t / e) AS wt, sum((1.0 - t) / (1.0 - e)) AS wc,
               sum(t * y / e) AS wyt,
               sum((1.0 - t) * y / (1.0 - e)) AS wyc FROM d)
             SELECT n, n_treat, n_ctrl,
               round(wt / n_treat, 6) AS mean_w_treat,
               round(wc / n_ctrl, 6) AS mean_w_ctrl,
               round((wyt - wyc) / n, 6) AS ate_ht,
               round(wyt / wt - wyc / wc, 6) AS ate_hajek
             FROM a""")),

    // ---- forecast accuracy metrics (per event type) ------------------------
    // pred = previous value per user (the naive one-step forecast); the
    // metrics aggregate is one keyed pass, no window beyond the keyed lag
    QueryDef("q_forecast_eval",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val scored = events(s, d)
          .filter(col("user_id").isNotNull && col("ts").isNotNull &&
            col("value").isNotNull && col("event_type").isNotNull)
          .withColumn("pred", lag("value", 1).over(w))
        graft.eval.ForecastEval.forecastEval(
            scored, "value", "pred", Seq("event_type"))
          .select(col("event_type"), col("n"), col("n_zero_actual"),
            round(col("mae"), 6).as("mae"),
            round(col("rmse"), 6).as("rmse"),
            round(col("bias"), 6).as("bias"),
            round(col("mape"), 6).as("mape"),
            round(col("smape"), 6).as("smape"),
            round(col("wape"), 6).as("wape"))
          .orderBy("event_type")
      },
      Some("""WITH w AS (SELECT event_type, value::DOUBLE AS y,
               lag(value::DOUBLE) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS p
               FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
                 AND value IS NOT NULL AND event_type IS NOT NULL),
             c AS (SELECT event_type, y, p FROM w WHERE p IS NOT NULL),
             a AS (SELECT event_type, count(*)::BIGINT AS n,
               sum(CASE WHEN y = 0 THEN 1 ELSE 0 END)::BIGINT
                 AS n_zero_actual,
               avg(abs(p - y)) AS mae,
               sqrt(avg((p - y) * (p - y))) AS rmse,
               avg(p - y) AS bias,
               avg(CASE WHEN y <> 0 THEN abs(p - y) / abs(y) END) AS mape,
               avg(CASE WHEN abs(y) + abs(p) > 0
                 THEN 2.0 * abs(p - y) / (abs(y) + abs(p))
                 ELSE 0 END) AS smape,
               sum(abs(p - y)) / nullif(sum(abs(y)), 0) AS wape
               FROM c GROUP BY 1)
             SELECT event_type, n, n_zero_actual, round(mae, 6) AS mae,
               round(rmse, 6) AS rmse, round(bias, 6) AS bias,
               round(mape, 6) AS mape, round(smape, 6) AS smape,
               round(wape, 6) AS wape
             FROM a ORDER BY event_type""")),

    // ---- McNemar paired-binary test ----------------------------------------
    // two derived "classifiers" on the same rows; only discordant cells
    // enter the statistic — counts exact, one division
    QueryDef("q_mcnemar",
      (s, d) => graft.stat.InferenceTests.mcnemar(
          lineitem(s, d)
            .filter(col("l_discount").isNotNull && col("l_tax").isNotNull)
            .withColumn("pa", col("l_discount") > 0.05)
            .withColumn("pb", col("l_tax") > 0.04),
          "pa", "pb")
        .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
          round(col("chi2"), 6).as("chi2"),
          round(col("chi2_corrected"), 6).as("chi2_corrected")),
      Some("""WITH d AS (SELECT (l_discount > 0.05) AS a,
               (l_tax > 0.04) AS b FROM lineitem
               WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL),
             g AS (SELECT count(*)::BIGINT AS n,
               sum(CASE WHEN a AND b THEN 1 ELSE 0 END)::BIGINT AS n11,
               sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)::BIGINT AS n10,
               sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)::BIGINT AS n01,
               sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)::BIGINT
                 AS n00 FROM d)
             SELECT n, n11, n10, n01, n00,
               round((n10 - n01)::DOUBLE * (n10 - n01) / (n10 + n01), 6)
                 AS chi2,
               round((abs((n10 - n01)::DOUBLE) - 1) *
                 (abs((n10 - n01)::DOUBLE) - 1) / (n10 + n01), 6)
                 AS chi2_corrected
             FROM g""")),

    // ---- multiple-testing corrections (Bonferroni / Holm / BH) -------------
    // the correction mechanics over a deterministic p column — rank
    // windows over the m-row hypothesis frame, running max/min replayed
    QueryDef("q_fdr_adjust",
      (s, d) => graft.stat.InferenceTests.multipleTestAdjust(
          s.read.parquet(s"$d/supplier.parquet")
            .filter(col("s_suppkey").isNotNull)
            .withColumn("p", (col("s_suppkey") * 61 % 101) / lit(101.0)),
          "p", Seq("s_suppkey"))
        .select(col("s_suppkey"), round(col("p"), 6).as("p"),
          col("rank").cast("long").as("rank"),
          round(col("p_bonferroni"), 6).as("p_bonferroni"),
          round(col("p_holm"), 6).as("p_holm"),
          round(col("p_bh"), 6).as("p_bh"))
        .orderBy("rank"),
      Some("""WITH h AS (SELECT s_suppkey,
               (s_suppkey * 61 % 101) / 101.0 AS p FROM supplier
               WHERE s_suppkey IS NOT NULL),
             mm AS (SELECT count(*)::BIGINT AS m FROM h),
             r AS (SELECT s_suppkey, p, m,
               row_number() OVER (ORDER BY p, s_suppkey) AS rank
               FROM h, mm),
             adj AS (SELECT *,
               least(1.0, p * m) AS pb,
               max(least(1.0, p * (m - rank + 1))) OVER (ORDER BY p,
                 s_suppkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
                 ROW) AS ph,
               min(least(1.0, p * m / rank)) OVER (ORDER BY p, s_suppkey
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS pbh
               FROM r)
             SELECT s_suppkey, round(p, 6) AS p, rank,
               round(pb, 6) AS p_bonferroni, round(ph, 6) AS p_holm,
               round(pbh, 6) AS p_bh
             FROM adj ORDER BY rank""")),

    // ---- partial autocorrelation (Durbin-Levinson over the ACF) ------------
    // the oracle unrolls the IDENTICAL recursion term-for-term from the
    // same unrounded per-user autocorrelations q_acf pins
    QueryDef("q_pacf",
      (s, d) => graft.events.TimeSeries.pacf(events(s, d),
          Seq("user_id"), "ts", "event_id", "value", maxLag = 3)
        .select(col("user_id"), col("lag"),
          round(col("pacf"), 6).as("pacf"))
        .orderBy("user_id", "lag"),
      Some("""WITH b AS (SELECT user_id, event_id, value::DOUBLE AS x,
               epoch_us(ts) AS tsu
               FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
                 AND event_id IS NOT NULL AND value IS NOT NULL),
             m AS (SELECT user_id, x,
               avg(x) OVER (PARTITION BY user_id) AS mu,
               lead(x, 1) OVER w AS l1, lead(x, 2) OVER w AS l2,
               lead(x, 3) OVER w AS l3
               FROM b WINDOW w AS (PARTITION BY user_id
                 ORDER BY tsu, event_id)),
             a AS (SELECT user_id,
               sum((x - mu) * (x - mu)) AS den,
               sum((x - mu) * (l1 - mu)) AS n1,
               sum((x - mu) * (l2 - mu)) AS n2,
               sum((x - mu) * (l3 - mu)) AS n3
               FROM m GROUP BY 1),
             rho AS (SELECT user_id, n1 / nullif(den, 0) AS r1,
               n2 / nullif(den, 0) AS r2, n3 / nullif(den, 0) AS r3
               FROM a),
             dl AS (SELECT user_id, r1, r2, r3,
               r1 AS phi11,
               (r2 - r1 * r1) / nullif(1 - r1 * r1, 0) AS phi22
               FROM rho),
             dl2 AS (SELECT *, phi11 - phi22 * phi11 AS phi21 FROM dl),
             dl3 AS (SELECT user_id, phi11, phi22,
               (r3 - phi21 * r2 - phi22 * r1) /
                 nullif(1 - phi21 * r1 - phi22 * r2, 0) AS phi33
               FROM dl2)
             SELECT user_id, lag, round(pacf, 6) AS pacf FROM (
               SELECT user_id, 1 AS lag, phi11 AS pacf FROM dl3
               UNION ALL SELECT user_id, 2, phi22 FROM dl3
               UNION ALL SELECT user_id, 3, phi33 FROM dl3)
             ORDER BY user_id, lag""")),

    // ---- cross-correlation function (hourly view vs click values) ----------
    // one +-K explode + co-partitioned equi-join on the shifted hour
    // index; the raw-sums correlation identity folds per lag
    QueryDef("q_ccf",
      (s, d) => {
        val hourly = events(s, d)
          .filter(col("ts").isNotNull && col("value").isNotNull &&
            col("event_type").isNotNull)
          .withColumn("i", expr("unix_micros(ts) div 3600000000"))
          .groupBy("i")
          .agg(avg(when(col("event_type") === "view", col("value")))
            .as("x"),
            avg(when(col("event_type") === "click", col("value")))
              .as("y"))
        graft.events.TimeSeries.crossCorrelation(
            hourly, Nil, "i", "x", "y", maxLag = 6)
          .select(col("lag"), col("n"), round(col("r"), 6).as("r"))
          .orderBy("lag")
      },
      Some("""WITH e AS (SELECT (epoch_us(ts) // 3600000000) AS i,
               avg(CASE WHEN event_type = 'view' THEN value END) AS x,
               avg(CASE WHEN event_type = 'click' THEN value END) AS y
               FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
                 AND event_type IS NOT NULL GROUP BY 1),
             lags AS (SELECT unnest([-6, -5, -4, -3, -2, -1, 0, 1, 2, 3,
               4, 5, 6]) AS lag),
             j AS (SELECT l.lag, a.x, b.y
               FROM e a CROSS JOIN lags l JOIN e b ON a.i + l.lag = b.i
               WHERE a.x IS NOT NULL AND b.y IS NOT NULL),
             g AS (SELECT lag, count(*)::BIGINT AS n, sum(x) AS sx,
               sum(y) AS sy, sum(x * x) AS sxx, sum(y * y) AS syy,
               sum(x * y) AS sxy FROM j GROUP BY 1),
             o AS (SELECT lag::INT AS lag, n,
               CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
                 AND n * syy - sy * sy > 0
                 THEN (n * sxy - sx * sy) /
                   sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) END AS r
               FROM g)
             SELECT lag, n, round(r, 6) AS r FROM o ORDER BY lag""")),

    // ---- geospatial tier ----------------------------------------------------
    // deterministic lat/lon derived from keys (|lat| <= 45 so the 4-deg
    // grid holds a 300 km radius); the ORACLE is the brute cross join —
    // it proves the grid-bucketed join loses no pair
    QueryDef("q_geo_join",
      (s, d) => {
        val pts = s.read.parquet(s"$d/customer.parquet")
          .filter(col("c_custkey").isNotNull)
          .withColumn("plat",
            (col("c_custkey") * 7919 % 9000) / lit(100.0) - 45.0)
          .withColumn("plon",
            (col("c_custkey") * 104729 % 36000) / lit(100.0) - 180.0)
          .select("c_custkey", "plat", "plon")
        val qs = s.read.parquet(s"$d/supplier.parquet")
          .filter(col("s_suppkey").isNotNull)
          .withColumn("qlat",
            (col("s_suppkey") * 7127 % 9000) / lit(100.0) - 45.0)
          .withColumn("qlon",
            (col("s_suppkey") * 104243 % 36000) / lit(100.0) - 180.0)
          .select("s_suppkey", "qlat", "qlon")
        graft.pipeline.Geo.radiusJoin(pts, qs, "plat", "plon",
            "qlat", "qlon", radiusMeters = 300000.0, cellDeg = 4.0)
          .select(col("s_suppkey"), col("c_custkey"),
            round(col("dist_m"), 3).as("dist_m"))
          .orderBy("s_suppkey", "c_custkey")
      },
      Some("""WITH c AS (SELECT c_custkey,
               (c_custkey * 7919 % 9000) / 100.0 - 45.0 AS plat,
               (c_custkey * 104729 % 36000) / 100.0 - 180.0 AS plon
               FROM customer WHERE c_custkey IS NOT NULL),
             s AS (SELECT s_suppkey,
               (s_suppkey * 7127 % 9000) / 100.0 - 45.0 AS qlat,
               (s_suppkey * 104243 % 36000) / 100.0 - 180.0 AS qlon
               FROM supplier WHERE s_suppkey IS NOT NULL),
             j AS (SELECT s_suppkey, c_custkey, 12742000.0 * asin(sqrt(
               sin((qlat - plat) * 0.017453292519943295 / 2) *
               sin((qlat - plat) * 0.017453292519943295 / 2) +
               cos(plat * 0.017453292519943295) *
               cos(qlat * 0.017453292519943295) *
               sin((qlon - plon) * 0.017453292519943295 / 2) *
               sin((qlon - plon) * 0.017453292519943295 / 2))) AS dist_m
               FROM c, s)
             SELECT s_suppkey, c_custkey, round(dist_m, 3) AS dist_m
             FROM j WHERE dist_m <= 300000.0
             ORDER BY s_suppkey, c_custkey""")),

    // ---- nearest point per query (1-NN with radius cap) --------------------
    QueryDef("q_geo_nearest",
      (s, d) => {
        val pts = s.read.parquet(s"$d/customer.parquet")
          .filter(col("c_custkey").isNotNull)
          .withColumn("plat",
            (col("c_custkey") * 7919 % 9000) / lit(100.0) - 45.0)
          .withColumn("plon",
            (col("c_custkey") * 104729 % 36000) / lit(100.0) - 180.0)
          .select("c_custkey", "plat", "plon")
        val qs = s.read.parquet(s"$d/supplier.parquet")
          .filter(col("s_suppkey").isNotNull)
          .withColumn("qlat",
            (col("s_suppkey") * 7127 % 9000) / lit(100.0) - 45.0)
          .withColumn("qlon",
            (col("s_suppkey") * 104243 % 36000) / lit(100.0) - 180.0)
          .select("s_suppkey", "qlat", "qlon")
        graft.pipeline.Geo.nearestJoin(pts, qs, "plat", "plon",
            "qlat", "qlon", queryKey = "s_suppkey", tieCol = "c_custkey",
            radiusMeters = 300000.0, cellDeg = 4.0)
          .select(col("s_suppkey"), col("c_custkey"),
            round(col("dist_m"), 3).as("dist_m"))
          .orderBy("s_suppkey")
      },
      Some("""WITH c AS (SELECT c_custkey,
               (c_custkey * 7919 % 9000) / 100.0 - 45.0 AS plat,
               (c_custkey * 104729 % 36000) / 100.0 - 180.0 AS plon
               FROM customer WHERE c_custkey IS NOT NULL),
             s AS (SELECT s_suppkey,
               (s_suppkey * 7127 % 9000) / 100.0 - 45.0 AS qlat,
               (s_suppkey * 104243 % 36000) / 100.0 - 180.0 AS qlon
               FROM supplier WHERE s_suppkey IS NOT NULL),
             j AS (SELECT s_suppkey, c_custkey, 12742000.0 * asin(sqrt(
               sin((qlat - plat) * 0.017453292519943295 / 2) *
               sin((qlat - plat) * 0.017453292519943295 / 2) +
               cos(plat * 0.017453292519943295) *
               cos(qlat * 0.017453292519943295) *
               sin((qlon - plon) * 0.017453292519943295 / 2) *
               sin((qlon - plon) * 0.017453292519943295 / 2))) AS dist_m
               FROM c, s),
             r AS (SELECT s_suppkey, c_custkey, dist_m,
               row_number() OVER (PARTITION BY s_suppkey
                 ORDER BY dist_m, c_custkey) AS rn
               FROM j WHERE dist_m <= 300000.0)
             SELECT s_suppkey, c_custkey, round(dist_m, 3) AS dist_m
             FROM r WHERE rn = 1 ORDER BY s_suppkey""")),

    // ---- grid-cell occupancy ------------------------------------------------
    // the cell key itself (floor lat + wrapped lon), top-50 densest cells
    QueryDef("q_geo_cells",
      (s, d) => graft.pipeline.Geo.withCells(
          s.read.parquet(s"$d/customer.parquet")
            .filter(col("c_custkey").isNotNull)
            .withColumn("lat",
              (col("c_custkey") * 7919 % 9000) / lit(100.0) - 45.0)
            .withColumn("lon",
              (col("c_custkey") * 104729 % 36000) / lit(100.0) - 180.0),
          "lat", "lon", cellDeg = 4.0)
        .groupBy("lat_cell", "lon_cell")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("lat_cell"), col("lon_cell"))
        .limit(50),
      Some("""WITH c AS (SELECT
               floor(((c_custkey * 7919 % 9000) / 100.0 - 45.0)
                 / 4.0)::INT AS lat_cell,
               ((floor((((c_custkey * 104729 % 36000) / 100.0 - 180.0)
                 + 180.0) / 4.0)::INT % 90) + 90) % 90 AS lon_cell
               FROM customer WHERE c_custkey IS NOT NULL)
             SELECT lat_cell, lon_cell, count(*)::BIGINT AS n FROM c
             GROUP BY 1, 2 ORDER BY n DESC, lat_cell, lon_cell
             LIMIT 50""")),

    // ---- top session paths (first-3-event-type prefixes) -------------------
    QueryDef("q_session_paths",
      (s, d) => graft.events.Transitions.sessionPaths(
          events(s, d)
            .filter(col("user_id").isNotNull && col("ts").isNotNull &&
              col("event_id").isNotNull && col("event_type").isNotNull)
            .withColumn("tsu", expr("unix_micros(ts)")),
          Seq("user_id"), "tsu", "event_id", "event_type",
          gap = 3600000000L, k = 3, topN = 20),
      Some("""WITH b AS (SELECT user_id, epoch_us(ts) AS tsu, event_id,
               event_type FROM events WHERE user_id IS NOT NULL
                 AND ts IS NOT NULL AND event_id IS NOT NULL
                 AND event_type IS NOT NULL),
             s AS (SELECT *, CASE WHEN lag(tsu) OVER w IS NULL
                 OR tsu - lag(tsu) OVER w > 3600000000 THEN 1 ELSE 0 END
                 AS ns
               FROM b WINDOW w AS (PARTITION BY user_id
                 ORDER BY tsu, event_id)),
             sid AS (SELECT *, sum(ns) OVER (PARTITION BY user_id
               ORDER BY tsu, event_id ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS sid FROM s),
             r AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid
               ORDER BY tsu, event_id) AS rn FROM sid),
             p AS (SELECT user_id, sid,
               string_agg(event_type, '>' ORDER BY rn) AS path
               FROM r WHERE rn <= 3 GROUP BY 1, 2)
             SELECT path, count(*)::BIGINT AS n FROM p GROUP BY 1
             ORDER BY n DESC, path LIMIT 20""")),

    // ---- Simpson's-paradox screen ------------------------------------------
    // pooled sums FOLD from the group frame on both sides, so the
    // summation trees match; price centered per the anova precedent
    QueryDef("q_simpson",
      (s, d) => Stats.simpsonCheck(
          lineitem(s, d).withColumn("price_c",
            col("l_extendedprice") - 38000.0d),
          "l_quantity", "price_c", "l_returnflag")
        .select(col("group"), col("n"),
          round(col("r_group"), 6).as("r_group"),
          round(col("r_pooled"), 6).as("r_pooled"),
          col("sign_flip"))
        .orderBy("group"),
      Some("""WITH d AS (SELECT l_returnflag AS g, l_quantity::DOUBLE AS x,
               l_extendedprice - 38000.0 AS y FROM lineitem
               WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
                 AND l_returnflag IS NOT NULL),
             gg AS (SELECT g, count(*)::DOUBLE AS n, sum(x) AS sx,
               sum(y) AS sy, sum(x * x) AS sxx, sum(y * y) AS syy,
               sum(x * y) AS sxy FROM d GROUP BY 1),
             p AS (SELECT sum(n) AS n, sum(sx) AS sx, sum(sy) AS sy,
               sum(sxx) AS sxx, sum(syy) AS syy, sum(sxy) AS sxy FROM gg),
             pr AS (SELECT CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
               AND n * syy - sy * sy > 0 THEN (n * sxy - sx * sy) /
               sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) END
               AS r_pooled FROM p),
             gr AS (SELECT g, n, CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
               AND n * syy - sy * sy > 0 THEN (n * sxy - sx * sy) /
               sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) END
               AS r_group FROM gg)
             SELECT g AS "group", n::BIGINT AS n,
               round(r_group, 6) AS r_group, round(r_pooled, 6) AS r_pooled,
               coalesce(r_group * r_pooled < 0, false) AS sign_flip
             FROM gr, pr ORDER BY 1""")),

    // ---- per-dimension embedding profile -----------------------------------
    QueryDef("q_vec_profile",
      (s, d) => graft.util.VectorOps.vecProfile(embeddings(s, d), "embedding")
        .select(col("dim"), col("n"),
          round(col("mean"), 6).as("mean"),
          round(col("variance_pop"), 6).as("variance_pop"),
          round(col("min"), 6).as("min"), round(col("max"), 6).as("max"))
        .orderBy("dim"),
      Some("""WITH e AS (SELECT unnest(embedding) AS v,
               generate_subscripts(embedding, 1) - 1 AS dim
               FROM embeddings WHERE embedding IS NOT NULL),
             c AS (SELECT dim::INT AS dim, v::DOUBLE AS v FROM e
               WHERE v IS NOT NULL),
             g AS (SELECT dim, count(*)::BIGINT AS n, sum(v) AS s,
               sum(v * v) AS ss, min(v) AS mn, max(v) AS mx FROM c
               GROUP BY 1)
             SELECT dim, n, round(s / n, 6) AS mean,
               round(ss / n - (s / n) * (s / n), 6) AS variance_pop,
               round(mn, 6) AS min, round(mx, 6) AS max
             FROM g ORDER BY dim""")),

    // ---- null-pattern mining -----------------------------------------------
    // correlated derived nulls (the q_nullcounts precedent) so joint
    // patterns actually occur
    QueryDef("q_null_patterns",
      (s, d) => graft.clean.Expectations.nullPatterns(
          lineitem(s, d)
            .withColumn("qa", when(col("l_quantity") > 45, null)
              .otherwise(col("l_quantity")))
            .withColumn("qb", when(col("l_quantity") > 48 ||
              col("l_discount") === 0.0, null).otherwise(col("l_discount")))
            .withColumn("qc", when(col("l_tax") === 0.0, null)
              .otherwise(col("l_tax"))),
          Seq("qa", "qb", "qc"))
        .select(col("mask"), col("n"), round(col("share"), 6).as("share")),
      Some("""WITH d AS (SELECT
               (CASE WHEN l_quantity > 45 THEN '1' ELSE '0' END) ||
               (CASE WHEN l_quantity > 48 OR l_discount = 0.0 THEN '1'
                 ELSE '0' END) ||
               (CASE WHEN l_tax = 0.0 THEN '1' ELSE '0' END) AS mask
               FROM lineitem),
             g AS (SELECT mask, count(*)::BIGINT AS n FROM d GROUP BY 1),
             t AS (SELECT sum(n) AS tot FROM g)
             SELECT mask, n, round(n / tot, 6) AS share FROM g, t
             ORDER BY n DESC, mask""")),

    // ---- Fleiss' kappa (4 raters per item: orders with 4 line items) -------
    QueryDef("q_fleiss",
      (s, d) => {
        val li = lineitem(s, d)
          .filter(col("l_orderkey").isNotNull && col("l_returnflag").isNotNull)
        val four = li.groupBy("l_orderkey").agg(count(lit(1)).as("__n"))
          .filter(col("__n") === 4).select("l_orderkey")
        graft.stat.InferenceTests.fleissKappa(
            li.join(four, "l_orderkey"), "l_orderkey", "l_returnflag")
          .select(col("n_items"), col("n_raters"),
            round(col("p_bar"), 6).as("p_bar"),
            round(col("p_e"), 6).as("p_e"),
            round(col("kappa"), 6).as("kappa"))
      },
      Some("""WITH ok AS (SELECT l_orderkey FROM lineitem
               WHERE l_orderkey IS NOT NULL AND l_returnflag IS NOT NULL
               GROUP BY 1 HAVING count(*) = 4),
             r AS (SELECT li.l_orderkey AS i, li.l_returnflag AS l
               FROM lineitem li JOIN ok USING (l_orderkey)
               WHERE li.l_returnflag IS NOT NULL),
             cells AS (SELECT i, l, count(*)::DOUBLE AS c FROM r
               GROUP BY 1, 2),
             pi AS (SELECT i, sum(c * c) AS c2 FROM cells GROUP BY 1),
             pb AS (SELECT count(*)::BIGINT AS n_items,
               avg((c2 - 4.0) / 12.0) AS p_bar FROM pi),
             pe AS (SELECT sum(nl * nl) / (sum(nl) * sum(nl)) AS p_e
               FROM (SELECT sum(c) AS nl FROM cells GROUP BY l))
             SELECT n_items, 4::BIGINT AS n_raters,
               round(p_bar, 6) AS p_bar, round(p_e, 6) AS p_e,
               round((p_bar - p_e) / (1 - p_e), 6) AS kappa
             FROM pb, pe""")),

    // ---- duplicate-cluster size histogram -----------------------------------
    // dup-injected corpus (the q_norm_dedup pattern, two overlapping
    // slices so cluster sizes 1/2/3 all occur) over the NORMALIZED key
    QueryDef("q_dup_sizes",
      (s, d) => {
        val docs = documents(s, d).select("doc_id", "text")
        val m7 = docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            concat(upper(col("text")), lit("  !!")).as("text"))
        val m13 = docs.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 2000000).as("doc_id"),
            concat(lit("** "), col("text")).as("text"))
        val corpus = docs.unionAll(m7).unionAll(m13)
          .select(graft.pipeline.Dedup.normalizeText(col("text"))
            .as("norm"))
        graft.pipeline.Dedup.dupSizeHistogram(corpus, "norm")
          .select(col("size"), col("n_clusters"), col("n_docs"))
          .orderBy("size")
      },
      Some("""WITH t AS (SELECT text FROM documents
               UNION ALL SELECT upper(text) || '  !!' FROM documents
                 WHERE doc_id % 7 = 0
               UNION ALL SELECT '** ' || text FROM documents
                 WHERE doc_id % 13 = 0),
             n AS (SELECT trim(regexp_replace(regexp_replace(
               lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))
               AS norm FROM t WHERE text IS NOT NULL),
             g AS (SELECT count(*)::BIGINT AS size FROM n GROUP BY norm)
             SELECT size, count(*)::BIGINT AS n_clusters,
               (size * count(*))::BIGINT AS n_docs
             FROM g GROUP BY 1 ORDER BY 1""")),

    // ---- burst detection over hourly event rates ----------------------------
    // exact mean thresholds (ratios of integer sums replay bit-equal),
    // island merge via idx - row_number
    QueryDef("q_bursts",
      (s, d) => {
        val hourly = events(s, d)
          .filter(col("event_type").isNotNull && col("ts").isNotNull)
          .withColumn("i", expr("unix_micros(ts) div 3600000000"))
          .groupBy("event_type", "i")
          .agg(count(lit(1)).as("c"))
        graft.events.TimeSeries.bursts(hourly, Seq("event_type"), "i", "c",
            mult = 1.3)
          .select(col("event_type"), col("start_idx"), col("end_idx"),
            col("n_buckets"), col("total").cast("long").as("total"),
            col("peak").cast("long").as("peak"))
          .orderBy("event_type", "start_idx")
      },
      Some("""WITH h AS (SELECT event_type,
               epoch_us(ts) // 3600000000 AS i, count(*)::DOUBLE AS c
               FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
               GROUP BY 1, 2),
             m AS (SELECT event_type, avg(c) AS mu FROM h GROUP BY 1),
             f AS (SELECT h.event_type, i, c FROM h JOIN m
               USING (event_type) WHERE c > mu * 1.3),
             isl AS (SELECT *, i - row_number() OVER (PARTITION BY
               event_type ORDER BY i) AS island FROM f)
             SELECT event_type, min(i)::BIGINT AS start_idx,
               max(i)::BIGINT AS end_idx, count(*)::BIGINT AS n_buckets,
               sum(c)::BIGINT AS total, max(c)::BIGINT AS peak
             FROM isl GROUP BY event_type, island
             ORDER BY event_type, start_idx""")),

    // ---- persisted geo index (partition-pruned radius query) ---------------
    // same brute-cross-join oracle as q_geo_join: the pairs must survive
    // the parquet round trip and the partitioned layout bit-for-bit
    QueryDef("q_geo_index",
      (s, d) => {
        val pts = s.read.parquet(s"$d/customer.parquet")
          .filter(col("c_custkey").isNotNull)
          .withColumn("plat",
            (col("c_custkey") * 7919 % 9000) / lit(100.0) - 45.0)
          .withColumn("plon",
            (col("c_custkey") * 104729 % 36000) / lit(100.0) - 180.0)
          .select("c_custkey", "plat", "plon")
        val qs = s.read.parquet(s"$d/supplier.parquet")
          .filter(col("s_suppkey").isNotNull)
          .withColumn("qlat",
            (col("s_suppkey") * 7127 % 9000) / lit(100.0) - 45.0)
          .withColumn("qlon",
            (col("s_suppkey") * 104243 % 36000) / lit(100.0) - 180.0)
          .select("s_suppkey", "qlat", "qlon")
        val path = graft.util.Scratch.dir("graft-q-geoindex")
        graft.pipeline.GeoIndex.write(pts, "c_custkey", "plat", "plon",
          cellDeg = 4.0, path, overwrite = true)
        graft.pipeline.GeoIndex.radiusQuery(qs, "qlat", "qlon",
            radiusMeters = 300000.0, path)
          .select(col("s_suppkey"), col("c_custkey"),
            round(col("dist_m"), 3).as("dist_m"))
          .orderBy("s_suppkey", "c_custkey")
      },
      Some("""WITH c AS (SELECT c_custkey,
               (c_custkey * 7919 % 9000) / 100.0 - 45.0 AS plat,
               (c_custkey * 104729 % 36000) / 100.0 - 180.0 AS plon
               FROM customer WHERE c_custkey IS NOT NULL),
             s AS (SELECT s_suppkey,
               (s_suppkey * 7127 % 9000) / 100.0 - 45.0 AS qlat,
               (s_suppkey * 104243 % 36000) / 100.0 - 180.0 AS qlon
               FROM supplier WHERE s_suppkey IS NOT NULL),
             j AS (SELECT s_suppkey, c_custkey, 12742000.0 * asin(sqrt(
               sin((qlat - plat) * 0.017453292519943295 / 2) *
               sin((qlat - plat) * 0.017453292519943295 / 2) +
               cos(plat * 0.017453292519943295) *
               cos(qlat * 0.017453292519943295) *
               sin((qlon - plon) * 0.017453292519943295 / 2) *
               sin((qlon - plon) * 0.017453292519943295 / 2))) AS dist_m
               FROM c, s)
             SELECT s_suppkey, c_custkey, round(dist_m, 3) AS dist_m
             FROM j WHERE dist_m <= 300000.0
             ORDER BY s_suppkey, c_custkey""")),

    // ---- weighted moments + Kish effective sample size ---------------------
    QueryDef("q_weighted_moments",
      (s, d) => Stats.weightedMoments(lineitem(s, d),
          "l_discount", "l_quantity", Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n"),
          col("sum_w").cast("long").as("sum_w"),
          round(col("mean_w"), 6).as("mean_w"),
          round(col("var_w"), 6).as("var_w"),
          round(col("n_eff"), 6).as("n_eff"))
        .orderBy("l_returnflag"),
      Some("""WITH d AS (SELECT l_returnflag, l_discount::DOUBLE AS x,
               l_quantity::DOUBLE AS w FROM lineitem
               WHERE l_returnflag IS NOT NULL AND l_discount IS NOT NULL
                 AND l_quantity IS NOT NULL),
             g AS (SELECT l_returnflag, count(*)::BIGINT AS n,
               sum(w) AS sw, sum(w * x) AS swx, sum(w * x * x) AS swxx,
               sum(w * w) AS sww FROM d GROUP BY 1)
             SELECT l_returnflag, n, sw::BIGINT AS sum_w,
               round(swx / sw, 6) AS mean_w,
               round(swxx / sw - (swx / sw) * (swx / sw), 6) AS var_w,
               round(sw * sw / sww, 6) AS n_eff
             FROM g ORDER BY l_returnflag""")),

    // ---- Neyman allocation + realized stratified sample --------------------
    // stddev is the explicit raw-sums chain; membership replays the
    // Lehmer hash verbatim (the q_hash_sample oracle, seed 5)
    QueryDef("q_neyman",
      (s, d) => {
        val docs = documents(s, d)
          .filter(col("doc_id").isNotNull && col("source").isNotNull &&
            col("text").isNotNull)
          .withColumn("len", length(col("text")))
        val alloc = graft.pipeline.Sampling.neymanAllocation(
          docs, "source", "len", targetN = 200)
        val realized = graft.pipeline.Sampling.neymanSample(
            docs, "doc_id", "source", "len", targetN = 200, seed = 5)
          .groupBy("source").agg(count(lit(1)).as("__r"))
        alloc.join(realized, col("stratum") === col("source"), "left")
          .select(col("stratum"), col("n_rows"),
            round(col("stddev"), 6).as("stddev"),
            round(col("fraction"), 6).as("fraction"),
            coalesce(col("__r"), lit(0L)).as("realized"))
          .orderBy("stratum")
      },
      Some("""WITH d AS (SELECT doc_id, source, length(text)::DOUBLE AS x
               FROM documents WHERE doc_id IS NOT NULL
                 AND source IS NOT NULL AND text IS NOT NULL),
             g AS (SELECT source AS stratum, count(*)::BIGINT AS n_rows,
               sum(x) AS s, sum(x * x) AS ss FROM d GROUP BY 1),
             sd AS (SELECT stratum, n_rows,
               CASE WHEN n_rows >= 2 AND
                 (ss - s * s / n_rows) / (n_rows - 1) > 0
                 THEN sqrt((ss - s * s / n_rows) / (n_rows - 1))
                 ELSE 0.0 END AS stddev FROM g),
             w AS (SELECT stratum, n_rows, stddev,
               n_rows * stddev AS weight FROM sd),
             tw AS (SELECT sum(weight) AS tw FROM w),
             fr AS (SELECT stratum, n_rows, stddev,
               CASE WHEN tw > 0 THEN least(1.0,
                 200.0 * weight / tw / n_rows) ELSE 0.0 END AS fraction
               FROM w, tw),
             k1 AS (SELECT doc_id, source,
               (doc_id % 2147483648 + (doc_id // 2147483648) * 48271)
                 % 2147483646 + 1 AS x FROM d),
             k2 AS (SELECT doc_id, source, ((x * 48271 % 2147483647)
               * 48271 % 2147483647) * 48271 % 2147483647 AS x3 FROM k1),
             k3 AS (SELECT doc_id, source,
               ((((x3 + 5) % 2147483646 + 1) * 48271 % 2147483647)
                 * 48271 % 2147483647)::DOUBLE / 2147483647.0 AS k
               FROM k2),
             kept AS (SELECT k3.source, count(*)::BIGINT AS realized
               FROM k3 JOIN fr ON k3.source = fr.stratum
               WHERE k3.k < fr.fraction GROUP BY 1)
             SELECT stratum, n_rows, round(stddev, 6) AS stddev,
               round(fraction, 6) AS fraction,
               coalesce(realized, 0) AS realized
             FROM fr LEFT JOIN kept ON fr.stratum = kept.source
             ORDER BY stratum""")),

    // ---- exact per-group quantile bands (no per-group buffers) -------------
    // the generalized medianByCounts: P50/P90/P99 per event type off the
    // distinct-value cumulative frame, quantile_cont convention
    QueryDef("q_quantile_bands",
      (s, d) => Stats.quantilesByCounts(
          events(s, d), "value", Seq("event_type"), Seq(0.5, 0.9, 0.99))
        .select(col("event_type"),
          round(col("q_0_5"), 6).as("q_0_5"),
          round(col("q_0_9"), 6).as("q_0_9"),
          round(col("q_0_99"), 6).as("q_0_99"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
             round(quantile_cont(value::DOUBLE, 0.5), 6) AS q_0_5,
             round(quantile_cont(value::DOUBLE, 0.9), 6) AS q_0_9,
             round(quantile_cont(value::DOUBLE, 0.99), 6) AS q_0_99
             FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
             GROUP BY 1 ORDER BY 1""")),

    // ---- energy distance (two-sample, 1-D cumulative identity) -------------
    // integer l_quantity keeps every cumulative an exact-integer double,
    // so the RangeCum fold is bit-deterministic
    QueryDef("q_energy_dist",
      (s, d) => graft.stat.Drift.energyDistance(
          lineitem(s, d), "l_quantity", "l_linestatus", "O", "F")
        .select(col("n_a"), col("n_b"),
          round(col("e_cross"), 6).as("e_cross"),
          round(col("e_within_a"), 6).as("e_within_a"),
          round(col("e_within_b"), 6).as("e_within_b"),
          round(col("energy"), 6).as("energy")),
      Some("""WITH two AS (SELECT l_quantity::DOUBLE AS v,
               (l_linestatus = 'O')::INT AS a FROM lineitem
               WHERE l_quantity IS NOT NULL
                 AND l_linestatus IN ('O', 'F')),
             c2 AS (SELECT v,
               sum(CASE WHEN a = 1 THEN 1.0 ELSE 0.0 END) AS ca,
               sum(CASE WHEN a = 0 THEN 1.0 ELSE 0.0 END) AS cb,
               v * sum(CASE WHEN a = 1 THEN 1.0 ELSE 0.0 END) AS sa,
               v * sum(CASE WHEN a = 0 THEN 1.0 ELSE 0.0 END) AS sb
               FROM two GROUP BY v),
             cum AS (SELECT *, sum(ca) OVER w AS cca, sum(cb) OVER w
               AS ccb, sum(sa) OVER w AS csa, sum(sb) OVER w AS csb
               FROM c2 WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW)),
             t AS (SELECT sum(ca) AS na, sum(cb) AS nb, sum(sa) AS ta,
               sum(sb) AS tb FROM c2),
             s AS (SELECT
               sum(ca * (v * ccb - csb + (tb - csb) - v * (nb - ccb)))
                 AS sxy,
               sum(ca * (v * cca - csa + (ta - csa) - v * (na - cca)))
                 AS sxx,
               sum(cb * (v * ccb - csb + (tb - csb) - v * (nb - ccb)))
                 AS syy,
               any_value(na) AS na, any_value(nb) AS nb
               FROM cum, t)
             SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
               round(sxy / (na * nb), 6) AS e_cross,
               round(sxx / (na * na), 6) AS e_within_a,
               round(syy / (nb * nb), 6) AS e_within_b,
               round(2.0 * (sxy / (na * nb)) - sxx / (na * na)
                 - syy / (nb * nb), 6) AS energy
             FROM s""")),

    // ---- geo index append path (build + grow, then query) ------------------
    // two-thirds written, one-third appended; the brute oracle must see
    // the union — append may not lose, duplicate, or re-cell points
    QueryDef("q_geo_append",
      (s, d) => {
        val pts = s.read.parquet(s"$d/customer.parquet")
          .filter(col("c_custkey").isNotNull)
          .withColumn("plat",
            (col("c_custkey") * 7919 % 9000) / lit(100.0) - 45.0)
          .withColumn("plon",
            (col("c_custkey") * 104729 % 36000) / lit(100.0) - 180.0)
          .select("c_custkey", "plat", "plon")
        val qs = s.read.parquet(s"$d/supplier.parquet")
          .filter(col("s_suppkey").isNotNull)
          .withColumn("qlat",
            (col("s_suppkey") * 7127 % 9000) / lit(100.0) - 45.0)
          .withColumn("qlon",
            (col("s_suppkey") * 104243 % 36000) / lit(100.0) - 180.0)
          .select("s_suppkey", "qlat", "qlon")
        val path = graft.util.Scratch.dir("graft-q-geoappend")
        graft.pipeline.GeoIndex.write(
          pts.filter(col("c_custkey") % 3 =!= 0), "c_custkey",
          "plat", "plon", cellDeg = 4.0, path, overwrite = true)
        graft.pipeline.GeoIndex.append(
          pts.filter(col("c_custkey") % 3 === 0), path)
        graft.pipeline.GeoIndex.radiusQuery(qs, "qlat", "qlon",
            radiusMeters = 300000.0, path)
          .select(col("s_suppkey"), col("c_custkey"),
            round(col("dist_m"), 3).as("dist_m"))
          .orderBy("s_suppkey", "c_custkey")
      },
      Some("""WITH c AS (SELECT c_custkey,
               (c_custkey * 7919 % 9000) / 100.0 - 45.0 AS plat,
               (c_custkey * 104729 % 36000) / 100.0 - 180.0 AS plon
               FROM customer WHERE c_custkey IS NOT NULL),
             s AS (SELECT s_suppkey,
               (s_suppkey * 7127 % 9000) / 100.0 - 45.0 AS qlat,
               (s_suppkey * 104243 % 36000) / 100.0 - 180.0 AS qlon
               FROM supplier WHERE s_suppkey IS NOT NULL),
             j AS (SELECT s_suppkey, c_custkey, 12742000.0 * asin(sqrt(
               sin((qlat - plat) * 0.017453292519943295 / 2) *
               sin((qlat - plat) * 0.017453292519943295 / 2) +
               cos(plat * 0.017453292519943295) *
               cos(qlat * 0.017453292519943295) *
               sin((qlon - plon) * 0.017453292519943295 / 2) *
               sin((qlon - plon) * 0.017453292519943295 / 2))) AS dist_m
               FROM c, s)
             SELECT s_suppkey, c_custkey, round(dist_m, 3) AS dist_m
             FROM j WHERE dist_m <= 300000.0
             ORDER BY s_suppkey, c_custkey""")),

    // ---- DeLong correlated-AUC test ----------------------------------------
    // two scorers on the same rows; placements replay over the distinct-
    // score cumulative frame (mid-tie convention), var chain term-aligned
    QueryDef("q_delong",
      (s, d) => graft.eval.BinaryMetrics.deLongTest(
          lineitem(s, d)
            .filter(col("l_orderkey").isNotNull &&
              col("l_linenumber").isNotNull &&
              col("l_returnflag").isNotNull && col("l_discount").isNotNull &&
              col("l_tax").isNotNull)
            .withColumn("rid",
              col("l_orderkey") * 8 + col("l_linenumber"))
            .withColumn("y", (col("l_returnflag") === "R").cast("double")),
          "rid", "y", "l_discount", "l_tax")
        .select(col("n_pos"), col("n_neg"),
          round(col("auc_1"), 6).as("auc_1"),
          round(col("auc_2"), 6).as("auc_2"),
          round(col("var_diff"), 10).as("var_diff"),
          round(col("z_stat"), 6).as("z_stat")),
      Some("""WITH r AS (SELECT
               (l_returnflag = 'R')::INT::DOUBLE AS y,
               l_discount::DOUBLE AS s1, l_tax::DOUBLE AS s2
               FROM lineitem WHERE l_orderkey IS NOT NULL
                 AND l_linenumber IS NOT NULL AND l_returnflag IS NOT NULL
                 AND l_discount IS NOT NULL AND l_tax IS NOT NULL),
             b1 AS (SELECT s1 AS s, count(*)::DOUBLE AS n, sum(y) AS p
               FROM r GROUP BY 1),
             c1 AS (SELECT s, p, n - p AS m, sum(p) OVER w AS cp,
               sum(n - p) OVER w AS cm FROM b1 WINDOW w AS (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             t1 AS (SELECT sum(p) AS np, sum(n - p) AS nm FROM b1),
             pl1 AS (SELECT s, (cm - m + m / 2) / nm AS v10,
               (np - cp + p / 2) / np AS v01 FROM c1, t1),
             b2 AS (SELECT s2 AS s, count(*)::DOUBLE AS n, sum(y) AS p
               FROM r GROUP BY 1),
             c2 AS (SELECT s, p, n - p AS m, sum(p) OVER w AS cp,
               sum(n - p) OVER w AS cm FROM b2 WINDOW w AS (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             t2 AS (SELECT sum(p) AS np, sum(n - p) AS nm FROM b2),
             pl2 AS (SELECT s, (cm - m + m / 2) / nm AS v10,
               (np - cp + p / 2) / np AS v01 FROM c2, t2),
             j AS (SELECT r.y,
               CASE WHEN r.y = 1.0 THEN pl1.v10 ELSE pl1.v01 END AS v1,
               CASE WHEN r.y = 1.0 THEN pl2.v10 ELSE pl2.v01 END AS v2
               FROM r JOIN pl1 ON r.s1 = pl1.s
                 JOIN pl2 ON r.s2 = pl2.s),
             a AS (SELECT
               sum(CASE WHEN y = 1.0 THEN 1.0 ELSE 0.0 END) AS n1,
               sum(CASE WHEN y = 1.0 THEN 0.0 ELSE 1.0 END) AS n0,
               sum(CASE WHEN y = 1.0 THEN v1 ELSE 0.0 END) AS s1p,
               sum(CASE WHEN y = 1.0 THEN v2 ELSE 0.0 END) AS s2p,
               sum(CASE WHEN y = 1.0 THEN 0.0 ELSE v1 END) AS s1n,
               sum(CASE WHEN y = 1.0 THEN 0.0 ELSE v2 END) AS s2n,
               sum(CASE WHEN y = 1.0 THEN v1 * v1 ELSE 0.0 END) AS q11p,
               sum(CASE WHEN y = 1.0 THEN v2 * v2 ELSE 0.0 END) AS q22p,
               sum(CASE WHEN y = 1.0 THEN v1 * v2 ELSE 0.0 END) AS q12p,
               sum(CASE WHEN y = 1.0 THEN 0.0 ELSE v1 * v1 END) AS q11n,
               sum(CASE WHEN y = 1.0 THEN 0.0 ELSE v2 * v2 END) AS q22n,
               sum(CASE WHEN y = 1.0 THEN 0.0 ELSE v1 * v2 END) AS q12n
               FROM j),
             v AS (SELECT n1, n0, s1p, s2p,
               ((q11p - s1p * s1p / n1) / (n1 - 1) +
                (q22p - s2p * s2p / n1) / (n1 - 1) -
                2.0 * ((q12p - s1p * s2p / n1) / (n1 - 1))) / n1 +
               ((q11n - s1n * s1n / n0) / (n0 - 1) +
                (q22n - s2n * s2n / n0) / (n0 - 1) -
                2.0 * ((q12n - s1n * s2n / n0) / (n0 - 1))) / n0 AS vd
               FROM a)
             SELECT n1::BIGINT AS n_pos, n0::BIGINT AS n_neg,
               round(s1p / n1, 6) AS auc_1, round(s2p / n1, 6) AS auc_2,
               round(vd, 10) AS var_diff,
               round(CASE WHEN vd > 0
                 THEN (s1p / n1 - s2p / n1) / sqrt(vd) END, 6) AS z_stat
             FROM v""")),

    // ---- Cochran's Q (k paired binary treatments) ---------------------------
    // complete blocks: orders whose line numbers are exactly {1,2,3,4}
    QueryDef("q_cochran_q",
      (s, d) => {
        val li = lineitem(s, d)
          .filter(col("l_orderkey").isNotNull &&
            col("l_linenumber").isNotNull && col("l_returnflag").isNotNull)
        val blocks = li.groupBy("l_orderkey")
          .agg(count(lit(1)).as("__c"),
            countDistinct("l_linenumber").as("__dl"),
            max("l_linenumber").as("__mx"), min("l_linenumber").as("__mn"))
          .filter(col("__c") === 4 && col("__dl") === 4 &&
            col("__mx") === 4 && col("__mn") === 1)
          .select("l_orderkey")
        graft.stat.InferenceTests.cochranQ(
            li.join(blocks, "l_orderkey")
              .withColumn("y", (col("l_returnflag") === "R").cast("int")),
            "l_orderkey", "l_linenumber", "y")
          .select(col("n_items"), col("k"), col("dof"),
            round(col("q_stat"), 6).as("q_stat"))
      },
      Some("""WITH ok AS (SELECT l_orderkey FROM lineitem
               WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
                 AND l_returnflag IS NOT NULL
               GROUP BY 1 HAVING count(*) = 4
                 AND count(DISTINCT l_linenumber) = 4
                 AND max(l_linenumber) = 4 AND min(l_linenumber) = 1),
             r AS (SELECT li.l_orderkey AS i, li.l_linenumber AS t,
               (li.l_returnflag = 'R')::INT::DOUBLE AS y
               FROM lineitem li JOIN ok USING (l_orderkey)),
             pi AS (SELECT i, sum(y) AS rr FROM r GROUP BY 1),
             ti AS (SELECT count(*)::BIGINT AS n_items, sum(rr) AS tt,
               sum(rr * rr) AS r2 FROM pi),
             cj AS (SELECT t, sum(y) AS c FROM r GROUP BY 1),
             a AS (SELECT sum((c - tt / 4) * (c - tt / 4)) AS num,
               any_value(n_items) AS n_items, any_value(tt) AS tt,
               any_value(r2) AS r2 FROM cj, ti)
             SELECT n_items, 4::BIGINT AS k, 3::BIGINT AS dof,
               round(CASE WHEN 4.0 * tt - r2 > 0
                 THEN 12.0 * num / (4.0 * tt - r2) END, 6) AS q_stat
             FROM a""")),

    // ---- Mantel-Haenszel pooled odds ratio ----------------------------------
    QueryDef("q_mantel_haenszel",
      (s, d) => graft.stat.InferenceTests.mantelHaenszel(
          lineitem(s, d)
            .filter(col("l_returnflag").isNotNull &&
              col("l_discount").isNotNull && col("l_tax").isNotNull)
            .withColumn("t", (col("l_discount") > 0.05).cast("int"))
            .withColumn("y", (col("l_tax") > 0.04).cast("int")),
          "l_returnflag", "t", "y")
        .select(col("n"), col("n_strata"),
          round(col("or_crude"), 6).as("or_crude"),
          round(col("or_mh"), 6).as("or_mh")),
      Some("""WITH d AS (SELECT l_returnflag AS s,
               (l_discount > 0.05)::INT AS t, (l_tax > 0.04)::INT AS y
               FROM lineitem WHERE l_returnflag IS NOT NULL
                 AND l_discount IS NOT NULL AND l_tax IS NOT NULL),
             st AS (SELECT s,
               sum(CASE WHEN t = 1 AND y = 1 THEN 1.0 ELSE 0.0 END) AS a,
               sum(CASE WHEN t = 1 AND y = 0 THEN 1.0 ELSE 0.0 END) AS b,
               sum(CASE WHEN t = 0 AND y = 1 THEN 1.0 ELSE 0.0 END) AS c,
               sum(CASE WHEN t = 0 AND y = 0 THEN 1.0 ELSE 0.0 END) AS dd
               FROM d GROUP BY 1),
             p AS (SELECT sum(a + b + c + dd)::BIGINT AS n,
               count(*)::BIGINT AS n_strata,
               sum(a * dd / (a + b + c + dd)) AS mh_num,
               sum(b * c / (a + b + c + dd)) AS mh_den,
               sum(a) AS ca, sum(b) AS cb, sum(c) AS cc, sum(dd) AS cd
               FROM st)
             SELECT n, n_strata,
               round(CASE WHEN cb * cc > 0 THEN ca * cd / (cb * cc) END, 6)
                 AS or_crude,
               round(CASE WHEN mh_den > 0 THEN mh_num / mh_den END, 6)
                 AS or_mh
             FROM p""")),

    // ---- Cronbach's alpha ----------------------------------------------------
    // three deterministically-correlated "items" around l_quantity so
    // the statistic lands in its meaningful (near-1) regime
    QueryDef("q_cronbach",
      (s, d) => Stats.cronbachAlpha(
          lineitem(s, d)
            .filter(col("l_quantity").isNotNull &&
              col("l_linenumber").isNotNull && col("l_suppkey").isNotNull)
            .withColumn("i1", col("l_quantity").cast("double"))
            .withColumn("i2",
              col("l_quantity") + col("l_linenumber").cast("double"))
            .withColumn("i3",
              col("l_quantity") + (col("l_suppkey") % 7).cast("double")),
          Seq("i1", "i2", "i3"))
        .select(col("n"), col("k"),
          round(col("sum_item_var"), 6).as("sum_item_var"),
          round(col("total_var"), 6).as("total_var"),
          round(col("alpha"), 6).as("alpha")),
      Some("""WITH d AS (SELECT l_quantity::DOUBLE AS i1,
               l_quantity + l_linenumber::DOUBLE AS i2,
               l_quantity + (l_suppkey % 7)::DOUBLE AS i3
               FROM lineitem WHERE l_quantity IS NOT NULL
                 AND l_linenumber IS NOT NULL AND l_suppkey IS NOT NULL),
             a AS (SELECT count(*)::DOUBLE AS n,
               sum(i1 + i2 + i3) AS st,
               sum((i1 + i2 + i3) * (i1 + i2 + i3)) AS sst,
               sum(i1) AS s1, sum(i1 * i1) AS ss1,
               sum(i2) AS s2, sum(i2 * i2) AS ss2,
               sum(i3) AS s3, sum(i3 * i3) AS ss3 FROM d),
             v AS (SELECT n,
               (ss1 - s1 * s1 / n) / (n - 1) +
               (ss2 - s2 * s2 / n) / (n - 1) +
               (ss3 - s3 * s3 / n) / (n - 1) AS siv,
               (sst - st * st / n) / (n - 1) AS tv FROM a)
             SELECT n::BIGINT AS n, 3 AS k, round(siv, 6) AS sum_item_var,
               round(tv, 6) AS total_var,
               round(CASE WHEN tv > 0
                 THEN 1.5 * (1.0 - siv / tv) END, 6) AS alpha
             FROM v""")),

    // ---- Box-Cox lambda selection ------------------------------------------
    // loglik compared PER ROW (magnitude ~10, engine diff ~1e-10 — the
    // scaled-statistic discipline); is_best pins the grid argmax
    QueryDef("q_boxcox",
      (s, d) => Stats.boxCoxFit(lineitem(s, d), "l_extendedprice")
        .select(col("lambda"), col("n"),
          round(col("loglik") / col("n"), 6).as("loglik_per_row"),
          col("is_best"))
        .orderBy("lambda"),
      Some("""WITH clean AS (SELECT l_extendedprice::DOUBLE AS x
               FROM lineitem WHERE l_extendedprice IS NOT NULL),
             lam AS (SELECT unnest([-2.0, -1.5, -1.0, -0.5, 0.0, 0.5,
               1.0, 1.5, 2.0]) AS lambda),
             t AS (SELECT lambda, CASE WHEN lambda = 0 THEN ln(x)
               ELSE (pow(x, lambda) - 1) / lambda END AS t
               FROM clean CROSS JOIN lam),
             p AS (SELECT lambda, count(*)::DOUBLE AS n, sum(t) AS s,
               sum(t * t) AS ss FROM t GROUP BY 1),
             sl AS (SELECT sum(ln(x)) AS sumln FROM clean),
             r AS (SELECT lambda, n,
               CASE WHEN ss / n - (s / n) * (s / n) > 0 THEN
                 -0.5 * n * ln(ss / n - (s / n) * (s / n)) +
                 (lambda - 1) * sumln END AS ll
               FROM p, sl)
             SELECT lambda, n::BIGINT AS n, round(ll / n, 6)
                 AS loglik_per_row,
               (ll IS NOT NULL AND row_number() OVER (ORDER BY ll DESC
                 NULLS LAST, lambda ASC) = 1) AS is_best
             FROM r ORDER BY lambda""")),
  )
}
