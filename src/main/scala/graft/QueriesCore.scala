package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.agg.Stats
import graft.clean.Clean
import graft.core.HandyFrame
import graft.ml.{HandyFencer, HandyImputer}
import graft.plotdata.PlotData
import graft.strata.{Bucket, ColStratum, Quantile, StratifiedFrame}

/** Gate tier 1/9 — reference-parity core: scan/join contracts, describe/stats, strata, fill/fence, plot data, string/date suites, Mahalanobis, t-tests, binary-classification metrics.
  *
  * Split from the 11k-line Queries.scala (r11 VERDICT #8): pure
  * relocation, zero semantic movement — [[Queries.defs]] concatenates
  * the nine tiers in the original order and the duplicate-name guard
  * still covers the whole set. All determinism rules live in the
  * [[Queries]] scaladoc; table readers and shared contracts in
  * [[QueryHelpers]]. 55 queries. */
private[graft] object QueriesCore {
  import QueryHelpers._

  val defs: Seq[QueryDef] = Seq(

    // ---- shape / counts --------------------------------------------------
    QueryDef("q_shape",
      (s, d) => lineitem(s, d).agg(count(lit(1)).as("n_rows")),
      Some("SELECT count(*) AS n_rows FROM lineitem")),

    // ---- key-skew report (the broadcast/salt/shuffle decision input) ------
    QueryDef("q_skew_report",
      (s, d) => graft.scale.ScaleOps.skewReport(lineitem(s, d), Seq("l_orderkey"))
        .select(col("n_rows"), col("n_keys"), col("max_key_count"),
          round(col("top1_share"), 6).as("top1_share"),
          round(col("avg_key_count"), 6).as("avg_key_count")),
      Some("""WITH c AS (SELECT l_orderkey, count(*) AS n FROM lineitem
               WHERE l_orderkey IS NOT NULL GROUP BY 1)
             SELECT sum(n)::BIGINT AS n_rows, count(*)::BIGINT AS n_keys,
               max(n)::BIGINT AS max_key_count,
               round(max(n)::DOUBLE / sum(n)::DOUBLE, 6) AS top1_share,
               round(sum(n)::DOUBLE / count(*)::DOUBLE, 6) AS avg_key_count
             FROM c""")),

    // ---- skew-salted join == plain join (semantics contract) --------------
    // the salt is physical-plan shaping only: a deterministic row-hash
    // spreads each hot key over 8 reducers, the dim side is exploded 8x,
    // and the result must be EXACTLY the plain join's — which is what the
    // oracle runs. sum(l_quantity) is integer-valued, so the double sum is
    // order-independent and the hash compare is exact
    QueryDef("q_salted_join",
      (s, d) => {
        val fact = lineitem(s, d)
          .select(col("l_orderkey").as("okey"), col("l_quantity"))
        val dim = orders(s, d)
          .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
        graft.scale.ScaleOps.saltedJoin(fact, dim, "okey", buckets = 8)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum("l_quantity").cast("long").as("sum_qty"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*)::BIGINT AS n,
             sum(l_quantity)::BIGINT AS sum_qty
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             GROUP BY 1 ORDER BY 1""")),

    // ---- Z-order layout key (multi-dim clustering for scan pruning) -------
    // min-max quantize each dimension to 8 bits, interleave (dim i at bit
    // b*ndims+i) — pure codegen'd column arithmetic whose integer ops the
    // oracle replays term-for-term; IEEE doubles make the quantization
    // floor bit-identical across engines
    QueryDef("q_zorder",
      (s, d) => graft.scale.ScaleOps.withZorder(spark_part(s, d),
          Seq("p_retailprice", "p_size"), bits = 8)
        .select(col("p_partkey"), col("zorder"))
        .orderBy("p_partkey"),
      Some("""WITH s AS (SELECT
               min(p_retailprice::DOUBLE) AS mn1, max(p_retailprice::DOUBLE) AS mx1,
               min(p_size::DOUBLE) AS mn2, max(p_size::DOUBLE) AS mx2 FROM part),
             q AS (SELECT p_partkey,
               least(255, greatest(0, floor(((p_retailprice::DOUBLE - mn1)
                 / (mx1 - mn1)) * 256.0)))::BIGINT AS q1,
               least(255, greatest(0, floor(((p_size::DOUBLE - mn2)
                 / (mx2 - mn2)) * 256.0)))::BIGINT AS q2
               FROM part, s)
             SELECT p_partkey,
               sum(((q1 >> b) & 1) * (1::BIGINT << (2 * b))
                 + ((q2 >> b) & 1) * (1::BIGINT << (2 * b + 1)))::BIGINT
                 AS zorder
             FROM q, unnest(generate_series(0, 7)) AS t(b)
             GROUP BY 1 ORDER BY 1""")),

    // ---- Bloom-pruned join == plain join (semantics contract) -------------
    // the Bloom prune is shuffle-volume shaping only: false positives die
    // in the real join, false negatives don't exist, so the result must
    // hash-match the plain filtered join the oracle runs
    QueryDef("q_bloom_join",
      (s, d) => {
        val big = lineitem(s, d)
          .select(col("l_orderkey").as("okey"), col("l_quantity"))
        val small = orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey").as("okey"))
        graft.scale.ScaleOps.bloomPrunedJoin(big, small, "okey")
          .agg(count(lit(1)).as("n"),
            sum("l_quantity").cast("long").as("sum_qty"))
      },
      Some("""SELECT count(*)::BIGINT AS n, sum(l_quantity)::BIGINT AS sum_qty
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             WHERE o_orderpriority = '1-URGENT'""")),

    // ---- schema-wide table profile (exact mode = the oracle contract) -----
    // min/max compare in native type, string-cast only for the uniform
    // output; doubles print identically in both engines at these values
    QueryDef("q_table_profile",
      (s, d) => graft.agg.Stats.tableProfile(
          s.read.parquet(s"$d/customer.parquet"),
          Seq("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"),
          exact = true)
        .orderBy("column"),
      Some("""WITH n AS (SELECT count(*)::BIGINT AS n_rows FROM customer)
             SELECT * FROM (
               SELECT 'c_custkey' AS "column", n.n_rows,
                 count(c_custkey)::BIGINT AS n_nonnull,
                 count(DISTINCT c_custkey)::BIGINT AS n_distinct,
                 min(c_custkey)::VARCHAR AS min_str,
                 max(c_custkey)::VARCHAR AS max_str FROM customer, n
                 GROUP BY n.n_rows
               UNION ALL
               SELECT 'c_nationkey', n.n_rows, count(c_nationkey)::BIGINT,
                 count(DISTINCT c_nationkey)::BIGINT,
                 min(c_nationkey)::VARCHAR, max(c_nationkey)::VARCHAR
                 FROM customer, n GROUP BY n.n_rows
               UNION ALL
               SELECT 'c_acctbal', n.n_rows, count(c_acctbal)::BIGINT,
                 count(DISTINCT c_acctbal)::BIGINT,
                 min(c_acctbal)::VARCHAR, max(c_acctbal)::VARCHAR
                 FROM customer, n GROUP BY n.n_rows
               UNION ALL
               SELECT 'c_mktsegment', n.n_rows, count(c_mktsegment)::BIGINT,
                 count(DISTINCT c_mktsegment)::BIGINT,
                 min(c_mktsegment)::VARCHAR, max(c_mktsegment)::VARCHAR
                 FROM customer, n GROUP BY n.n_rows)
             ORDER BY "column"""")),

    // ---- measured auto-join == plain join (semantics contract) ------------
    // whatever physical branch the measurements pick (broadcast here:
    // orders is small at these SFs), the RESULT must hash-match the plain
    // join — same contract family as q_salted_join / q_bloom_join
    QueryDef("q_auto_join",
      (s, d) => {
        val fact = lineitem(s, d)
          .select(col("l_orderkey").as("okey"), col("l_quantity"))
        val dim = orders(s, d)
          .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
        graft.scale.ScaleOps.autoJoin(fact, dim, "okey",
            broadcastRows = 100000L, skewThreshold = 0.2)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum("l_quantity").cast("long").as("sum_qty"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*)::BIGINT AS n,
             sum(l_quantity)::BIGINT AS sum_qty
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             GROUP BY 1 ORDER BY 1""")),

    // ---- classic grouped aggregation (TPC-H Q1 shape) --------------------
    QueryDef("q1_agg",
      (s, d) => lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             round(avg(l_quantity), 6) AS avg_qty,
             count(*) AS count_order
             FROM lineitem GROUP BY l_returnflag, l_linestatus
             ORDER BY l_returnflag, l_linestatus""")),

    // ---- describe: mean/min/max/stddev/var (SURVEY §2.4) -----------------
    QueryDef("q_describe",
      (s, d) => Stats.describe(lineitem(s, d),
          Seq("l_extendedprice", "l_quantity"), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n"),
          round(col("l_extendedprice_mean"), 4).as("price_mean"),
          round(col("l_extendedprice_min"), 4).as("price_min"),
          round(col("l_extendedprice_max"), 4).as("price_max"),
          round(col("l_extendedprice_stddev"), 4).as("price_stddev"),
          round(col("l_extendedprice_var"), 2).as("price_var"),
          round(col("l_quantity_mean"), 6).as("qty_mean"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(*) AS n,
             round(avg(l_extendedprice), 4) AS price_mean,
             round(min(l_extendedprice), 4) AS price_min,
             round(max(l_extendedprice), 4) AS price_max,
             round(stddev_samp(l_extendedprice), 4) AS price_stddev,
             round(var_samp(l_extendedprice), 2) AS price_var,
             round(avg(l_quantity), 6) AS qty_mean
             FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- exact percentiles (q1/median/q3) --------------------------------
    QueryDef("q_percentiles",
      (s, d) => Stats.percentileExact(lineitem(s, d),
          Seq("l_extendedprice"), Seq(0.25, 0.5, 0.75), Seq("l_returnflag"))
        .select(col("l_returnflag"),
          round(col("l_extendedprice_p25"), 4).as("q1"),
          round(col("l_extendedprice_p50"), 4).as("median"),
          round(col("l_extendedprice_p75"), 4).as("q3"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.25), 4) AS q1,
             round(quantile_cont(l_extendedprice, 0.50), 4) AS median,
             round(quantile_cont(l_extendedprice, 0.75), 4) AS q3
             FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- value_counts ----------------------------------------------------
    QueryDef("q_value_counts",
      (s, d) => Stats.valueCounts(lineitem(s, d), Seq("l_returnflag", "l_linestatus"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS value_counts
             FROM lineitem WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
             GROUP BY l_returnflag, l_linestatus
             ORDER BY l_returnflag, l_linestatus""")),

    // ---- mode: global + stratified ---------------------------------------
    QueryDef("q_mode",
      (s, d) => Stats.mode(lineitem(s, d), "l_returnflag"),
      Some("""SELECT l_returnflag AS l_returnflag_mode FROM (
               SELECT l_returnflag, count(*) AS cnt FROM lineitem
               WHERE l_returnflag IS NOT NULL GROUP BY l_returnflag)
             ORDER BY cnt DESC, l_returnflag LIMIT 1""")),

    QueryDef("q_mode_stratified",
      (s, d) => Stats.modeStratified(orders(s, d), "o_orderpriority",
          Seq("o_orderstatus"))
        .orderBy("o_orderstatus"),
      Some("""WITH counts AS (
               SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
               FROM orders WHERE o_orderpriority IS NOT NULL
               GROUP BY o_orderstatus, o_orderpriority),
             ranked AS (
               SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                 ORDER BY cnt DESC, o_orderpriority) AS rn FROM counts)
             SELECT o_orderstatus, o_orderpriority AS o_orderpriority_mode
             FROM ranked WHERE rn = 1 ORDER BY o_orderstatus""")),

    // ---- null counts & ratios (nulls synthesized via nullif) -------------
    QueryDef("q_nullcounts",
      (s, d) => {
        val li = lineitem(s, d)
          .withColumn("qty_n", when(col("l_quantity") > 45, null)
            .otherwise(col("l_quantity")))
          .withColumn("disc_n", when(col("l_discount") === 0.0, null)
            .otherwise(col("l_discount")))
        Stats.isNull(li, Seq("qty_n", "disc_n"))
          .select(col("qty_n").as("qty_nulls"), col("disc_n").as("disc_nulls"))
      },
      Some("""SELECT
             sum(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END)::BIGINT AS qty_nulls,
             sum(CASE WHEN l_discount = 0.0 THEN 1 ELSE 0 END)::BIGINT AS disc_nulls
             FROM lineitem""")),

    QueryDef("q_nullratio",
      (s, d) => {
        val li = lineitem(s, d)
          .withColumn("qty_n", when(col("l_quantity") > 45, null)
            .otherwise(col("l_quantity")))
        Stats.isNull(li, Seq("qty_n"), ratio = true, strata = Seq("l_returnflag"))
          .select(col("l_returnflag"), round(col("qty_n_ratio"), 6).as("null_ratio"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             round(sum(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) / count(*), 6)
               AS null_ratio
             FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- distinct counts (exact variant for the oracle) ------------------
    QueryDef("q_nunique",
      (s, d) => Stats.nuniqueExact(lineitem(s, d),
          Seq("l_orderkey", "l_partkey", "l_returnflag")),
      Some("""SELECT count(DISTINCT l_orderkey) AS l_orderkey,
             count(DISTINCT l_partkey) AS l_partkey,
             count(DISTINCT l_returnflag) AS l_returnflag FROM lineitem""")),

    // ---- stratified exact distinct counts ---------------------------------
    QueryDef("q_nunique_strat",
      (s, d) => Stats.nuniqueExact(lineitem(s, d),
          Seq("l_orderkey", "l_partkey"), strata = Seq("l_returnflag"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             count(DISTINCT l_orderkey) AS l_orderkey,
             count(DISTINCT l_partkey) AS l_partkey
             FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // ---- entropy / mutual information ------------------------------------
    QueryDef("q_entropy",
      (s, d) => Stats.entropy(lineitem(s, d), "l_returnflag")
        .select(round(col("l_returnflag_entropy"), 6).as("entropy")),
      Some("""SELECT round(sum(-log2(p) * p), 6) AS entropy FROM (
               SELECT count(*) / (SELECT count(*)::DOUBLE FROM lineitem
                 WHERE l_returnflag IS NOT NULL) AS p
               FROM lineitem WHERE l_returnflag IS NOT NULL
               GROUP BY l_returnflag)""")),

    // ---- per-stratum entropy (grouped path) -------------------------------
    QueryDef("q_entropy_strat",
      (s, d) => {
        val sf = StratifiedFrame(orders(s, d), Seq(ColStratum("o_orderstatus")))
        sf.entropy("o_orderpriority")
          .select(col("o_orderstatus"),
            round(col("o_orderpriority_entropy"), 6).as("entropy"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, round(sum(-log2(p) * p), 6) AS entropy
             FROM (SELECT o_orderstatus,
               count(*) / sum(count(*)) OVER (PARTITION BY o_orderstatus)::DOUBLE
                 AS p
               FROM orders WHERE o_orderpriority IS NOT NULL
               GROUP BY o_orderstatus, o_orderpriority)
             GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    QueryDef("q_mutual_info",
      (s, d) => Stats.mutualInfo(lineitem(s, d), "l_returnflag", "l_linestatus")
        .select(round(col("mutual_info"), 6).as("mutual_info")),
      Some("""WITH clean AS (
               SELECT l_returnflag, l_linestatus FROM lineitem
               WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL),
             joint AS (
               SELECT l_returnflag, l_linestatus, count(*)::DOUBLE AS cnt
               FROM clean GROUP BY l_returnflag, l_linestatus),
             m0 AS (SELECT l_returnflag, count(*)::DOUBLE AS c0 FROM clean
               GROUP BY l_returnflag),
             m1 AS (SELECT l_linestatus, count(*)::DOUBLE AS c1 FROM clean
               GROUP BY l_linestatus),
             n AS (SELECT count(*)::DOUBLE AS n FROM clean)
             SELECT round(sum(log2(cnt * n.n / (c0 * c1)) * cnt / n.n), 6)
               AS mutual_info
             FROM joint JOIN m0 USING (l_returnflag)
               JOIN m1 USING (l_linestatus), n""")),

    // ---- correlation matrix (Pearson) ------------------------------------
    QueryDef("q_corr",
      (s, d) => Stats.corrPearson(lineitem(s, d),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .select(
          round(col("l_quantity__l_extendedprice"), 6).as("qty_price"),
          round(col("l_quantity__l_discount"), 6).as("qty_disc"),
          round(col("l_extendedprice__l_discount"), 6).as("price_disc")),
      Some("""SELECT round(corr(l_quantity, l_extendedprice), 6) AS qty_price,
             round(corr(l_quantity, l_discount), 6) AS qty_disc,
             round(corr(l_extendedprice, l_discount), 6) AS price_disc
             FROM lineitem""")),

    // ---- higher central moments (population skew / excess kurtosis) ------
    // oracle recomputes the centered power means explicitly: DuckDB's
    // skewness()/kurtosis() are the BIAS-CORRECTED sample statistics, a
    // different estimator than the population m3/m2^1.5, m4/m2²−3 the
    // operator (and pandas' scipy default) exposes.
    QueryDef("q_moments",
      (s, d) => Stats.moments(lineitem(s, d), Seq("l_quantity", "l_discount"))
        .select(col("column"), col("n"),
          round(col("mean"), 6).as("mean"),
          round(col("variance"), 6).as("variance"),
          round(col("skewness"), 6).as("skewness"),
          round(col("kurtosis"), 6).as("kurtosis"))
        .orderBy("column"),
      Some("""WITH clean AS (SELECT l_quantity::DOUBLE AS q, l_discount::DOUBLE AS dis
               FROM lineitem WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL),
             m AS (SELECT count(*) AS n, avg(q) AS muq, avg(dis) AS mud FROM clean),
             p AS (SELECT any_value(n) AS n, any_value(muq) AS muq,
               any_value(mud) AS mud,
               avg(pow(q - muq, 2)) AS q2, avg(pow(q - muq, 3)) AS q3,
               avg(pow(q - muq, 4)) AS q4,
               avg(pow(dis - mud, 2)) AS d2, avg(pow(dis - mud, 3)) AS d3,
               avg(pow(dis - mud, 4)) AS d4
               FROM clean, m)
             SELECT * FROM (
               SELECT 'l_discount' AS "column", n, round(mud, 6) AS mean,
                 round(d2, 6) AS variance,
                 round(d3 / pow(d2, 1.5), 6) AS skewness,
                 round(d4 / (d2 * d2) - 3, 6) AS kurtosis FROM p
               UNION ALL
               SELECT 'l_quantity', n, round(muq, 6), round(q2, 6),
                 round(q3 / pow(q2, 1.5), 6), round(q4 / (q2 * q2) - 3, 6) FROM p)
             ORDER BY 1""")),

    // ---- covariance matrix (upper triangle, one agg pass) ----------------
    QueryDef("q_cov",
      (s, d) => Stats.covarianceMatrix(lineitem(s, d),
          Seq("l_quantity", "l_discount", "l_tax"))
        .select(col("col_a"), col("col_b"), round(col("cov"), 6).as("cov"))
        .orderBy("col_a", "col_b"),
      Some("""WITH clean AS (SELECT l_quantity AS q, l_discount AS dis, l_tax AS t
               FROM lineitem WHERE l_quantity IS NOT NULL
                 AND l_discount IS NOT NULL AND l_tax IS NOT NULL)
             SELECT * FROM (
               SELECT 'l_discount' AS col_a, 'l_discount' AS col_b,
                 round(covar_samp(dis, dis), 6) AS cov FROM clean
               UNION ALL SELECT 'l_discount', 'l_quantity',
                 round(covar_samp(dis, q), 6) FROM clean
               UNION ALL SELECT 'l_discount', 'l_tax',
                 round(covar_samp(dis, t), 6) FROM clean
               UNION ALL SELECT 'l_quantity', 'l_quantity',
                 round(covar_samp(q, q), 6) FROM clean
               UNION ALL SELECT 'l_quantity', 'l_tax',
                 round(covar_samp(q, t), 6) FROM clean
               UNION ALL SELECT 'l_tax', 'l_tax',
                 round(covar_samp(t, t), 6) FROM clean)
             ORDER BY col_a, col_b""")),

    // ---- Population Stability Index (drift between two slices) -----------
    // reference slice defines the equal-width binning; current values clamp
    // into the edge bins; eps-floored shares keep the log finite
    QueryDef("q_psi",
      (s, d) => {
        val li = lineitem(s, d)
        Stats.psi(li.filter(col("l_orderkey") % 2 === 0),
            li.filter(col("l_orderkey") % 2 === 1), "l_extendedprice",
            bins = 10)
          .select(round(col("psi"), 6).as("psi"))
      },
      Some("""WITH ref AS (SELECT l_extendedprice::DOUBLE AS x FROM lineitem
               WHERE l_orderkey % 2 = 0 AND l_extendedprice IS NOT NULL),
             cur AS (SELECT l_extendedprice::DOUBLE AS x FROM lineitem
               WHERE l_orderkey % 2 = 1 AND l_extendedprice IS NOT NULL),
             e AS (SELECT min(x) AS lo, max(x) AS hi FROM ref),
             rb AS (SELECT least(greatest(floor((x - e.lo) / ((e.hi - e.lo) / 10)),
                 0), 9)::BIGINT AS bin, count(*) AS n FROM ref, e GROUP BY 1),
             cb AS (SELECT least(greatest(floor((x - e.lo) / ((e.hi - e.lo) / 10)),
                 0), 9)::BIGINT AS bin, count(*) AS n FROM cur, e GROUP BY 1),
             j AS (SELECT coalesce(rb.bin, cb.bin) AS bin,
                 coalesce(rb.n, 0) AS n_ref, coalesce(cb.n, 0) AS n_cur
               FROM rb FULL OUTER JOIN cb ON rb.bin = cb.bin),
             t AS (SELECT sum(n_ref)::DOUBLE AS tr, sum(n_cur)::DOUBLE AS tc
               FROM j)
             SELECT round(sum((greatest(n_cur/tc, 1e-6) - greatest(n_ref/tr, 1e-6))
               * ln(greatest(n_cur/tc, 1e-6) / greatest(n_ref/tr, 1e-6))), 6)
               AS psi
             FROM j, t""")),

    // ---- PSI over reference-quantile bins (skew-robust variant) -----------
    // edges = the reference's exact quartiles (ExactPercentile ≡
    // quantile_cont), ROUNDED to 6 decimals on both engines so the
    // bin-membership decision is bit-identical; bin = #edges below x
    QueryDef("q_psi_quantile",
      (s, d) => {
        val li = lineitem(s, d)
        Stats.psiQuantile(li.filter(col("l_orderkey") % 2 === 0),
            li.filter(col("l_orderkey") % 2 === 1), "l_extendedprice",
            bins = 4)
          .select(round(col("psi"), 6).as("psi"))
      },
      Some("""WITH ref AS (SELECT l_extendedprice::DOUBLE AS x FROM lineitem
               WHERE l_orderkey % 2 = 0 AND l_extendedprice IS NOT NULL),
             cur AS (SELECT l_extendedprice::DOUBLE AS x FROM lineitem
               WHERE l_orderkey % 2 = 1 AND l_extendedprice IS NOT NULL),
             e AS (SELECT round(quantile_cont(x, 0.25), 6) AS e1,
               round(quantile_cont(x, 0.5), 6) AS e2,
               round(quantile_cont(x, 0.75), 6) AS e3 FROM ref),
             rb AS (SELECT (CASE WHEN x > e1 THEN 1 ELSE 0 END
                 + CASE WHEN x > e2 THEN 1 ELSE 0 END
                 + CASE WHEN x > e3 THEN 1 ELSE 0 END)::BIGINT AS bin,
               count(*) AS n FROM ref, e GROUP BY 1),
             cb AS (SELECT (CASE WHEN x > e1 THEN 1 ELSE 0 END
                 + CASE WHEN x > e2 THEN 1 ELSE 0 END
                 + CASE WHEN x > e3 THEN 1 ELSE 0 END)::BIGINT AS bin,
               count(*) AS n FROM cur, e GROUP BY 1),
             j AS (SELECT coalesce(rb.bin, cb.bin) AS bin,
                 coalesce(rb.n, 0) AS n_ref, coalesce(cb.n, 0) AS n_cur
               FROM rb FULL OUTER JOIN cb ON rb.bin = cb.bin),
             t AS (SELECT sum(n_ref)::DOUBLE AS tr, sum(n_cur)::DOUBLE AS tc
               FROM j)
             SELECT round(sum((greatest(n_cur/tc, 1e-6) - greatest(n_ref/tr, 1e-6))
               * ln(greatest(n_cur/tc, 1e-6) / greatest(n_ref/tr, 1e-6))), 6)
               AS psi
             FROM j, t""")),

    // ---- stratify: Bucket (equal-width) grouped path ---------------------
    QueryDef("q_stratify_bucket",
      (s, d) => {
        val sf = StratifiedFrame(lineitem(s, d), Seq(Bucket("l_extendedprice", 5)))
        sf.agg((df, sc) => df.groupBy(sc.map(col): _*)
          .agg(count(lit(1)).as("cnt"))
          .withColumnRenamed(sc.head, "bucket"))
          .orderBy("bucket")
      },
      Some("""WITH mm AS (SELECT min(l_extendedprice)::DOUBLE AS lo,
               max(l_extendedprice)::DOUBLE AS hi FROM lineitem)
             SELECT least(greatest(floor((l_extendedprice - lo) / ((hi - lo) / 5)),
               0), 4)::INT AS bucket, count(*) AS cnt
             FROM lineitem, mm GROUP BY 1 ORDER BY 1""")),

    // ---- stratify: Quantile buckets (exact edges for oracle parity) ------
    QueryDef("q_stratify_quantile",
      (s, d) => {
        val sf = StratifiedFrame(lineitem(s, d),
          Seq(Quantile("l_extendedprice", 4, exact = true)))
        sf.agg((df, sc) => df.groupBy(sc.map(col): _*)
          .agg(count(lit(1)).as("cnt"))
          .withColumnRenamed(sc.head, "bucket"))
          .orderBy("bucket")
      },
      Some("""WITH e AS (SELECT quantile_cont(l_extendedprice, 0.25) AS e1,
               quantile_cont(l_extendedprice, 0.50) AS e2,
               quantile_cont(l_extendedprice, 0.75) AS e3 FROM lineitem)
             SELECT least((l_extendedprice >= e1)::INT +
               (l_extendedprice >= e2)::INT + (l_extendedprice >= e3)::INT, 3)
               AS bucket, count(*) AS cnt
             FROM lineitem, e GROUP BY 1 ORDER BY 1""")),

    // ---- stratify: categorical × bucket combo ----------------------------
    QueryDef("q_stratify_combo",
      (s, d) => {
        val sf = StratifiedFrame(lineitem(s, d),
          Seq(ColStratum("l_returnflag"), Bucket("l_quantity", 3)))
        sf.agg((df, sc) => df.groupBy(sc.map(col): _*)
          .agg(round(sum("l_extendedprice"), 2).as("price_sum"))
          .withColumnRenamed(sc(1), "bucket"))
          .orderBy("l_returnflag", "bucket")
      },
      Some("""WITH mm AS (SELECT min(l_quantity)::DOUBLE AS lo,
               max(l_quantity)::DOUBLE AS hi FROM lineitem)
             SELECT l_returnflag,
               least(greatest(floor((l_quantity - lo) / ((hi - lo) / 3)), 0), 2)::INT
                 AS bucket,
               round(sum(l_extendedprice), 2) AS price_sum
             FROM lineitem, mm GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- fill: global mean imputation (nulls synthesized) ----------------
    QueryDef("q_fill_mean",
      (s, d) => {
        val withNulls = lineitem(s, d).withColumn("q",
          when(col("l_quantity") > 45, null).otherwise(col("l_quantity")))
        val filled = Clean.fill(withNulls.toHandy, Clean.Mean, Seq("q"))
        filled.df.agg(round(sum("q"), 2).as("filled_sum"),
          count(lit(1)).as("n"))
      },
      Some("""WITH t AS (SELECT CASE WHEN l_quantity > 45 THEN NULL
               ELSE l_quantity END AS q FROM lineitem),
             m AS (SELECT avg(q) AS mv FROM t)
             SELECT round(sum(coalesce(q, mv)), 2) AS filled_sum,
               count(*) AS n FROM t, m""")),

    // ---- fill: stratified median imputation ------------------------------
    QueryDef("q_fill_median_strat",
      (s, d) => {
        val withNulls = lineitem(s, d).withColumn("q",
          when(col("l_quantity") > 45, null).otherwise(col("l_quantity")))
        val filled = Clean.fill(withNulls.toHandy, Clean.Median, Seq("q"),
          Seq(ColStratum("l_returnflag")))
        filled.df.groupBy("l_returnflag")
          .agg(round(sum("q"), 2).as("filled_sum"))
          .orderBy("l_returnflag")
      },
      Some("""WITH t AS (SELECT l_returnflag, CASE WHEN l_quantity > 45 THEN NULL
               ELSE l_quantity END AS q FROM lineitem),
             m AS (SELECT l_returnflag, quantile_cont(q, 0.5) AS mv FROM t
               GROUP BY 1)
             SELECT t.l_returnflag, round(sum(coalesce(q, mv)), 2) AS filled_sum
             FROM t JOIN m USING (l_returnflag)
             GROUP BY t.l_returnflag ORDER BY t.l_returnflag""")),

    // ---- imputer transformer replay (learn → dict → CASE WHEN replay) ----
    QueryDef("q_imputer_replay",
      (s, d) => {
        val withNulls = lineitem(s, d).withColumn("q",
          when(col("l_quantity") > 45, null).otherwise(col("l_quantity")))
        // learn on one frame...
        val learned = Clean.fill(withNulls.toHandy, Clean.Mean, Seq("q"),
          Seq(ColStratum("l_returnflag")))
        // ...replay via the serializable transformer on a fresh frame
        val imputer = new HandyImputer().setFillDict(learned.state.statistics)
        imputer.transform(withNulls)
          .groupBy("l_returnflag")
          .agg(round(sum("q"), 2).as("filled_sum"))
          .orderBy("l_returnflag")
      },
      Some("""WITH t AS (SELECT l_returnflag, CASE WHEN l_quantity > 45 THEN NULL
               ELSE l_quantity END AS q FROM lineitem),
             m AS (SELECT l_returnflag, avg(q) AS mv FROM t GROUP BY 1)
             SELECT t.l_returnflag, round(sum(coalesce(q, mv)), 2) AS filled_sum
             FROM t JOIN m USING (l_returnflag)
             GROUP BY t.l_returnflag ORDER BY t.l_returnflag""")),

    // ---- fence: Tukey capping --------------------------------------------
    QueryDef("q_fence_cap",
      (s, d) => {
        val fenced = Clean.fence(lineitem(s, d).toHandy, Seq("l_extendedprice"))
        fenced.df.agg(
          round(sum("l_extendedprice"), 2).as("capped_sum"),
          round(min("l_extendedprice"), 4).as("capped_min"),
          round(max("l_extendedprice"), 4).as("capped_max"))
      },
      Some("""WITH f AS (SELECT quantile_cont(l_extendedprice, 0.25) AS q1,
               quantile_cont(l_extendedprice, 0.75) AS q3 FROM lineitem),
             c AS (SELECT least(greatest(l_extendedprice, q1 - 1.5 * (q3 - q1)),
               q3 + 1.5 * (q3 - q1)) AS v FROM lineitem, f)
             SELECT round(sum(v), 2) AS capped_sum,
               round(min(v), 4) AS capped_min,
               round(max(v), 4) AS capped_max FROM c""")),

    // ---- fencer transformer replay ---------------------------------------
    QueryDef("q_fencer_replay",
      (s, d) => {
        val learned = Clean.fence(lineitem(s, d).toHandy, Seq("l_extendedprice"))
        val fencer = new HandyFencer().setFenceDict(learned.state.fences)
        fencer.transform(lineitem(s, d))
          .agg(round(sum("l_extendedprice"), 2).as("capped_sum"),
            count(lit(1)).as("n"))
      },
      Some("""WITH f AS (SELECT quantile_cont(l_extendedprice, 0.25) AS q1,
               quantile_cont(l_extendedprice, 0.75) AS q3 FROM lineitem),
             c AS (SELECT least(greatest(l_extendedprice, q1 - 1.5 * (q3 - q1)),
               q3 + 1.5 * (q3 - q1)) AS v FROM lineitem, f)
             SELECT round(sum(v), 2) AS capped_sum, count(*) AS n FROM c""")),

    // ---- median/MAD robust fences (heavy-tail companion of Tukey) ---------
    // bounds = median ± k·1.4826·MAD; 50% breakdown where extreme mass
    // drags q1/q3 themselves. Two exact-percentile aggs (MAD needs the
    // median first); DuckDB replays both medians and the fence arithmetic
    QueryDef("q_mad_fences",
      (s, d) => graft.clean.Clean.calcMadFences(lineitem(s, d),
          Seq("l_extendedprice", "l_quantity"), k = 3.0)
        .select(col("col_name"), round(col("median"), 6).as("median"),
          round(col("mad"), 6).as("mad"),
          round(col("lfence"), 6).as("lfence"),
          round(col("ufence"), 6).as("ufence"))
        .orderBy("col_name"),
      Some("""WITH m AS (SELECT median(l_extendedprice::DOUBLE) AS m1,
               median(l_quantity::DOUBLE) AS m2 FROM lineitem),
             d AS (SELECT
               median(abs(l_extendedprice::DOUBLE - m1)) AS d1,
               median(abs(l_quantity::DOUBLE - m2)) AS d2
               FROM lineitem, m)
             SELECT 'l_extendedprice' AS col_name, round(m1, 6) AS median,
               round(d1, 6) AS mad,
               round(m1 - 3.0 * 1.4826 * d1, 6) AS lfence,
               round(m1 + 3.0 * 1.4826 * d1, 6) AS ufence FROM m, d
             UNION ALL
             SELECT 'l_quantity', round(m2, 6), round(d2, 6),
               round(m2 - 3.0 * 1.4826 * d2, 6),
               round(m2 + 3.0 * 1.4826 * d2, 6) FROM m, d
             ORDER BY col_name""")),

    QueryDef("q_mad_outliers",
      (s, d) => graft.clean.Clean.madOutlierCounts(lineitem(s, d),
          Seq("l_extendedprice", "l_quantity"), k = 3.0),
      Some("""WITH m AS (SELECT median(l_extendedprice::DOUBLE) AS m1,
               median(l_quantity::DOUBLE) AS m2 FROM lineitem),
             d AS (SELECT
               median(abs(l_extendedprice::DOUBLE - m1)) AS d1,
               median(abs(l_quantity::DOUBLE - m2)) AS d2
               FROM lineitem, m)
             SELECT
               sum((l_extendedprice < m1 - 3.0 * 1.4826 * d1 OR
                    l_extendedprice > m1 + 3.0 * 1.4826 * d1)::INT)::BIGINT
                 AS l_extendedprice,
               sum((l_quantity < m2 - 3.0 * 1.4826 * d2 OR
                    l_quantity > m2 + 3.0 * 1.4826 * d2)::INT)::BIGINT
                 AS l_quantity
             FROM lineitem, m, d""")),

    // ---- Tukey outlier counts, stratified --------------------------------
    QueryDef("q_outlier_counts",
      (s, d) => Clean.outlierCounts(lineitem(s, d),
          Seq("l_extendedprice", "l_quantity"), 1.5, Seq("l_returnflag"))
        .withColumnRenamed("l_extendedprice", "price_outliers")
        .withColumnRenamed("l_quantity", "qty_outliers")
        .orderBy("l_returnflag"),
      Some("""WITH f AS (SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.25) AS p_q1,
               quantile_cont(l_extendedprice, 0.75) AS p_q3,
               quantile_cont(l_quantity, 0.25) AS q_q1,
               quantile_cont(l_quantity, 0.75) AS q_q3
               FROM lineitem GROUP BY 1)
             SELECT l_returnflag,
               sum((l_extendedprice < p_q1 - 1.5 * (p_q3 - p_q1) OR
                    l_extendedprice > p_q3 + 1.5 * (p_q3 - p_q1))::INT)::BIGINT
                 AS price_outliers,
               sum((l_quantity < q_q1 - 1.5 * (q_q3 - q_q1) OR
                    l_quantity > q_q3 + 1.5 * (q_q3 - q_q1))::INT)::BIGINT
                 AS qty_outliers
             FROM lineitem JOIN f USING (l_returnflag)
             GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- boxplot stats ----------------------------------------------------
    QueryDef("q_bxp_stats",
      (s, d) => PlotData.bxpStats(lineitem(s, d), "l_extendedprice",
          strata = Seq("l_returnflag"))
        .select(col("l_returnflag"),
          round(col("q1"), 4).as("q1"), round(col("med"), 4).as("med"),
          round(col("q3"), 4).as("q3"), round(col("mean"), 4).as("mean"),
          col("n"), round(col("lo_whisker"), 4).as("lo_whisker"),
          round(col("hi_whisker"), 4).as("hi_whisker"), col("fliers"))
        .orderBy("l_returnflag"),
      Some("""WITH st AS (SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.25) AS q1,
               quantile_cont(l_extendedprice, 0.50) AS med,
               quantile_cont(l_extendedprice, 0.75) AS q3,
               avg(l_extendedprice) AS mean, count(*) AS n
               FROM lineitem GROUP BY 1),
             j AS (SELECT l.*, st.q1, st.med, st.q3, st.mean, st.n,
               st.q1 - 1.5 * (st.q3 - st.q1) AS lf,
               st.q3 + 1.5 * (st.q3 - st.q1) AS uf
               FROM lineitem l JOIN st USING (l_returnflag))
             SELECT l_returnflag, round(any_value(q1), 4) AS q1,
               round(any_value(med), 4) AS med, round(any_value(q3), 4) AS q3,
               round(any_value(mean), 4) AS mean, any_value(n) AS n,
               round(min(CASE WHEN l_extendedprice BETWEEN lf AND uf
                 THEN l_extendedprice END), 4) AS lo_whisker,
               round(max(CASE WHEN l_extendedprice BETWEEN lf AND uf
                 THEN l_extendedprice END), 4) AS hi_whisker,
               sum((l_extendedprice < lf OR l_extendedprice > uf)::INT)::BIGINT
                 AS fliers
             FROM j GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- histogram (dense bucket completion) ------------------------------
    QueryDef("q_histogram",
      (s, d) => PlotData.histogram(lineitem(s, d), "l_extendedprice", 10)
        .select(col("bucket"), col("cnt"),
          round(col("bin_lo"), 4).as("bin_lo"), round(col("bin_hi"), 4).as("bin_hi")),
      Some("""WITH mm AS (SELECT min(l_extendedprice)::DOUBLE AS lo,
               max(l_extendedprice)::DOUBLE AS hi FROM lineitem),
             c AS (SELECT least(greatest(floor((l_extendedprice - lo) /
               ((hi - lo) / 10)), 0), 9)::INT AS bucket, count(*) AS cnt
               FROM lineitem, mm GROUP BY 1),
             g AS (SELECT t.range::INT AS bucket, lo, hi
               FROM range(0, 10) t, mm)
             SELECT g.bucket, coalesce(cnt, 0) AS cnt,
               round(lo + g.bucket * ((hi - lo) / 10), 4) AS bin_lo,
               round(lo + (g.bucket + 1) * ((hi - lo) / 10), 4) AS bin_hi
             FROM g LEFT JOIN c USING (bucket) ORDER BY 1""")),

    // ---- categorical histogram: counts over category×strata completion ----
    QueryDef("q_hist_categorical",
      (s, d) => PlotData.histogramCategorical(orders(s, d), "o_orderpriority",
          strata = Seq("o_orderstatus"))
        .orderBy("o_orderstatus", "o_orderpriority"),
      Some("""WITH cats AS (SELECT DISTINCT o_orderpriority FROM orders
               WHERE o_orderpriority IS NOT NULL),
             combos AS (SELECT DISTINCT o_orderstatus FROM orders),
             c AS (SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
               FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1, 2)
             SELECT combos.o_orderstatus, cats.o_orderpriority,
               coalesce(cnt, 0) AS cnt
             FROM combos CROSS JOIN cats
             LEFT JOIN c USING (o_orderstatus, o_orderpriority)
             ORDER BY o_orderstatus, o_orderpriority""")),

    // ---- 2-D scatter binning ----------------------------------------------
    QueryDef("q_scatter_bins",
      (s, d) => PlotData.scatterBins(lineitem(s, d), "l_quantity", "l_discount", 10)
        .select(col("bx"), col("by"), col("cnt"),
          round(col("proportion"), 6).as("proportion")),
      Some("""WITH mm AS (SELECT min(l_quantity)::DOUBLE AS xlo,
               max(l_quantity)::DOUBLE AS xhi, min(l_discount)::DOUBLE AS ylo,
               max(l_discount)::DOUBLE AS yhi, count(*)::DOUBLE AS n FROM lineitem)
             SELECT
               least(greatest(floor((l_quantity - xlo) / ((xhi - xlo) / 10)), 0), 9)::INT AS bx,
               least(greatest(floor((l_discount - ylo) / ((yhi - ylo) / 10)), 0), 9)::INT AS by,
               count(*) AS cnt,
               round(count(*) / any_value(n), 6) AS proportion
             FROM lineitem, mm GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- top-k fliers (TakeOrderedAndProject) -----------------------------
    QueryDef("q_top_fliers",
      (s, d) => {
        val ev = events(s, d)
        val row = Clean.calcFences(ev, Seq("value")).head()
        PlotData.topFliers(ev, "value",
            row.getAs[Double]("value_lfence"),
            row.getAs[Double]("value_ufence"), 100)
          .select(col("event_id"), round(col("value"), 4).as("value"))
      },
      Some("""WITH f AS (SELECT quantile_cont(value, 0.25) AS q1,
               quantile_cont(value, 0.75) AS q3 FROM events)
             SELECT event_id, round(value, 4) AS value
             FROM events, f
             WHERE value < q1 - 1.5 * (q3 - q1)
                OR value > q3 + 1.5 * (q3 - q1)
             ORDER BY abs(value) DESC, value LIMIT 100""")),

    // ---- string function suite (native codegen'd Columns) -----------------
    QueryDef("q_string_suite",
      (s, d) => {
        import graft.funcs.implicits._
        val p = col("p_name")
        spark_part(s, d).select(
          col("p_partkey"),
          p.str.upper.as("up"),
          p.str.lower.as("lo"),
          p.str.len.as("len"),
          p.str.contains("a").cast("int").as("has_a"),
          p.str.startswith("b").cast("int").as("starts_b"),
          p.str.endswith("e").cast("int").as("ends_e"),
          p.str.find("ge").as("find_ge"),
          p.str.slice(0, 5).as("first5"),
          p.str.rjust(25).as("rj"),
          p.str.replace("[aeiou]", "").as("novowel"),
          p.str.count("a").as("n_a"),
          p.str.capitalize.as("cap"),
          p.str.strip.as("stripped"),
          reverse(p).as("rev"),
          p.str.translate("abc", "xyz").as("tr"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey,
             upper(p_name) AS up, lower(p_name) AS lo,
             length(p_name) AS len,
             contains(p_name, 'a')::INT AS has_a,
             starts_with(p_name, 'b')::INT AS starts_b,
             (p_name LIKE '%e')::INT AS ends_e,
             (strpos(p_name, 'ge') - 1) AS find_ge,
             substr(p_name, 1, 5) AS first5,
             lpad(p_name, 25, ' ') AS rj,
             regexp_replace(p_name, '[aeiou]', '', 'g') AS novowel,
             (length(p_name) - length(replace(p_name, 'a', ''))) AS n_a,
             upper(substr(p_name, 1, 1)) || lower(substr(p_name, 2)) AS cap,
             trim(p_name) AS stripped,
             reverse(p_name) AS rev,
             translate(p_name, 'abc', 'xyz') AS tr
             FROM part ORDER BY p_partkey""")),

    // ---- datetime function suite ------------------------------------------
    QueryDef("q_datetime_suite",
      (s, d) => {
        import graft.funcs.implicits._
        val t = col("o_orderdate")
        orders(s, d).select(
          col("o_orderkey"),
          t.dt.year.as("yr"),
          t.dt.month.as("mo"),
          t.dt.day.as("dy"),
          t.dt.dayofweek.as("dow"),   // pandas Monday=0
          t.dt.dayofyear.as("doy"),
          t.dt.week.as("iso_week"),
          t.dt.quarter.as("qtr"),
          t.dt.daysinmonth.as("dim"),
          t.dt.isLeapYear.cast("int").as("leap"),
          t.dt.isMonthStart.cast("int").as("m_start"),
          t.dt.isMonthEnd.cast("int").as("m_end"),
          t.dt.isQuarterStart.cast("int").as("q_start"),
          t.dt.isYearStart.cast("int").as("y_start"),
          t.dt.strftime("%Y-%m").as("ym"),
          t.dt.weekdayName.as("dow_name"),
          t.dt.normalize.as("day_floor"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             year(o_orderdate) AS yr, month(o_orderdate) AS mo,
             day(o_orderdate) AS dy,
             (isodow(o_orderdate) - 1) AS dow,
             dayofyear(o_orderdate) AS doy,
             weekofyear(o_orderdate) AS iso_week,
             quarter(o_orderdate) AS qtr,
             day(last_day(o_orderdate)) AS dim,
             ((year(o_orderdate) % 4 = 0 AND year(o_orderdate) % 100 != 0)
               OR year(o_orderdate) % 400 = 0)::INT AS leap,
             (day(o_orderdate) = 1)::INT AS m_start,
             (o_orderdate::DATE = last_day(o_orderdate))::INT AS m_end,
             (day(o_orderdate) = 1 AND (month(o_orderdate) - 1) % 3 = 0)::INT
               AS q_start,
             (dayofyear(o_orderdate) = 1)::INT AS y_start,
             strftime(o_orderdate, '%Y-%m') AS ym,
             dayname(o_orderdate) AS dow_name,
             date_trunc('day', o_orderdate) AS day_floor
             FROM orders ORDER BY o_orderkey""")),

    // ---- series boolean-mask / transform suite ----------------------------
    QueryDef("q_series_suite",
      (s, d) => {
        import graft.funcs.implicits._
        val li = lineitem(s, d)
        li.agg(
          sum(col("l_quantity").series.between(5, 25).cast("long")).as("n_between"),
          sum(col("l_returnflag").series.isin(Seq("A", "R")).cast("long")).as("n_isin"),
          round(sum(col("l_extendedprice").series.clip(1000, 50000)), 2).as("clip_sum"),
          round(sum(col("l_discount").series.roundTo(1)), 1).as("round_sum"),
          round(sum(col("l_quantity").series.absOf), 2).as("abs_sum"))
      },
      Some("""SELECT
             sum((l_quantity BETWEEN 5 AND 25)::INT)::BIGINT AS n_between,
             sum((l_returnflag IN ('A', 'R'))::INT)::BIGINT AS n_isin,
             round(sum(least(greatest(l_extendedprice, 1000), 50000)), 2)
               AS clip_sum,
             round(sum(round(l_discount, 1)), 1) AS round_sum,
             round(sum(abs(l_quantity)), 2) AS abs_sum
             FROM lineitem""")),

    // ---- assign: multi-column computed append -----------------------------
    QueryDef("q_assign",
      (s, d) => {
        val hf = lineitem(s, d).toHandy.assign(
          "revenue" -> (col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
          "charge" -> (col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax"))))
        hf.df.groupBy("l_returnflag")
          .agg(round(sum("revenue"), 2).as("revenue"),
            round(sum("charge"), 2).as("charge"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2)
               AS charge
             FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- Mahalanobis distance (2-col case has a closed-form oracle) -------
    QueryDef("q_mahalanobis",
      (s, d) => {
        val li = lineitem(s, d)
        val model = graft.outlier.Mahalanobis.fit(li,
          Seq("l_quantity", "l_extendedprice"))
        li.select(col("l_orderkey"), col("l_linenumber"),
          round(model.distance, 6).as("mahalanobis"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""WITH m AS (SELECT avg(l_quantity) AS mq, stddev_samp(l_quantity) AS sq,
               avg(l_extendedprice) AS mp, stddev_samp(l_extendedprice) AS sp,
               corr(l_quantity, l_extendedprice) AS r FROM lineitem)
             SELECT l_orderkey, l_linenumber,
               round(sqrt((u * u - 2 * r * u * v + v * v) / (1 - r * r)), 6)
                 AS mahalanobis
             FROM (SELECT l_orderkey, l_linenumber, r,
               (l_quantity - mq) / sq AS u,
               (l_extendedprice - mp) / sp AS v
               FROM lineitem, m)
             ORDER BY l_orderkey, l_linenumber""")),

    QueryDef("q_mahalanobis_outliers",
      (s, d) => {
        val ev = events(s, d)
          .withColumn("v2", col("value") * col("value") + col("user_id") % 7)
        val flagged = graft.outlier.Mahalanobis.addDistance(ev,
          Seq("value", "v2"), 0.999)
        flagged.agg(sum(col("__outlier").cast("long")).as("n_outliers"),
          count(lit(1)).as("n"))
      },
      Some("""WITH t AS (SELECT value, value * value + user_id % 7 AS v2
               FROM events),
             m AS (SELECT avg(value) AS m1, stddev_samp(value) AS s1,
               avg(v2) AS m2, stddev_samp(v2) AS s2, corr(value, v2) AS r
               FROM t)
             SELECT sum((sqrt((u * u - 2 * r * u * v + v * v) / (1 - r * r)) >
               sqrt(-2 * ln(1 - 0.999)))::INT)::BIGINT AS n_outliers,
               count(*) AS n
             FROM (SELECT (value - m1) / s1 AS u, (v2 - m2) / s2 AS v, r
               FROM t, m)""")),

    // ---- Welch t statistic matrix (SQL-expressible part of t-test) --------
    QueryDef("q_welch",
      (s, d) => graft.stat.StatTests.welchStats(lineitem(s, d),
          "l_extendedprice", Seq("l_returnflag"))
        .select(col("a_l_returnflag").as("g1"), col("b_l_returnflag").as("g2"),
          round(col("t_stat"), 6).as("t_stat"),
          round(col("welch_df"), 4).as("welch_df"))
        .orderBy("g1", "g2"),
      Some("""WITH g AS (SELECT l_returnflag, avg(l_extendedprice) AS m,
               var_samp(l_extendedprice) AS v, count(*)::DOUBLE AS n
               FROM lineitem GROUP BY 1)
             SELECT a.l_returnflag AS g1, b.l_returnflag AS g2,
               round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 6) AS t_stat,
               round(pow(a.v / a.n + b.v / b.n, 2) /
                 (pow(a.v / a.n, 2) / (a.n - 1) + pow(b.v / b.n, 2) / (b.n - 1)), 4)
                 AS welch_df
             FROM g a, g b WHERE a.l_returnflag < b.l_returnflag
             ORDER BY g1, g2""")),

    // ---- binary classification: confusion matrix + curves -----------------
    QueryDef("q_confusion",
      (s, d) => {
        val li = lineitem(s, d)
          .withColumn("label", (col("l_returnflag") === "R").cast("double"))
        graft.eval.BinaryMetrics.confusionMatrix(li, "l_discount", "label", 0.05)
      },
      Some("""SELECT
             sum((l_discount < 0.05 AND l_returnflag != 'R')::INT)::BIGINT AS tn,
             sum((l_discount >= 0.05 AND l_returnflag != 'R')::INT)::BIGINT AS fp,
             sum((l_discount < 0.05 AND l_returnflag = 'R')::INT)::BIGINT AS fn,
             sum((l_discount >= 0.05 AND l_returnflag = 'R')::INT)::BIGINT AS tp
             FROM lineitem""")),

    QueryDef("q_metrics_by_threshold",
      (s, d) => {
        val li = lineitem(s, d)
          .withColumn("label", (col("l_returnflag") === "R").cast("double"))
        graft.eval.BinaryMetrics.metricsByThreshold(li, "l_discount", "label")
          .select(round(col("threshold"), 4).as("threshold"),
            round(col("fpr"), 6).as("fpr"),
            round(col("recall"), 6).as("recall"),
            round(col("precision"), 6).as("precision"))
      },
      Some("""WITH sl AS (SELECT l_discount AS score,
               (l_returnflag = 'R')::INT AS label FROM lineitem),
             per AS (SELECT score, sum(label)::DOUBLE AS pos,
               (count(*) - sum(label))::DOUBLE AS neg FROM sl GROUP BY score),
             c AS (SELECT score,
               sum(pos) OVER (ORDER BY score DESC
                 ROWS UNBOUNDED PRECEDING) AS tp,
               sum(neg) OVER (ORDER BY score DESC
                 ROWS UNBOUNDED PRECEDING) AS fp,
               sum(pos) OVER () AS p, sum(neg) OVER () AS n FROM per)
             SELECT round(score, 4) AS threshold, round(fp / n, 6) AS fpr,
               round(tp / p, 6) AS recall,
               round(tp / (tp + fp), 6) AS precision FROM c
             UNION ALL SELECT 0.0, 1.0, 1.0, 0.0""")),

    // ---- per-curve threshold accessors (fMeasure exercises beta) ----------
    QueryDef("q_fmeasure_by_threshold",
      (s, d) => {
        val li = lineitem(s, d)
          .withColumn("label", (col("l_returnflag") === "R").cast("double"))
        graft.eval.BinaryMetrics.fMeasureByThreshold(li, "l_discount", "label",
            beta = 2.0)
          .select(round(col("threshold"), 4).as("threshold"),
            round(col("f_measure"), 6).as("f_measure"))
      },
      Some("""WITH sl AS (SELECT l_discount AS score,
               (l_returnflag = 'R')::INT AS label FROM lineitem),
             per AS (SELECT score, sum(label)::DOUBLE AS pos,
               (count(*) - sum(label))::DOUBLE AS neg FROM sl GROUP BY score),
             c AS (SELECT score,
               sum(pos) OVER (ORDER BY score DESC
                 ROWS UNBOUNDED PRECEDING) AS tp,
               sum(neg) OVER (ORDER BY score DESC
                 ROWS UNBOUNDED PRECEDING) AS fp,
               sum(pos) OVER () AS p FROM per),
             prc AS (SELECT score, tp / (tp + fp) AS prec, tp / p AS rec
               FROM c)
             SELECT round(score, 4) AS threshold,
               round(CASE WHEN prec + rec = 0 THEN 0.0
                 ELSE 5.0 * prec * rec / (4.0 * prec + rec) END, 6)
                 AS f_measure FROM prc""")),

    // ---- ROC / PR curve points --------------------------------------------
    QueryDef("q_roc",
      (s, d) => {
        val li = lineitem(s, d)
          .withColumn("label", (col("l_returnflag") === "R").cast("double"))
        graft.eval.BinaryMetrics.roc(li, "l_discount", "label")
          .select(round(col("fpr"), 6).as("fpr"), round(col("tpr"), 6).as("tpr"))
          .orderBy("fpr", "tpr")
      },
      Some("""WITH sl AS (SELECT l_discount AS score,
               (l_returnflag = 'R')::INT AS label FROM lineitem),
             per AS (SELECT score, sum(label)::DOUBLE AS pos,
               (count(*) - sum(label))::DOUBLE AS neg FROM sl GROUP BY score),
             c AS (SELECT
               sum(pos) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING) AS tp,
               sum(neg) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING) AS fp,
               sum(pos) OVER () AS p, sum(neg) OVER () AS n FROM per)
             SELECT fpr, tpr FROM (
               SELECT round(fp / n, 6) AS fpr, round(tp / p, 6) AS tpr FROM c
               UNION ALL SELECT 0.0, 0.0 UNION ALL SELECT 1.0, 1.0)
             ORDER BY fpr, tpr""")),

    QueryDef("q_pr",
      (s, d) => {
        val li = lineitem(s, d)
          .withColumn("label", (col("l_returnflag") === "R").cast("double"))
        graft.eval.BinaryMetrics.pr(li, "l_discount", "label")
          .select(round(col("recall"), 6).as("recall"),
            round(col("precision"), 6).as("precision"))
          .orderBy("recall", "precision")
      },
      Some("""WITH sl AS (SELECT l_discount AS score,
               (l_returnflag = 'R')::INT AS label FROM lineitem),
             per AS (SELECT score, sum(label)::DOUBLE AS pos,
               (count(*) - sum(label))::DOUBLE AS neg FROM sl GROUP BY score),
             c AS (SELECT
               sum(pos) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING) AS tp,
               sum(neg) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING) AS fp,
               sum(pos) OVER () AS p FROM per)
             SELECT round(tp / p, 6) AS recall,
               round(tp / (tp + fp), 6) AS precision
             FROM c ORDER BY recall, precision""")),

    // DataFrame-native trapezoid AUC (ROC + PR), oracle'd against the same
    // trapezoid built from DuckDB lag windows over the per-score curve
    QueryDef("q_auc",
      (s, d) => {
        val li = lineitem(s, d)
          .withColumn("label", (col("l_returnflag") === "R").cast("double"))
        graft.eval.BinaryMetrics.auc(li, "l_discount", "label")
          .select(round(col("auc_roc"), 6).as("auc_roc"),
            round(col("auc_pr"), 6).as("auc_pr"))
      },
      Some("""WITH sl AS (SELECT l_discount AS score,
               (l_returnflag = 'R')::INT AS label FROM lineitem),
             per AS (SELECT score, sum(label)::DOUBLE AS pos,
               (count(*) - sum(label))::DOUBLE AS neg FROM sl GROUP BY score),
             c AS (SELECT score,
               sum(pos) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING) AS tp,
               sum(neg) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING) AS fp,
               sum(pos) OVER () AS p, sum(neg) OVER () AS n FROM per),
             seg AS (SELECT tp, fp, p, n,
               coalesce(lag(tp) OVER (ORDER BY score DESC), 0) AS tp0,
               coalesce(lag(fp) OVER (ORDER BY score DESC), 0) AS fp0 FROM c)
             SELECT
               round(sum((fp - fp0) * (tp + tp0) / 2) / (max(p) * max(n)), 6)
                 AS auc_roc,
               round(sum((tp - tp0) / p * (tp / (tp + fp) +
                 CASE WHEN tp0 + fp0 = 0 THEN tp / (tp + fp)
                      ELSE tp0 / (tp0 + fp0) END) / 2), 6) AS auc_pr
             FROM seg""")),

    // ---- vector/array disassemble -----------------------------------------
    QueryDef("q_disassemble",
      (s, d) => {
        val emb = graft.util.VectorOps.disassemble(embeddings(s, d), "embedding")
        emb.groupBy("label").agg(
          round(avg(col("embedding_0").cast("double")), 6).as("e0_mean"),
          round(avg(col("embedding_1").cast("double")), 6).as("e1_mean"),
          round(avg(col("embedding_2").cast("double")), 6).as("e2_mean"),
          count(lit(1)).as("n"))
          .orderBy("label")
      },
      Some("""SELECT label,
             round(avg(embedding[1]::DOUBLE), 6) AS e0_mean,
             round(avg(embedding[2]::DOUBLE), 6) AS e1_mean,
             round(avg(embedding[3]::DOUBLE), 6) AS e2_mean,
             count(*) AS n
             FROM embeddings GROUP BY label ORDER BY label""")),

    // ======================================================================
    // Extension tier: training-data pipeline operators
    // ======================================================================,
  )
}
