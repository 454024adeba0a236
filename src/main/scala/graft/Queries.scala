package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.agg.Stats
import graft.clean.Clean
import graft.core.HandyFrame
import graft.ml.{HandyFencer, HandyImputer}
import graft.plotdata.PlotData
import graft.strata.{Bucket, ColStratum, Quantile, StratifiedFrame}

/** Driver-facing query registry. Each entry pairs a Spark implementation
  * (built on the graft library) with an equivalent DuckDB SQL oracle.
  *
  * Determinism rules (the driver hash-compares values):
  *  - every multi-row result is ORDER BY'd on its key columns in BOTH sides;
  *  - every floating-point aggregate is rounded the same way on both sides
  *    (sums of doubles are order-dependent in the last ulps);
  *  - DuckDB `sum(int)` yields HUGEINT — always cast to BIGINT/DOUBLE to
  *    match Spark's types.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Gate-only rows carry an exact-verification HARNESS (e.g. a guarded
      * all-pairs baseline) alongside the operator: they run in Verify —
      * hash-checked — but are excluded from Bench, whose numbers should
      * measure operator cost, not the harness. Each gate-only row has a
      * cheap operator-cost twin that IS benched. */
    gateOnly: Boolean = false)

object Queries {

  private def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
  private def orders(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")
  private def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  private def spark_part(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/part.parquet")
  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
  /** events.parquet's `ts` encoding varies with how the driver wrote the
    * file: TIMESTAMP(NANOS) arrives (with
    * spark.sql.legacy.parquet.nanosAsLong=true) as an epoch-nanos long,
    * TIMESTAMP(MICROS) without a timezone annotation as TIMESTAMP_NTZ,
    * and annotated micros as a session-tz TIMESTAMP. Normalize all three
    * to TimestampType: the session timezone is pinned to UTC
    * (Verify/Bench/Explain), so the NTZ wall-clock cast is epoch-exact
    * against DuckDB's naive-timestamp epoch_us. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Rank-wise dominance contract for ANN result sets whose ids are
    * model-dependent (PQ/IVF-PQ codebooks — SQL can't derive them): the
    * returned ids are re-scored with the EXACT cosine in-query and
    * compared rank-for-rank against the brute-force top-k. The i-th best
    * exact cosine of any k-subset of the corpus is at most the i-th
    * brute cosine, so `pq_exact_le_brute` must hold on every rank; ids
    * outside the corpus would be dropped by the re-score join and
    * surface as `pq_returned_ok` = false. brute_cos is the per-rank
    * value DuckDB replays independently. */
  private def pqContract(s: SparkSession, corpus: DataFrame,
                         pqIds: DataFrame, qvec: Array[Double],
                         k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("cos"), col("vec_id")) // k rows — bounded window
    val brute = graft.pipeline.Similarity.bruteForceTopK(corpus,
        "vec_id", "embedding", qvec, k)
      .withColumn("rn", row_number().over(w))
      .select(col("rn"), col("cos").as("__bcos"))
    val nReturned = pqIds.count()
    val pqExact = graft.pipeline.Similarity.bruteForceTopK(
        corpus.join(pqIds, "vec_id"), "vec_id", "embedding", qvec, k)
      .withColumn("rn", row_number().over(w))
      .select(col("rn"), col("cos").as("__pcos"))
    brute.join(pqExact, Seq("rn"), "left")
      .select(col("rn"),
        round(col("__bcos"), 6).as("brute_cos"),
        (col("__pcos").isNull || col("__pcos") <= col("__bcos") + lit(1e-9))
          .as("pq_exact_le_brute"),
        lit(nReturned <= k).as("pq_returned_ok"))
      .orderBy("rn")
  }

  /** DuckDB replay of [[pqContract]]: the brute top-k per rank + the
    * flags the Spark side must have proven true. */
  private val pqContractOracle: String =
    """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
        WHERE vec_id = 0),
      s AS (SELECT vec_id,
        list_cosine_similarity(embedding::DOUBLE[], qv) AS cos
        FROM embeddings, q WHERE vec_id != 0),
      b AS (SELECT cos, row_number() OVER (ORDER BY cos DESC, vec_id)
        AS rn FROM s)
      SELECT rn, round(cos, 6) AS brute_cos, true AS pq_exact_le_brute,
        true AS pq_returned_ok
      FROM b WHERE rn <= 10 ORDER BY rn"""

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
    // ======================================================================

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
        val path = java.nio.file.Files
          .createTempDirectory("graft-q-vecindex").toString
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
        val path = java.nio.file.Files
          .createTempDirectory("graft-q-textindex").toString
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
        graft.pipeline.Dedup.simhashPairsFromSig(sigs,
            maxHamming = 8, chunks = 9)
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
             WHERE bit_count(xor(a.sig, b.sig)) <= 8
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
    // cosine alone, no all-pairs harness
    QueryDef("q_semdedup_op",
      (s, d) => graft.pipeline.Clustering.semDedup(
          embeddings(s, d), "vec_id", "embedding", k = 8,
          threshold = 0.45, iters = 2, probes = 2)
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
        .orderBy("id_a", "id_b"),
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
        val pngOf = udf((id: Long) =>
          graft.pipeline.Multimodal.syntheticPng(id % 50))
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
        val path = java.nio.file.Files
          .createTempDirectory("graft-q-substridx").toString
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
        val path = java.nio.file.Files
          .createTempDirectory("graft-q-histsketch").toString
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
        val path = java.nio.file.Files
          .createTempDirectory("graft-q-hllsketch").toString
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
        val path = java.nio.file.Files
          .createTempDirectory("graft-q-pqpersist").toString
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

    // ---- events: windowed aggregation (batch mirror of streaming path) ----
    QueryDef("q_events_windowed",
      (s, d) => events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("value_sum"))
        .orderBy("hour", "event_type"),
      Some("""SELECT date_trunc('hour', ts)::TIMESTAMP AS hour, event_type,
             count(*) AS n, round(sum(value), 2) AS value_sum
             FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- rolling trailing-hour window per user ----------------------------
    // keyed RANGE window: every event scored against its own trailing
    // interval; ties (same second) share one frame so the result is
    // order-deterministic — no global window anywhere
    QueryDef("q_events_rolling",
      (s, d) => graft.events.Rolling.rollingAgg(events(s, d),
          Seq("user_id"), "ts", "value", windowSec = 3600L)
        .select(col("event_id"), col("n_win"),
          round(col("sum_win"), 2).as("sum_win"))
        .orderBy("event_id"),
      Some("""SELECT event_id, count(*) OVER w AS n_win,
             round(sum(value) OVER w, 2) AS sum_win
             FROM (SELECT event_id, user_id, value,
               CAST(floor(epoch(ts)) AS BIGINT) AS tss FROM events)
             WINDOW w AS (PARTITION BY user_id ORDER BY tss
               RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
             ORDER BY event_id""")),

    // ---- EWMA (per-user exponential smoothing) -----------------------------
    // the engine runs the e_i = a*x_i + (1-a)*e_{i-1} recursion in one
    // sorted-group streaming pass; the oracle replays the SAME recursion
    // via a recursive CTE with the same op order (a*x + (1.0-a)*e), so
    // the doubles are BIT-IDENTICAL and compared UNROUNDED. (A closed-
    // form pow expansion drifted ~1e-12 past a round(6) boundary; and
    // round() itself is unusable here — DuckDB's scales by 1e6 before
    // rounding, flipping values that sit ~1e-9 below a boundary.)
    QueryDef("q_ewma",
      (s, d) => graft.events.Rolling.ewma(events(s, d),
          Seq("user_id"), "ts", "event_id", "value", alpha = 0.3)
        .select(col("user_id"), col("event_id"), col("ewma"))
        .orderBy("user_id", "event_id"),
      Some("""WITH RECURSIVE r AS (SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts::TIMESTAMP), event_id) AS rn
               FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
                 AND event_id IS NOT NULL AND value IS NOT NULL),
             rec AS (
               SELECT user_id, event_id, rn, value::DOUBLE AS e
               FROM r WHERE rn = 1
               UNION ALL
               SELECT r.user_id, r.event_id, r.rn,
                 0.3 * r.value + (1.0 - 0.3) * rec.e
               FROM r JOIN rec ON r.user_id = rec.user_id
                 AND r.rn = rec.rn + 1)
             SELECT user_id, event_id, e AS ewma FROM rec
             ORDER BY 1, 2""")),

    // ---- trailing-baseline anomaly flags -----------------------------------
    // z against the same user's strictly-earlier trailing hour (the
    // current second excluded so a burst can't mask itself); identical
    // RANGE window replayed in DuckDB
    QueryDef("q_rolling_zscore",
      (s, d) => graft.events.Rolling.rollingZscore(events(s, d),
          Seq("user_id"), "ts", "value", windowSec = 3600L, threshold = 2.0)
        .select(col("event_id"), round(col("z"), 6).as("z"),
          col("is_anomaly"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
             round(CASE WHEN count(value) OVER w >= 2
                 AND stddev_samp(value) OVER w > 0
               THEN (value - avg(value) OVER w) / stddev_samp(value) OVER w
               END, 6) AS z,
             coalesce(CASE WHEN count(value) OVER w >= 2
                 AND stddev_samp(value) OVER w > 0
               THEN abs((value - avg(value) OVER w) /
                 stddev_samp(value) OVER w) > 2.0 END, false) AS is_anomaly
             FROM (SELECT event_id, user_id, value,
               CAST(floor(epoch(ts)) AS BIGINT) AS tss FROM events)
             WINDOW w AS (PARTITION BY user_id ORDER BY tss
               RANGE BETWEEN 3599 PRECEDING AND 1 PRECEDING)
             ORDER BY event_id""")),

    // ---- RFM segmentation ---------------------------------------------------
    // quantile-threshold scoring over the user frame; monetary rounds
    // to 6 BEFORE bucketing so threshold comparisons are ulp-stable;
    // recency/frequency are exact ints, thresholds replay via
    // quantile_cont — the whole row compares unrounded
    QueryDef("q_rfm",
      (s, d) => graft.events.Retention.rfm(events(s, d),
          "user_id", "ts", "value", nBins = 5)
        .orderBy("user_id"),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, value
               FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
                 AND value IS NOT NULL),
             ref AS (SELECT max(tsu) AS r FROM e),
             u AS (SELECT user_id,
               (ref.r - max(tsu)) // 3600000000 AS recency_h,
               count(*)::BIGINT AS frequency,
               round(sum(value), 6) AS monetary
               FROM e, ref GROUP BY user_id, ref.r),
             q AS (SELECT
               [quantile_cont(recency_h::DOUBLE, 0.2),
                quantile_cont(recency_h::DOUBLE, 0.4),
                quantile_cont(recency_h::DOUBLE, 0.6),
                quantile_cont(recency_h::DOUBLE, 0.8)] AS qr,
               [quantile_cont(frequency::DOUBLE, 0.2),
                quantile_cont(frequency::DOUBLE, 0.4),
                quantile_cont(frequency::DOUBLE, 0.6),
                quantile_cont(frequency::DOUBLE, 0.8)] AS qf,
               [quantile_cont(monetary, 0.2),
                quantile_cont(monetary, 0.4),
                quantile_cont(monetary, 0.6),
                quantile_cont(monetary, 0.8)] AS qm
               FROM u),
             sc AS (SELECT user_id, recency_h, frequency, monetary,
               6 - (1 + (recency_h::DOUBLE > qr[1])::INT
                 + (recency_h::DOUBLE > qr[2])::INT
                 + (recency_h::DOUBLE > qr[3])::INT
                 + (recency_h::DOUBLE > qr[4])::INT) AS r_score,
               1 + (frequency::DOUBLE > qf[1])::INT
                 + (frequency::DOUBLE > qf[2])::INT
                 + (frequency::DOUBLE > qf[3])::INT
                 + (frequency::DOUBLE > qf[4])::INT AS f_score,
               1 + (monetary > qm[1])::INT + (monetary > qm[2])::INT
                 + (monetary > qm[3])::INT + (monetary > qm[4])::INT
                 AS m_score
               FROM u, q)
             SELECT user_id, recency_h, frequency, monetary,
               r_score::INT AS r_score, f_score::INT AS f_score,
               m_score::INT AS m_score,
               r_score::VARCHAR || f_score::VARCHAR || m_score::VARCHAR
                 AS segment
             FROM sc ORDER BY user_id""")),

    // ---- persisted incremental aggregation state ---------------------------
    // the state is built INCREMENTALLY (write even half, append odd
    // half, merge from the files) and must equal the oracle's one-shot
    // aggregate over everything — the mergeable-moments contract.
    // sum/mean/variance carry reduce-order ulps -> round(6)
    QueryDef("q_agg_index",
      (s, d) => {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_aggidx").toString
        val ev = events(s, d)
        graft.pipeline.AggIndex.write(
          ev.filter(col("event_id") % 2 === 0),
          Seq("event_type"), "value", tmp)
        graft.pipeline.AggIndex.append(
          ev.filter(col("event_id") % 2 === 1),
          Seq("event_type"), "value", tmp)
        graft.pipeline.AggIndex.compact(s, tmp)
        graft.pipeline.AggIndex.stats(s, tmp)
          .select(col("event_type"), col("n"),
            round(col("sum"), 6).as("sum"), col("min"), col("max"),
            round(col("mean"), 6).as("mean"),
            round(col("variance"), 6).as("variance"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*)::BIGINT AS n,
               round(sum(value), 6) AS sum,
               min(value) AS min, max(value) AS max,
               round(sum(value) / count(*), 6) AS mean,
               round(sum(value * value) / count(*) -
                 (sum(value) / count(*)) * (sum(value) / count(*)), 6)
                 AS variance
             FROM events
             WHERE event_type IS NOT NULL AND value IS NOT NULL
             GROUP BY 1 ORDER BY 1""")),

    // ---- robust trailing-baseline anomaly flags ----------------------------
    // median/IQR baseline over the strictly-earlier trailing hour;
    // exact window percentiles (quantile_cont interpolation) on both
    // sides, round(6) for the interpolation/division ulps
    QueryDef("q_rolling_robust",
      (s, d) => graft.events.Rolling.rollingRobustZscore(events(s, d),
          Seq("user_id"), "ts", "value", windowSec = 3600L,
          threshold = 2.5)
        .select(col("event_id"),
          round(col("baseline_median"), 6).as("baseline_median"),
          round(col("baseline_iqr"), 6).as("baseline_iqr"),
          round(col("robust_z"), 6).as("robust_z"), col("is_anomaly"))
        .orderBy("event_id"),
      Some("""SELECT event_id, round(med, 6) AS baseline_median,
               round(q3 - q1, 6) AS baseline_iqr,
               round(CASE WHEN cnt >= 4 AND (q3 - q1) > 0 THEN
                 (value - med) / (0.7413 * (q3 - q1)) END, 6) AS robust_z,
               coalesce(CASE WHEN cnt >= 4 AND (q3 - q1) > 0 THEN
                 abs((value - med) / (0.7413 * (q3 - q1))) > 2.5 END,
                 false) AS is_anomaly
             FROM (SELECT event_id, value,
               quantile_cont(value, 0.5) OVER w AS med,
               quantile_cont(value, 0.25) OVER w AS q1,
               quantile_cont(value, 0.75) OVER w AS q3,
               count(value) OVER w AS cnt
               FROM (SELECT event_id, user_id, value,
                 CAST(floor(epoch(ts)) AS BIGINT) AS tss FROM events)
               WINDOW w AS (PARTITION BY user_id ORDER BY tss
                 RANGE BETWEEN 3599 PRECEDING AND 1 PRECEDING))
             ORDER BY event_id""")),

    // ---- sketch-tier robust baseline: bounded-state scale path -------------
    // rollingRobustZscoreSketch replaces the exact window percentile's
    // per-row frame buffer with a CountHist window sketch (bins+2 longs of
    // state). The sketch quantile is deterministic but not cheaply SQL-
    // replayable per frame, so the gate contract proves its per-quantile
    // bound IN-QUERY against the exact order-statistic bracket
    // [x_(floor(r)+1), x_(floor(r)+2)] of every frame (collect_list
    // harness — verification cost, not the operator): the sketch median
    // must sit within bracket +/- 2*cellWidth, the IQR within the two
    // quartile brackets +/- 4*cellWidth, and no baseline mass may fall
    // outside [lo, hi]. DuckDB replays the frame counts + proven flags.
    QueryDef("q_rolling_robust_sketch",
      (s, d) => {
        val lo = 0.0; val hi = 1000.0; val bins = 1000
        val width = (hi - lo) / bins
        val sk = graft.events.Rolling.rollingRobustZscoreSketch(
          events(s, d), Seq("user_id"), "ts", "value",
          windowSec = 3600L, lo, hi, bins, threshold = 2.5)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("__tss")).rangeBetween(-3599, -1)
        val withArr = sk.withColumn("__tss", col("ts").cast("long"))
          .withColumn("__arr", sort_array(
            collect_list(col("value").cast("double")).over(w)))
          .withColumn("__n", size(col("__arr")))
        def bracket(p: Double): (org.apache.spark.sql.Column,
            org.apache.spark.sql.Column) = {
          val i = floor((col("__n") - 1) * p).cast("int")
          (element_at(col("__arr"), greatest(i + 1, lit(1))),
            element_at(col("__arr"),
              greatest(least(i + lit(2), col("__n")), lit(1))))
        }
        val (mLo, mHi) = bracket(0.5)
        val (q1Lo, q1Hi) = bracket(0.25)
        val (q3Lo, q3Hi) = bracket(0.75)
        val medDefined = col("baseline_median").isNotNull
        withArr.agg(
          count(lit(1)).as("n_events"),
          sum(when(medDefined, 1L).otherwise(0L)).as("n_with_baseline"),
          (sum(when(medDefined &&
              (col("baseline_median") < mLo - lit(2 * width) ||
                col("baseline_median") > mHi + lit(2 * width)), 1L)
            .otherwise(0L)) === 0).as("median_bracketed"),
          (sum(when(col("baseline_iqr").isNotNull &&
              (col("baseline_iqr") < q3Lo - q1Hi - lit(4 * width) ||
                col("baseline_iqr") > q3Hi - q1Lo + lit(4 * width)), 1L)
            .otherwise(0L)) === 0).as("iqr_bracketed"),
          (sum(col("baseline_below") + col("baseline_above")) === 0)
            .as("all_in_range"))
      },
      Some("""SELECT count(*)::BIGINT AS n_events,
               sum(CASE WHEN cnt >= 1 THEN 1 ELSE 0 END)::BIGINT
                 AS n_with_baseline,
               true AS median_bracketed, true AS iqr_bracketed,
               true AS all_in_range
             FROM (SELECT count(value) OVER w AS cnt
               FROM (SELECT user_id, value,
                 CAST(floor(epoch(ts)) AS BIGINT) AS tss FROM events)
               WINDOW w AS (PARTITION BY user_id ORDER BY tss
                 RANGE BETWEEN 3599 PRECEDING AND 1 PRECEDING))""")),

    // ---- per-key gap / outage report ---------------------------------------
    // all gaps are exact micros longs; only the avg is a division
    QueryDef("q_gap_report",
      (s, d) => graft.events.TimeSeries.gapReport(events(s, d),
          Seq("user_id"), "ts", "event_id", thresholdUs = 3600000000L)
        // avg_gap is one correctly-rounded division of exact ints —
        // bit-identical across engines, so it compares UNROUNDED
        // (round() itself would diverge: scaling a ~1e10 value by 1e6
        // exceeds 2^53 in DuckDB's round path)
        .select(col("user_id"), col("n_events"), col("span_us"),
          col("max_gap_us"), col("avg_gap_us"), col("n_gaps_over"))
        .orderBy("user_id"),
      Some("""WITH g AS (SELECT user_id, epoch_us(ts) AS tsu,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id) AS gap
               FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
                 AND event_id IS NOT NULL)
             SELECT user_id, count(*)::BIGINT AS n_events,
               (max(tsu) - min(tsu))::BIGINT AS span_us,
               max(gap)::BIGINT AS max_gap_us,
               sum(gap)::DOUBLE / count(gap) AS avg_gap_us,
               sum(CASE WHEN gap > 3600000000 THEN 1 ELSE 0 END)::BIGINT
                 AS n_gaps_over
             FROM g GROUP BY 1 ORDER BY 1""")),

    // ---- time-weighted average (step-function hold) ------------------------
    QueryDef("q_twa",
      (s, d) => graft.events.TimeSeries.timeWeightedAvg(events(s, d),
          Seq("user_id"), "ts", "event_id", "value")
        .select(col("user_id"), col("n_events"), col("span_us"),
          round(col("twa"), 6).as("twa"))
        .orderBy("user_id"),
      Some("""WITH w AS (SELECT user_id, value, epoch_us(ts) AS tsu,
               (lead(epoch_us(ts)) OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id) - epoch_us(ts))::DOUBLE
                 AS hold
               FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
                 AND event_id IS NOT NULL AND value IS NOT NULL)
             SELECT user_id, count(*)::BIGINT AS n_events,
               (max(tsu) - min(tsu))::BIGINT AS span_us,
               round(CASE WHEN max(tsu) > min(tsu)
                 THEN sum(value * hold) / (max(tsu) - min(tsu))
                 ELSE max(value) END, 6) AS twa
             FROM w GROUP BY 1 ORDER BY 1""")),

    // ---- CUSUM change detection (per-event, bit-exact recursion) -----------
    // same oracle strategy as q_ewma: a recursive CTE replaying the
    // identical +/−/greatest op order is BIT-IDENTICAL to the JVM
    // recursion — cusum_hi/lo compare unrounded
    QueryDef("q_cusum",
      (s, d) => graft.events.TimeSeries.cusum(events(s, d),
          Seq("user_id"), "ts", "event_id", "value",
          target = 5.0, slack = 0.5, h = 25.0)
        .select(col("user_id"), col("event_id"), col("value"),
          col("cusum_hi"), col("cusum_lo"), col("alarm"))
        .orderBy("user_id", "event_id"),
      Some("""WITH RECURSIVE r AS (SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id) AS rn
               FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
                 AND event_id IS NOT NULL AND value IS NOT NULL),
             rec AS (
               SELECT user_id, event_id, rn, value::DOUBLE AS v,
                 greatest(0.0, value - 5.0 - 0.5) AS hi,
                 greatest(0.0, 5.0 - 0.5 - value) AS lo
               FROM r WHERE rn = 1
               UNION ALL
               SELECT r.user_id, r.event_id, r.rn, r.value,
                 greatest(0.0, rec.hi + (r.value - 5.0 - 0.5)),
                 greatest(0.0, rec.lo + (5.0 - 0.5 - r.value))
               FROM r JOIN rec ON r.user_id = rec.user_id
                 AND r.rn = rec.rn + 1)
             SELECT user_id, event_id, v AS value, hi AS cusum_hi,
               lo AS cusum_lo, (hi > 25.0 OR lo > 25.0) AS alarm
             FROM rec ORDER BY 1, 2""")),

    // ---- per-key autocorrelation function (lags 1..3) ----------------------
    // one keyed window pass (mean + 3 leads) folded into one aggregate,
    // melted by stack(); the series mean is a double window-avg, so the
    // products carry sum-order ulps — acf compares under round(6)
    QueryDef("q_acf",
      (s, d) => graft.events.TimeSeries.acf(events(s, d),
          Seq("user_id"), "ts", "event_id", "value", maxLag = 3)
        .select(col("user_id"), col("lag"), col("n"),
          round(col("acf"), 6).as("acf"))
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
             a AS (SELECT user_id, count(*)::BIGINT AS n,
               sum((x - mu) * (x - mu)) AS den,
               sum((x - mu) * (l1 - mu)) AS n1,
               sum((x - mu) * (l2 - mu)) AS n2,
               sum((x - mu) * (l3 - mu)) AS n3
               FROM m GROUP BY 1)
             SELECT user_id, lag, n, round(num / nullif(den, 0), 6) AS acf
             FROM (SELECT user_id, n, 1 AS lag, n1 AS num, den FROM a
               UNION ALL SELECT user_id, n, 2, n2, den FROM a
               UNION ALL SELECT user_id, n, 3, n3, den FROM a)
             ORDER BY user_id, lag""")),

    // ---- Holt linear (level + trend) smoothing ------------------------------
    // the q_ewma contract extended to a two-state recursion: the oracle's
    // RECURSIVE CTE applies the IDENTICAL op order (level from (l+b),
    // trend from the recomputed level), so level/trend/forecast compare
    // BIT-FOR-BIT, unrounded
    QueryDef("q_holt",
      (s, d) => graft.events.TimeSeries.holtLinear(events(s, d),
          Seq("user_id"), "ts", "event_id", "value",
          alpha = 0.3, beta = 0.2)
        .select(col("user_id"), col("event_id"), col("level"),
          col("trend"), col("forecast"))
        .orderBy("user_id", "event_id"),
      Some("""WITH RECURSIVE r AS (SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id) AS rn
               FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
                 AND event_id IS NOT NULL AND value IS NOT NULL),
             rec AS (
               SELECT user_id, event_id, rn, value::DOUBLE AS l,
                 0.0::DOUBLE AS b
               FROM r WHERE rn = 1
               UNION ALL
               SELECT r.user_id, r.event_id, r.rn,
                 0.3 * r.value + (1.0 - 0.3) * (rec.l + rec.b),
                 0.2 * ((0.3 * r.value + (1.0 - 0.3) * (rec.l + rec.b))
                   - rec.l) + (1.0 - 0.2) * rec.b
               FROM r JOIN rec ON r.user_id = rec.user_id
                 AND r.rn = rec.rn + 1)
             SELECT user_id, event_id, l AS level, b AS trend,
               l + b AS forecast
             FROM rec ORDER BY 1, 2""")),

    // ---- diurnal seasonality summary ---------------------------------------
    // hour-of-day variance-explained per user; hourly means round(6)
    // BEFORE the peak/trough argmax (ulp-stable hour choice), r²
    // round(6) for the moment-sum ulps
    QueryDef("q_seasonality",
      (s, d) => graft.events.TimeSeries.seasonality(events(s, d),
          Seq("user_id"), "ts", "value")
        .select(col("user_id"), col("n"),
          round(col("r2_seasonal"), 6).as("r2_seasonal"),
          col("peak_hour"), col("trough_hour"),
          col("peak_mean"), col("trough_mean"))
        .orderBy("user_id"),
      Some("""WITH b AS (SELECT user_id,
               ((epoch_us(ts) // 3600000000) % 24)::INT AS h,
               value::DOUBLE AS x
               FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
                 AND value IS NOT NULL),
             ph AS (SELECT user_id, h, count(*)::BIGINT AS n,
               sum(x) AS s, sum(x * x) AS ss,
               round(sum(x) / count(*), 6) AS m
               FROM b GROUP BY 1, 2),
             r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY m DESC, h) AS rp,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY m ASC, h) AS rt FROM ph),
             a AS (SELECT user_id, sum(n)::BIGINT AS n, sum(s) AS st,
               sum(ss) AS sst, sum(s * s / n) AS between_ss,
               max(CASE WHEN rp = 1 THEN h END) AS peak_hour,
               max(CASE WHEN rp = 1 THEN m END) AS peak_mean,
               max(CASE WHEN rt = 1 THEN h END) AS trough_hour,
               max(CASE WHEN rt = 1 THEN m END) AS trough_mean
               FROM r GROUP BY 1)
             SELECT user_id, n,
               round(CASE WHEN sst - st * st / n > 0.0 THEN
                 1.0 - (sst - between_ss) / (sst - st * st / n) END, 6)
                 AS r2_seasonal,
               peak_hour, trough_hour, peak_mean, trough_mean
             FROM a ORDER BY user_id""")),

    // ---- single change-point localization (AMOC) ----------------------------
    // values enter as EXACT CENTS (round(value·100) longs — v·100 is
    // never an exact .5, so both engines round identically), making
    // every running sum exact and every output a fixed division chain:
    // the whole row compares UNROUNDED. The first cut rounded the raw
    // double means at 6 and hit the half-boundary (59.6046875) — the
    // q_robust_mean lesson again
    QueryDef("q_change_point",
      (s, d) => graft.events.TimeSeries.changePoint(
          events(s, d).withColumn("cents",
            round(col("value") * 100).cast("long")),
          Seq("user_id"), "ts", "event_id", "cents")
        .select(col("user_id"), col("n"), col("split_tie"),
          col("n_before"), (col("gain") / 100.0).as("gain"),
          (col("mean_before") / 100.0).as("mean_before"),
          (col("mean_after") / 100.0).as("mean_after"))
        .orderBy("user_id"),
      Some("""WITH b AS (SELECT user_id, event_id,
               round(value * 100)::BIGINT::DOUBLE AS x,
               epoch_us(ts) AS tsu
               FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
                 AND event_id IS NOT NULL AND value IS NOT NULL),
             c AS (SELECT user_id, event_id, tsu,
               count(*) OVER wp AS nt, sum(x) OVER wp AS st,
               count(*) OVER wa AS n, sum(x) OVER wa AS s
               FROM b
               WINDOW wp AS (PARTITION BY user_id ORDER BY tsu, event_id
                 ROWS UNBOUNDED PRECEDING),
               wa AS (PARTITION BY user_id)),
             g AS (SELECT user_id, event_id, nt, n,
               st / nt AS mb, (s - st) / (n - nt) AS ma,
               round(sqrt(nt * (n - nt) / n) *
                 abs(st / nt - (s - st) / (n - nt)), 6) AS gain,
               tsu
               FROM c WHERE nt < n),
             r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY gain DESC, tsu, event_id) AS rk FROM g)
             SELECT user_id, n::BIGINT AS n, event_id AS split_tie,
               nt::BIGINT AS n_before, gain / 100.0 AS gain,
               mb / 100.0 AS mean_before, ma / 100.0 AS mean_after
             FROM r WHERE rk = 1 ORDER BY user_id""")),

    // ---- burstiness: per-user Fano factor over hourly buckets ---------------
    // empty in-span buckets count as zeros WITHOUT materializing
    // (N = max-min+1 span arithmetic); every term is an exact long and
    // the op chain is fixed, so the row compares UNROUNDED
    QueryDef("q_dispersion",
      (s, d) => graft.events.TimeSeries.dispersion(events(s, d),
          Seq("user_id"), "ts", bucketUs = 3600000000L)
        .orderBy("user_id"),
      Some("""WITH b AS (SELECT user_id,
               epoch_us(ts) // 3600000000 AS bk, count(*)::BIGINT AS c
               FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
               GROUP BY 1, 2),
             g AS (SELECT user_id, sum(c)::BIGINT AS n_events,
               (max(bk) - min(bk) + 1)::BIGINT AS n_buckets,
               count(*)::BIGINT AS occupied,
               sum(c * c)::BIGINT AS cc
               FROM b GROUP BY 1)
             SELECT user_id, n_events, n_buckets, occupied,
               n_events::DOUBLE / n_buckets AS mean,
               cc::DOUBLE / n_buckets -
                 (n_events::DOUBLE / n_buckets) *
                 (n_events::DOUBLE / n_buckets) AS variance,
               CASE WHEN n_events::DOUBLE / n_buckets > 0.0 THEN
                 (cc::DOUBLE / n_buckets -
                   (n_events::DOUBLE / n_buckets) *
                   (n_events::DOUBLE / n_buckets)) /
                 (n_events::DOUBLE / n_buckets) END AS fano
             FROM g ORDER BY user_id""")),

    // ---- Mann-Kendall trend + Sen's slope -----------------------------------
    // run on the DAILY resample (the operator's documented contract —
    // MK is pairwise), per user. ROUNDING-FREE contract (the round-9 red
    // row): daily values are exact cent sums qsum (floor(v·100 + 0.5) is
    // deterministic for cents data — the true integer sits > 0.49 from
    // the floor boundary) carried as x = qsum/cnt/100, a fixed chain
    // over exact longs, so every downstream comparison/group/slope is
    // the identical IEEE op chain in both engines; Sen's slope uses the
    // "lower" Type-1 order-statistic pick (SELECTS a chain-derived
    // double instead of interpolating a new one) and z derives from
    // exact longs through sqrt — all columns compare UNROUNDED.
    QueryDef("q_mann_kendall",
      (s, d) => {
        val ev = events(s, d)
          .na.drop(Seq("user_id", "ts", "value"))
          .withColumn("day",
            expr("unix_micros(ts) div 86400000000"))
        val daily = ev.groupBy("user_id", "day")
          .agg(sum(floor(col("value") * 100 + 0.5)).as("qsum"),
            count(lit(1)).as("cnt"))
          .withColumn("x",
            col("qsum").cast("double") / col("cnt").cast("double") / 100.0)
          .withColumn("ts2", timestamp_micros(col("day") * 86400000000L))
        graft.events.TimeSeries.mannKendall(daily, Seq("user_id"),
            "ts2", "day", "x", senEstimator = "lower")
          .select(col("user_id"), col("n"), col("s"), col("var_s"),
            col("z"), col("sen_slope"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, value
               FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
                 AND value IS NOT NULL),
             dly AS (SELECT user_id, tsu // 86400000000 AS day,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS qsum,
               count(*)::BIGINT AS cnt FROM e GROUP BY 1, 2),
             dx AS (SELECT user_id, day,
               qsum::DOUBLE / cnt::DOUBLE / 100.0 AS x FROM dly),
             r AS (SELECT user_id, day, x, row_number()
                 OVER (PARTITION BY user_id ORDER BY day) AS rn FROM dx),
             p AS (SELECT a.user_id, a.x AS xa, b.x AS xb,
               a.day AS ta, b.day AS tb
               FROM r a JOIN r b ON a.user_id = b.user_id AND a.rn < b.rn),
             sagg AS (SELECT user_id, sum(CASE WHEN xb > xa THEN 1
                 WHEN xb < xa THEN -1 ELSE 0 END)::BIGINT AS s
               FROM p GROUP BY 1),
             sl AS (SELECT user_id,
                 (xb - xa) / (((tb - ta) * 86400000000)::DOUBLE / 1e6)
                   AS slope
               FROM p WHERE tb != ta),
             sr AS (SELECT user_id, slope,
                 row_number() OVER (PARTITION BY user_id ORDER BY slope)
                   AS srn,
                 count(*) OVER (PARTITION BY user_id) AS m FROM sl),
             sen AS (SELECT user_id, slope AS sen_slope FROM sr
               WHERE srn = (m + 1) // 2),
             tc AS (SELECT user_id, count(*)::BIGINT AS t FROM dx
               GROUP BY user_id, x),
             tie AS (SELECT user_id,
               sum(t * (t - 1) * (t * 2 + 5))::BIGINT AS tsum,
               sum(t)::BIGINT AS n FROM tc GROUP BY 1),
             f AS (SELECT tie.user_id, n, coalesce(s, 0)::BIGINT AS s,
               ((n * (n - 1) * (n * 2 + 5) - tsum))::DOUBLE / 18.0
                 AS var_s, sen_slope
               FROM tie LEFT JOIN sagg ON tie.user_id = sagg.user_id
                 LEFT JOIN sen ON tie.user_id = sen.user_id)
             SELECT user_id, n, s, var_s,
               CASE WHEN var_s > 0.0 THEN
                 CASE WHEN s > 0 THEN (s - 1)::DOUBLE / sqrt(var_s)
                   WHEN s < 0 THEN (s + 1)::DOUBLE / sqrt(var_s)
                   ELSE 0.0 END END AS z,
               sen_slope
             FROM f ORDER BY user_id""")),

    // ---- Durbin-Watson residual autocorrelation -----------------------------
    // per-user OLS of value on seconds-from-first-event (min-centered in
    // exact long micros BEFORE the double divide — raw epoch-micros x
    // would cancel catastrophically in the x² sums), residuals lagged in
    // time order, DW ratio under round(6)
    QueryDef("q_durbin_watson",
      (s, d) => graft.events.TimeSeries.durbinWatson(events(s, d),
          Seq("user_id"), "ts", "event_id", "value")
        .select(col("user_id"), col("n"), round(col("dw"), 6).as("dw"))
        .orderBy("user_id"),
      Some("""WITH b AS (SELECT user_id, event_id, value::DOUBLE AS y,
               epoch_us(ts) AS tsu
               FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
                 AND event_id IS NOT NULL AND value IS NOT NULL),
             c AS (SELECT user_id, event_id, y,
               (tsu - min(tsu) OVER (PARTITION BY user_id))::DOUBLE / 1e6
                 AS xc FROM b),
             g AS (SELECT user_id, count(*) AS n, sum(xc) AS sx,
               sum(y) AS sy, sum(xc * y) AS sxy, sum(xc * xc) AS sxx
               FROM c GROUP BY 1),
             k AS (SELECT user_id, n,
               (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0) AS slope,
               (sy - (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0)
                 * sx) / n AS icept
               FROM g),
             e AS (SELECT c.user_id, c.event_id, xc,
               y - (icept + slope * xc) AS e
               FROM c JOIN k USING (user_id)),
             l AS (SELECT user_id, e, lag(e) OVER (PARTITION BY user_id
                 ORDER BY xc, event_id) AS ep FROM e)
             SELECT user_id, count(*)::BIGINT AS n,
               round(sum((e - ep) * (e - ep)) / nullif(sum(e * e), 0), 6)
                 AS dw
             FROM l GROUP BY 1 ORDER BY 1""")),

    // ---- as-of join: latest click before each purchase, per user ----------
    // oracle = DuckDB's NATIVE ASOF JOIN — the engine's merge-scan
    // formulation must reproduce a first-class reference implementation
    QueryDef("q_asof_join",
      (s, d) => {
        val ev = events(s, d).withColumn("tsu", unix_micros(col("ts")))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("tsu"),
            round(col("value"), 2).as("value"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("tsu"),
            col("tsu").as("click_tsu"), round(col("value"), 2).as("click_value"))
        graft.joins.AsofJoin.asofJoin(purchases, clicks,
            keys = Seq("user_id"), tsCol = "tsu",
            valueCols = Seq("click_tsu", "click_value"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tsu,
               round(value, 2) AS value, event_type FROM events),
             p AS (SELECT event_id, user_id, tsu, value FROM e
               WHERE event_type = 'purchase'),
             c AS (SELECT user_id, tsu AS click_tsu, value AS click_value
               FROM e WHERE event_type = 'click')
             SELECT p.user_id, p.tsu, p.event_id, p.value,
               c.click_tsu, c.click_value
             FROM p ASOF LEFT JOIN c
               ON p.user_id = c.user_id AND p.tsu >= c.click_tsu
             ORDER BY event_id""")),

    // backward as-of with a 10-minute tolerance (pandas merge_asof
    // tolerance parity): matches older than the bound are nulled; the
    // oracle applies the same CASE over DuckDB's native ASOF JOIN
    QueryDef("q_asof_tolerance",
      (s, d) => {
        val ev = events(s, d).withColumn("tsu", unix_micros(col("ts")))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("tsu"),
            round(col("value"), 2).as("value"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("tsu"),
            col("tsu").as("click_tsu"),
            round(col("value"), 2).as("click_value"))
        graft.joins.AsofJoin.asofJoinTolerance(purchases, clicks,
            keys = Seq("user_id"), tsCol = "tsu",
            valueCols = Seq("click_tsu", "click_value"),
            rightTsValueCol = "click_tsu", tolerance = 6.0e8)
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tsu,
               round(value, 2) AS value, event_type FROM events),
             p AS (SELECT event_id, user_id, tsu, value FROM e
               WHERE event_type = 'purchase'),
             c AS (SELECT user_id, tsu AS click_tsu, value AS click_value
               FROM e WHERE event_type = 'click'),
             j AS (SELECT p.user_id, p.tsu, p.event_id, p.value,
               c.click_tsu, c.click_value
               FROM p ASOF LEFT JOIN c
                 ON p.user_id = c.user_id AND p.tsu >= c.click_tsu)
             SELECT user_id, tsu, event_id, value,
               CASE WHEN tsu - click_tsu <= 600000000
                 THEN click_tsu END AS click_tsu,
               CASE WHEN tsu - click_tsu <= 600000000
                 THEN click_value END AS click_value
             FROM j ORDER BY event_id""")),

    // ---- forward as-of: next click at or after each purchase --------------
    // same merge-scan plan as the backward tier, ts DESCENDING: scanning
    // from the future backward, the carried right row at each left row is
    // the smallest right ts still >= it. DuckDB has no forward ASOF, so
    // the oracle replays it as an inequality join + min-rank pick
    QueryDef("q_asof_forward",
      (s, d) => {
        val ev = events(s, d).withColumn("tsu", unix_micros(col("ts")))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("tsu"),
            round(col("value"), 2).as("value"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("tsu"),
            col("tsu").as("click_tsu"), round(col("value"), 2).as("click_value"))
        graft.joins.AsofJoin.asofJoinForward(purchases, clicks,
            keys = Seq("user_id"), tsCol = "tsu",
            valueCols = Seq("click_tsu", "click_value"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tsu,
               round(value, 2) AS value, event_type FROM events),
             p AS (SELECT event_id, user_id, tsu, value FROM e
               WHERE event_type = 'purchase'),
             c AS (SELECT user_id, tsu AS click_tsu, value AS click_value
               FROM e WHERE event_type = 'click'),
             j AS (SELECT p.user_id, p.tsu, p.event_id, p.value,
               c.click_tsu, c.click_value,
               row_number() OVER (PARTITION BY p.event_id
                 ORDER BY c.click_tsu) AS rn
               FROM p LEFT JOIN c
                 ON p.user_id = c.user_id AND c.click_tsu >= p.tsu)
             SELECT user_id, tsu, event_id, value, click_tsu, click_value
             FROM j WHERE rn = 1 ORDER BY event_id""")),

    // ---- nearest as-of: closest click either side of each purchase --------
    // pandas merge_asof(direction='nearest') parity: two one-pass scans
    // (backward + forward) composed by one id-keyed join; ties go
    // backward. Oracle ranks each purchase's clicks by absolute distance
    // with the backward-preferring tiebreak
    QueryDef("q_asof_nearest",
      (s, d) => {
        val ev = events(s, d).withColumn("tsu", unix_micros(col("ts")))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("tsu"),
            round(col("value"), 2).as("value"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("tsu"),
            col("tsu").as("click_tsu"), round(col("value"), 2).as("click_value"))
        graft.joins.AsofJoin.asofJoinNearest(purchases, clicks,
            keys = Seq("user_id"), tsCol = "tsu",
            valueCols = Seq("click_tsu", "click_value"),
            idCol = "event_id", rightTsValueCol = "click_tsu")
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tsu,
               round(value, 2) AS value, event_type FROM events),
             p AS (SELECT event_id, user_id, tsu, value FROM e
               WHERE event_type = 'purchase'),
             c AS (SELECT user_id, tsu AS click_tsu, value AS click_value
               FROM e WHERE event_type = 'click'),
             j AS (SELECT p.user_id, p.tsu, p.event_id, p.value,
               c.click_tsu, c.click_value,
               row_number() OVER (PARTITION BY p.event_id
                 ORDER BY abs(c.click_tsu - p.tsu),
                   (c.click_tsu > p.tsu)::INT, c.click_tsu) AS rn
               FROM p LEFT JOIN c ON p.user_id = c.user_id)
             SELECT user_id, tsu, event_id, value, click_tsu, click_value
             FROM j WHERE rn = 1 ORDER BY event_id""")),

    // ---- range join: purchases inside click-session windows ---------------
    // intervals = per-user click sessions (4-day gap — the synthetic
    // events put median per-user click spacing at ~35 h, so a web-style
    // 30-min gap yields only single-point sessions); points = purchase
    // timestamps; the bin-exploded equi-join must reproduce DuckDB's
    // BETWEEN range join exactly
    QueryDef("q_range_join",
      (s, d) => {
        val ev = events(s, d).withColumn("tsu", unix_micros(col("ts")))
        val sessions = graft.events.Sessionize.sessionBounds(
            ev.filter(col("event_type") === "click")
              .select("user_id", "tsu"),
            keys = Seq("user_id"), tsCol = "tsu",
            gap = 345600L * 1000000L, sidCol = "sid")
          .drop("n_events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("tsu"))
        graft.joins.RangeJoin.pointInInterval(purchases, sessions,
            keys = Seq("user_id"), pointCol = "tsu", loCol = "lo",
            hiCol = "hi", binWidth = 86400L * 1000000L)
          .select("event_id", "user_id", "tsu", "sid", "lo", "hi")
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tsu,
               event_type FROM events),
             c AS (SELECT user_id, tsu,
               CASE WHEN lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu)
                 IS NULL OR tsu - lag(tsu) OVER (PARTITION BY user_id
                 ORDER BY tsu) > 345600000000 THEN 1 ELSE 0 END AS new_s
               FROM e WHERE event_type = 'click'),
             s2 AS (SELECT user_id, tsu, sum(new_s) OVER (PARTITION BY
               user_id ORDER BY tsu ROWS UNBOUNDED PRECEDING)::BIGINT AS sid
               FROM c),
             sess AS (SELECT user_id, sid, min(tsu) AS lo, max(tsu) AS hi
               FROM s2 GROUP BY 1, 2),
             p AS (SELECT event_id, user_id, tsu FROM e
               WHERE event_type = 'purchase')
             SELECT p.event_id, p.user_id, p.tsu, sess.sid, sess.lo, sess.hi
             FROM p JOIN sess ON p.user_id = sess.user_id
               AND p.tsu BETWEEN sess.lo AND sess.hi
             ORDER BY event_id""")),

    // ---- interval-interval overlap join -----------------------------------
    // two derived per-user interval sets (event -> [epoch_s, epoch_s +
    // id-keyed span]); both sides bin-exploded, pairs meet on (user, bin)
    // with the exact overlap post-filter, emitted EXACTLY once at the
    // later interval's first bin — no dedup pass. Oracle = the plain
    // inequality join
    QueryDef("q_interval_join",
      (s, d) => {
        // microsecond-exact epochs: a seconds cast truncates in Spark but
        // ROUNDS through DuckDB's double epoch() — off-by-one overlaps
        val ev = events(s, d).withColumn("us", expr("unix_micros(ts)"))
        val l = ev.filter(col("event_id") % 5 === 0)
          .select(col("user_id").as("k"), col("event_id").as("id_a"),
            col("us").as("lo_a"),
            (col("us") + col("event_id") % 600 * 1000000L).as("hi_a"))
        val r = ev.filter(col("event_id") % 5 === 1)
          .select(col("user_id").as("k"), col("event_id").as("id_b"),
            col("us").as("lo_b"),
            (col("us") + col("event_id") % 900 * 1000000L).as("hi_b"))
        graft.joins.RangeJoin.intervalOverlap(l, r, Seq("k"),
            "lo_a", "hi_a", "lo_b", "hi_b", binWidth = 512L * 1000000L)
          .select(col("id_a"), col("id_b"),
            (least(col("hi_a"), col("hi_b")) -
              greatest(col("lo_a"), col("lo_b"))).as("overlap_us"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH l AS (SELECT user_id k, event_id id_a,
               epoch_us(ts) lo_a,
               epoch_us(ts) + event_id % 600 * 1000000 hi_a
               FROM events WHERE event_id % 5 = 0),
             r AS (SELECT user_id k, event_id id_b,
               epoch_us(ts) lo_b,
               epoch_us(ts) + event_id % 900 * 1000000 hi_b
               FROM events WHERE event_id % 5 = 1)
             SELECT id_a, id_b,
               (least(hi_a, hi_b) - greatest(lo_a, lo_b))::BIGINT
                 AS overlap_us
             FROM l JOIN r ON l.k = r.k AND lo_a <= hi_b AND lo_b <= hi_a
             ORDER BY id_a, id_b""")),

    // ---- LOCF fill (sensor-dropout densification) -------------------------
    // nulls planted deterministically (event_id % 3 = 0), filled with the
    // key's last non-null value at-or-before; ties resolve by event id.
    // One keyed window — the oracle replays last_value IGNORE NULLS
    QueryDef("q_locf",
      (s, d) => {
        val ev = events(s, d).withColumn("tsu", unix_micros(col("ts")))
          .withColumn("v", when(col("event_id") % 3 === 0, lit(null))
            .otherwise(round(col("value"), 2)))
          .select("event_id", "user_id", "tsu", "v")
        graft.events.Rolling.locfFill(ev, Seq("user_id"), "tsu", "v",
            tieCol = "event_id")
          .select(col("event_id"), col("user_id"), col("v"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tsu,
               CASE WHEN event_id % 3 = 0 THEN NULL
                 ELSE round(value, 2) END AS v FROM events)
             SELECT event_id, user_id,
               last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
                 ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING) AS v
             FROM e ORDER BY event_id""")),

    // ---- fixed-grid resampling with gap carry-forward ---------------------
    // per-user 4-day cells: observed cells carry (n_obs, mean); empty
    // cells between a key's first and last observation are materialized
    // from the key's own span (never a global calendar) and filled with
    // the previous cell's mean. The feature-regularization step models
    // need; oracle replays cells + generate_series + IGNORE NULLS window
    QueryDef("q_resample",
      (s, d) => {
        val ev = events(s, d)
          .select(col("user_id"), col("ts"), round(col("value"), 2).as("v"))
        graft.events.Rolling.resample(ev, Seq("user_id"), "ts", "v",
            stepSec = 345600L)
          .select(col("user_id"), col("grid_ts"), col("n_obs"),
            round(col("value"), 6).as("value"))
          .orderBy("user_id", "grid_ts")
      },
      Some("""WITH e AS (SELECT user_id,
               epoch_us(ts) // 1000000 AS sec, round(value, 2) AS v
               FROM events WHERE ts IS NOT NULL),
             cells AS (SELECT user_id,
               (sec // 345600) * 345600 AS grid_ts,
               count(v) AS n_obs, avg(v) AS m
               FROM e GROUP BY 1, 2),
             spans AS (SELECT user_id, min(grid_ts) AS lo, max(grid_ts) AS hi
               FROM cells GROUP BY 1),
             grid AS (SELECT user_id,
               unnest(generate_series(lo, hi, 345600)) AS grid_ts FROM spans),
             j AS (SELECT g.user_id, g.grid_ts,
               coalesce(c.n_obs, 0) AS n_obs, c.m
               FROM grid g LEFT JOIN cells c
               ON g.user_id = c.user_id AND g.grid_ts = c.grid_ts)
             SELECT user_id, grid_ts, n_obs::BIGINT AS n_obs,
               round(last_value(m IGNORE NULLS) OVER (PARTITION BY user_id
                 ORDER BY grid_ts ROWS UNBOUNDED PRECEDING), 6) AS value
             FROM j ORDER BY user_id, grid_ts""")),

    // ---- events: sessionization via window gaps ---------------------------
    QueryDef("q_events_sessions",
      (s, d) => {
        // ordering by epoch seconds instead of the raw timestamp is
        // session-equivalent: ties within one second have gap 0 either way
        val ev = events(s, d).withColumn("tss", col("ts").cast("long"))
        graft.events.Sessionize.sessionBounds(ev, Seq("user_id"), "tss",
            gap = 1800L)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
          .orderBy("user_id")
      },
      Some("""WITH g AS (SELECT user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                 IS NULL OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY
                 user_id ORDER BY ts)) > 1800 THEN 1 ELSE 0 END AS new_session
               FROM events),
             s AS (SELECT user_id, sum(new_session) OVER (PARTITION BY user_id
               ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id FROM g),
             per AS (SELECT user_id, session_id, count(*) AS n_events
               FROM s GROUP BY 1, 2)
             SELECT user_id, count(*)::BIGINT AS n_sessions,
               sum(n_events)::BIGINT AS n_events
             FROM per GROUP BY user_id ORDER BY user_id""")),

    // ---- events: first-order Markov transition matrix ---------------------
    // lead over (user, ts, event_id) — the tie column makes the pairing a
    // total order, so counts replay exactly
    QueryDef("q_transitions",
      (s, d) => graft.events.Transitions.transitionMatrix(
          events(s, d), "user_id", "event_type", "ts", "event_id")
        .select(col("from_type"), col("to_type"), col("n"),
          round(col("p"), 6).as("p"))
        .orderBy("from_type", "to_type"),
      Some("""WITH p AS (SELECT event_type AS f,
               lead(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS t
               FROM events WHERE user_id IS NOT NULL
                 AND event_type IS NOT NULL AND ts IS NOT NULL),
             c AS (SELECT f AS from_type, t AS to_type,
               count(*)::BIGINT AS n FROM p WHERE t IS NOT NULL
               GROUP BY 1, 2)
             SELECT from_type, to_type, n,
               round(n::DOUBLE / sum(n) OVER (PARTITION BY from_type), 6)
                 AS p
             FROM c ORDER BY from_type, to_type""")),

    // ---- events: ordered-step funnel (first-touch, windowed) --------------
    // greedy earliest-after-previous matching anchored at the first step-0
    // event == the oracle's chained min-joins (see Funnel scaladoc); the
    // Spark side is ONE user-keyed shuffle instead of K joins
    QueryDef("q_funnel",
      (s, d) => {
        val ev = events(s, d).withColumn("tsu", unix_micros(col("ts")))
        graft.events.Funnel.report(ev, "user_id", "event_type", "tsu",
            Seq("view", "click", "purchase"), window = 604800000000L)
          .select(col("step"), col("step_name"), col("n_users"),
            round(col("conversion"), 6).as("conversion"))
          .orderBy("step")
      },
      Some("""WITH s0 AS (SELECT user_id, min(epoch_us(ts)) AS t0 FROM events
               WHERE event_type = 'view' AND user_id IS NOT NULL
                 AND ts IS NOT NULL GROUP BY 1),
             s1 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t1
               FROM events e JOIN s0 ON e.user_id = s0.user_id
               WHERE e.event_type = 'click' AND epoch_us(e.ts) > s0.t0
                 AND epoch_us(e.ts) - s0.t0 <= 604800000000 GROUP BY 1),
             s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2
               FROM events e JOIN s1 ON e.user_id = s1.user_id
               JOIN s0 ON e.user_id = s0.user_id
               WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s1.t1
                 AND epoch_us(e.ts) - s0.t0 <= 604800000000 GROUP BY 1),
             c AS (SELECT (SELECT count(*) FROM s0) AS c0,
                   (SELECT count(*) FROM s1) AS c1,
                   (SELECT count(*) FROM s2) AS c2)
             SELECT 0 AS step, 'view' AS step_name, c0::BIGINT AS n_users,
               round(c0::DOUBLE / c0, 6) AS conversion FROM c
             UNION ALL SELECT 1, 'click', c1::BIGINT,
               round(c1::DOUBLE / c0, 6) FROM c
             UNION ALL SELECT 2, 'purchase', c2::BIGINT,
               round(c2::DOUBLE / c0, 6) FROM c
             ORDER BY step""")),

    // ---- events: cohort retention matrix ----------------------------------
    // week cohorts by first event; integral div on both sides (epoch micros
    // are non-negative, so trunc == floor == DuckDB's //)
    QueryDef("q_retention",
      (s, d) => {
        val ev = events(s, d).withColumn("tsu", unix_micros(col("ts")))
        graft.events.Retention.cohorts(ev, "user_id", "tsu", 604800000000L)
          .select(col("cohort"), col("offset"), col("n_active"),
            col("cohort_size"), round(col("retention"), 6).as("retention"))
          .orderBy("cohort", "offset")
      },
      Some("""WITH ev AS (SELECT user_id, epoch_us(ts) // 604800000000 AS p
               FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
             f AS (SELECT user_id, min(p) AS cohort FROM ev GROUP BY 1),
             a AS (SELECT DISTINCT user_id, p FROM ev),
             j AS (SELECT f.cohort, a.p - f.cohort AS "offset",
                   count(*)::BIGINT AS n_active
               FROM a JOIN f ON a.user_id = f.user_id GROUP BY 1, 2)
             SELECT cohort, "offset", n_active,
               max(CASE WHEN "offset" = 0 THEN n_active END)
                 OVER (PARTITION BY cohort) AS cohort_size,
               round(n_active::DOUBLE /
                 max(CASE WHEN "offset" = 0 THEN n_active END)
                 OVER (PARTITION BY cohort), 6) AS retention
             FROM j ORDER BY cohort, "offset"""")),

    // ---- per-group OLS fit (slope / intercept / r²) -----------------------
    // one hash aggregate of six sums; the oracle replays the raw-sums
    // identity term-for-term (regr_slope would accumulate differently)
    QueryDef("q_linear_fit",
      (s, d) => Stats.linearFit(lineitem(s, d), Seq("l_returnflag"),
          "l_quantity", "l_extendedprice")
        .select(col("l_returnflag"), col("n"),
          round(col("slope"), 4).as("slope"),
          round(col("intercept"), 4).as("intercept"),
          round(col("r2"), 6).as("r2"))
        .orderBy("l_returnflag"),
      Some("""WITH g AS (SELECT l_returnflag, count(*)::BIGINT AS n,
               sum(l_quantity::DOUBLE) AS sx,
               sum(l_extendedprice::DOUBLE) AS sy,
               sum(l_quantity::DOUBLE * l_extendedprice::DOUBLE) AS sxy,
               sum(l_quantity::DOUBLE * l_quantity::DOUBLE) AS sxx,
               sum(l_extendedprice::DOUBLE * l_extendedprice::DOUBLE) AS syy
               FROM lineitem
               WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
               GROUP BY 1)
             SELECT l_returnflag, n,
               round((n*sxy - sx*sy) / (n*sxx - sx*sx), 4) AS slope,
               round((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 4)
                 AS intercept,
               round((n*sxy - sx*sy)*(n*sxy - sx*sy) /
                 ((n*sxx - sx*sx)*(n*syy - sy*sy)), 6) AS r2
             FROM g ORDER BY l_returnflag""")),

    // ---- hierarchical rollup totals ----------------------------------------
    // native ROLLUP (Expand + one hash agg) vs DuckDB GROUP BY ROLLUP;
    // grouping-bit convention pinned via the GROUPING() identity, null
    // dimension slots coalesced to a sentinel on both sides so row
    // sorting never touches null ordering
    QueryDef("q_rollup",
      (s, d) => graft.agg.Stats.rollupAgg(lineitem(s, d),
          Seq("l_returnflag", "l_linestatus"), "l_quantity")
        .withColumn("total", col("total").cast("long"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
               coalesce(l_linestatus, '(all)') AS l_linestatus,
               (2 * grouping(l_returnflag) + grouping(l_linestatus))::INT
                 AS level,
               count(*)::BIGINT AS n,
               sum(l_quantity)::BIGINT AS total
             FROM lineitem
             WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
               AND l_quantity IS NOT NULL
             GROUP BY ROLLUP (l_returnflag, l_linestatus)
             ORDER BY 1, 2""")),

    // ---- 2-D skyline (Pareto front) ----------------------------------------
    // parts not dominated on (size, retailprice); pure comparisons, no
    // arithmetic — the row compares unrounded. Oracle = quadratic
    // NOT EXISTS domination, a genuinely independent formulation of the
    // same definition
    QueryDef("q_skyline",
      (s, d) => graft.operators.Skyline.skyline2d(
          s.read.parquet(s"$d/part.parquet"), "p_size", "p_retailprice")
        .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_size, p_retailprice FROM part p
             WHERE p_size IS NOT NULL AND p_retailprice IS NOT NULL
               AND NOT EXISTS (SELECT 1 FROM part q
                 WHERE q.p_size IS NOT NULL
                   AND q.p_retailprice IS NOT NULL
                   AND q.p_size >= p.p_size
                   AND q.p_retailprice >= p.p_retailprice
                   AND (q.p_size > p.p_size
                     OR q.p_retailprice > p.p_retailprice))
             ORDER BY 1""")),

    // ---- exact weighted percentiles ----------------------------------------
    // quantity-weighted price quantiles: Type-1 inverse CDF returns an
    // OBSERVED value, the running weight sum folds in deterministic
    // value order, and integer weights make every sum exact — the row
    // compares UNROUNDED
    QueryDef("q_weighted_pctl",
      (s, d) => graft.agg.Stats.weightedPercentile(lineitem(s, d),
          Seq("l_returnflag"), "l_extendedprice", "l_quantity",
          Seq(0.25, 0.5, 0.9))
        .orderBy("l_returnflag", "p"),
      Some("""WITH cells AS (SELECT l_returnflag AS g,
               l_extendedprice::DOUBLE AS v,
               sum(l_quantity::DOUBLE) AS cw
               FROM lineitem WHERE l_returnflag IS NOT NULL
                 AND l_extendedprice IS NOT NULL
                 AND l_quantity IS NOT NULL
               GROUP BY 1, 2),
             c AS (SELECT g, v,
               sum(cw) OVER (PARTITION BY g ORDER BY v
                 ROWS UNBOUNDED PRECEDING) AS cum,
               sum(cw) OVER (PARTITION BY g) AS tot FROM cells)
             SELECT g AS l_returnflag, p,
               min(CASE WHEN cum >= p * tot THEN v END) AS wpctl
             FROM c, (VALUES (CAST(0.25 AS DOUBLE)),
               (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE))) ps(p)
             GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- robust means (trimmed + winsorized) --------------------------------
    // on the INTEGER quantity column the whole row is bit-exact
    // UNROUNDED: integer-valued double sums are exact in any order, the
    // exact-quantile cuts replay (quantile_cont interpolation — the
    // q_percentiles contract), and the operator's decomposition form
    // keeps the winsorized mean a fixed op chain. The first cut of this
    // row used avg() over clamped cents values and hit an EXACT half
    // boundary at round(6) (51646.2046875: Spark HALF_UP vs DuckDB
    // half-even) — averaged cents data lands on exact halves
    // systematically; never round such a column for comparison
    QueryDef("q_robust_mean",
      (s, d) => graft.agg.Stats.robustMean(lineitem(s, d),
          Seq("l_returnflag"), "l_quantity", p = 0.1)
        .orderBy("l_returnflag"),
      Some("""WITH b AS (SELECT l_returnflag AS g,
               l_quantity::DOUBLE AS x FROM lineitem
               WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL),
             q AS (SELECT g, quantile_cont(x, 0.1) AS q_lo,
               quantile_cont(x, 0.9) AS q_hi FROM b GROUP BY 1)
             SELECT g AS l_returnflag, count(*)::BIGINT AS n,
               sum(x) / count(*) AS mean,
               sum(CASE WHEN x >= q_lo AND x <= q_hi THEN x END) /
                 count(CASE WHEN x >= q_lo AND x <= q_hi THEN 1 END)
                 AS trimmed_mean,
               (sum(CASE WHEN x >= q_lo AND x <= q_hi THEN x END)
                 + count(CASE WHEN x < q_lo THEN 1 END) * any_value(q_lo)
                 + count(CASE WHEN x > q_hi THEN 1 END) * any_value(q_hi))
                 / count(*) AS winsorized_mean,
               any_value(q_lo) AS q_lo, any_value(q_hi) AS q_hi
             FROM b JOIN q USING (g) GROUP BY g ORDER BY g""")),

    // ---- triangle counts + clustering coefficient --------------------------
    // co-supply graph (suppliers sharing a part in lineitem); wedge
    // join + semijoin closure on both sides; coeff is one fixed
    // rational chain over exact longs — compares UNROUNDED
    QueryDef("q_triangles",
      (s, d) => {
        // quantity <= 2 keeps the co-supply graph SPARSE (the full
        // graph is near-complete on the small supplier universe and
        // its wedge mass explodes — see NOTES)
        val li = lineitem(s, d)
          .filter(col("l_quantity") <= 2)
          .select(col("l_partkey").as("p"), col("l_suppkey").as("sp"))
          .distinct()
        val edges = li.join(
            li.select(col("p"), col("sp").as("sp2")), "p")
          .filter(col("sp") < col("sp2"))
          .select(col("sp").as("src"), col("sp2").as("dst"))
        graft.pipeline.Graph.triangles(edges, "src", "dst")
          .orderBy("node")
      },
      Some("""WITH ps AS (SELECT DISTINCT l_partkey AS p,
               l_suppkey AS sp FROM lineitem
               WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
                 AND l_quantity <= 2),
             e AS (SELECT DISTINCT a.sp AS a, b.sp AS b
               FROM ps a JOIN ps b ON a.p = b.p AND a.sp < b.sp),
             w AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
               FROM e e1 JOIN e e2 ON e1.b = e2.a),
             t AS (SELECT w.a, w.b, w.c FROM w
               WHERE EXISTS (SELECT 1 FROM e
                 WHERE e.a = w.a AND e.b = w.c)),
             pn AS (SELECT node, count(*)::BIGINT AS triangles FROM (
               SELECT a AS node FROM t UNION ALL
               SELECT b FROM t UNION ALL SELECT c FROM t)
               GROUP BY 1),
             dg AS (SELECT node, count(*)::BIGINT AS degree FROM (
               SELECT a AS node FROM e UNION ALL SELECT b FROM e)
               GROUP BY 1)
             SELECT dg.node, degree,
               coalesce(triangles, 0)::BIGINT AS triangles,
               CASE WHEN degree >= 2 THEN
                 2.0 * coalesce(triangles, 0) / (degree * (degree - 1))
               END AS coeff
             FROM dg LEFT JOIN pn ON dg.node = pn.node
             ORDER BY dg.node""")),

    // ---- rendezvous (HRW) shard assignment ---------------------------------
    // argmax over per-shard md5 salts; the oracle takes the explode +
    // arg_max route to the same argmax — identical md5 preimages on
    // both sides, ties impossible
    QueryDef("q_rendezvous",
      (s, d) => graft.pipeline.Sampling.rendezvousShard(
          s.read.parquet(s"$d/supplier.parquet"), "s_suppkey",
          nShards = 8)
        .select(col("s_suppkey"), col("shard"))
        .orderBy("s_suppkey"),
      Some("""WITH x AS (SELECT s_suppkey, unnest(range(8)) AS sh
               FROM supplier),
             h AS (SELECT s_suppkey, sh,
               md5('graft:' || s_suppkey || ':' || sh) AS hh FROM x)
             SELECT s_suppkey, arg_max(sh, hh)::INT AS shard
             FROM h GROUP BY 1 ORDER BY 1""")),

    // ---- per-source concentration (Gini + Herfindahl) ----------------------
    // how unevenly character mass spreads across each source's docs; the
    // rank formulation of Gini is permutation-invariant over ties so the
    // window needs no tie column; sums carry engine ulps -> round(6)
    QueryDef("q_concentration",
      (s, d) => graft.agg.Stats.concentration(documents(s, d),
          Seq("source"), "n_chars")
        .select(col("source"), col("n"), col("total"),
          round(col("gini"), 6).as("gini"),
          round(col("hhi"), 6).as("hhi"))
        .orderBy("source"),
      Some("""WITH b AS (SELECT source, n_chars::DOUBLE AS x,
               row_number() OVER (PARTITION BY source ORDER BY n_chars)
                 AS i
               FROM documents
               WHERE source IS NOT NULL AND n_chars IS NOT NULL)
             SELECT source, count(*)::BIGINT AS n,
               sum(x) AS total,
               round((2.0 * sum(i * x) - (count(*) + 1) * sum(x)) /
                 (count(*) * nullif(sum(x), 0)), 6) AS gini,
               round(sum(x * x) / (nullif(sum(x), 0) * sum(x)), 6) AS hhi
             FROM b GROUP BY source ORDER BY source""")),

    // ---- ridge regression (closed-form, one distributed pass) -------------
    // two features + intercept, λ = 10 on the slopes only; the oracle
    // solves the SAME centered normal equations by Cramer's rule while
    // the engine runs Gaussian elimination — algebraically identical,
    // numerically within ulps, pinned under round(4)
    QueryDef("q_ridge",
      (s, d) => graft.ml.Regression.ridgeFit(lineitem(s, d),
          Seq("l_quantity", "l_discount"), "l_extendedprice",
          lambda = 10.0)
        .select(col("n"), round(col("intercept"), 4).as("intercept"),
          round(col("beta_l_quantity"), 4).as("beta_l_quantity"),
          round(col("beta_l_discount"), 4).as("beta_l_discount")),
      Some("""WITH b AS (SELECT l_quantity::DOUBLE AS x1,
               l_discount::DOUBLE AS x2, l_extendedprice::DOUBLE AS y
               FROM lineitem WHERE l_quantity IS NOT NULL
                 AND l_discount IS NOT NULL AND l_extendedprice IS NOT NULL),
             g AS (SELECT count(*)::BIGINT AS n, sum(x1) AS sx1,
               sum(x2) AS sx2, sum(y) AS sy, sum(x1*x1) AS s11,
               sum(x1*x2) AS s12, sum(x2*x2) AS s22, sum(x1*y) AS s1y,
               sum(x2*y) AS s2y FROM b),
             k AS (SELECT n, sx1/n AS m1, sx2/n AS m2, sy/n AS my,
               s11 - n*(sx1/n)*(sx1/n) + 10.0 AS g11,
               s12 - n*(sx1/n)*(sx2/n) AS g12,
               s22 - n*(sx2/n)*(sx2/n) + 10.0 AS g22,
               s1y - n*(sx1/n)*(sy/n) AS c1,
               s2y - n*(sx2/n)*(sy/n) AS c2 FROM g),
             k2 AS (SELECT n, m1, m2, my,
               (c1*g22 - c2*g12) / (g11*g22 - g12*g12) AS b1,
               (g11*c2 - g12*c1) / (g11*g22 - g12*g12) AS b2 FROM k)
             SELECT n, round(my - (b1*m1 + b2*m2), 4) AS intercept,
               round(b1, 4) AS beta_l_quantity,
               round(b2, 4) AS beta_l_discount
             FROM k2""")),

    // ---- Benford first-digit profile --------------------------------------
    // leading digit via the canonical decimal string (strip sign, point,
    // zeros) — exact in both engines; the double column is cast to
    // DECIMAL(12,2) first (no double is an exact .xx5 tie, so both
    // engines round identically)
    QueryDef("q_benford",
      (s, d) => Stats.benford(
          s.read.parquet(s"$d/customer.parquet")
            .withColumn("bal",
              col("c_acctbal").cast(
                org.apache.spark.sql.types.DataTypes.createDecimalType(12, 2))),
          "bal")
        .select(col("digit"), col("n"),
          round(col("observed_p"), 6).as("observed_p"),
          round(col("expected_p"), 6).as("expected_p"),
          round(col("chi2_term"), 6).as("chi2_term"))
        .orderBy("digit"),
      Some("""WITH v AS (SELECT substr(regexp_replace(
                 c_acctbal::DECIMAL(12,2)::VARCHAR, '[^1-9]', '', 'g'),
                 1, 1)::INT AS digit
               FROM customer
               WHERE c_acctbal IS NOT NULL AND c_acctbal != 0),
             c AS (SELECT digit, count(*)::BIGINT AS n FROM v GROUP BY 1),
             t AS (SELECT sum(n)::DOUBLE AS total FROM c)
             SELECT digit, n,
               round(n / total, 6) AS observed_p,
               round(log10(1 + 1.0/digit), 6) AS expected_p,
               round(total * (n/total - log10(1 + 1.0/digit)) *
                 (n/total - log10(1 + 1.0/digit)) /
                 log10(1 + 1.0/digit), 6) AS chi2_term
             FROM c, t ORDER BY digit""")),

    // ---- Spearman correlation (rank-transform + Pearson) -------------------
    QueryDef("q_corr_spearman",
      (s, d) => Stats.corrSpearman(lineitem(s, d),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .select(round(col("l_quantity__l_extendedprice"), 6).as("qty_price"),
          round(col("l_quantity__l_discount"), 6).as("qty_disc"),
          round(col("l_extendedprice__l_discount"), 6).as("price_disc")),
      Some("""WITH r AS (SELECT
               rank() OVER (ORDER BY l_quantity) +
                 (count(*) OVER (PARTITION BY l_quantity) - 1) / 2.0 AS rq,
               rank() OVER (ORDER BY l_extendedprice) +
                 (count(*) OVER (PARTITION BY l_extendedprice) - 1) / 2.0 AS rp,
               rank() OVER (ORDER BY l_discount) +
                 (count(*) OVER (PARTITION BY l_discount) - 1) / 2.0 AS rd
               FROM lineitem)
             SELECT round(corr(rq, rp), 6) AS qty_price,
               round(corr(rq, rd), 6) AS qty_disc,
               round(corr(rp, rd), 6) AS price_disc FROM r""")),

    // ---- KS test WITH p-value (hash-green via the shared series chain) ----
    // The commons-math exact Kolmogorov CDF has no DuckDB replay, so the
    // p-value emitted here is the ASYMPTOTIC Kolmogorov series
    //   p = 2 Σ_{j=1..100} (−1)^{j−1} exp(−2 j² z²),  z = √n · D
    // evaluated as the IDENTICAL literal op chain in BOTH engines (the
    // q_srm Wilson–Hilferty precedent): Spark folds it with
    // aggregate(sequence(...)), DuckDB with list_sum(list_transform(...)),
    // both from the engine's own UNROUNDED D — term-order and arithmetic
    // shape match, so round-6 compares exactly. The distributed machinery
    // under test is still ksTestMulti's one-sort multi-CDF sup fold. The
    // third row samples l_discount (n≈113 at sf0.01) so the p is
    // NON-trivial at the gate SF, not just the ≈0 of the full-table fits;
    // the JVM exact-CDF p (untestable here) is pinned against this same
    // series for large n inside StatTests.ksPValue.
    QueryDef("q_ks_test",
      (s, d) => {
        val spark = s
        import spark.implicits._
        val li = lineitem(s, d)
        val full = graft.stat.StatTests.ksTestMulti(li, "l_extendedprice",
          Seq(("exp30000", "exp", Seq(30000.0)),
            ("uniform", "uniform", Seq(0.0, 110000.0))))
        val nFull = li.filter(col("l_extendedprice").isNotNull).count()
        val samp = li.filter(col("l_orderkey") % 601 === 0)
        val sampKs = graft.stat.StatTests.ksTestMulti(samp, "l_discount",
          Seq(("uniform_disc_sample", "uniform", Seq(0.0, 0.1))))
        val nSamp = samp.filter(col("l_discount").isNotNull).count()
        val rows = full.map { case (l, r) => (l, r.statistic, nFull) } ++
          sampKs.map { case (l, r) => (l, r.statistic, nSamp) }
        rows.toDF("dist", "__stat", "n")
          .withColumn("__z", sqrt(col("n")) * col("__stat"))
          .select(col("dist"), col("n"),
            round(col("__stat"), 6).as("ks_stat"),
            round(least(lit(1.0), greatest(lit(0.0), lit(2.0) * expr(
              "aggregate(sequence(1, 100), cast(0.0 as double), (acc, j) " +
                "-> acc + (case when j % 2 = 1 then 1.0D else -1.0D end) " +
                "* exp(-2.0D * j * j * __z * __z))"))), 6).as("p_asym"))
          .orderBy("dist")
      },
      Some("""WITH s AS (SELECT l_extendedprice::DOUBLE AS v FROM lineitem
               WHERE l_extendedprice IS NOT NULL),
             r AS (SELECT v, (row_number() OVER (ORDER BY v))::DOUBLE AS i,
               (count(*) OVER ())::DOUBLE AS n FROM s),
             d AS (SELECT max(n)::BIGINT AS n,
               max(greatest(abs((1 - exp(-v / 30000.0)) - (i - 1) / n),
                 abs((1 - exp(-v / 30000.0)) - i / n))) AS exp_d,
               max(greatest(
                 abs(least(greatest(v / 110000.0, 0), 1) - (i - 1) / n),
                 abs(least(greatest(v / 110000.0, 0), 1) - i / n))) AS uni_d
               FROM r),
             s2 AS (SELECT l_discount::DOUBLE AS v FROM lineitem
               WHERE l_orderkey % 601 = 0 AND l_discount IS NOT NULL),
             r2 AS (SELECT v, (row_number() OVER (ORDER BY v))::DOUBLE AS i,
               (count(*) OVER ())::DOUBLE AS n FROM s2),
             d2 AS (SELECT max(n)::BIGINT AS n,
               max(greatest(
                 abs(least(greatest(v / 0.1, 0), 1) - (i - 1) / n),
                 abs(least(greatest(v / 0.1, 0), 1) - i / n))) AS uni_d
               FROM r2),
             raw AS (SELECT 'exp30000' AS dist, n, exp_d AS stat FROM d
               UNION ALL SELECT 'uniform', n, uni_d FROM d
               UNION ALL SELECT 'uniform_disc_sample', n, uni_d FROM d2),
             z AS (SELECT dist, n, stat, sqrt(n) * stat AS zz FROM raw)
             SELECT dist, n, round(stat, 6) AS ks_stat,
               round(least(1.0, greatest(0.0, 2.0 * list_sum(list_transform(
                 generate_series(1, 100), j ->
                 (CASE WHEN j % 2 = 1 THEN 1.0 ELSE -1.0 END) *
                 exp(-2.0 * j * j * zz * zz))))), 6) AS p_asym
             FROM z ORDER BY dist""")),

    // the full t-test matrix machinery runs (summaries → driver pairs →
    // commons-math p-values) but the driver row emits the SQL-expressible
    // Welch t statistic + degrees of freedom per pair — hash-green; the
    // p-value itself is pinned by StatEvalSpec against 2·(1 − T_df.cdf|t|).
    // Distinct column from q_welch (l_quantity vs l_extendedprice) so the
    // two rows don't collapse into one check.
    QueryDef("q_ttest_matrix",
      (s, d) => {
        val spark = s
        import spark.implicits._
        graft.stat.StatTests.tTestMatrixFull(lineitem(s, d), "l_quantity",
            Seq("l_returnflag"))
          .map { case (k1, k2, r) =>
            (k1.head.toString, k2.head.toString, r.tStat, r.df) }
          .toDF("g1", "g2", "t_stat", "welch_df")
          // round through functions.round — same half-up semantics as the
          // DuckDB oracle (and as q_welch)
          .select(col("g1"), col("g2"), round(col("t_stat"), 6).as("t_stat"),
            round(col("welch_df"), 4).as("welch_df"))
          .orderBy("g1", "g2")
      },
      Some("""WITH g AS (SELECT l_returnflag, avg(l_quantity) AS m,
               var_samp(l_quantity) AS v, count(*)::DOUBLE AS n
               FROM lineitem GROUP BY 1)
             SELECT a.l_returnflag AS g1, b.l_returnflag AS g2,
               round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 6) AS t_stat,
               round(pow(a.v / a.n + b.v / b.n, 2) /
                 (pow(a.v / a.n, 2) / (a.n - 1) + pow(b.v / b.n, 2) / (b.n - 1)), 4)
                 AS welch_df
             FROM g a, g b WHERE a.l_returnflag < b.l_returnflag
             ORDER BY g1, g2""")),

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

    // ---- Jaro-Winkler native expression (cross-engine scalar check) --------
    // each supplier name scored against its successor's name and a
    // char-dropped mutation of itself; the oracle is DuckDB's own
    // jaro_similarity / jaro_winkler_similarity — a genuine independent
    // implementation of the same standard, agreeing under round(6)
    QueryDef("q_jaro",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window.orderBy("s_suppkey")
        val sup = s.read.parquet(s"$d/supplier.parquet")
          .select(col("s_suppkey"), col("s_name"))
          .withColumn("next_name", lead("s_name", 1).over(w))
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
    // every 50th vector is the broadcast reference; the rest stream
    // through a broadcast-nested-loop + bins-bounded aggregate. Cosines
    // round to 6 decimals BEFORE binning so the bin edges replay across
    // engines; bin edges are the identical (-1 + 2·b/B) arithmetic
    QueryDef("q_cos_drift",
      (s, d) => {
        val e = embeddings(s, d)
        graft.pipeline.Similarity.cosineHistogram(
            e.filter(col("vec_id") % 50 =!= 0), "vec_id", "embedding",
            e.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
            bins = 20)
          .orderBy("bin")
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                 FROM embeddings),
             r AS (SELECT v FROM e WHERE vec_id % 50 = 0),
             c AS (SELECT v FROM e WHERE vec_id % 50 != 0),
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
          s"/tmp/graft_ingest/${new java.io.File(d).getName}/docs_jsonl"
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
          s"/tmp/graft_ingest/${new java.io.File(d).getName}/docs_jsonl_gz"
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
          s"/tmp/graft_ingest/${new java.io.File(d).getName}/docs_text"
        documents(s, d).select(col("text"))
          .write.mode("overwrite").text(path)
        val docs = graft.sources.Ingest.readTextDocs(s, path)
        val uniq = docs.agg((count(lit(1)) ===
          countDistinct(col("file"), col("offset"))).as("ids_unique"))
        docs.select("text").crossJoin(uniq).orderBy("text")
      },
      Some("""SELECT text, true AS ids_unique
             FROM documents ORDER BY text""")),

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
             ok AS (SELECT bi.b, bi.i FROM bi JOIN sz ON bi.b = sz.b
               WHERE sz.s <= 1000),
             pr AS (SELECT x.i AS item_a, y.i AS item_b,
               count(*)::BIGINT AS n_ab
               FROM ok x JOIN ok y ON x.b = y.b AND x.i < y.i
               GROUP BY 1, 2 HAVING count(*) >= 3),
             mg AS (SELECT i, count(*)::BIGINT AS c FROM bi GROUP BY 1)
             SELECT item_a, item_b, ma.c AS n_a, mb.c AS n_b, n_ab,
               nb.n::BIGINT AS n_baskets, ovs.o::BIGINT AS oversized_baskets,
               round(n_ab::DOUBLE / nb.n, 6) AS support,
               round(n_ab::DOUBLE / ma.c, 6) AS conf_a_b,
               round(n_ab::DOUBLE / mb.c, 6) AS conf_b_a,
               round(n_ab::DOUBLE * nb.n / (ma.c::DOUBLE * mb.c), 6) AS lift
             FROM pr JOIN mg ma ON pr.item_a = ma.i
               JOIN mg mb ON pr.item_b = mb.i, nb, ovs
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
        val path = java.nio.file.Files
          .createTempDirectory("graft-q-geoindex").toString
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
        val path = java.nio.file.Files
          .createTempDirectory("graft-q-geoappend").toString
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
             FROM r ORDER BY lambda"""))
  )

  // A duplicated QueryDef name silently SHADOWS the earlier row in the
  // Maps below (fn and oracle together, so the gate still "passes" while
  // a query vanishes) — fail loudly at first use instead (the round-11
  // q_ngram_novelty collision lesson).
  private lazy val nameGuard: Unit = {
    val dups = defs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate QueryDef names: ${dups.mkString(", ")}")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    nameGuard
    defs.map(q => q.name -> q.fn).toMap
  }
  /** Bench subset: everything except the gate-only verification rows. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] = {
    nameGuard
    defs.filterNot(_.gateOnly).map(q => q.name -> q.fn).toMap
  }
  def oracleSql: Map[String, String] = {
    nameGuard
    defs.flatMap(q => q.oracle.map(o => q.name -> o.linesIterator
      .map(_.trim).mkString(" "))).toMap
  }
}
