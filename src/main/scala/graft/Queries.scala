package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.agg.Stats

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
    oracle: Option[String])

object Queries {

  private def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
  private def orders(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")
  private def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
  private def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")

  val defs: Seq[QueryDef] = Seq(

    // ---- shape / counts --------------------------------------------------
    QueryDef("q_shape",
      (s, d) => lineitem(s, d).agg(count(lit(1)).as("n_rows")),
      Some("SELECT count(*) AS n_rows FROM lineitem")),

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

    // ---- entropy / mutual information ------------------------------------
    QueryDef("q_entropy",
      (s, d) => Stats.entropy(lineitem(s, d), "l_returnflag")
        .select(round(col("l_returnflag_entropy"), 6).as("entropy")),
      Some("""SELECT round(sum(-log2(p) * p), 6) AS entropy FROM (
               SELECT count(*) / (SELECT count(*)::DOUBLE FROM lineitem
                 WHERE l_returnflag IS NOT NULL) AS p
               FROM lineitem WHERE l_returnflag IS NOT NULL
               GROUP BY l_returnflag)""")),

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
             FROM lineitem"""))
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(o => q.name -> o.linesIterator
      .map(_.trim).mkString(" "))).toMap
}
