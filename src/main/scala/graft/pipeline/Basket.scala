package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining — pairwise rules with
  * support/confidence/lift over (basket, item) co-purchase data. The
  * rule layer [[graft.pipeline.Graph.coOccurrence]] stops short of:
  * shared-basket counts become the full A-priori pair contract
  * (support(a,b) = n_ab/N, confidence(a→b) = n_ab/n_a,
  * lift = N·n_ab/(n_a·n_b)), the signals a recommendation or
  * bundling pipeline actually thresholds on.
  *
  * Reference scope note: handyspark's stats tier stops at per-column
  * association (mutual information, correlations —
  * handyspark/stats.py); basket rules are an engine-tier extension in
  * the same spirit over transactional keys.
  *
  * Scale shape: one DISTINCT shuffle folds the input to unique
  * (basket, item) pairs; item marginals are one hash aggregate off
  * that frame; the pair counts come from a self-join keyed on the
  * basket — work is Σ_b k_b², bounded by `maxBasketSize` (baskets
  * above the cap are EXCLUDED from pairing, counted, and surfaced in
  * the `oversized_baskets` column, never silently — a handful of
  * degenerate mega-baskets would otherwise dominate the join; their
  * items still count toward marginals and N). Everything downstream of
  * the distinct runs on the folded frames; nothing re-scans the corpus.
  */
object Basket {

  /** Pairwise association rules. Output: one row per unordered item
    * pair (item_a < item_b) with joint basket count ≥ `minCount`:
    * (item_a, item_b, n_a, n_b, n_ab, n_baskets, oversized_baskets,
    * support, conf_a_b, conf_b_a, lift). Counts are exact longs;
    * support/confidence/lift are the standard ratios (float only at
    * the final division). `n_a`/`n_b`/`n_baskets` count over ALL
    * baskets (marginals are not subject to the pairing cap), but
    * `n_ab` excludes pairs inside baskets larger than `maxBasketSize`
    * — so when `oversized_baskets` > 0 the ratios built on n_ab
    * (support, confidence, lift) are LOWER BOUNDS on their all-basket
    * values, not exact; the `oversized_baskets` column makes the skip
    * visible so callers can raise the cap (or exact-dedup the
    * degenerate mega-baskets first) when bounds aren't enough. */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
                minCount: Long = 2, maxBasketSize: Int = 1000): DataFrame = {
    require(minCount >= 1, s"pairRules: minCount must be >= 1, got $minCount")
    require(maxBasketSize >= 2,
      s"pairRules: maxBasketSize must be >= 2, got $maxBasketSize")
    val bi = df.na.drop(Seq(basketCol, itemCol))
      .select(col(basketCol).as("__basket"), col(itemCol).as("__item"))
      .distinct()
      // marginals, sizes, and the pair join all read this cache; the
      // returned rule plan is lazy, so there is no sound in-method
      // unpersist point (Components lifetime note) — entry stays until
      // LRU eviction; looping callers can clearCache() between batches
      .persist()
    val nBaskets = bi.select("__basket").distinct().count()
    val sizes = bi.groupBy("__basket")
      .agg(count(lit(1)).as("__sz"))
    val oversized = sizes.filter(col("__sz") > maxBasketSize)
      .count()
    val pairable = bi.join(
      sizes.filter(col("__sz") <= maxBasketSize).select("__basket"),
      "__basket")
    val l = pairable.select(col("__basket"), col("__item").as("item_a"))
    val r = pairable.select(col("__basket"), col("__item").as("item_b"))
    val pairs = l.join(r, Seq("__basket"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    val marg = bi.groupBy("__item").agg(count(lit(1)).as("__cnt"))
    val withA = pairs.join(
      marg.select(col("__item").as("item_a"), col("__cnt").as("n_a")),
      "item_a")
    val withB = withA.join(
      marg.select(col("__item").as("item_b"), col("__cnt").as("n_b")),
      "item_b")
    withB
      .withColumn("n_baskets", lit(nBaskets))
      .withColumn("oversized_baskets", lit(oversized))
      .withColumn("support", col("n_ab").cast("double") / nBaskets)
      .withColumn("conf_a_b", col("n_ab").cast("double") / col("n_a"))
      .withColumn("conf_b_a", col("n_ab").cast("double") / col("n_b"))
      .withColumn("lift",
        col("n_ab").cast("double") * nBaskets /
          (col("n_a").cast("double") * col("n_b")))
      .select("item_a", "item_b", "n_a", "n_b", "n_ab", "n_baskets",
        "oversized_baskets", "support", "conf_a_b", "conf_b_a", "lift")
  }
}
