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
  * Scale shape (r13 rework — the r12 sf10d probe measured the old
  * sizes-join + basket self-join at 40× for 100× data): one DISTINCT
  * shuffle folds the input to unique (basket, item) pairs; ONE hash
  * aggregate per basket collects the (sorted) item array together with
  * the basket's full size — the former sizes aggregate, the
  * sizes⋈items join, and the basket self-join are all fused into that
  * single shuffle, and pair generation is a local generator chain
  * (posexplode + slice) feeding straight into the pair-count partial
  * aggregate. Work downstream of the distinct is Σ_b k_b², bounded by
  * `maxBasketSize` (baskets above the cap are EXCLUDED from pairing,
  * counted, and surfaced in the `oversized_baskets` column, never
  * silently — a handful of degenerate mega-baskets would otherwise
  * dominate the explode; their items still count toward marginals and
  * N).
  *
  * Two item-level prunes run BEFORE the pair explode:
  *
  *  - A-PRIORI MIN-SUPPORT PRUNE (always on, output-invariant): a pair
  *    can only reach `n_ab ≥ minCount` if BOTH item marginals are
  *    ≥ minCount (n_ab ≤ min(n_a, n_b) — the downward-closure
  *    property), so items with an all-basket marginal below `minCount`
  *    are dropped from the pairable arrays. This is a theorem, not a
  *    heuristic: the emitted rule set is bit-identical with the prune
  *    on or off (BasketSpec pins it). On long-tail corpora (documents
  *    × vocabulary) it is the difference between Σk² over raw basket
  *    sizes and Σk² over frequent-item counts. The prune is skipped
  *    entirely (no extra join) when the marginal table shows nothing
  *    prunable.
  *  - HEAD-ITEM STOP-LIST (`maxItemDf`, optional, output-CHANGING):
  *    items appearing in more than `maxItemDf` baskets are excluded
  *    from pairing — the q_ngram_stoplist precedent for corpora whose
  *    head items co-occur with everything and pay k² per basket while
  *    carrying no signal (lift ≈ 1 by construction). The number of
  *    stop-listed items is surfaced in the `excluded_items` column
  *    (0 when the stop-list is off). Rules among the SURVIVING items
  *    are exact — dropping an item never changes another pair's
  *    co-occurrence count — and marginals/N still count all items.
  */
object Basket {

  /** Pairwise association rules. Output: one row per unordered item
    * pair (item_a < item_b) with joint basket count ≥ `minCount`:
    * (item_a, item_b, n_a, n_b, n_ab, n_baskets, oversized_baskets,
    * excluded_items, support, conf_a_b, conf_b_a, lift). Counts are
    * exact longs; support/confidence/lift are the standard ratios
    * (float only at the final division). `n_a`/`n_b`/`n_baskets` count
    * over ALL baskets (marginals are not subject to the pairing cap or
    * the stop-list), but `n_ab` excludes pairs inside baskets larger
    * than `maxBasketSize` — so when `oversized_baskets` > 0 the ratios
    * built on n_ab (support, confidence, lift) are LOWER BOUNDS on
    * their all-basket values, not exact; the `oversized_baskets`
    * column makes the skip visible so callers can raise the cap (or
    * exact-dedup the degenerate mega-baskets first) when bounds aren't
    * enough. `excluded_items` counts items stop-listed by `maxItemDf`
    * (their pairs are absent; surviving pairs are exact). */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
                minCount: Long = 2, maxBasketSize: Int = 1000,
                maxItemDf: Long = Long.MaxValue): DataFrame = {
    require(minCount >= 1, s"pairRules: minCount must be >= 1, got $minCount")
    require(maxBasketSize >= 2,
      s"pairRules: maxBasketSize must be >= 2, got $maxBasketSize")
    require(maxItemDf >= 1,
      s"pairRules: maxItemDf must be >= 1, got $maxItemDf")
    val bi = df.na.drop(Seq(basketCol, itemCol))
      .select(col(basketCol).as("__basket"), col(itemCol).as("__item"))
      .distinct()
      // marginals and the basket aggregate both read this cache; the
      // returned rule plan is lazy, so there is no sound in-method
      // unpersist point (Components lifetime note) — lifecycle is the
      // bounded CacheRegistry FIFO; looping callers can also
      // CacheRegistry.clear() between batches
      .transform(graft.util.CacheRegistry.cached("basket.bi", _))
    // all-basket marginals (df of each item) — drive both the A-priori
    // prune decision and the final n_a/n_b joins
    val marg = graft.util.CacheRegistry.cached("basket.marg",
      bi.groupBy("__item").agg(count(lit(1)).as("__cnt")))
    val excludedItems =
      if (maxItemDf == Long.MaxValue) 0L
      else marg.filter(col("__cnt") > maxItemDf).count()
    val prunable =
      if (minCount <= 1 && maxItemDf == Long.MaxValue) 0L
      else marg.filter(col("__cnt") < minCount ||
        col("__cnt") > maxItemDf).count()
    // __k = item survives both prunes; the keep-join only exists when
    // something is actually prunable (the common all-frequent case pays
    // zero extra shuffles — the A-priori prune is free until it bites)
    val biKeyed =
      if (prunable == 0L) bi.withColumn("__k", lit(true))
      else bi.join(
        marg.filter(col("__cnt") >= minCount && col("__cnt") <= maxItemDf)
          .select(col("__item"), lit(true).as("__k")),
        Seq("__item"), "left")
        .withColumn("__k", coalesce(col("__k"), lit(false)))
    // ONE aggregate carries both the basket's FULL size (__sz — the
    // oversized test must see pre-prune sizes, or pruning could shrink
    // an over-cap basket under the cap and CHANGE the output) and the
    // sorted survivor array (collect_list drops the nulls the when()
    // assigns to pruned items). sort_array's ascending order is the
    // same total order as Spark's `<`, so emitting (items[i], items[j])
    // with i < j reproduces the item_a < item_b contract exactly.
    val basketAgg = biKeyed.groupBy("__basket")
      .agg(count(lit(1)).as("__sz"),
        sort_array(collect_list(when(col("__k"), col("__item"))))
          .as("__items"))
      .transform(graft.util.CacheRegistry.cached("basket.basketAgg", _))
    val nBaskets = basketAgg.count()
    val oversized = basketAgg.filter(col("__sz") > maxBasketSize).count()
    // local pair generation: for each survivor array, item i pairs with
    // every later item — posexplode + slice stay in whole-stage codegen
    // and stream straight into the pair-count partial aggregate (no
    // self-join, no second shuffle of the corpus)
    val pairs = basketAgg
      .filter(col("__sz") <= maxBasketSize && size(col("__items")) >= 2)
      .select(posexplode(col("__items")).as(Seq("__i", "item_a")),
        col("__items"))
      .select(col("item_a"),
        explode(slice(col("__items"), col("__i") + lit(2),
          size(col("__items")))).as("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    val withA = pairs.join(
      marg.select(col("__item").as("item_a"), col("__cnt").as("n_a")),
      "item_a")
    val withB = withA.join(
      marg.select(col("__item").as("item_b"), col("__cnt").as("n_b")),
      "item_b")
    withB
      .withColumn("n_baskets", lit(nBaskets))
      .withColumn("oversized_baskets", lit(oversized))
      .withColumn("excluded_items", lit(excludedItems))
      .withColumn("support", col("n_ab").cast("double") / nBaskets)
      .withColumn("conf_a_b", col("n_ab").cast("double") / col("n_a"))
      .withColumn("conf_b_a", col("n_ab").cast("double") / col("n_b"))
      .withColumn("lift",
        col("n_ab").cast("double") * nBaskets /
          (col("n_a").cast("double") * col("n_b")))
      .select("item_a", "item_b", "n_a", "n_b", "n_ab", "n_baskets",
        "oversized_baskets", "excluded_items", "support", "conf_a_b",
        "conf_b_a", "lift")
  }
}
