package graft.pipeline

import graft.SparkSpec

class BasketSpec extends SparkSpec {

  // output columns: 0 item_a, 1 item_b, 2 n_a, 3 n_b, 4 n_ab, 5 n_baskets,
  // 6 oversized_baskets, 7 excluded_items, 8 support, 9 conf_a_b,
  // 10 conf_b_a, 11 lift

  test("pairRules computes exact support/confidence/lift on a known corpus") {
    import spark.implicits._
    // 4 baskets: {m,b}, {m,b,e}, {m,e}, {b} — milk/bread/eggs classic
    val df = Seq(
      (1, "milk"), (1, "bread"),
      (2, "milk"), (2, "bread"), (2, "eggs"),
      (3, "milk"), (3, "eggs"),
      (4, "bread")).toDF("basket", "item")
    val rules = Basket.pairRules(df, "basket", "item", minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(rules.size == 3)
    val mb = rules(("bread", "milk")) // item_a < item_b lexically
    assert(mb.getLong(2) == 3L && mb.getLong(3) == 3L)        // n_a, n_b
    assert(mb.getLong(4) == 2L && mb.getLong(5) == 4L)        // n_ab, N
    assert(mb.getLong(7) == 0L)                               // no stop-list
    assert(math.abs(mb.getDouble(8) - 0.5) < 1e-12)           // support
    assert(math.abs(mb.getDouble(9) - 2.0 / 3) < 1e-12)       // conf a->b
    assert(math.abs(mb.getDouble(10) - 2.0 / 3) < 1e-12)      // conf b->a
    assert(math.abs(mb.getDouble(11) - 2.0 * 4 / 9) < 1e-12)  // lift
    val be = rules(("bread", "eggs"))
    assert(be.getLong(4) == 1L)
    assert(math.abs(be.getDouble(11) - 1.0 * 4 / (3 * 2)) < 1e-12)
  }

  test("pairRules deduplicates repeated (basket, item) rows before counting") {
    import spark.implicits._
    val df = Seq((1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b"))
      .toDF("basket", "item")
    val r = Basket.pairRules(df, "basket", "item", minCount = 1).collect()
    assert(r.length == 1)
    assert(r(0).getLong(4) == 2L) // both baskets pair (a, b) exactly once
    assert(r(0).getLong(2) == 2L && r(0).getLong(3) == 2L)
  }

  test("oversized baskets are excluded from pairing but kept in marginals") {
    import spark.implicits._
    // basket 1 has 4 items (over cap 3) — its pairs must not appear,
    // but its items still count in n_a/n_b and N
    val df = (Seq("w", "x", "y", "z").map((1, _)) ++
      Seq((2, "w"), (2, "x"))).toDF("basket", "item")
    val r = Basket.pairRules(df, "basket", "item",
      minCount = 1, maxBasketSize = 3).collect()
    assert(r.length == 1) // only basket 2's (w, x)
    val wx = r(0)
    assert(wx.getString(0) == "w" && wx.getString(1) == "x")
    assert(wx.getLong(4) == 1L)                  // joint from basket 2 only
    assert(wx.getLong(2) == 2L && wx.getLong(3) == 2L) // marginals keep b1
    assert(wx.getLong(5) == 2L)                  // N counts both baskets
    assert(wx.getLong(6) == 1L)                  // oversized surfaced
  }

  test("minCount filters low-support pairs; guards reject bad params") {
    import spark.implicits._
    val df = Seq((1, "a"), (1, "b"), (2, "a"), (2, "c")).toDF("b", "i")
    assert(Basket.pairRules(df, "b", "i", minCount = 2).count() == 0)
    intercept[IllegalArgumentException] {
      Basket.pairRules(df, "b", "i", minCount = 0)
    }
    intercept[IllegalArgumentException] {
      Basket.pairRules(df, "b", "i", maxBasketSize = 1)
    }
    intercept[IllegalArgumentException] {
      Basket.pairRules(df, "b", "i", maxItemDf = 0)
    }
  }

  test("A-priori prune is output-invariant (the downward-closure theorem)") {
    import spark.implicits._
    // long-tail corpus: items t1..t6 appear once each (prunable at
    // minCount=2), h/g co-occur across baskets. The pruned run
    // (minCount=2 drops the singletons BEFORE pairing) must emit exactly
    // the unpruned run (minCount=1 prunes nothing) filtered to
    // n_ab >= 2 — bit-identical rows, the theorem the prune rests on.
    val df = Seq(
      (1, "h"), (1, "g"), (1, "t1"), (1, "t2"),
      (2, "h"), (2, "g"), (2, "t3"), (2, "t4"),
      (3, "h"), (3, "g"), (3, "t5"),
      (4, "h"), (4, "t6")).toDF("basket", "item")
    val pruned = Basket.pairRules(df, "basket", "item", minCount = 2)
      .orderBy("item_a", "item_b").collect().toSeq
    val unpruned = Basket.pairRules(df, "basket", "item", minCount = 1)
      .filter("n_ab >= 2").orderBy("item_a", "item_b").collect().toSeq
    assert(pruned == unpruned)
    assert(pruned.nonEmpty) // (g, h) with n_ab = 3 survives
    assert(pruned.head.getLong(7) == 0L) // prune is not a stop-list skip
  }

  test("maxItemDf stop-lists head items; surviving pairs stay exact") {
    import spark.implicits._
    // 'hub' is in all 4 baskets (df 4 > cap 3) — its pairs vanish and
    // excluded_items = 1; (a, b) co-occur in baskets 1, 2 and their
    // counts/marginals are unchanged by the exclusion of hub
    val df = Seq(
      (1, "hub"), (1, "a"), (1, "b"),
      (2, "hub"), (2, "a"), (2, "b"),
      (3, "hub"), (3, "a"),
      (4, "hub"), (4, "b")).toDF("basket", "item")
    val r = Basket.pairRules(df, "basket", "item", minCount = 1,
      maxItemDf = 3).collect()
    assert(r.length == 1)
    val ab = r(0)
    assert(ab.getString(0) == "a" && ab.getString(1) == "b")
    assert(ab.getLong(4) == 2L)                  // n_ab exact
    assert(ab.getLong(2) == 3L && ab.getLong(3) == 3L) // marginals keep hub rows' baskets
    assert(ab.getLong(7) == 1L)                  // stop-listed count surfaced
  }
}
