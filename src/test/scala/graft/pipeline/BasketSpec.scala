package graft.pipeline

import graft.SparkSpec

class BasketSpec extends SparkSpec {

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
    assert(math.abs(mb.getDouble(7) - 0.5) < 1e-12)           // support
    assert(math.abs(mb.getDouble(8) - 2.0 / 3) < 1e-12)       // conf a->b
    assert(math.abs(mb.getDouble(9) - 2.0 / 3) < 1e-12)       // conf b->a
    assert(math.abs(mb.getDouble(10) - 2.0 * 4 / 9) < 1e-12)  // lift
    val be = rules(("bread", "eggs"))
    assert(be.getLong(4) == 1L)
    assert(math.abs(be.getDouble(10) - 1.0 * 4 / (3 * 2)) < 1e-12)
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
  }
}
