package graft.util

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The fuzzy/basket cache lifecycle (VERDICT r13 #2): a long-running
  * ingestion loop calling fuzzyPairs/pairRules per batch must NOT
  * accumulate storage without bound — the registry FIFO evicts beyond
  * `spark.graft.opCacheMax`, and clear() is the explicit hook. */
class CacheRegistrySpec extends SparkSpec {

  test("20 pairRules + fuzzyPairs batches keep persisted RDD count bounded") {
    val sc2 = spark
    import sc2.implicits._
    CacheRegistry.clear()
    val cap = spark.conf.get("spark.graft.opCacheMax", "16").toInt
    val baskets = Seq((1, "a"), (1, "b"), (2, "a"), (2, "b"), (2, "c"),
      (3, "b"), (3, "c")).toDF("basket", "item")
    val names = Seq((1L, "acme corp"), (2L, "acme corp."), (3L, "acme corp"),
      (4L, "zenith ltd"), (5L, "zenith ltd,")).toDF("id", "name")
    (1 to 10).foreach { _ =>
      graft.pipeline.Basket.pairRules(baskets, "basket", "item").count()
      graft.pipeline.FuzzyJoin.fuzzyPairs(names, "id", "name", maxDist = 2).count()
    }
    assert(CacheRegistry.size <= cap,
      s"registry grew past cap: ${CacheRegistry.size} > $cap")
    // the registry is the only storage these ops create, so persisted
    // RDDs must be bounded by it (other suites' caches may coexist in
    // the shared session — compare against a before/after baseline
    // instead of an absolute count)
    val persisted = spark.sparkContext.getPersistentRDDs.size
    graft.pipeline.Basket.pairRules(baskets, "basket", "item").count()
    graft.pipeline.FuzzyJoin.fuzzyPairs(names, "id", "name", maxDist = 2).count()
    val persistedAfter = spark.sparkContext.getPersistentRDDs.size
    assert(persistedAfter <= persisted + 1,
      s"two more batches grew storage ($persisted -> $persistedAfter): not bounded")
  }

  test("clear() unpersists everything registered") {
    val sc2 = spark
    import sc2.implicits._
    val df = Seq((1, "x")).toDF("basket", "item")
    graft.pipeline.Basket.pairRules(df, "basket", "item").count()
    assert(CacheRegistry.size > 0)
    CacheRegistry.clear()
    assert(CacheRegistry.size == 0)
  }

  test("eviction is safe: an evicted op output still materializes correctly") {
    val sc2 = spark
    import sc2.implicits._
    CacheRegistry.clear()
    spark.conf.set("spark.graft.opCacheMax", "2")
    try {
      val names = Seq((1L, "acme corp"), (2L, "acme corp."), (3L, "acme corp"))
        .toDF("id", "name")
      // build FIRST, evict its caches by running more batches, THEN
      // materialize — the plan must recompute, not fail or change output
      val pairs = graft.pipeline.FuzzyJoin.fuzzyPairs(names, "id", "name", 2)
      (1 to 3).foreach { _ =>
        graft.pipeline.FuzzyJoin.fuzzyPairs(names, "id", "name", 2).count()
      }
      val got = pairs.orderBy("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    } finally {
      spark.conf.set("spark.graft.opCacheMax", "16")
      CacheRegistry.clear()
    }
  }
}
