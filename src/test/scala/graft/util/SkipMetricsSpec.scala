package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Every bounded-cap skip site surfaces its dropped work through
  * [[SkipMetrics]] (r11 VERDICT silent-cap audit): this spec drives each
  * wired operator over its cap and asserts the counter fires — and stays
  * zero when nothing is dropped. */
class SkipMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("simhashPairsFromSig over-cap bucket fires simhash.skippedBuckets " +
      "(zero when under cap)") {
    // 20 identical signatures -> every chunk bucket holds 20 rows
    val sigs = (1L to 20L).map(i => (i, 0x0F0FL)).toDF("id", "sig")
    SkipMetrics.reset("simhash.skippedBuckets")
    graft.pipeline.Dedup.simhashPairsFromSig(sigs, maxHamming = 3,
      maxBucket = 10, chunks = 4).count()
    assert(SkipMetrics.value("simhash.skippedBuckets") > 0L)
    SkipMetrics.reset("simhash.skippedBuckets")
    graft.pipeline.Dedup.simhashPairsFromSig(sigs, maxHamming = 3,
      maxBucket = 100, chunks = 4).count()
    assert(SkipMetrics.value("simhash.skippedBuckets") === 0L)
  }

  test("fuzzyPairs over-cap posting list fires " +
      "fuzzyPairs.skippedPostingLists") {
    // DISTINCT strings (identical ones would be pre-collapsed to one rep
    // before the posting stage — the r13 fuzzy dedup fix) sharing a long
    // common part: the common grams have df 30, the two tail grams df
    // ~1, so every prefix keeps both tail grams plus the SAME lowest-
    // (gram, ord) common gram — a 30-row posting list, over cap 5
    val names = (1L to 30L).map(i => (i,
        s"shared-prefix-nm${('a' + (i % 26)).toChar}${('a' + (i / 26)).toChar}"))
      .toDF("id", "name")
    SkipMetrics.reset("fuzzyPairs.skippedPostingLists")
    graft.pipeline.FuzzyJoin.fuzzyPairs(names, "id", "name",
      maxDist = 1, maxPostingList = 5).count()
    assert(SkipMetrics.value("fuzzyPairs.skippedPostingLists") > 0L)
  }

  test("posting-list pair generation cap fires " +
      "pairsByKey.skippedPostingLists (and only for over-cap keys)") {
    // key 1 holds 25 ids (over cap 5, skipped); key 2 holds 3 (kept)
    val keyed = ((1L to 25L).map(i => (1L, i)) ++
      (1L to 3L).map(i => (2L, 100L + i))).toDS()
    SkipMetrics.reset("pairsByKey.skippedPostingLists")
    val pairs = graft.pipeline.Dedup.pairsByKey(keyed, maxPostingList = 5)
    assert(pairs.count() === 3L) // C(3,2) from the kept key only
    assert(SkipMetrics.value("pairsByKey.skippedPostingLists") === 1L)
  }

  test("coOccurrence over-cap vertex fires coOccurrence.skippedVertices") {
    val edges = (1L to 20L).map(i => (100L, i)).toDF("src", "dst")
    SkipMetrics.reset("coOccurrence.skippedVertices")
    graft.pipeline.Graph.coOccurrence(edges, "src", "dst",
      maxDegree = 5).count()
    assert(SkipMetrics.value("coOccurrence.skippedVertices") === 1L)
  }

  test("embeddingDedup over-cap LSH bucket fires " +
      "embeddingLsh.skippedBuckets; knnGraph fires its own") {
    // 30 near-identical vectors land in one bucket per table
    val vecs = (1L to 30L).map(i =>
      (i, Array(1.0f, 0.001f * i))).toDF("id", "vec")
    SkipMetrics.reset("embeddingLsh.skippedBuckets")
    graft.pipeline.Dedup.embeddingDedup(vecs, "id", "vec", dim = 2,
      threshold = 0.9, bits = 2, maxBucket = 10).count()
    assert(SkipMetrics.value("embeddingLsh.skippedBuckets") > 0L)
    SkipMetrics.reset("knnGraph.skippedBuckets")
    graft.pipeline.Similarity.knnGraph(vecs, "id", "vec", dim = 2,
      k = 3, bits = 2, tables = 1, maxBucket = 10).count()
    assert(SkipMetrics.value("knnGraph.skippedBuckets") > 0L)
  }

  test("semDedup over-cap cluster fires semDedup.skippedClusters") {
    val vecs = (1L to 40L).map(i =>
      (i, Array(1.0f, 0.001f * i))).toDF("id", "vec")
    SkipMetrics.reset("semDedup.skippedClusters")
    graft.pipeline.Clustering.semDedup(vecs, "id", "vec", k = 1,
      threshold = 0.9, maxCluster = 10).count()
    assert(SkipMetrics.value("semDedup.skippedClusters") > 0L)
  }

  test("refuse guards increment <op>.refused before throwing (r13 #8)") {
    val vecs = (1L to 50L).map(i =>
      (i, Array(1.0f, 0.001f * i))).toDF("id", "vec")
    SkipMetrics.reset("allPairsCosine.refused")
    intercept[IllegalArgumentException](graft.pipeline.Similarity
      .allPairsCosine(vecs, "id", "vec", threshold = 0.9, maxRows = 10))
    assert(SkipMetrics.value("allPairsCosine.refused") === 1L)
    SkipMetrics.reset("knnGraphExact.refused")
    intercept[IllegalArgumentException](graft.pipeline.Similarity
      .knnGraphExact(vecs, "id", "vec", k = 3, maxRows = 10))
    assert(SkipMetrics.value("knnGraphExact.refused") === 1L)
    SkipMetrics.reset("ngramJaccard.refused")
    val docs = (1L to 40L).map(i => (i, "the same tokens in every doc"))
      .toDF("id", "text")
    intercept[IllegalArgumentException](graft.pipeline.Dedup
      .ngramJaccard(docs, "id", "text", n = 3, maxPairMass = 5L).count())
    assert(SkipMetrics.value("ngramJaccard.refused") === 1L)
    // a refuse shows in the end-of-run damage report
    assert(SkipMetrics.nonZero().contains("ngramJaccard.refused"))
  }

  test("nonZero lists only fired counters; unknown names read 0") {
    assert(SkipMetrics.value("never.created") === 0L)
    SkipMetrics.reset("simhash.skippedBuckets")
    val nz = SkipMetrics.nonZero()
    assert(!nz.contains("simhash.skippedBuckets"))
  }
}
