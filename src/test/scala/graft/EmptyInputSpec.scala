package graft

import org.apache.spark.sql.functions._

/** Degenerate-input sweep: every major operator must tolerate an EMPTY
  * frame without crashing (empty result or null-aggregate row — never an
  * exception). Empty inputs are routine at scale: a filter that matches
  * nothing, a new partition, a stratum about to appear. */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emptyNum = spark.emptyDataset[(String, Double, Double)]
    .toDF("g", "x", "y")
  private lazy val emptyDocs = spark.emptyDataset[(Long, String)]
    .toDF("doc_id", "text")
  private lazy val emptyVecs = spark.emptyDataset[(Long, Seq[Double])]
    .toDF("vec_id", "embedding")

  test("aggregation surface tolerates empty input") {
    assert(graft.agg.Stats.describe(emptyNum, Seq("x", "y")).count() == 1)
    assert(graft.agg.Stats.valueCounts(emptyNum, Seq("g")).count() == 0)
    assert(graft.agg.Stats.mode(emptyNum, "g").count() == 0)
    assert(graft.agg.Stats.entropy(emptyNum, "g").count() == 1)
    assert(graft.agg.Stats.entropy(emptyNum, "g", Seq("g")).count() == 0)
    assert(graft.agg.Stats.mutualInfo(emptyNum, "g", "x").count() == 1)
    assert(graft.agg.Stats.mutualInfoMatrix(emptyNum, Seq("g", "x")).isEmpty)
    assert(graft.agg.Stats.nuniqueExact(emptyNum, Seq("g")).head().getLong(0) == 0)
    assert(graft.agg.Stats.isNull(emptyNum, Seq("x")).head().getLong(0) == 0)
    val p = graft.agg.Stats.percentileExact(emptyNum, Seq("x"), Seq(0.5)).head()
    assert(p.isNullAt(0)) // no data → null percentile
  }

  test("clean/fill/fence surface tolerates empty input") {
    val hf = graft.core.HandyFrame(emptyNum)
    val filled = graft.clean.Clean.fill(hf, graft.clean.Clean.Mean, Seq("x"))
    assert(filled.df.count() == 0)
    val fences = graft.clean.Clean.calcFences(emptyNum, Seq("x"))
    assert(fences.count() == 1) // null fences row
    assert(graft.clean.Clean.outlierCounts(emptyNum, Seq("x")).count() == 1)
  }

  test("dedup/similarity surface tolerates empty input") {
    assert(graft.pipeline.Dedup.exact(emptyDocs, "doc_id", "text").count() == 0)
    assert(graft.pipeline.Dedup.minhashDedup(
      emptyDocs, "doc_id", "text").count() == 0)
    assert(graft.pipeline.Dedup.ngramJaccard(
      emptyDocs, "doc_id", "text", 3, maxDf = 5).count() == 0)
    assert(graft.pipeline.Dedup.simhashDedup(
      emptyDocs, "doc_id", "text").count() == 0)
    assert(graft.pipeline.Dedup.embeddingDedup(
      emptyVecs, "vec_id", "embedding", dim = 4, tables = 2).count() == 0)
    assert(graft.pipeline.Similarity.allPairsCosine(
      emptyVecs, "vec_id", "embedding", 0.5).count() == 0)
    assert(graft.pipeline.Similarity.bruteForceTopK(
      emptyVecs, "vec_id", "embedding", Array(1.0, 0.0, 0.0, 0.0), 5)
      .count() == 0)
    assert(graft.pipeline.Similarity.topKJoin(
      emptyVecs, emptyVecs, "vec_id", "embedding", 5).count() == 0)
  }

  test("text/sampling/eval surface tolerates empty input") {
    assert(graft.pipeline.TextAnalysis.analyze(emptyDocs, "text").count() == 0)
    assert(graft.pipeline.TextAnalysis.vocabulary(
      emptyDocs, "doc_id", "text").count() == 0)
    assert(graft.pipeline.Sampling.hashSample(
      emptyDocs, "doc_id", 0.5).count() == 0)
    assert(graft.pipeline.Sampling.trainTestSplit(
      emptyDocs, "doc_id", 0.1, 0.1).count() == 0)
    val scored = spark.emptyDataset[(Double, Double)].toDF("score", "label")
    assert(graft.eval.BinaryMetrics.curveData(scored, "score", "label")
      .count() == 0)
    val aucRow = graft.eval.BinaryMetrics.auc(scored, "score", "label").head()
    assert(aucRow.getDouble(0).isNaN && aucRow.getDouble(1).isNaN) // 0/0
    assert(graft.eval.BinaryMetrics.confusionMatrix(
      scored, "score", "label", 0.5).count() == 1)
  }

  test("round-6 additions tolerate empty input") {
    // corpus diagnostics
    val z = graft.pipeline.TextAnalysis.zipfFit(emptyDocs, "doc_id", "text").head()
    assert(z.getLong(3) == 0L && z.getDouble(0).isNaN) // no vocab → NaN fit
    val docsWithSource = spark.emptyDataset[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    assert(graft.pipeline.Dedup.dedupReport(
      docsWithSource, "text", "source").count() == 0)
    assert(graft.pipeline.TextAnalysis.ngramNovelty(
      emptyDocs, "doc_id", "text", 3).count() == 0)
    // sampling / sketch contracts
    assert(graft.pipeline.Sampling.temperatureSample(
      docsWithSource, "doc_id", "source", alpha = 0.5, scale = 0.1)
      .count() == 0)
    assert(graft.agg.Stats.nuniqueCheck(emptyNum, Seq("g", "x"))
      .head().getLong(0) == 0)
    val pc = graft.agg.Stats.percentileApproxCheck(
      emptyNum, Seq("x"), Seq(0.5)).head()
    assert(pc.isNullAt(0)) // no data → null exact percentile
    // incremental dedup: empty corpus keeps every batch row; empty batch
    // stays empty
    val batch = Seq((1L, 10L), (2L, 20L)).toDF("id", "key")
    val emptyKeys = spark.emptyDataset[(Long, Long)].toDF("id", "key")
    assert(graft.pipeline.Dedup.bloomNewRows(
      batch, emptyKeys, "key", expectedItems = 10L).count() == 2)
    assert(graft.pipeline.Dedup.bloomNewRows(
      emptyKeys, batch, "key", expectedItems = 10L).count() == 0)
    // eval curve accessors
    val scored = spark.emptyDataset[(Double, Double)].toDF("score", "label")
    assert(graft.eval.BinaryMetrics.thresholds(
      scored, "score", "label").count() == 0)
    assert(graft.eval.BinaryMetrics.fMeasureByThreshold(
      scored, "score", "label").count() == 0)
    // cross-source overlap on empty input
    assert(graft.pipeline.Dedup.groupOverlap(
      docsWithSource, "source", "text").count() == 0)
    // incremental semantic screen: empty corpus flags nothing, keeps all
    val b = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val emptyV = spark.emptyDataset[(Long, Seq[Double])]
      .toDF("vec_id", "embedding")
    assert(graft.pipeline.Dedup.embeddingDedupAgainst(
      b, emptyV, "vec_id", "embedding", dim = 2).count() == 0)
    assert(graft.pipeline.Dedup.nearNewRows(
      b, emptyV, "vec_id", "embedding", dim = 2).count() == 2)
    assert(graft.pipeline.Dedup.nearNewRows(
      emptyV, b, "vec_id", "embedding", dim = 2).count() == 0)
    // profile-driven sampler: empty profile -> no share -> all dropped
    val stream = Seq((1L, "web")).toDF("doc_id", "source")
    assert(graft.pipeline.Sampling.temperatureSampleWith(
      stream, docsWithSource, "doc_id", "source",
      alpha = 0.5, scale = 0.5).count() == 0)
  }

  test("round-7 additions tolerate empty input") {
    import spark.implicits._
    // incremental text screen: empty corpus flags nothing, keeps all;
    // empty batch stays empty
    val batchDocs = Seq((1L, "alpha beta gamma"), (2L, "delta eps zeta"))
      .toDF("doc_id", "text")
    assert(graft.pipeline.Dedup.minhashDedupAgainst(
      batchDocs, emptyDocs, "doc_id", "text").count() == 0)
    assert(graft.pipeline.Dedup.textNewRows(
      batchDocs, emptyDocs, "doc_id", "text").count() == 2)
    assert(graft.pipeline.Dedup.textNewRows(
      emptyDocs, batchDocs, "doc_id", "text").count() == 0)
    // full t-test result on a single group: no pairs, empty matrix
    val oneGroup = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    assert(graft.stat.StatTests.tTestMatrixFull(oneGroup, "v", Seq("g")).isEmpty)
    // tokenizer edge inputs
    assert(graft.pipeline.TextAnalysis.fastTokens("").isEmpty)
    assert(graft.pipeline.TextAnalysis.fastTokens(" \t\n ").isEmpty)
  }

  test("round-9 additions tolerate empty input") {
    import spark.implicits._
    assert(graft.pipeline.Dedup.normalizedDedup(
      emptyDocs, "doc_id", "text").count() == 0)
    assert(graft.pipeline.Dedup.substringDedup(
      emptyDocs, "doc_id", "text", minTokens = 3).count() == 0)
    val scored = spark.emptyDataset[(Long, String, Double)]
      .toDF("doc_id", "text", "score")
    assert(graft.pipeline.Dedup.exactKeepBest(
      scored, "doc_id", "text", "score").count() == 0)
    assert(graft.pipeline.Dedup.normalizedKeepBest(
      scored, "doc_id", "text", "score").count() == 0)
    // keepBest with an empty PAIR graph: every row is its own component
    val docs3 = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "score")
    val emptyPairs = spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b")
    assert(graft.pipeline.Dedup.nearDedupKeepBest(
      docs3, "id", emptyPairs, "score").count() == 2)
    // kNN graph: empty corpus (both tiers), k larger than the corpus
    assert(graft.pipeline.Similarity.knnGraphExact(
      emptyVecs, "vec_id", "embedding", k = 3).count() == 0)
    assert(graft.pipeline.Similarity.knnGraph(
      emptyVecs, "vec_id", "embedding", dim = 4, k = 3).count() == 0)
    val twoVecs = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)))
      .toDF("vec_id", "embedding")
    assert(graft.pipeline.Similarity.knnGraphExact(
      twoVecs, "vec_id", "embedding", k = 5).count() == 2) // 1 neighbor each
    // persisted indexes: empty corpus round-trips through parquet (the
    // empty write still carries the schema), and an empty batch screens
    // to an empty result against a real index
    val tPath = java.nio.file.Files
      .createTempDirectory("graft-empty-tidx").toString
    graft.pipeline.TextIndex.write(emptyDocs, "doc_id", "text", tPath)
    val batch2 = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    assert(graft.pipeline.TextIndex.dedupAgainst(
      batch2, "doc_id", "text", tPath).count() == 0)
    assert(graft.pipeline.TextIndex.newRows(
      batch2, "doc_id", "text", tPath).count() == 1)
    val vPath = java.nio.file.Files
      .createTempDirectory("graft-empty-vidx").toString
    graft.pipeline.VecIndex.write(
      twoVecs, "vec_id", "embedding", dim = 2, vPath, bits = 2)
    assert(graft.pipeline.VecIndex.dedupAgainst(
      emptyVecs.select(col("vec_id"), col("embedding")), "vec_id",
      "embedding", vPath).count() == 0)
    assert(graft.pipeline.VecIndex.newRows(
      emptyVecs, "vec_id", "embedding", vPath).count() == 0)
  }

  test("classifier/evaluation tier tolerates empty input") {
    val emptySL = spark.emptyDataset[(Double, Double)].toDF("p", "y")
    assert(graft.eval.BinaryMetrics.calibrationCurve(
      emptySL, "p", "y").count() == 0)
    val b = graft.eval.BinaryMetrics.brierScore(emptySL, "p", "y").head()
    assert(b.isNullAt(0) && b.getAs[Long]("n") == 0L)
    assert(graft.eval.BinaryMetrics.aucBy(emptySL, "p", "y").count() == 1)
    assert(graft.eval.BinaryMetrics.aucBy(emptySL, "p", "y")
      .head().getAs[Double]("auc_roc").isNaN) // 0 pos, 0 neg → NaN
    assert(graft.eval.BinaryMetrics.isotonicCalibrate(
      emptySL, "p", "y").count() == 0)
    assert(graft.eval.BinaryMetrics.thresholdAtPrecision(
      emptySL, "p", "y", 0.9).count() == 0)
    // trainLogistic refuses an empty labeled set with a clear message
    val emptyFeat = spark.emptyDataset[(Array[Double], Double)]
      .toDF("x", "y")
    val e = intercept[IllegalArgumentException](
      graft.pipeline.Classify.trainLogistic(emptyFeat, "x", "y", steps = 1))
    assert(e.getMessage.contains("no non-null labeled rows"))
    val emptyRun = spark.emptyDataset[(String, Long, Int)]
      .toDF("q", "doc", "rank")
    assert(graft.eval.RankingMetrics.rbo(
      emptyRun, emptyRun, "q", "doc", "rank", k = 3).count() == 0)
    // global ESS over nothing: one row, n = 0, NaN ratios (0/0)
    val ess = graft.pipeline.Sampling.effectiveSampleSize(
      emptyNum.select(col("x").as("w")), "w").head()
    assert(ess.getAs[Long]("n") == 0L)
    assert(graft.pipeline.Sampling.effectiveSampleSize(
      emptyNum, "x", "g").count() == 0)
    assert(graft.pipeline.Pca.jlProject(
      emptyVecs, "vec_id", "embedding", 4).count() == 0)
    assert(graft.stat.StatTests.propTestStats(
      emptyNum.select(col("g"), col("x").as("kept")), "kept",
      Seq("g")).count() == 0)
  }

  test("quality/CDC/engagement/resampling tiers tolerate empty input") {
    import graft.clean.Expectations
    import graft.clean.Expectations._
    // whole expectation suite on an empty frame: every metric 1.0
    val checks = Expectations.run(emptyNum,
      Seq(Completeness("x"), Uniqueness(Seq("g")), InRange("x", 0, 1),
        AllowedValues("g", Seq("a")), NonNegative("x")))
    assert(checks.count() == 5 &&
      checks.collect().forall(r => r.getDouble(3) == 1.0))
    assert(Expectations.fdViolations(emptyNum, Seq("g"), "x").count() == 0)
    assert(Expectations.fkOrphans(emptyNum, "x", emptyNum, "y")
      .count() == 0)

    val emptyEv = spark.emptyDataset[(Long, java.sql.Timestamp, Long)]
      .toDF("user_id", "ts", "event_id")
    assert(graft.events.Engagement.cumulativeReach(
      emptyEv, "user_id", "ts").count() == 0)
    assert(graft.events.Engagement.rollingActive(
      emptyEv, "user_id", "ts", 7).count() == 0)
    assert(graft.events.Engagement.debounce(
      emptyEv, Seq("user_id"), "ts", "event_id", 10L).count() == 0)

    val emptySnap = spark.emptyDataset[(Long, String)].toDF("id", "v")
    val emptyCh = spark.emptyDataset[(Long, String, Long, String)]
      .toDF("id", "op", "seq", "v")
    assert(graft.pipeline.Snapshot.applyChanges(
      emptySnap, emptyCh, "id", "op", "seq", Seq("v")).count() == 0)
    assert(graft.pipeline.FuzzyJoin.survivorship(
      emptyNum.select(col("x").as("cluster"), col("y").as("id"),
        col("x").as("prio"), col("g").as("a")),
      "cluster", "id", "prio", Seq("a")).count() == 0)

    // resampling: empty calibration → null q → null bands on target
    val target = Seq((1.0, 2.0)).toDF("p", "y")
    val banded = graft.stat.Resample.conformalInterval(
      emptyNum.select(col("x").as("p"), col("y")), target, "p", "y")
      .collect()(0)
    assert(banded.isNullAt(2) && banded.isNullAt(3))
    assert(graft.stat.Resample.bootstrapMeanCI(
      emptyNum.select(col("g"), col("x"), col("y").cast("long").as("id")),
      "id", "x", Seq("g"), b = 5).count() == 0)
    assert(graft.stat.Drift.wasserstein1Pairs(
      emptyNum, "x", "g").count() == 0)
    assert(graft.pipeline.Semistructured.jsonProfile(
      emptyDocs, "text").count() == 0)
    assert(graft.stat.Experiment.cuped(
      emptyNum.select(col("g").as("arm"), col("x").as("pre"),
        col("y").as("post")), "arm", "pre", "post").count() == 0)
  }

  test("round-10 tier tolerates empty input") {
    import graft.stat.InferenceTests
    // inference: one-row aggregates degrade to null stats, cell ops to 0
    assert(InferenceTests.kruskalWallis(emptyNum, "x", "g").head()
      .isNullAt(3))
    assert(InferenceTests.brownForsythe(emptyNum, "x", "g").head()
      .isNullAt(6))
    assert(InferenceTests.jarqueBera(emptyNum, "x").head().isNullAt(3))
    assert(InferenceTests.cohensD(emptyNum, "x", "g").count() == 0)
    assert(InferenceTests.kendallTauB(emptyNum, "x", "y").head()
      .isNullAt(4))
    assert(InferenceTests.mcnemar(
      emptyNum.select(col("x").as("a"), col("y").as("b")), "a", "b")
      .head().isNullAt(5))
    assert(InferenceTests.multipleTestAdjust(
      emptyNum.select(col("x").as("p"), col("g").as("id")),
      "p", Seq("id")).count() == 0)
    // fleissKappa's equal-design probe has nothing to verify on empty
    // input — the refuse message names the design, not an NPE
    intercept[IllegalArgumentException] {
      InferenceTests.fleissKappa(emptyNum, "g", "x")
    }
    // cochranQ's k >= 2 probe likewise refuses informatively on empty
    intercept[IllegalArgumentException] {
      InferenceTests.cochranQ(
        emptyNum.select(col("g").as("i"), col("x").as("t"),
          col("y").as("yy")), "i", "t", "yy")
    }
    assert(InferenceTests.mantelHaenszel(
      emptyNum.select(col("g").as("s"), col("x").as("t"),
        col("y").as("yy")), "s", "t", "yy").head().isNullAt(3))
    assert(graft.agg.Stats.cronbachAlpha(emptyNum, Seq("x", "y")).head()
      .isNullAt(4))
    // causal / eval
    assert(graft.stat.Experiment.diffInDiff(
      emptyNum.select(col("x").as("t"), col("y").as("p"),
        lit(1.0).as("v")), "t", "p", "v").head().isNullAt(8))
    assert(graft.stat.Experiment.ipwAte(
      emptyNum.select(col("x").as("t"), col("y").as("v"),
        lit(0.5).as("e")), "t", "v", "e").head().isNullAt(5))
    assert(graft.eval.ForecastEval.forecastEval(
      emptyNum, "x", "y").head().getLong(0) == 0L)
    assert(graft.eval.BinaryMetrics.deLongTest(
      emptyNum.select(col("x").as("id"), lit(1.0).as("y"),
        col("x").as("s1"), col("y").as("s2")), "id", "y", "s1", "s2")
      .head().isNullAt(5))
    // time series / drift
    assert(graft.events.TimeSeries.pacf(
      emptyNum.select(col("g"), current_timestamp().as("ts"),
        col("x").cast("long").as("tie"), col("y").as("v")),
      Seq("g"), "ts", "tie", "v", maxLag = 2).count() == 0)
    assert(graft.events.TimeSeries.crossCorrelation(
      emptyNum.select(col("x").cast("long").as("i"), col("y").as("a"),
        col("y").as("b")), Nil, "i", "a", "b", 2).count() == 0)
    assert(graft.events.TimeSeries.bursts(
      emptyNum.select(col("g"), col("x").cast("long").as("i"),
        col("y").as("c")), Seq("g"), "i", "c").count() == 0)
    assert(graft.stat.Drift.energyDistance(emptyNum, "x", "g", "a", "b")
      .head().isNullAt(5))
    // baskets / geo / sampling / profiles
    assert(graft.pipeline.Basket.pairRules(
      emptyDocs.select(col("doc_id").as("b"), col("text").as("i")),
      "b", "i", minCount = 1).count() == 0)
    assert(graft.pipeline.Geo.radiusJoin(
      emptyNum.select(col("x").as("plat"), col("y").as("plon")),
      emptyNum.select(col("x").as("qlat"), col("y").as("qlon")),
      "plat", "plon", "qlat", "qlon", 1000.0, 4.0).count() == 0)
    assert(graft.pipeline.Sampling.neymanAllocation(
      emptyNum, "g", "x", 10).count() == 0)
    assert(graft.agg.Stats.weightedMoments(emptyNum, "x", "y").head()
      .isNullAt(2))
    assert(graft.agg.Stats.quantilesByCounts(
      emptyNum, "x", Seq("g"), Seq(0.5)).count() == 0)
    assert(graft.agg.Stats.simpsonCheck(emptyNum, "x", "y", "g")
      .count() == 0)
    assert(graft.agg.Stats.boxCoxFit(emptyNum, "x").count() == 9)
    assert(graft.clean.Expectations.nullPatterns(
      emptyNum, Seq("x")).count() == 0)
    assert(graft.pipeline.Dedup.dupSizeHistogram(emptyDocs, "text")
      .count() == 0)
    assert(graft.events.Transitions.sessionPaths(
      emptyNum.select(col("g").as("u"), col("x").cast("long").as("ts"),
        col("y").cast("long").as("tie"), col("g").as("t")),
      Seq("u"), "ts", "tie", "t", gap = 10L).count() == 0)
  }

  test("round-11 additions tolerate empty input") {
    // sketch-tier rolling robust baseline: empty stream -> empty result
    assert(graft.events.Rolling.rollingRobustZscoreSketch(
      emptyNum.select(col("g"), current_timestamp().as("ts"),
        col("x").as("v")),
      Seq("g"), "ts", "v", windowSec = 60L,
      lo = 0.0, hi = 100.0, bins = 10).count() == 0)
    // HistQuantiles over zero rows: tallies zero, quantiles null
    val hq = emptyNum.agg(graft.expr.HistQuantiles.of(
      col("x"), 0.0, 1.0, 4, Seq(0.5)).as("sk"))
      .select(col("sk.n"), col("sk.quantiles")).head()
    assert(hq.getLong(0) == 0L && hq.isNullAt(1))
    // ER round-11 additions
    val emptyIdName = emptyNum.select(
      col("x").cast("long").as("id"), col("g").as("name"))
    assert(graft.pipeline.FuzzyJoin.sortedNeighborhood(
      emptyIdName, "id", "name", col("__s"), window = 3,
      minSim = 0.5).count() == 0)
    assert(graft.pipeline.FuzzyJoin.multiPassClusters(
      emptyIdName, "id", "name",
      Seq(emptyIdName.select(col("id").as("id_a"),
        col("id").as("id_b")))).count() == 0)
  }
}
