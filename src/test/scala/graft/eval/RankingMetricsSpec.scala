package graft.eval

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RankingMetricsSpec extends SparkSpec {

  import spark.implicits._

  private def log2(x: Double) = math.log(x) / math.log(2.0)

  test("perQuery: hand-computed binary-relevance case, k=3") {
    val results = Seq(
      ("A", 5L, 1), ("A", 2L, 2), ("A", 9L, 3), ("A", 1L, 4), // rank 4 cut
      ("C", 7L, 1)                                            // no truth
    ).toDF("q", "doc", "rank")
    val truth = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("B", 10L))
      .toDF("q", "doc")
    val got = RankingMetrics.perQuery(results, truth, "q", "doc", "rank",
        k = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    // query C has no truth -> dropped; B has truth but no results -> zeros
    assert(got.keySet == Set("A", "B"))
    val a = got("A")
    assert(a.getAs[Long]("n_truth") == 3L && a.getAs[Long]("n_hits") == 1L)
    assert(math.abs(a.getAs[Double]("recall_at_k") - 1.0 / 3) < 1e-12)
    assert(math.abs(a.getAs[Double]("precision_at_k") - 1.0 / 3) < 1e-12)
    assert(math.abs(a.getAs[Double]("mrr") - 0.5) < 1e-12) // first hit rank 2
    val idcg = 1 / log2(2) + 1 / log2(3) + 1 / log2(4)
    assert(math.abs(a.getAs[Double]("ndcg_at_k") - (1 / log2(3)) / idcg)
      < 1e-12)
    val b = got("B")
    assert(b.getAs[Long]("n_hits") == 0L)
    assert(b.getAs[Double]("recall_at_k") == 0.0 &&
      b.getAs[Double]("mrr") == 0.0 && b.getAs[Double]("ndcg_at_k") == 0.0)
  }

  test("perQuery: graded relevance orders the ideal list by grade") {
    // truth grades 3,2,1 for docs 1,2,3; results retrieve them REVERSED
    val results = Seq(("q", 3L, 1), ("q", 2L, 2), ("q", 1L, 3))
      .toDF("q", "doc", "rank")
    val truth = Seq(("q", 1L, 3.0), ("q", 2L, 2.0), ("q", 3L, 1.0))
      .toDF("q", "doc", "grade")
    val r = RankingMetrics.perQuery(results, truth, "q", "doc", "rank",
      k = 3, gradeCol = Some("grade")).head()
    val dcg = 1.0 / log2(2) + 2.0 / log2(3) + 3.0 / log2(4)
    val idcg = 3.0 / log2(2) + 2.0 / log2(3) + 1.0 / log2(4)
    assert(math.abs(r.getAs[Double]("ndcg_at_k") - dcg / idcg) < 1e-12)
    assert(r.getAs[Double]("recall_at_k") == 1.0)
    assert(r.getAs[Double]("mrr") == 1.0)
    // perfect ordering scores ndcg exactly 1
    val perfect = Seq(("q", 1L, 1), ("q", 2L, 2), ("q", 3L, 3))
      .toDF("q", "doc", "rank")
    val p = RankingMetrics.perQuery(perfect, truth, "q", "doc", "rank",
      k = 3, gradeCol = Some("grade")).head()
    assert(math.abs(p.getAs[Double]("ndcg_at_k") - 1.0) < 1e-12)
  }

  test("perQuery evaluates the ANN tier: full-probe IVF scores ndcg 1 vs brute truth") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q0 = e.filter(col("vec_id") === 0)
      .select(expr("transform(embedding, x -> cast(x as double))"))
      .head().getSeq[Double](0).toArray
    val corpus = e.filter(col("vec_id") =!= 0)
    val truth = graft.pipeline.Similarity.bruteForceTopK(corpus, "vec_id",
        "embedding", q0, 10)
      .select(lit(0L).as("q"), col("vec_id").as("doc"))
    val (assigned, centers) = graft.pipeline.Similarity.ivfAssign(corpus,
      "vec_id", "embedding", nCells = 8)
    val results = graft.pipeline.Similarity.ivfTopK(assigned, centers,
        "vec_id", q0, k = 10, nProbe = 8) // full probe == exact
      .withColumn("q", lit(0L))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q")
          .orderBy(desc("cos"), col("vec_id"))))
      .select(col("q"), col("vec_id").as("doc"), col("rank"))
    val m = RankingMetrics.perQuery(results, truth, "q", "doc", "rank",
      k = 10).head()
    assert(m.getAs[Double]("recall_at_k") == 1.0)
    assert(math.abs(m.getAs[Double]("ndcg_at_k") - 1.0) < 1e-12)
  }

  test("rbo: identical = 1, disjoint = 0, hand case, top-weighting") {
    import spark.implicits._
    def run(rows: (String, Long, Int)*) = rows.toSeq.toDF("q", "doc", "rank")
    val a = run(("q1", 1L, 1), ("q1", 2L, 2), ("q1", 3L, 3))
    // identical rankings: exactly 1 regardless of p/k normalization
    val same = RankingMetrics.rbo(a, a, "q", "doc", "rank", k = 3, p = 0.5)
      .head()
    assert(math.abs(same.getAs[Double]("rbo") - 1.0) < 1e-12)
    assert(same.getAs[Long]("n_common") == 3L)
    // hand case: B swaps ranks 1 and 2 → A_1 = 0, A_2 = A_3 = 1
    // rbo = (0 + 0.5 + 0.25) · (1−0.5)/(1−0.5³) = 0.75 · 4/7 = 3/7
    val b = run(("q1", 2L, 1), ("q1", 1L, 2), ("q1", 3L, 3))
    val swapped = RankingMetrics.rbo(a, b, "q", "doc", "rank", 3, 0.5)
      .head().getAs[Double]("rbo")
    assert(math.abs(swapped - 3.0 / 7.0) < 1e-12, swapped.toString)
    // disjoint doc sets: query still present, rbo 0
    val c = run(("q1", 7L, 1), ("q1", 8L, 2), ("q1", 9L, 3))
    val disj = RankingMetrics.rbo(a, c, "q", "doc", "rank", 3, 0.5).head()
    assert(disj.getAs[Long]("n_common") == 0L &&
      disj.getAs[Double]("rbo") == 0.0)
    // top-weighting: disagreeing at rank 1 hurts more than at rank 3
    val tailSwap = run(("q1", 1L, 1), ("q1", 3L, 2), ("q1", 2L, 3))
    val tail = RankingMetrics.rbo(a, tailSwap, "q", "doc", "rank", 3, 0.5)
      .head().getAs[Double]("rbo")
    assert(tail > swapped)
    // multi-query independence + ranks beyond k ignored
    val a2 = run(("q1", 1L, 1), ("q2", 5L, 1), ("q2", 6L, 99))
    val b2 = run(("q1", 1L, 1), ("q2", 5L, 1), ("q2", 6L, 2))
    val byQ = RankingMetrics.rbo(a2, b2, "q", "doc", "rank", 3, 0.5)
      .orderBy("q").as[(String, Long, Double)].collect()
    // q1's identical SINGLE-doc lists score 16/21, not 1: truncated RBO
    // keeps dividing by the full depth d, so the unobserved tail of a
    // short list counts against it (RBO_min semantics)
    assert(byQ(0)._1 == "q1" && byQ(0)._2 == 1L &&
      math.abs(byQ(0)._3 - 16.0 / 21.0) < 1e-12)
    assert(byQ(1)._2 == 1L) // (q2, 6) rank-99 row filtered from run A
    // explicit universe: extra queries surface with rbo 0, and the
    // result is unchanged for the queries the runs cover
    val uni = Seq("q1", "q2", "q3").toDF("q")
    val withU = RankingMetrics.rbo(a2, b2, "q", "doc", "rank", 3, 0.5,
        universe = Some(uni))
      .orderBy("q").as[(String, Long, Double)].collect()
    assert(withU.length == 3)
    assert(withU.take(2).toSeq == byQ.toSeq)
    assert(withU(2) == (("q3", 0L, 0.0)))
    intercept[graft.util.GraftException](
      RankingMetrics.rbo(a, b, "q", "doc", "rank", 0, 0.5))
    intercept[graft.util.GraftException](
      RankingMetrics.rbo(a, b, "q", "doc", "rank", 3, 1.0))
  }

  test("intraListDiversity: orthogonal list = 1, duplicate list = 0") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),  // orthogonal pair
      (3L, Seq(1.0, 1.0)), (4L, Seq(2.0, 2.0)),  // same direction
      (5L, Seq(1.0, 0.0))                         // lone item, no pair
    ).toDF("id", "v")
    val run = Seq(
      ("qa", 1L, 1), ("qa", 2L, 2),
      ("qb", 3L, 1), ("qb", 4L, 2),
      ("qc", 5L, 1),
      ("qa", 9L, 3) // item without a vector: skipped, not crashed
    ).toDF("q", "doc", "rank")
    val got = RankingMetrics.intraListDiversity(run, "q", "doc", "rank",
        vecs, "id", "v", k = 5)
      .orderBy("q").collect()
    assert(got(0).getString(0) == "qa" && got(0).getLong(1) == 2 &&
      got(0).getLong(2) == 1 && math.abs(got(0).getDouble(3) - 1.0) < 1e-12)
    assert(got(1).getString(0) == "qb" &&
      math.abs(got(1).getDouble(3)) < 1e-12)
    assert(got(2).getString(0) == "qc" && got(2).getLong(2) == 0 &&
      got(2).isNullAt(3)) // single item: no pairs, null ild
  }

  test("intraListDiversity: rank cut applies before pairing") {
    val vecs = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(1.0, 0.0))).toDF("id", "v")
    val run = Seq(("q", 1L, 1), ("q", 2L, 2), ("q", 3L, 3))
      .toDF("q", "doc", "rank")
    val got = RankingMetrics.intraListDiversity(run, "q", "doc", "rank",
      vecs, "id", "v", k = 2).collect()(0)
    assert(got.getLong(1) == 2 && got.getLong(2) == 1)
  }

  test("catalogCoverage: stale items don't inflate the share") {
    val run = Seq(("q", 1L), ("q", 2L), ("r", 2L), ("r", 99L))
      .toDF("q", "doc")
    val cat = Seq(1L, 2L, 3L, 4L).toDF("id")
    val got = RankingMetrics.catalogCoverage(run, "doc", cat, "id")
      .collect()(0)
    // recommended distinct {1,2,99} = 3; in-catalog {1,2} = 2 of 4
    assert(got.getLong(0) == 3 && got.getLong(1) == 4 &&
      got.getDouble(2) == 0.5)
  }
}
