package graft.eval

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FusionSpec extends SparkSpec {
  import spark.implicits._

  private def runDf(rows: (String, Long, Double)*) =
    rows.toDF("q", "doc", "s")

  test("rrf matches the hand-computed fusion on a two-run fixture") {
    // run A ranks: q1 -> (10, 11, 12); run B ranks: q1 -> (11, 12, 13)
    val a = runDf(("q1", 10L, 3.0), ("q1", 11L, 2.0), ("q1", 12L, 1.0))
    val b = runDf(("q1", 11L, 9.0), ("q1", 12L, 8.0), ("q1", 13L, 7.0))
    val got = Fusion.rrf(Seq(a, b), "q", "doc", "s", k = 60)
      .orderBy("fused_rank").collect()
    val exp = Map( // doc -> (n_runs, score)
      10L -> (1L, 1.0 / 61),
      11L -> (2L, 1.0 / 62 + 1.0 / 61),
      12L -> (2L, 1.0 / 63 + 1.0 / 62),
      13L -> (1L, 1.0 / 63))
    assert(got.length == 4)
    got.foreach { r =>
      val (n, s) = exp(r.getLong(1))
      assert(r.getLong(2) == n, s"n_runs for doc ${r.getLong(1)}")
      assert(math.abs(r.getDouble(3) - s) < 1e-15, s"doc ${r.getLong(1)}")
    }
    // 11 beats everything (present high in both runs); fused ranks dense
    assert(got.head.getLong(1) == 11L && got.head.getInt(4) == 1)
    assert(got.map(_.getInt(4)).toSeq == Seq(1, 2, 3, 4))
  }

  test("rrf: exact score ties rank by doc id; depth cuts each run's tail") {
    val a = runDf(("q1", 5L, 1.0), ("q1", 3L, 1.0), ("q1", 7L, 0.5))
    val ranks = Fusion.rrf(Seq(a), "q", "doc", "s", k = 60)
      .orderBy("fused_rank")
      .select("doc").as[Long].collect().toSeq
    assert(ranks == Seq(3L, 5L, 7L)) // tie at 1.0 -> lower doc id first
    val cut = Fusion.rrf(Seq(a), "q", "doc", "s", k = 60, depth = 2)
    assert(cut.count() == 2)
    assert(cut.filter(col("doc") === 7L).count() == 0)
  }

  test("rrf is per-query: queries do not leak into each other's ranks") {
    val a = runDf(("q1", 1L, 9.0), ("q1", 2L, 8.0),
      ("q2", 2L, 5.0), ("q2", 9L, 4.0))
    val got = Fusion.rrf(Seq(a), "q", "doc", "s", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(3), r.getInt(4))).toMap
    assert(got(("q1", 1L)) == (1.0 / 11, 1))
    assert(got(("q2", 2L)) == (1.0 / 11, 1)) // rank 1 within q2
    assert(got(("q2", 9L)) == (1.0 / 12, 2))
  }

  test("weightedFuse: min-max normalization, weights, and absent docs") {
    // run A scores q1: 10 -> 4.0, 11 -> 2.0, 12 -> 0.0 (normalize to
    // 1, .5, 0); run B: 11 -> 100, 12 -> 50 (normalize to 1, 0)
    val a = runDf(("q1", 10L, 4.0), ("q1", 11L, 2.0), ("q1", 12L, 0.0))
    val b = runDf(("q1", 11L, 100.0), ("q1", 12L, 50.0))
    val got = Fusion.weightedFuse(Seq(a, b), Seq(0.7, 0.3),
        "q", "doc", "s").collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got(10L) == (1L, 0.7))               // 0.7*1    (absent from B)
    assert(got(11L) == (2L, 0.7 * 0.5 + 0.3))   // 0.7*.5 + 0.3*1
    assert(got(12L) == (2L, 0.0))               // 0.7*0  + 0.3*0
  }

  test("weightedFuse: a constant-score run contributes zero everywhere") {
    val a = runDf(("q1", 1L, 3.0), ("q1", 2L, 3.0))
    val b = runDf(("q1", 1L, 9.0), ("q1", 2L, 1.0))
    val got = Fusion.weightedFuse(Seq(a, b), Seq(0.5, 0.5),
        "q", "doc", "s").collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(got(1L) == 0.5 && got(2L) == 0.0)
  }

  test("weightedFuse depth: normalization bounds come from the cut run") {
    // depth=2 keeps scores (9, 5); min-max over (9, 5), NOT (9, 5, 1)
    val a = runDf(("q1", 1L, 9.0), ("q1", 2L, 5.0), ("q1", 3L, 1.0))
    val got = Fusion.weightedFuse(Seq(a), Seq(1.0), "q", "doc", "s",
        depth = 2).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == 1.0 && got(2L) == 0.0)
  }

  test("argument validation") {
    val a = runDf(("q1", 1L, 1.0))
    intercept[IllegalArgumentException](Fusion.rrf(Nil, "q", "doc", "s"))
    intercept[IllegalArgumentException](
      Fusion.rrf(Seq(a), "q", "doc", "s", k = 0))
    intercept[IllegalArgumentException](
      Fusion.weightedFuse(Seq(a), Seq(0.5, 0.5), "q", "doc", "s"))
  }
}
