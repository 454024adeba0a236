package graft.stat

import graft.SparkSpec

class DriftSpec extends SparkSpec {

  test("wasserstein1Pairs: hand-checked shift and identity") {
    import spark.implicits._
    val df = (Seq(("a", 0.0), ("a", 1.0), ("b", 1.0), ("b", 2.0)) ++
      Seq(("c", 0.0), ("c", 1.0))).toDF("g", "v")
    val got = Drift.wasserstein1Pairs(df, "v", "g")
      .orderBy("group_a", "group_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // a vs b: uniform{0,1} vs uniform{1,2} — unit shift → W1 = 1
    // a vs c: identical → 0;  b vs c: reverse unit shift → 1
    assert(got.toSeq == Seq(
      ("a", "b", 2L, 2L, 1.0), ("a", "c", 2L, 2L, 0.0),
      ("b", "c", 2L, 2L, 1.0)))
  }

  test("wasserstein1Pairs: translation by c gives W1 = c; ties collapse") {
    import spark.implicits._
    val a = Seq(1.0, 2.0, 2.0, 7.0)
    val df = (a.map(("a", _)) ++ a.map(v => ("b", v + 2.5))).toDF("g", "v")
    val got = Drift.wasserstein1Pairs(df, "v", "g").collect()(0)
    assert(got.getString(0) == "a" && got.getString(1) == "b")
    assert(got.getLong(2) == 4 && got.getLong(3) == 4)
    assert(math.abs(got.getDouble(4) - 2.5) < 1e-12)
  }

  test("wasserstein1Pairs: unequal sizes weight by each side's own n") {
    import spark.implicits._
    // a = {0,0,1,1} (uniform on two points), b = {0,1} — same ECDF → 0
    val df = (Seq(0.0, 0.0, 1.0, 1.0).map(("a", _)) ++
      Seq(0.0, 1.0).map(("b", _))).toDF("g", "v")
    val got = Drift.wasserstein1Pairs(df, "v", "g").collect()(0)
    assert(got.getLong(2) == 4 && got.getLong(3) == 2)
    assert(got.getDouble(4) == 0.0)
  }
}
