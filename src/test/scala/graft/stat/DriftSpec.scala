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

  test("wasserstein1Pairs: maxDistinct refuses continuous supports; " +
      "binned tier approximates within two cell widths") {
    import spark.implicits._
    val cont = (1 to 400).map(i => (if (i % 2 == 0) "a" else "b",
      i * 0.001 + (if (i % 2 == 0) 0.05 else 0.0))).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Drift.wasserstein1Pairs(cont, "v", "g", maxDistinct = 100).collect()
    }
    assert(e.getMessage.contains("wasserstein1PairsBinned"))
    // translation by 0.05: exact W1 ≈ 0.05 (ECDF steps 0.002 apart);
    // grid width at bins=200 over span ~0.45 is ~0.00225, so the binned
    // estimate must land within 2 cells of the exact distance
    val exact = Drift.wasserstein1Pairs(cont, "v", "g")
      .head().getDouble(4)
    val binned = Drift.wasserstein1PairsBinned(cont, "v", "g", bins = 200)
      .head().getDouble(4)
    val cell = 0.45 / 200
    assert(math.abs(binned - exact) <= 2 * cell + 1e-12,
      s"binned $binned vs exact $exact (cell $cell)")
    // degenerate single-value support: both tiers return 0
    val one = Seq(("a", 3.0), ("b", 3.0)).toDF("g", "v")
    assert(Drift.wasserstein1PairsBinned(one, "v", "g").head()
      .getDouble(4) == 0.0)
  }

  test("energyDistance matches the brute pairwise V-statistic") {
    import spark.implicits._
    val xs = Seq(1.0, 2.0, 2.0, 5.0, 7.0)
    val ys = Seq(2.0, 3.0, 9.0)
    val df = (xs.map(("x", _)) ++ ys.map(("y", _))).toDF("g", "v")
    val got = Drift.energyDistance(df, "v", "g", "x", "y").head()
    def pairMean(a: Seq[Double], b: Seq[Double]): Double =
      (for { u <- a; w <- b } yield math.abs(u - w)).sum / (a.size * b.size)
    val exy = pairMean(xs, ys)
    val exx = pairMean(xs, xs)
    val eyy = pairMean(ys, ys)
    assert(got.getLong(0) == 5L && got.getLong(1) == 3L)
    assert(math.abs(got.getDouble(2) - exy) < 1e-12)
    assert(math.abs(got.getDouble(3) - exx) < 1e-12)
    assert(math.abs(got.getDouble(4) - eyy) < 1e-12)
    assert(math.abs(got.getDouble(5) - (2 * exy - exx - eyy)) < 1e-12)
    // identical distributions: energy 0 exactly (integer values)
    val same = (xs.map(("x", _)) ++ xs.map(("y", _))).toDF("g", "v")
    assert(Drift.energyDistance(same, "v", "g", "x", "y").head()
      .getDouble(5) == 0.0)
    // empty side -> nulls
    val solo = xs.map(("x", _)).toDF("g", "v")
    assert(Drift.energyDistance(solo, "v", "g", "x", "y").head().isNullAt(5))
  }
}
