package graft.stat

import graft.SparkSpec
import org.apache.spark.sql.functions._

class InferenceTestsSpec extends SparkSpec {

  test("chiSquare matches the classic full-table sum, including empty cells") {
    import spark.implicits._
    // 2x2 with known marginals
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(40)(("b", "y"))
    val got = InferenceTests.chiSquare(rows.toDF("r", "c"), "r", "c").head()
    val expected = 4.0 / 12 + 4.0 / 18 + 4.0 / 28 + 4.0 / 42
    assert(got.getLong(0) == 100L)
    assert(math.abs(got.getDouble(4) - expected) < 1e-12)
    assert(math.abs(got.getDouble(5) - math.sqrt(expected / 100)) < 1e-12)

    // a table with an EMPTY cell: the identity must equal the brute-force
    // sum over ALL row x col combos (empty cells contribute e)
    val sparse = Seq.fill(5)(("a", "x")) ++ Seq.fill(7)(("a", "y")) ++
      Seq.fill(9)(("b", "x")) // (b, y) empty
    val cells = sparse.groupBy(identity).view.mapValues(_.size).toMap
    val n = sparse.size.toDouble
    val rMarg = sparse.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val cMarg = sparse.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val brute = (for { r <- rMarg.keys; c <- cMarg.keys } yield {
      val o = cells.getOrElse((r, c), 0).toDouble
      val e = rMarg(r) * cMarg(c) / n
      (o - e) * (o - e) / e
    }).sum
    val got2 = InferenceTests.chiSquare(sparse.toDF("r", "c"), "r", "c").head()
    assert(math.abs(got2.getDouble(4) - brute) < 1e-12)
    // 1xk degenerate: dof 0, null stat
    val deg = InferenceTests.chiSquare(
      Seq(("a", "x"), ("a", "y")).toDF("r", "c"), "r", "c").head()
    assert(deg.getLong(3) == 0L && deg.isNullAt(4) && deg.isNullAt(5))
  }

  test("anovaF matches commons-math OneWayAnova") {
    import spark.implicits._
    val g1 = Seq(18.2, 20.1, 17.6, 16.8, 18.8, 19.7, 19.1)
    val g2 = Seq(17.4, 18.7, 19.1, 16.4, 15.9, 18.4, 17.7)
    val g3 = Seq(15.2, 18.8, 17.7, 16.5, 15.9, 17.1, 16.7)
    val df = (g1.map(("g1", _)) ++ g2.map(("g2", _)) ++ g3.map(("g3", _)))
      .toDF("g", "v")
    val got = InferenceTests.anovaF(df, "v", "g").head()
    val ref = new org.apache.commons.math3.stat.inference.OneWayAnova()
      .anovaFValue(java.util.List.of(g1.toArray, g2.toArray, g3.toArray))
    assert(got.getLong(0) == 3L && got.getLong(1) == 21L)
    assert(got.getLong(4) == 2L && got.getLong(5) == 18L)
    assert(math.abs(got.getDouble(6) - ref) < 1e-9)
    // p-value helper consistent with commons-math's test
    val refP = new org.apache.commons.math3.stat.inference.OneWayAnova()
      .anovaPValue(java.util.List.of(g1.toArray, g2.toArray, g3.toArray))
    assert(math.abs(
      InferenceTests.anovaPValue(got.getDouble(6), 2L, 18L) - refP) < 1e-9)
    // degenerate: single group yields null F
    assert(InferenceTests.anovaF(g1.map(("g", _)).toDF("g", "v"), "v", "g")
      .head().isNullAt(6))
  }

  test("cohenKappa matches the textbook po/pe arithmetic") {
    import spark.implicits._
    // classic 2-rater example: 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no
    val rows = Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
      Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val got = InferenceTests.cohenKappa(rows.toDF("r1", "r2"), "r1", "r2")
      .head()
    val po = 35.0 / 50
    val pe = (25.0 * 30 + 25.0 * 20) / (50.0 * 50)
    assert(got.getLong(0) == 50L)
    assert(math.abs(got.getDouble(1) - po) < 1e-12)
    assert(math.abs(got.getDouble(2) - pe) < 1e-12)
    assert(math.abs(got.getDouble(3) - (po - pe) / (1 - pe)) < 1e-12)
    // disjoint label sets: pe = 0, kappa = po
    val disj = InferenceTests.cohenKappa(
      Seq(("a", "x"), ("b", "y")).toDF("r1", "r2"), "r1", "r2").head()
    assert(disj.getDouble(2) == 0.0 && disj.getDouble(3) == 0.0)
    // constant identical pair: pe = 1 -> null kappa
    val const = InferenceTests.cohenKappa(
      Seq(("a", "a"), ("a", "a")).toDF("r1", "r2"), "r1", "r2").head()
    assert(const.getDouble(1) == 1.0 && const.isNullAt(3))
  }

  test("mannWhitney matches brute-force mid-ranks with tie correction") {
    import spark.implicits._
    val a = Seq(1.0, 2.0, 2.0, 4.0, 9.0)
    val b = Seq(2.0, 5.0, 5.0, 7.0)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    val got = InferenceTests.mannWhitney(df, "v", "g", "a", "b").head()
    // brute-force mid-ranks over the pooled sample
    val pooled = (a.map((_, "a")) ++ b.map((_, "b"))).sortBy(_._1)
    val ranks = pooled.zipWithIndex.groupBy(_._1._1).toSeq.flatMap {
      case (_, grp) =>
        val mid = grp.map(_._2 + 1.0).sum / grp.size
        grp.map { case ((_, g), _) => (g, mid) }
    }.toSeq
    val ra = ranks.filter(_._1 == "a").map(_._2).sum
    val n1 = a.size.toDouble; val n2 = b.size.toDouble; val n = n1 + n2
    val u = ra - n1 * (n1 + 1) / 2
    val ties = pooled.groupBy(_._1).values.map(_.size.toDouble)
      .map(t => t * t * t - t).sum
    val sigma2 = n1 * n2 / 12 * ((n + 1) - ties / (n * (n - 1)))
    assert(got.getLong(0) == 5L && got.getLong(1) == 4L)
    assert(math.abs(got.getDouble(2) - u) < 1e-12)
    assert(math.abs(got.getDouble(3) - (u - n1 * n2 / 2) / math.sqrt(sigma2))
      < 1e-12)
    // all-tied input: zero variance -> null z
    val tied = InferenceTests.mannWhitney(
      Seq(("a", 1.0), ("b", 1.0)).toDF("g", "v"), "v", "g", "a", "b").head()
    assert(tied.isNullAt(3))
  }

  test("chiSquarePValue matches commons-math chi-square test") {
    import spark.implicits._
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(40)(("b", "y"))
    val got = InferenceTests.chiSquare(rows.toDF("r", "c"), "r", "c").head()
    val refP = new org.apache.commons.math3.stat.inference.ChiSquareTest()
      .chiSquareTest(Array(Array(10L, 20L), Array(30L, 40L)))
    assert(math.abs(
      InferenceTests.chiSquarePValue(got.getDouble(4), got.getLong(3)) - refP)
      < 1e-9)
  }
}
