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

  test("kruskalWallis matches a sequential mid-rank computation, with ties") {
    import spark.implicits._
    val g1 = Seq(2.9, 3.0, 2.5, 2.6, 3.2, 3.0) // 3.0 ties across groups
    val g2 = Seq(3.8, 2.7, 4.0, 2.4, 3.0)
    val g3 = Seq(2.8, 3.4, 3.7, 2.2, 2.0, 3.0)
    val data = g1.map(("g1", _)) ++ g2.map(("g2", _)) ++ g3.map(("g3", _))
    val got = InferenceTests.kruskalWallis(data.toDF("g", "v"), "v", "g").head()
    // sequential reference: pooled sort -> mid-ranks -> H with tie correction
    val sorted = data.map(_._2).sorted
    val mid = sorted.zipWithIndex.groupBy(_._1).map { case (v, xs) =>
      v -> (xs.map(_._2 + 1).sum.toDouble / xs.size)
    }
    val byG = data.groupBy(_._1)
    val nTot = data.size.toDouble
    val r2n = byG.values.map { xs =>
      val rg = xs.map(x => mid(x._2)).sum
      rg * rg / xs.size
    }.sum
    val h = 12.0 / (nTot * (nTot + 1)) * r2n - 3 * (nTot + 1)
    val ties = data.map(_._2).groupBy(identity).values
      .map(_.size.toDouble).map(t => t * t * t - t).sum
    val hc = h / (1.0 - ties / (nTot * nTot * nTot - nTot))
    assert(got.getLong(0) == 3L && got.getLong(1) == 17L && got.getLong(2) == 2L)
    assert(math.abs(got.getDouble(3) - h) < 1e-10)
    assert(math.abs(got.getDouble(4) - hc) < 1e-10)
    // degenerate: one group -> null H; all-tied -> null corrected H
    assert(InferenceTests.kruskalWallis(
      g1.map(("g", _)).toDF("g", "v"), "v", "g").head().isNullAt(3))
    assert(InferenceTests.kruskalWallis(
      Seq(("a", 1.0), ("b", 1.0)).toDF("g", "v"), "v", "g")
      .head().isNullAt(4))
  }

  test("brownForsythe equals ANOVA on |x - group median| (commons-math F)") {
    import spark.implicits._
    val g1 = Seq(18.0, 20.0, 17.0, 16.0, 19.0, 23.0, 19.0)
    val g2 = Seq(17.0, 30.0, 19.0, 16.0, 15.0, 18.0, 44.0) // fatter spread
    val g3 = Seq(16.0, 17.0, 16.5, 16.2, 16.8, 17.1, 16.7)
    val df = (g1.map(("g1", _)) ++ g2.map(("g2", _)) ++ g3.map(("g3", _)))
      .toDF("g", "v")
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val zs = Seq(g1, g2, g3).map(g => g.map(x => math.abs(x - median(g))))
    val ref = new org.apache.commons.math3.stat.inference.OneWayAnova()
      .anovaFValue(java.util.List.of(
        zs(0).toArray, zs(1).toArray, zs(2).toArray))
    val got = InferenceTests.brownForsythe(df, "v", "g").head()
    assert(got.getLong(0) == 3L && got.getLong(1) == 21L)
    assert(math.abs(got.getDouble(6) - ref) < 1e-9)
  }

  test("jarqueBera matches the moments identity and flags a skewed sample") {
    import spark.implicits._
    val xs = Seq(1.0, 1.1, 0.9, 1.2, 0.8, 1.0, 5.0) // one fat outlier
    val got = InferenceTests.jarqueBera(xs.toDF("v"), "v").head()
    val n = xs.size.toDouble
    val mu = xs.sum / n
    val m2 = xs.map(x => math.pow(x - mu, 2)).sum / n
    val m3 = xs.map(x => math.pow(x - mu, 3)).sum / n
    val m4 = xs.map(x => math.pow(x - mu, 4)).sum / n
    val s = m3 / math.pow(m2, 1.5)
    val k = m4 / (m2 * m2) - 3
    assert(math.abs(got.getDouble(1) - s) < 1e-10)
    assert(math.abs(got.getDouble(2) - k) < 1e-10)
    assert(math.abs(got.getDouble(3) - n / 6 * (s * s + k * k / 4)) < 1e-9)
    assert(got.getDouble(3) > 3.0) // the outlier sample is far from normal
    // a symmetric two-point sample: skew 0, kurt -2, JB = n/6 * 1
    val sym = InferenceTests.jarqueBera(
      Seq(0.0, 1.0, 0.0, 1.0).toDF("v"), "v").head()
    assert(math.abs(sym.getDouble(1)) < 1e-12)
    assert(math.abs(sym.getDouble(2) - (-2.0)) < 1e-12)
  }

  test("cohensD matches the pooled-sd hand computation per pair") {
    import spark.implicits._
    val a = Seq(2.0, 4.0, 6.0, 8.0)        // mean 5, var 20/3
    val b = Seq(1.0, 2.0, 3.0)             // mean 2, var 1
    val c = Seq(10.0, 10.0, 10.0, 10.0)    // constant
    val df = (a.map(("a", _)) ++ b.map(("b", _)) ++ c.map(("c", _)))
      .toDF("g", "v")
    val rows = InferenceTests.cohensD(df, "v", "g")
      .orderBy("group_a", "group_b").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    val sp2ab = ((a.size - 1) * (20.0 / 3) + (b.size - 1) * 1.0) /
      (a.size + b.size - 2)
    val dab = (5.0 - 2.0) / math.sqrt(sp2ab)
    val ab = rows(0)
    assert(ab.getLong(2) == 4L && ab.getLong(3) == 3L)
    assert(math.abs(ab.getDouble(6) - dab) < 1e-12)
    assert(math.abs(ab.getDouble(7) -
      dab * (1.0 - 3.0 / (4 * 7 - 9))) < 1e-12)
    // (a, c): pooled sd comes only from a's spread; (b, c) likewise
    val ac = rows(1)
    val sp2ac = ((a.size - 1) * (20.0 / 3)) / (a.size + c.size - 2)
    assert(math.abs(ac.getDouble(6) - (5.0 - 10.0) / math.sqrt(sp2ac)) < 1e-12)
  }

  test("kendallTauB matches the brute-force pairwise count, with ties") {
    import spark.implicits._
    val xs = Seq((1, 1), (1, 2), (2, 1), (2, 2), (2, 2), (3, 1), (3, 3),
      (4, 2), (4, 4), (5, 5))
    val got = InferenceTests.kendallTauB(xs.toDF("a", "b"), "a", "b").head()
    // brute force over all row pairs
    var cC = 0L; var dC = 0L
    for (i <- xs.indices; j <- i + 1 until xs.size) {
      val s = (xs(i)._1 - xs(j)._1) * (xs(i)._2 - xs(j)._2)
      if (s > 0) cC += 1 else if (s < 0) dC += 1
    }
    val n = xs.size.toDouble
    val n0 = n * (n - 1) / 2
    val n1 = xs.groupBy(_._1).values.map(_.size.toDouble)
      .map(t => t * (t - 1) / 2).sum
    val n2 = xs.groupBy(_._2).values.map(_.size.toDouble)
      .map(t => t * (t - 1) / 2).sum
    val tau = (cC - dC) / math.sqrt((n0 - n1) * (n0 - n2))
    assert(got.getLong(0) == 10L)
    assert(got.getLong(2) == cC && got.getLong(3) == dC)
    assert(math.abs(got.getDouble(4) - tau) < 1e-12)
    // perfect concordance on distinct values -> tau 1; constant col -> null
    val mono = InferenceTests.kendallTauB(
      Seq((1, 10), (2, 20), (3, 30)).toDF("a", "b"), "a", "b").head()
    assert(math.abs(mono.getDouble(4) - 1.0) < 1e-12)
    val const = InferenceTests.kendallTauB(
      Seq((1, 1), (2, 1), (3, 1)).toDF("a", "b"), "a", "b").head()
    assert(const.isNullAt(4))
    // the quadratic guard refuses beyond maxCells
    val err = intercept[IllegalArgumentException] {
      InferenceTests.kendallTauB(
        (1 to 100).map(i => (i, i)).toDF("a", "b"), "a", "b", maxCells = 10)
    }
    assert(err.getMessage.contains("maxCells"))
    // p-value helper: strong monotone trend on 10 points is significant-ish
    assert(InferenceTests.kendallTauPValue(45L, 0L, 10L) < 0.001)
  }

  test("kendallTauB companions: gamma ignores ties, Somers' D directions") {
    import spark.implicits._
    val xs = Seq((1, 1), (1, 2), (2, 1), (2, 2), (2, 2), (3, 1), (3, 3),
      (4, 2), (4, 4), (5, 5))
    val got = InferenceTests.kendallTauB(xs.toDF("a", "b"), "a", "b").head()
    val (cC, dC) = (got.getLong(2), got.getLong(3))
    val n = xs.size.toDouble
    val n0 = n * (n - 1) / 2
    val n1 = xs.groupBy(_._1).values.map(_.size.toDouble)
      .map(t => t * (t - 1) / 2).sum
    val n2 = xs.groupBy(_._2).values.map(_.size.toDouble)
      .map(t => t * (t - 1) / 2).sum
    assert(math.abs(got.getDouble(5) - (cC - dC).toDouble / (cC + dC))
      < 1e-12)
    assert(math.abs(got.getDouble(6) - (cC - dC) / (n0 - n1)) < 1e-12)
    assert(math.abs(got.getDouble(7) - (cC - dC) / (n0 - n2)) < 1e-12)
    // all-tied pair column: gamma null (no concordant or discordant)
    val tied = InferenceTests.kendallTauB(
      Seq((1, 1), (2, 1), (1, 1)).toDF("a", "b"), "a", "b").head()
    assert(tied.isNullAt(5))
  }

  test("fleissKappa matches the worked Wikipedia-style example and " +
    "refuses unequal designs") {
    import spark.implicits._
    // 4 items x 3 raters: hand-checkable counts
    //  item 1: a,a,a  item 2: a,a,b  item 3: b,b,b  item 4: a,b,c
    val rows = Seq(
      (1, "a"), (1, "a"), (1, "a"),
      (2, "a"), (2, "a"), (2, "b"),
      (3, "b"), (3, "b"), (3, "b"),
      (4, "a"), (4, "b"), (4, "c"))
    val got = InferenceTests.fleissKappa(rows.toDF("item", "lbl"),
      "item", "lbl").head()
    // P_i: (9-3)/6=1, (5-3)/6=1/3, 1, (3-3)/6=0 -> p_bar = 7/12
    val pBar = (1.0 + 1.0 / 3 + 1.0 + 0.0) / 4
    // marginals: a=6, b=5, c=1 of 12 -> P_e = (36+25+1)/144
    val pE = 62.0 / 144
    assert(got.getLong(0) == 4L && got.getLong(1) == 3L)
    assert(math.abs(got.getDouble(2) - pBar) < 1e-12)
    assert(math.abs(got.getDouble(3) - pE) < 1e-12)
    assert(math.abs(got.getDouble(4) - (pBar - pE) / (1 - pE)) < 1e-12)
    // unanimous single label: P_e = 1 -> null kappa
    val uni = InferenceTests.fleissKappa(
      Seq((1, "a"), (1, "a"), (2, "a"), (2, "a")).toDF("i", "l"),
      "i", "l").head()
    assert(uni.isNullAt(4))
    // unequal rater counts refuse
    val e = intercept[IllegalArgumentException] {
      InferenceTests.fleissKappa(
        Seq((1, "a"), (1, "b"), (2, "a")).toDF("i", "l"), "i", "l")
    }
    assert(e.getMessage.contains("unequal"))
  }

  test("mcnemar counts discordant cells and matches the textbook statistic") {
    import spark.implicits._
    val rows = Seq.fill(20)((true, true)) ++ Seq.fill(5)((true, false)) ++
      Seq.fill(1)((false, true)) ++ Seq.fill(10)((false, false))
    val got = InferenceTests.mcnemar(rows.toDF("a", "b"), "a", "b").head()
    assert(got.getLong(0) == 36L)
    assert(got.getLong(1) == 20L && got.getLong(2) == 5L &&
      got.getLong(3) == 1L && got.getLong(4) == 10L)
    assert(math.abs(got.getDouble(5) - 16.0 / 6) < 1e-12)
    assert(math.abs(got.getDouble(6) - 9.0 / 6) < 1e-12)
    // perfectly-agreeing classifiers: no discordance, null statistics
    val agree = InferenceTests.mcnemar(
      Seq((true, true), (false, false)).toDF("a", "b"), "a", "b").head()
    assert(agree.isNullAt(5) && agree.isNullAt(6))
  }

  test("multipleTestAdjust reproduces the sequential BH / Holm / " +
    "Bonferroni adjustments") {
    import spark.implicits._
    val ps = Seq(0.01, 0.04, 0.03, 0.005, 0.2, 0.04) // dup p needs the tie
    val df = ps.zipWithIndex.map { case (p, i) => (i, p) }.toDF("id", "p")
    val got = InferenceTests.multipleTestAdjust(df, "p", Seq("id"))
      .orderBy("rank").collect()
    val m = ps.size
    // sequential reference over (p, id)-sorted hypotheses
    val sorted = ps.zipWithIndex.sortBy { case (p, i) => (p, i) }
    val bonf = sorted.map { case (p, _) => math.min(1.0, p * m) }
    val holm = sorted.zipWithIndex
      .map { case ((p, _), i) => math.min(1.0, p * (m - i)) }
      .scanLeft(0.0)(math.max).tail
    val bh = sorted.zipWithIndex
      .map { case ((p, _), i) => math.min(1.0, p * m / (i + 1)) }
      .scanRight(1.0)(math.min).init
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(2) == i + 1)
      assert(math.abs(r.getDouble(3) - bonf(i)) < 1e-12, s"bonf $i")
      assert(math.abs(r.getDouble(4) - holm(i)) < 1e-12, s"holm $i")
      assert(math.abs(r.getDouble(5) - bh(i)) < 1e-12, s"bh $i")
    }
    // monotonicity: BH is non-decreasing in rank, Holm too
    val bhCol = got.map(_.getDouble(5))
    assert(bhCol.zip(bhCol.tail).forall { case (a, b) => a <= b + 1e-15 })
    intercept[IllegalArgumentException] {
      InferenceTests.multipleTestAdjust(df, "p", Seq("id"), maxTests = 2)
    }
    intercept[IllegalArgumentException] {
      InferenceTests.multipleTestAdjust(df, "p", Nil)
    }
    // duplicate (p, ties) rows break the reversed-order prefix-min
    // equivalence — the uniqueness contract must refuse, not skew
    val dup = Seq((1, 0.01), (1, 0.01), (2, 0.2)).toDF("id", "p")
    val e = intercept[IllegalArgumentException] {
      InferenceTests.multipleTestAdjust(dup, "p", Seq("id"))
    }
    assert(e.getMessage.contains("unique"))
  }

  test("cochranQ matches the hand-worked complete-block statistic") {
    import spark.implicits._
    // 4 items x 3 treatments with known totals
    val rows = Seq(
      (1, "a", 1), (1, "b", 1), (1, "c", 0),
      (2, "a", 1), (2, "b", 0), (2, "c", 0),
      (3, "a", 1), (3, "b", 1), (3, "c", 1),
      (4, "a", 0), (4, "b", 0), (4, "c", 0))
    val got = InferenceTests.cochranQ(rows.toDF("i", "t", "y"),
      "i", "t", "y").head()
    // C = (3, 2, 1), T = 6, R = (2, 1, 3, 0), sum R^2 = 14
    // Q = 3*2 * sum((C - 2)^2) / (3*6 - 14) = 6 * 2 / 4 = 3
    assert(got.getLong(0) == 4L && got.getLong(1) == 3L &&
      got.getLong(2) == 2L)
    assert(math.abs(got.getDouble(3) - 3.0) < 1e-12)
    // incomplete block refuses; duplicate observation refuses
    val incomplete = rows.filterNot(r => r._1 == 4 && r._2 == "c")
    val e = intercept[IllegalArgumentException] {
      InferenceTests.cochranQ(incomplete.toDF("i", "t", "y"), "i", "t", "y")
    }
    assert(e.getMessage.contains("incomplete"))
    intercept[IllegalArgumentException] {
      InferenceTests.cochranQ((rows :+ ((1, "a", 0))).toDF("i", "t", "y"),
        "i", "t", "y")
    }
    // all-zero outcomes: denominator 0 -> null Q
    val zeros = rows.map { case (i, t, _) => (i, t, 0) }
    assert(InferenceTests.cochranQ(zeros.toDF("i", "t", "y"), "i", "t", "y")
      .head().isNullAt(3))
  }

  test("mantelHaenszel pools per-stratum odds and exposes confounding") {
    import spark.implicits._
    // classic confounded pair of 2x2 tables: within each stratum the
    // odds ratio is exactly 1, but the crude table suggests an effect
    val s1 = Seq.fill(40)(("s1", 1, 1)) ++ Seq.fill(10)(("s1", 1, 0)) ++
      Seq.fill(20)(("s1", 0, 1)) ++ Seq.fill(5)(("s1", 0, 0))
    val s2 = Seq.fill(5)(("s2", 1, 1)) ++ Seq.fill(20)(("s2", 1, 0)) ++
      Seq.fill(10)(("s2", 0, 1)) ++ Seq.fill(40)(("s2", 0, 0))
    val got = InferenceTests.mantelHaenszel(
      (s1 ++ s2).toDF("s", "t", "y"), "s", "t", "y").head()
    assert(got.getLong(0) == 150L && got.getLong(1) == 2L)
    // each stratum: OR = (40*5)/(10*20) = 1 and (5*40)/(20*10) = 1
    assert(math.abs(got.getDouble(3) - 1.0) < 1e-12) // or_mh
    // crude: A=45 B=30 C=30 D=45 -> OR = 2.25, visibly confounded
    assert(math.abs(got.getDouble(2) - 2.25) < 1e-12)
    // empty diagonal yields null crude OR
    val deg = InferenceTests.mantelHaenszel(
      Seq(("s", 1, 1), ("s", 0, 0)).toDF("s", "t", "y"), "s", "t", "y")
      .head()
    assert(deg.isNullAt(2) && deg.isNullAt(3))
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
