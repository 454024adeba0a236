package graft.events

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SurvivalSpec extends SparkSpec {

  // textbook right-censored sample: (duration, event)
  private val sample = Seq(
    (6.0, 1), (6.0, 1), (6.0, 1), (6.0, 0), (7.0, 1), (9.0, 0), (10.0, 1),
    (10.0, 0), (11.0, 0), (13.0, 1), (16.0, 1), (17.0, 0), (19.0, 0),
    (20.0, 0), (22.0, 1), (23.0, 1), (25.0, 0), (32.0, 0), (32.0, 0),
    (34.0, 0), (35.0, 0))

  private def bruteKm(rows: Seq[(Double, Int)]): Seq[(Double, Double)] = {
    val byT = rows.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = rows.size.toDouble
    var s = 1.0
    byT.map { case (t, grp) =>
      val d = grp.count(_._2 == 1).toDouble
      s *= (1.0 - d / atRisk)
      val out = (t, s)
      atRisk -= grp.size
      out
    }
  }

  test("kaplanMeier reproduces the brute-force product-limit curve") {
    import spark.implicits._
    val got = Survival.kaplanMeier(sample.toDF("dur", "ev"), "dur", "ev")
      .select("t", "survival").as[(Double, Double)].collect().toSeq
    val ref = bruteKm(sample)
    assert(got.map(_._1) == ref.map(_._1))
    got.zip(ref).foreach { case ((_, s), (_, r)) =>
      assert(math.abs(s - r) < 1e-12) }
    // the famous 6MP value: S(6) = (21-3)/21
    assert(math.abs(got.head._2 - 18.0 / 21) < 1e-12)
    // at-risk / event / censored bookkeeping at t=6 and t=10
    val rows = Survival.kaplanMeier(sample.toDF("dur", "ev"), "dur", "ev")
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows(6.0) == ((21L, 3L, 1L)))
    assert(rows(10.0) == ((15L, 1L, 1L)))
  }

  test("kaplanMeier hits zero when the last at-risk subject fails") {
    import spark.implicits._
    val all = Seq((1.0, 1), (2.0, 1), (3.0, 1))
    val got = Survival.kaplanMeier(all.toDF("dur", "ev"), "dur", "ev")
      .select("t", "survival").as[(Double, Double)].collect().toSeq
    assert(math.abs(got(0)._2 - 2.0 / 3) < 1e-12)
    assert(math.abs(got(1)._2 - 1.0 / 3) < 1e-12)
    assert(got(2)._2 == 0.0)
  }

  test("kaplanMeierBy partitions curves per group") {
    import spark.implicits._
    val df = (sample.map { case (t, e) => ("g1", t, e) } ++
      Seq(("g2", 5.0, 1), ("g2", 8.0, 0))).toDF("g", "dur", "ev")
    val got = Survival.kaplanMeierBy(df, "g", "dur", "ev")
    val g1 = got.filter(col("g") === "g1")
      .select("t", "survival").as[(Double, Double)].collect().toSeq
    val ref = bruteKm(sample)
    g1.zip(ref).foreach { case ((t, s), (rt, rs)) =>
      assert(t == rt && math.abs(s - rs) < 1e-12) }
    val g2 = got.filter(col("g") === "g2")
      .select("t", "survival").as[(Double, Double)].collect().toMap
    assert(math.abs(g2(5.0) - 0.5) < 1e-12 && g2(8.0) == 0.5)
  }

  test("logRank observed/expected match a brute-force computation") {
    import spark.implicits._
    val g1 = Seq((3.0, 1), (5.0, 1), (7.0, 0), (9.0, 1), (18.0, 0))
    val g2 = Seq((12.0, 1), (19.0, 1), (20.0, 0), (20.0, 1), (33.0, 0))
    val df = (g1.map { case (t, e) => ("a", t, e) } ++
      g2.map { case (t, e) => ("b", t, e) }).toDF("g", "dur", "ev")
    // brute force over every distinct time
    val rows = g1.map { case (t, e) => ("a", t, e) } ++
      g2.map { case (t, e) => ("b", t, e) }
    val times = rows.map(_._2).distinct.sorted
    var (ea, eb, oa, ob) = (0.0, 0.0, 0.0, 0.0)
    times.foreach { t =>
      val atRisk = rows.filter(_._2 >= t)
      val ra = atRisk.count(_._1 == "a").toDouble
      val rt = atRisk.size.toDouble
      val dt = rows.filter(r => r._2 == t && r._3 == 1)
      ea += dt.size * ra / rt
      eb += dt.size * (rt - ra) / rt
      oa += dt.count(_._1 == "a")
      ob += dt.count(_._1 == "b")
    }
    val got = Survival.logRank(df, "g", "dur", "ev")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(math.abs(got("a")._1 - oa) < 1e-12)
    assert(math.abs(got("a")._2 - ea) < 1e-12)
    assert(math.abs(got("b")._1 - ob) < 1e-12)
    assert(math.abs(got("b")._2 - eb) < 1e-12)
    val stat = Survival.logRankStat(df, "g", "dur", "ev").head()
    val chi2 = (oa - ea) * (oa - ea) / ea + (ob - eb) * (ob - eb) / eb
    assert(stat.getLong(0) == 2L && stat.getLong(2) == 1L)
    assert(math.abs(stat.getDouble(1) - chi2) < 1e-12)
  }

  test("identical groups give logRank chi2 ~ 0") {
    import spark.implicits._
    val base = Seq((2.0, 1), (4.0, 1), (6.0, 0), (8.0, 1))
    val df = (base.map { case (t, e) => ("a", t, e) } ++
      base.map { case (t, e) => ("b", t, e) }).toDF("g", "dur", "ev")
    val stat = Survival.logRankStat(df, "g", "dur", "ev").head()
    assert(math.abs(stat.getDouble(1)) < 1e-12)
  }

  test("nelsonAalenBy: hand-computed hazard ladder with censoring; " +
      "exp(-H) tracks the KM curve from above") {
    import spark.implicits._
    // group a: durations (1,ev) (2,ev) (2,cens) (3,ev):
    //   t=1: risk 4, d 1 -> H = 1/4
    //   t=2: risk 3, d 1 -> H = 1/4 + 1/3
    //   t=3: risk 1, d 1 -> H = 1/4 + 1/3 + 1
    val rows = Seq(("a", 1.0, 1), ("a", 2.0, 1), ("a", 2.0, 0),
      ("a", 3.0, 1), ("b", 5.0, 0))
    val df = rows.toDF("g", "dur", "ev")
    val got = Survival.nelsonAalenBy(df, "g", "dur", "ev")
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r).toMap
    val h1 = got(("a", 1.0))
    assert(h1.getLong(2) == 4L && h1.getLong(3) == 1L)
    assert(math.abs(h1.getDouble(4) - 0.25) < 1e-15)
    val h2 = got(("a", 2.0))
    assert(h2.getLong(2) == 3L)
    assert(math.abs(h2.getDouble(4) - (0.25 + 1.0 / 3)) < 1e-15)
    val h3 = got(("a", 3.0))
    assert(math.abs(h3.getDouble(4) - (0.25 + 1.0 / 3 + 1.0)) < 1e-15)
    assert(math.abs(h3.getDouble(5) -
      math.exp(-(0.25 + 1.0 / 3 + 1.0))) < 1e-15)
    // all-censored group: hazard stays 0, breslow survival 1
    val b = got(("b", 5.0))
    assert(b.getDouble(4) == 0.0 && b.getDouble(5) == 1.0)
    // Breslow bounds KM from above at every event time
    val km = Survival.kaplanMeierBy(df, "g", "dur", "ev")
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        r.getAs[Double]("survival")).toMap
    got.foreach { case (k, r) =>
      assert(r.getDouble(5) >= km(k) - 1e-12, s"breslow < KM at $k")
    }
  }

  test("kaplanMeier: maxDistinct refuses continuous durations; binned " +
      "tier snaps to the grid and brackets the exact curve") {
    import spark.implicits._
    val cont = (1 to 300).map(i => (i * 0.37, i % 3 min 1)).toDF("dur", "ev")
    val e = intercept[IllegalArgumentException] {
      Survival.kaplanMeier(cont, "dur", "ev", maxDistinct = 100)
    }
    assert(e.getMessage.contains("kaplanMeierBinned"))
    // binned with bins >= distinct count reproduces the exact curve at
    // the grid points: same survival multiset (durations snap up but
    // every subject keeps its relative order when cells hold one value)
    val small = sample.toDF("dur", "ev")
    val exact = Survival.kaplanMeier(small, "dur", "ev")
      .select("survival").collect().map(_.getDouble(0)).sorted
    val fine = Survival.kaplanMeierBinned(small, "dur", "ev", bins = 100000)
      .select("survival").collect().map(_.getDouble(0)).sorted
    assert(exact.length == fine.length)
    exact.zip(fine).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12) }
    // coarse grid: still a valid monotone survival curve ending within
    // the exact curve's terminal value (coarsening merges risk sets)
    val coarse = Survival.kaplanMeierBinned(small, "dur", "ev", bins = 5)
      .select("t", "survival").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(coarse.length <= 6)
    coarse.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0)._2 >= w(1)._2 - 1e-12) }
    // degenerate single-duration input
    val one = Seq((2.0, 1), (2.0, 0)).toDF("dur", "ev")
    val c1 = Survival.kaplanMeierBinned(one, "dur", "ev").collect()
    assert(c1.length == 1 && math.abs(c1(0).getDouble(4) - 0.5) < 1e-12)
  }
}
