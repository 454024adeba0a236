package graft.stat

import graft.SparkSpec

class ExperimentSpec extends SparkSpec {

  test("cuped: hand-checked theta and adjusted means") {
    import spark.implicits._
    // pre perfectly predicts post within noise: post = 2*pre + arm effect
    val units = Seq(
      ("t", 1.0, 2.5), ("t", 2.0, 4.4), ("t", 3.0, 6.6),
      ("c", 1.0, 2.0), ("c", 2.0, 4.1), ("c", 3.0, 5.9)
    ).toDF("arm", "pre", "post")
    val rows = Experiment.cuped(units, "arm", "pre", "post")
      .orderBy("arm").collect()
    // pooled theta = cov_pop(pre,post)/var_pop(pre); replicate in Scala
    val pre = Seq(1.0, 2.0, 3.0, 1.0, 2.0, 3.0)
    val post = Seq(2.5, 4.4, 6.6, 2.0, 4.1, 5.9)
    val muPre = pre.sum / 6; val muPost = post.sum / 6
    val theta = pre.zip(post).map { case (x, y) =>
      (x - muPre) * (y - muPost) }.sum /
      pre.map(x => (x - muPre) * (x - muPre)).sum
    val adj = pre.zip(post).map { case (x, y) => y - theta * (x - muPre) }
    val cMean = adj.drop(3).sum / 3; val tMean = adj.take(3).sum / 3
    assert(rows.map(_.getString(0)).toSeq == Seq("c", "t"))
    assert(math.abs(rows(0).getDouble(3) - cMean) < 1e-12)
    assert(math.abs(rows(1).getDouble(3) - tMean) < 1e-12)
    // variance strictly reduced when pre correlates with post
    rows.foreach { r =>
      assert(r.getDouble(5) < r.getDouble(4),
        s"var_cuped ${r.getDouble(5)} !< var_post ${r.getDouble(4)}")
    }
  }

  test("cuped: constant covariate degrades to no adjustment") {
    import spark.implicits._
    val units = Seq(("t", 5.0, 1.0), ("t", 5.0, 3.0),
      ("c", 5.0, 2.0), ("c", 5.0, 4.0)).toDF("arm", "pre", "post")
    val rows = Experiment.cuped(units, "arm", "pre", "post")
      .orderBy("arm").collect()
    rows.foreach { r =>
      assert(r.getDouble(2) == r.getDouble(3)) // mean_cuped == mean_post
      assert(r.getDouble(4) == r.getDouble(5))
    }
  }

  test("cuped: null pre/post rows dropped from both fit and report") {
    import spark.implicits._
    val units = Seq(("t", Some(1.0), Some(2.0)), ("t", None, Some(9.0)),
      ("c", Some(2.0), None), ("c", Some(3.0), Some(4.0)))
      .toDF("arm", "pre", "post")
    val rows = Experiment.cuped(units, "arm", "pre", "post")
      .orderBy("arm").collect()
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toSeq ==
      Seq("c" -> 1L, "t" -> 1L))
  }

  test("srmCheck: balanced arms give chi2 ~ 0, unbalanced flag") {
    import spark.implicits._
    val balanced = (1 to 300).map(i => (i % 2).toString).toDF("arm")
    val b = Experiment.srmCheck(balanced, "arm",
      Seq("0" -> 1.0, "1" -> 1.0)).collect()(0)
    assert(b.getLong(0) == 300 && b.getDouble(2) == 0.0)
    assert(b.getDouble(4) > 0.99) // p ~ 1

    // 200 vs 100 against 50/50: chi2 = (50^2/150)*2 = 33.33
    val skew = ((1 to 200).map(_ => "0") ++ (1 to 100).map(_ => "1"))
      .toDF("arm")
    val s = Experiment.srmCheck(skew, "arm",
      Seq("0" -> 1.0, "1" -> 1.0)).collect()(0)
    assert(math.abs(s.getDouble(2) - 100.0 * 100 / 300) < 1e-9)
    assert(s.getDouble(4) < 1e-3) // a real SRM
  }

  test("srmCheck: expected arm with zero observed rows still counted") {
    import spark.implicits._
    val df = Seq("a", "a", "b", "b").toDF("arm")
    val r = Experiment.srmCheck(df, "arm",
      Seq("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)).collect()(0)
    // e = 4/3 each; chi2 = 2*(4/3-... ) observed (2,2,0)
    val e = 4.0 / 3
    val expChi2 = 2 * (2 - e) * (2 - e) / e + e
    assert(math.abs(r.getDouble(2) - expChi2) < 1e-9)
    assert(r.getLong(3) == 2)
  }

  test("upliftDeciles: hand-checked two-bucket qini") {
    import spark.implicits._
    // top-half scores: treated respond 2/2, control 1/2; bottom: nobody
    val units = Seq(
      ("t", 8.0, 1.0), ("t", 7.0, 1.0), ("t", 2.0, 0.0), ("t", 1.0, 0.0),
      ("c", 6.0, 0.0), ("c", 5.0, 1.0), ("c", 4.0, 0.0), ("c", 3.0, 0.0)
    ).toDF("arm", "score", "y")
    val got = Experiment.upliftDeciles(units, "arm", "t", "y", "score",
      buckets = 2).collect()
    assert(got.length == 2)
    val b1 = got(0)
    assert(b1.getLong(0) == 1 && b1.getLong(1) == 2 && b1.getLong(2) == 2)
    assert(b1.getDouble(5) == 1.0 && b1.getDouble(6) == 0.5) // rates
    assert(b1.getDouble(7) == 0.5)                           // uplift
    assert(b1.getDouble(8) == 1.0) // qini(1) = 2 - 1*(2/2)
    val b2 = got(1)
    assert(b2.getDouble(7) == 0.0)
    assert(b2.getDouble(8) == 1.0) // flat tail: qini(2) = 2 - 1*(4/4)
    intercept[IllegalArgumentException](
      Experiment.upliftDeciles(units, "arm", "t", "y", "score", 1))
  }

  test("upliftDeciles: bucket with no controls yields null rate/uplift") {
    import spark.implicits._
    val units = Seq(
      ("t", 9.0, 1.0), ("t", 8.0, 0.0),  // top bucket all treated
      ("c", 2.0, 1.0), ("t", 1.0, 0.0))
      .toDF("arm", "score", "y")
    val got = Experiment.upliftDeciles(units, "arm", "t", "y", "score",
      buckets = 2).collect()
    assert(got(0).getLong(2) == 0 && got(0).isNullAt(6) &&
      got(0).isNullAt(7))
  }

  test("srmCheck: unknown observed arm is a hard error") {
    import spark.implicits._
    val df = Seq("a", "b", "z").toDF("arm")
    val ex = intercept[IllegalArgumentException] {
      Experiment.srmCheck(df, "arm", Seq("a" -> 1.0, "b" -> 1.0))
    }
    assert(ex.getMessage.contains("z"))
  }

  test("diffInDiff recovers a planted effect with parallel trends") {
    import spark.implicits._
    // control: 10 -> 12 (trend +2); treated: 20 -> 25 (trend +2, effect +3)
    // two units per cell with ±1 spread so the SE is well-defined
    val rows = Seq(
      (1, 0, 19.0), (1, 0, 21.0), (1, 1, 24.0), (1, 1, 26.0),
      (0, 0, 9.0), (0, 0, 11.0), (0, 1, 11.0), (0, 1, 13.0))
    val got = Experiment.diffInDiff(rows.toDF("t", "p", "y"), "t", "p", "y")
      .head()
    assert(got.getLong(0) == 2L && got.getLong(1) == 2L &&
      got.getLong(2) == 2L && got.getLong(3) == 2L)
    assert(math.abs(got.getDouble(4) - 20.0) < 1e-12) // mean_tpre
    assert(math.abs(got.getDouble(8) - 3.0) < 1e-12)  // did
    // each cell: s² = 2, n = 2 -> v = 1; SE = sqrt(4) = 2
    assert(math.abs(got.getDouble(9) - 2.0) < 1e-12)
    // an empty cell nulls the estimate rather than faking a zero
    val missing = Experiment.diffInDiff(
      rows.filterNot(r => r._1 == 1 && r._2 == 1).toDF("t", "p", "y"),
      "t", "p", "y").head()
    assert(missing.isNullAt(8) && missing.isNullAt(9))
    // a SINGLETON cell: the cell-means point estimate is defined (n=1
    // means exist), only the SE nulls (no sample variance at n=1)
    val singleton = Experiment.diffInDiff(
      (rows.filterNot(r => r._1 == 1 && r._2 == 1) :+ (1, 1, 25.0))
        .toDF("t", "p", "y"), "t", "p", "y").head()
    assert(singleton.getLong(1) == 1L)
    assert(math.abs(singleton.getDouble(8) - 3.0) < 1e-12) // did defined
    assert(singleton.isNullAt(9))                          // se null
  }

  test("ipwAte: HT and Hajek agree on balanced uniform propensities") {
    import spark.implicits._
    // e = 0.5 everywhere: IPW reduces to the two-arm mean difference
    val rows = Seq((1.0, 10.0, 0.5), (1.0, 14.0, 0.5),
      (0.0, 6.0, 0.5), (0.0, 10.0, 0.5))
    val got = Experiment.ipwAte(rows.toDF("t", "y", "e"), "t", "y", "e")
      .head()
    assert(got.getLong(0) == 4L && got.getLong(1) == 2L && got.getLong(2) == 2L)
    assert(math.abs(got.getDouble(5) - 4.0) < 1e-12) // ate_ht
    assert(math.abs(got.getDouble(6) - 4.0) < 1e-12) // ate_hajek
  }

  test("ipwAte clips extreme propensities and hand-checks the weighted sums") {
    import spark.implicits._
    // e = 0.001 clips to 0.05; e = 0.999 clips to 0.95
    val rows = Seq((1.0, 2.0, 0.001), (0.0, 3.0, 0.999))
    val got = Experiment.ipwAte(rows.toDF("t", "y", "e"), "t", "y", "e",
      clip = 0.05).head()
    val wyt = 2.0 / 0.05; val wyc = 3.0 / 0.05
    assert(math.abs(got.getDouble(5) - (wyt - wyc) / 2) < 1e-12)
    // Hajek normalizes the clipped weights away entirely here
    assert(math.abs(got.getDouble(6) - (2.0 - 3.0)) < 1e-12)
    // single-arm input -> null ATEs
    val oneArm = Experiment.ipwAte(
      Seq((1.0, 2.0, 0.5)).toDF("t", "y", "e"), "t", "y", "e").head()
    assert(oneArm.isNullAt(5) && oneArm.isNullAt(6))
    intercept[IllegalArgumentException] {
      Experiment.ipwAte(rows.toDF("t", "y", "e"), "t", "y", "e", clip = 0.6)
    }
  }
}
