package graft.eval

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CalibrationSpec extends SparkSpec {

  private def toy = {
    import spark.implicits._
    // scores chosen so bins 0/5/9 are hit; labels hand-assigned
    Seq((0.05, 0.0), (0.08, 1.0), (0.55, 1.0), (0.58, 0.0),
      (0.52, 1.0), (0.95, 1.0), (1.00, 1.0)).toDF("p", "y")
  }

  test("calibrationCurve: hand-computed bins, 1.0 clamps into the last bin") {
    import spark.implicits._
    val got = BinaryMetrics.calibrationCurve(toy, "p", "y", bins = 10)
      .orderBy("bin")
      .as[(Int, Long, Double, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(0, 5, 9))
    val byBin = got.map(r => r._1 -> r).toMap
    assert(byBin(0)._2 == 2 && math.abs(byBin(0)._3 - 0.065) < 1e-12 &&
      math.abs(byBin(0)._4 - 0.5) < 1e-12)
    assert(byBin(5)._2 == 3 &&
      math.abs(byBin(5)._3 - (0.55 + 0.58 + 0.52) / 3) < 1e-12 &&
      math.abs(byBin(5)._4 - 2.0 / 3) < 1e-12)
    // score 1.0 would floor into bin 10 — must clamp to 9
    assert(byBin(9)._2 == 2 && math.abs(byBin(9)._4 - 1.0) < 1e-12)
    intercept[IllegalArgumentException](
      BinaryMetrics.calibrationCurve(toy, "p", "y", bins = 0))
  }

  test("brierScore: hand value; perfect and uninformed scorers") {
    import spark.implicits._
    val r = BinaryMetrics.brierScore(toy, "p", "y").head()
    val want = Seq((0.05, 0.0), (0.08, 1.0), (0.55, 1.0), (0.58, 0.0),
      (0.52, 1.0), (0.95, 1.0), (1.00, 1.0))
      .map { case (p, y) => (p - y) * (p - y) }.sum / 7
    assert(math.abs(r.getAs[Double]("brier") - want) < 1e-12)
    assert(r.getAs[Long]("n") == 7L)
    val perfect = Seq((1.0, 1.0), (0.0, 0.0)).toDF("p", "y")
    assert(BinaryMetrics.brierScore(perfect, "p", "y")
      .head().getAs[Double]("brier") == 0.0)
    val coin = Seq((0.5, 1.0), (0.5, 0.0)).toDF("p", "y")
    assert(math.abs(BinaryMetrics.brierScore(coin, "p", "y")
      .head().getAs[Double]("brier") - 0.25) < 1e-12)
  }

  test("isotonicCalibrate: hand PAV case, monotone input unchanged, " +
      "mass conserved, calibrateColumn lookup with empty-bin carry") {
    import spark.implicits._
    // 4 bins (bins=4, scores at bin centers), rates [0.2, 0.1, 0.6, 0.4]
    // with n=10 each → PAV pools (0,1)→0.15 and (2,3)→0.5
    def mk(bin: Int, pos: Int, n: Int) =
      (0 until n).map(i => (bin / 4.0 + 0.1, if (i < pos) 1.0 else 0.0))
    val df = (mk(0, 2, 10) ++ mk(1, 1, 10) ++ mk(2, 6, 10) ++ mk(3, 4, 10))
      .toDF("p", "y")
    val fit = BinaryMetrics.isotonicCalibrate(df, "p", "y", bins = 4)
      .orderBy("bin").as[(Int, Long, Long, Double, Double)].collect()
    assert(fit.map(_._5).toSeq == Seq(0.15, 0.15, 0.5, 0.5))
    assert(fit.map(_._4).toSeq == Seq(0.2, 0.1, 0.6, 0.4))
    // mass conservation: Σ n·calibrated == Σ pos
    assert(math.abs(fit.map(r => r._2 * r._5).sum -
      fit.map(_._3).sum.toDouble) < 1e-9)
    // already-monotone input passes through untouched
    val mono = (mk(0, 1, 10) ++ mk(1, 3, 10) ++ mk(2, 7, 10)).toDF("p", "y")
    val fit2 = BinaryMetrics.isotonicCalibrate(mono, "p", "y", bins = 4)
      .orderBy("bin").as[(Int, Long, Long, Double, Double)].collect()
    assert(fit2.map(_._5).toSeq == Seq(0.1, 0.3, 0.7))
    // lookup: bin 3 is EMPTY in `mono` — a bin-3 score inherits bin 2's
    // value; a below-range score clamps to the first fitted value
    val lut = fit2.map(r => (r._1, r._5))
    val probe = Seq(0.1, 0.35, 0.6, 0.9).toDF("p")
    val out = probe.select(BinaryMetrics.calibrateColumn(col("p"), lut,
      bins = 4).as("c")).as[Double].collect().toSeq
    assert(out == Seq(0.1, 0.3, 0.7, 0.7))
    intercept[IllegalArgumentException](
      BinaryMetrics.isotonicCalibrate(df, "p", "y", bins = 0))
  }

  test("aucBy matches the trapezoid auc under heavy ties, and hand cases") {
    import spark.implicits._
    // deterministic tie-heavy scores: 7 distinct values over 400 rows
    val rows = (0 until 400).map { i =>
      val score = (i * 13 % 7).toDouble / 10.0
      val label = if ((i * 31 + (i % 7) * 11) % 10 < 3 + (i * 13 % 7)) 1.0 else 0.0
      (i.toLong, score, label, if (i % 2 == 0) "even" else "odd")
    }.toDF("id", "p", "y", "g")
    val whole = BinaryMetrics.auc(rows, "p", "y").head().getAs[Double]("auc_roc")
    val viaRanks = BinaryMetrics.aucBy(rows, "p", "y").head()
      .getAs[Double]("auc_roc")
    assert(math.abs(whole - viaRanks) < 1e-12, s"$whole vs $viaRanks")
    // grouped: each group's AUC equals the trapezoid AUC of its slice
    val grouped = BinaryMetrics.aucBy(rows, "p", "y", "g")
      .orderBy("g").as[(String, Long, Long, Double)].collect()
    assert(grouped.map(_._1).toSeq == Seq("even", "odd"))
    grouped.foreach { case (g, pos, neg, a) =>
      val slice = rows.filter(col("g") === g)
      val want = BinaryMetrics.auc(slice, "p", "y").head()
        .getAs[Double]("auc_roc")
      assert(math.abs(a - want) < 1e-12, s"group $g: $a vs $want")
      assert(pos > 0 && neg > 0)
    }
    // perfect separation = 1.0; reversed = 0.0; single-class = NaN
    val perfect = Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0)).toDF("p", "y")
    assert(BinaryMetrics.aucBy(perfect, "p", "y").head()
      .getAs[Double]("auc_roc") == 1.0)
    val reversed = Seq((0.1, 1.0), (0.9, 0.0)).toDF("p", "y")
    assert(BinaryMetrics.aucBy(reversed, "p", "y").head()
      .getAs[Double]("auc_roc") == 0.0)
    val oneClass = Seq((0.1, 1.0), (0.9, 1.0)).toDF("p", "y")
    assert(BinaryMetrics.aucBy(oneClass, "p", "y").head()
      .getAs[Double]("auc_roc").isNaN)
  }

  test("isotonicCalibrateBy: per-group fits equal standalone fits") {
    import spark.implicits._
    def mk(g: String, bin: Int, pos: Int, n: Int) =
      (0 until n).map(i => (g, bin / 4.0 + 0.1, if (i < pos) 1.0 else 0.0))
    // group A needs pooling; group B is already monotone
    val df = (mk("A", 0, 2, 10) ++ mk("A", 1, 1, 10) ++ mk("A", 2, 6, 10) ++
      mk("B", 0, 1, 10) ++ mk("B", 2, 7, 10)).toDF("g", "p", "y")
    val by = BinaryMetrics.isotonicCalibrateBy(df, "p", "y", "g", bins = 4)
      .orderBy("g", "bin")
      .as[(String, Int, Long, Long, Double, Double)].collect()
    Seq("A", "B").foreach { g =>
      val standalone = BinaryMetrics.isotonicCalibrate(
          df.filter(col("g") === g), "p", "y", bins = 4)
        .orderBy("bin").as[(Int, Long, Long, Double, Double)].collect()
      val grouped = by.filter(_._1 == g)
        .map(r => (r._2, r._3, r._4, r._5, r._6))
      assert(grouped.toSeq == standalone.toSeq, s"group $g")
    }
    // group A pooled bins 0-1 (rates 0.2, 0.1 → 0.15); B untouched
    assert(by.filter(_._1 == "A").map(_._6).toSeq == Seq(0.15, 0.15, 0.6))
    assert(by.filter(_._1 == "B").map(_._6).toSeq == Seq(0.1, 0.7))
  }

  test("brierDecomposition: exact identity and hand case") {
    import spark.implicits._
    // two bins: scores {0.1, 0.3} in bins 0/1 at bins=2... use bins=10 with
    // in-bin score spread so within-bin terms are nonzero
    val df = Seq((0.02, 0.0), (0.08, 1.0), (0.82, 1.0), (0.88, 1.0),
      (0.85, 0.0)).toDF("p", "y")
    val r = BinaryMetrics.brierDecomposition(df, "p", "y", bins = 10).head()
    val brier = r.getAs[Double]("brier")
    val want = Seq((0.02, 0.0), (0.08, 1.0), (0.82, 1.0), (0.88, 1.0),
      (0.85, 0.0)).map { case (p, y) => (p - y) * (p - y) }.sum / 5
    assert(math.abs(brier - want) < 1e-12)
    val identity = r.getAs[Double]("reliability") -
      r.getAs[Double]("resolution") + r.getAs[Double]("uncertainty") +
      r.getAs[Double]("within_bin_var") -
      2 * r.getAs[Double]("within_bin_cov")
    assert(math.abs(brier - identity) < 1e-12, s"$brier vs $identity")
    // uncertainty = ȳ(1−ȳ) with ȳ = 3/5
    assert(math.abs(r.getAs[Double]("uncertainty") - 0.6 * 0.4) < 1e-12)
    // a perfectly calibrated uninformed scorer: rel 0, res 0
    val flat = Seq((0.5, 1.0), (0.5, 0.0)).toDF("p", "y")
    val fr = BinaryMetrics.brierDecomposition(flat, "p", "y").head()
    assert(math.abs(fr.getAs[Double]("reliability")) < 1e-12)
    assert(math.abs(fr.getAs[Double]("resolution")) < 1e-12)
    assert(BinaryMetrics.brierDecomposition(
      spark.emptyDataset[(Double, Double)].toDF("p", "y"), "p", "y")
      .count() == 0)
  }

  test("thresholdAtPrecision: picks the max-recall qualifying threshold; " +
      "empty when unattainable") {
    import spark.implicits._
    // descending-score curve: t=0.9 → P=1.0 R=1/3; t=0.7 → P=2/3 R=2/3;
    // t=0.5 → P=3/4 R=1.0; t=0.3 → P=3/5 R=1.0
    val df = Seq((0.9, 1.0), (0.7, 0.0), (0.5, 1.0), (0.5, 1.0),
      (0.3, 0.0)).toDF("p", "y")
    val at75 = BinaryMetrics.thresholdAtPrecision(df, "p", "y", 0.75)
      .collect()
    assert(at75.length == 1)
    // both t=0.9 (R=1/3) and t=0.5 (P=0.75, R=1.0) qualify → t=0.5 wins
    assert(at75(0).getAs[Double]("threshold") == 0.5)
    assert(math.abs(at75(0).getAs[Double]("recall") - 1.0) < 1e-12)
    // precision 1.0 only attainable at the top threshold (recall 1/3)
    val at100 = BinaryMetrics.thresholdAtPrecision(df, "p", "y", 1.0)
      .head()
    assert(at100.getAs[Double]("threshold") == 0.9)
    assert(math.abs(at100.getAs[Double]("recall") - 1.0 / 3) < 1e-12)
    // unattainable floor → empty frame, not an error
    val none = BinaryMetrics.thresholdAtPrecision(
      Seq((0.9, 0.0), (0.1, 1.0)).toDF("p", "y"), "p", "y", 0.9)
    assert(none.count() == 0L)
    intercept[IllegalArgumentException](
      BinaryMetrics.thresholdAtPrecision(df, "p", "y", 0.0))
  }

  test("null scores/labels are dropped from both metrics") {
    import spark.implicits._
    val withNulls = Seq((Some(0.5), Some(1.0)), (None: Option[Double], Some(1.0)),
      (Some(0.5), None: Option[Double])).toDF("p", "y")
    assert(BinaryMetrics.brierScore(withNulls, "p", "y")
      .head().getAs[Long]("n") == 1L)
    assert(BinaryMetrics.calibrationCurve(withNulls, "p", "y")
      .agg(sum("n")).head().getLong(0) == 1L)
  }

  test("liftTable: perfect scorer concentrates positives in bucket 1") {
    import spark.implicits._
    // 20 rows, 5 positives with the 5 highest scores, 4 buckets of 5
    val df = (1 to 20).map(i =>
      (100.0 - i, if (i <= 5) 1.0 else 0.0, i.toLong)).toDF("s", "y", "t")
    val got = BinaryMetrics.liftTable(df, "s", "y", "t", nBuckets = 4)
      .orderBy("bucket").collect()
    assert(got.length == 4)
    val b1 = got.head
    assert(b1.getLong(1) == 5L && b1.getLong(2) == 5L) // n, pos
    assert(b1.getDouble(3) == 1.0)                     // rate
    assert(b1.getDouble(4) == 1.0 / 0.25)              // lift = 4x
    assert(b1.getDouble(7) == 1.0)                     // gain: all pos in b1
    got.tail.foreach(r => assert(r.getLong(2) == 0L))
    // cumulative counts cover everything
    assert(got.last.getLong(5) == 20L && got.last.getLong(6) == 5L)
    assert(math.abs(got.last.getDouble(8) - 1.0) < 1e-15) // cum_lift -> 1
  }

  test("liftTable: ties split deterministically by the tie column and " +
      "bucket sizes follow the row_number formula") {
    import spark.implicits._
    // all scores equal: ranking is pure tie order; 7 rows into 3 buckets
    // -> sizes floor boundaries: ranks 1-2 / 3-4 / 5-7? formula:
    // bucket(r) = floor((r-1)*3/7): r=1,2,3 -> 0; 4,5 -> 1; 6,7 -> 2
    val df = (1 to 7).map(i => (1.0, (i % 2).toDouble, i.toLong))
      .toDF("s", "y", "t")
    val got = BinaryMetrics.liftTable(df, "s", "y", "t", nBuckets = 3)
      .orderBy("bucket").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(3L, 2L, 2L))
    // positives are rows with odd tie: buckets hold t=1,2,3 / 4,5 / 6,7
    assert(got.map(_.getLong(2)).toSeq == Seq(2L, 1L, 1L))
  }

  test("liftTable: null rows dropped; rates are exact long ratios") {
    import spark.implicits._
    val df = Seq((Some(0.9), Some(1.0), Some(1L)),
      (None, Some(1.0), Some(2L)), (Some(0.1), None, Some(3L)),
      (Some(0.2), Some(0.0), None), (Some(0.5), Some(0.0), Some(4L)))
      .toDF("s", "y", "t")
    val got = BinaryMetrics.liftTable(df, "s", "y", "t", nBuckets = 1)
      .collect()
    assert(got.length == 1)
    assert(got.head.getLong(1) == 2L && got.head.getLong(2) == 1L)
    assert(got.head.getDouble(3) == 0.5)
  }
}
