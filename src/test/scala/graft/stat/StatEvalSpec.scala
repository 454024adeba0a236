package graft.stat

import graft.SparkSpec
import graft.eval.BinaryMetrics
import graft.outlier.Mahalanobis
import graft.util.VectorOps
import org.apache.spark.sql.functions._

class StatEvalSpec extends SparkSpec {

  test("Mahalanobis distance of the mean point is 0; planted point is flagged") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = (1 to 500).map { _ =>
      val x = rnd.nextGaussian(); (x, x * 0.5 + rnd.nextGaussian() * 0.1)
    }
    val df = (base :+ ((10.0, -10.0))).toDF("x", "y")
    val flagged = Mahalanobis.addDistance(df, Seq("x", "y"), 0.999)
    val out = flagged.filter(col("__outlier")).select("x", "y").collect()
    assert(out.exists(r => r.getDouble(0) == 10.0 && r.getDouble(1) == -10.0))
  }

  test("Mahalanobis wide-column fit equals the codegen aggregate fit") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cols = (0 until 5).map(i => s"c$i")
    val rows = (1 to 400).map { _ =>
      val base = rnd.nextGaussian()
      (base + rnd.nextGaussian() * 0.5, base * 2 + rnd.nextGaussian(),
        rnd.nextGaussian(), base - rnd.nextGaussian() * 0.3,
        rnd.nextGaussian() * 3)
    }
    val df = rows.toDF(cols: _*)
    val narrow = Mahalanobis.fit(df, cols)               // codegen agg path
    val wide = Mahalanobis.fit(df, cols, wideThreshold = 2) // typed path
    cols.indices.foreach { i =>
      assert(math.abs(narrow.means(i) - wide.means(i)) < 1e-9)
      assert(math.abs(narrow.stds(i) - wide.stds(i)) < 1e-9)
      cols.indices.foreach { j =>
        assert(math.abs(narrow.invCorr(i)(j) - wide.invCorr(i)(j)) < 1e-6,
          s"invCorr($i)($j): ${narrow.invCorr(i)(j)} vs ${wide.invCorr(i)(j)}")
      }
    }
  }

  test("chi2Threshold matches the closed form for k=2") {
    assert(math.abs(Mahalanobis.chi2Threshold(2, 0.999) -
      math.sqrt(-2 * math.log(0.001))) < 1e-9)
  }

  test("tTestMatrix p-value is high for same-distribution groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(1)
    val df = (1 to 400).map(i =>
      (if (i % 2 == 0) "a" else "b", rnd.nextGaussian())).toDF("g", "v")
    val m = StatTests.tTestMatrix(df, "v", Seq("g"))
    assert(m.size == 1)
    assert(m.head._3 > 0.01) // same distribution → no significant difference
  }

  test("tTestMatrix p-value is tiny for shifted groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(2)
    val df = (1 to 400).map { i =>
      val shift = if (i % 2 == 0) 0.0 else 5.0
      (if (i % 2 == 0) "a" else "b", rnd.nextGaussian() + shift)
    }.toDF("g", "v")
    assert(StatTests.tTestMatrix(df, "v", Seq("g")).head._3 < 1e-10)
  }

  test("tTestMatrixFull: p-value is 2·(1 − T_df.cdf|t|) of the emitted t/df") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 300).map { i =>
      val g = i % 3
      (s"g$g", rnd.nextGaussian() + g * 0.5)
    }.toDF("g", "v")
    val full = StatTests.tTestMatrixFull(df, "v", Seq("g"))
    assert(full.size == 3)
    full.foreach { case (_, _, r) =>
      val expected = 2.0 * (1.0 -
        new org.apache.commons.math3.distribution.TDistribution(r.df)
          .cumulativeProbability(math.abs(r.tStat)))
      assert(math.abs(r.pValue - expected) < 1e-12,
        s"p=${r.pValue} vs 2(1-cdf)=$expected at t=${r.tStat}, df=${r.df}")
    }
    // the p-value-only facade is the same matrix
    val ps = StatTests.tTestMatrix(df, "v", Seq("g"))
    assert(ps.map(_._3) == full.map(_._3.pValue))
  }

  test("propTest: hand z for a known 2x2, p = 2(1-Phi|z|), degenerate NaN") {
    import spark.implicits._
    // group a: 30/100 successes; group b: 50/100
    val df = ((0 until 100).map(i => ("a", if (i < 30) 1 else 0)) ++
      (0 until 100).map(i => ("b", if (i < 50) 1 else 0))).toDF("g", "kept")
    val r = StatTests.propTest(df, "kept", Seq("g")).head()
    val pooled = 80.0 / 200.0
    val wantZ = (0.3 - 0.5) / math.sqrt(pooled * (1 - pooled) * (2.0 / 100))
    assert(math.abs(r.getAs[Double]("z_stat") - wantZ) < 1e-12)
    assert(math.abs(r.getAs[Double]("rate1") - 0.3) < 1e-12)
    val nd = new org.apache.commons.math3.distribution.NormalDistribution()
    val wantP = 2.0 * (1.0 - nd.cumulativeProbability(math.abs(wantZ)))
    assert(math.abs(r.getAs[Double]("p_value") - wantP) < 1e-12)
    // identical rates: z = 0, p = 1
    val same = ((0 until 50).map(i => ("a", i % 2)) ++
      (0 until 50).map(i => ("b", i % 2))).toDF("g", "kept")
    val rs = StatTests.propTest(same, "kept", Seq("g")).head()
    assert(rs.getAs[Double]("z_stat") == 0.0 &&
      math.abs(rs.getAs[Double]("p_value") - 1.0) < 1e-12)
    // pooled rate 0 (no successes anywhere): NaN, not a crash
    val zero = Seq(("a", 0), ("b", 0)).toDF("g", "kept")
    val rz = StatTests.propTest(zero, "kept", Seq("g")).head()
    assert(rz.getAs[Double]("z_stat").isNaN &&
      rz.getAs[Double]("p_value").isNaN)
  }

  test("KS test accepts the true distribution, rejects a wrong one") {
    val df = spark.range(2000).select(randn(42).as("v"))
    val ok = StatTests.ksTest(df, "v", "norm", 0, 1)
    assert(ok.pValue > 0.01)
    val bad = StatTests.ksTest(df, "v", "uniform", 0, 1)
    assert(bad.pValue < 1e-6)
  }

  test("ksTestMulti (single sort) matches per-distribution mllib results") {
    val df = spark.range(2000).select(randn(42).as("v"))
    val multi = StatTests.ksTestMulti(df, "v",
      Seq(("n", "norm", Seq(0.0, 1.0)), ("u", "uniform", Seq(0.0, 1.0)))).toMap
    val n1 = StatTests.ksTest(df, "v", "norm", 0, 1)
    val u1 = StatTests.ksTest(df, "v", "uniform", 0, 1)
    assert(math.abs(multi("n").statistic - n1.statistic) < 1e-12)
    assert(math.abs(multi("u").statistic - u1.statistic) < 1e-12)
    assert(math.abs(multi("n").pValue - n1.pValue) < 1e-6)
  }

  test("ksTestApprox tracks the exact statistic within its error bound") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(5000)(rnd.nextGaussian()).toDF("v")
    val dists = Seq(
      ("norm01", "norm", Seq(0.0, 1.0)),
      ("uniform", "uniform", Seq(-4.0, 4.0)))
    val exact = StatTests.ksTestMulti(data, "v", dists).toMap
    val approx = StatTests.ksTestApprox(data, "v", dists, m = 512).toMap
    dists.foreach { case (label, _, _) =>
      val e = exact(label).statistic
      val a = approx(label).statistic
      assert(math.abs(e - a) < 1.0 / 512 + 2e-3,
        s"$label exact=$e approx=$a")
    }
    // and the decision agrees: normal accepted, uniform strongly rejected
    assert(approx("norm01").pValue > 0.01)
    assert(approx("uniform").pValue < 1e-6)
  }

  test("confusion matrix counts sum to n and match manual counts") {
    import spark.implicits._
    val df = Seq((0.9, 1.0), (0.8, 1.0), (0.4, 1.0), (0.7, 0.0), (0.2, 0.0),
      (0.1, 0.0)).toDF("score", "label")
    val r = BinaryMetrics.confusionMatrix(df, "score", "label", 0.5).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 1L, 1L, 2L))) // tn fp fn tp
  }

  test("roc curve matches mllib adapter point set") {
    import spark.implicits._
    val df = Seq((0.9, 1.0), (0.8, 1.0), (0.4, 1.0), (0.7, 0.0), (0.2, 0.0),
      (0.1, 0.0)).toDF("score", "label")
    val native = BinaryMetrics.roc(df, "score", "label")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    val mllib = BinaryMetrics.mllibMetrics(df, "score", "label")
      .roc().collect().toSet
    assert(native == mllib)
  }

  test("per-curve threshold accessors match mllib point sets") {
    import spark.implicits._
    val df = Seq((0.9, 1.0), (0.8, 1.0), (0.8, 0.0), (0.7, 0.0), (0.6, 1.0),
      (0.4, 1.0), (0.2, 0.0), (0.2, 1.0), (0.1, 0.0))
      .toDF("score", "label").repartition(4)
    val m = BinaryMetrics.mllibMetrics(df, "score", "label")
    def pts(native: org.apache.spark.sql.DataFrame) =
      native.collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    def close(a: Set[(Double, Double)], b: Set[(Double, Double)]): Boolean = {
      val bs = b.toSeq.sortBy(_._1); val as = a.toSeq.sortBy(_._1)
      as.size == bs.size && as.zip(bs).forall { case ((t1, v1), (t2, v2)) =>
        t1 == t2 && math.abs(v1 - v2) < 1e-12 }
    }
    assert(BinaryMetrics.thresholds(df, "score", "label")
      .collect().map(_.getDouble(0)).toSeq ==
      m.thresholds().collect().toSeq.sorted.reverse)
    assert(close(pts(BinaryMetrics.precisionByThreshold(df, "score", "label")),
      m.precisionByThreshold().collect().toSet))
    assert(close(pts(BinaryMetrics.recallByThreshold(df, "score", "label")),
      m.recallByThreshold().collect().toSet))
    assert(close(pts(BinaryMetrics.fMeasureByThreshold(df, "score", "label")),
      m.fMeasureByThreshold().collect().toSet))
    assert(close(pts(BinaryMetrics.fMeasureByThreshold(df, "score", "label", 2.0)),
      m.fMeasureByThreshold(2.0).collect().toSet))
    // all-negative data: P + R = 0 at every threshold -> F = 0, not NaN
    val neg = Seq((0.9, 0.0), (0.5, 0.0)).toDF("score", "label")
    assert(BinaryMetrics.fMeasureByThreshold(neg, "score", "label")
      .collect().forall(_.getDouble(1) == 0.0))
  }

  test("auc via mllib adapter on perfect classifier is 1") {
    import spark.implicits._
    val df = Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0), (0.1, 0.0))
      .toDF("score", "label")
    assert(BinaryMetrics.mllibMetrics(df, "score", "label").areaUnderROC() == 1.0)
  }

  test("DataFrame-native auc matches mllib areaUnderROC/areaUnderPR") {
    import spark.implicits._
    // imperfect classifier with score ties and both label classes per tie
    val df = Seq((0.9, 1.0), (0.8, 1.0), (0.8, 0.0), (0.7, 0.0), (0.6, 1.0),
      (0.6, 0.0), (0.4, 1.0), (0.2, 0.0), (0.2, 1.0), (0.1, 0.0))
      .toDF("score", "label").repartition(4)
    val native = BinaryMetrics.auc(df, "score", "label").head()
    val m = BinaryMetrics.mllibMetrics(df, "score", "label")
    assert(math.abs(native.getDouble(0) - m.areaUnderROC()) < 1e-12,
      s"roc ${native.getDouble(0)} vs ${m.areaUnderROC()}")
    assert(math.abs(native.getDouble(1) - m.areaUnderPR()) < 1e-12,
      s"pr ${native.getDouble(1)} vs ${m.areaUnderPR()}")
    // perfect classifier: both areas 1
    val perfect = Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0), (0.1, 0.0))
      .toDF("score", "label")
    val pa = BinaryMetrics.auc(perfect, "score", "label").head()
    assert(pa.getDouble(0) == 1.0 && pa.getDouble(1) == 1.0)
  }

  test("disassemble splits arrays at min-width with ragged input") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, 2.0, 3.0)), (2L, Seq(4.0, 5.0)))
      .toDF("id", "arr")
    val out = VectorOps.disassemble(df, "arr")
    assert(out.columns.toSeq == Seq("id", "arr_0", "arr_1"))
    assert(out.orderBy("id").collect().map(_.getDouble(1)).toSeq == Seq(1.0, 4.0))
  }

  test("disassemble handles ml vectors") {
    import spark.implicits._
    import org.apache.spark.ml.linalg.Vectors
    val df = Seq((1L, Vectors.dense(1.0, 2.0)), (2L, Vectors.dense(3.0, 4.0)))
      .toDF("id", "vec")
    val out = VectorOps.disassemble(df, "vec")
    assert(out.columns.toSeq == Seq("id", "vec_0", "vec_1"))
    assert(out.orderBy("id").collect().map(_.getDouble(2)).toSeq == Seq(2.0, 4.0))
  }

  test("vecProfile profiles each dimension, tolerating ragged vectors") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0f, 10.0f)), (2L, Seq(3.0f, 30.0f)),
      (3L, Seq(5.0f))) // ragged: dim 1 has coverage 2 of 3
      .toDF("id", "embedding")
    val got = VectorOps.vecProfile(df, "embedding")
      .orderBy("dim").collect()
    assert(got.length == 2)
    val d0 = got(0)
    assert(d0.getInt(0) == 0 && d0.getLong(1) == 3L)
    assert(math.abs(d0.getDouble(2) - 3.0) < 1e-12)          // mean
    assert(math.abs(d0.getDouble(3) - (35.0 / 3 - 9)) < 1e-9) // pop var
    assert(d0.getDouble(4) == 1.0 && d0.getDouble(5) == 5.0)
    val d1 = got(1)
    assert(d1.getLong(1) == 2L && math.abs(d1.getDouble(2) - 20.0) < 1e-12)
    // null vectors are skipped entirely
    val withNull = Seq((1L, Some(Seq(2.0f))), (2L, None))
      .toDF("id", "embedding")
    val n = VectorOps.vecProfile(withNull, "embedding").collect()
    assert(n.length == 1 && n(0).getLong(1) == 1L)
  }

  test("simpsonCheck flags the planted paradox; aligned data stays clean") {
    import spark.implicits._
    // two strata, each with POSITIVE within-group slope, but group B
    // sits at high x / low y so the pooled slope is negative
    val gA = Seq((1.0, 10.0), (2.0, 11.0), (3.0, 12.0))
    val gB = Seq((11.0, 1.0), (12.0, 2.0), (13.0, 3.0))
    val df = (gA.map { case (x, y) => ("A", x, y) } ++
      gB.map { case (x, y) => ("B", x, y) }).toDF("g", "x", "y")
    val got = graft.agg.Stats.simpsonCheck(df, "x", "y", "g")
      .orderBy("group").collect()
    assert(got.length == 2)
    got.foreach { r =>
      assert(r.getDouble(2) > 0.99)  // within-group r ~ +1
      assert(r.getDouble(3) < 0)     // pooled r negative
      assert(r.getBoolean(4))        // flagged
    }
    // aligned strata: no flag, pooled and group signs agree
    val aligned = (gA.map { case (x, y) => ("A", x, y) } ++
      gA.map { case (x, y) => ("B", x + 1, y + 1) }).toDF("g", "x", "y")
    val ok = graft.agg.Stats.simpsonCheck(aligned, "x", "y", "g").collect()
    assert(ok.forall(r => !r.getBoolean(4)))
    // constant-x group: null r_group, false flag (never a phantom alarm)
    val const = (gA.map { case (x, y) => ("A", x, y) } ++
      Seq(("B", 5.0, 1.0), ("B", 5.0, 2.0))).toDF("g", "x", "y")
    val cb = graft.agg.Stats.simpsonCheck(const, "x", "y", "g")
      .orderBy("group").collect()
    assert(cb(1).isNullAt(2) && !cb(1).getBoolean(4))
  }
}
