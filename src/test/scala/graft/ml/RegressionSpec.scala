package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("ridgeFit at lambda=0 recovers an exact linear relationship") {
    // y = 2 + 3*x1 - 4*x2, no noise: OLS must reproduce it
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      val x1 = rnd.nextDouble() * 10
      val x2 = rnd.nextDouble() * 5
      (x1, x2, 2.0 + 3.0 * x1 - 4.0 * x2)
    }
    val got = Regression.ridgeFit(rows.toDF("x1", "x2", "y"),
      Seq("x1", "x2"), "y").head()
    assert(got.getAs[Long]("n") == 200L)
    assert(math.abs(got.getAs[Double]("intercept") - 2.0) < 1e-8)
    assert(math.abs(got.getAs[Double]("beta_x1") - 3.0) < 1e-9)
    assert(math.abs(got.getAs[Double]("beta_x2") + 4.0) < 1e-9)
  }

  test("ridgeFit matches the single-feature closed form and shrinks " +
      "with lambda") {
    val rows = Seq((1.0, 2.0), (2.0, 3.5), (3.0, 5.5), (4.0, 7.0),
      (5.0, 9.5))
    val df = rows.toDF("x", "y")
    // closed form: beta = Sxy / (Sxx + lambda) on centered sums
    val n = rows.length
    val mx = rows.map(_._1).sum / n
    val my = rows.map(_._2).sum / n
    val sxx = rows.map(r => (r._1 - mx) * (r._1 - mx)).sum
    val sxy = rows.map(r => (r._1 - mx) * (r._2 - my)).sum
    for (l <- Seq(0.0, 1.0, 10.0)) {
      val got = Regression.ridgeFit(df, Seq("x"), "y", lambda = l).head()
      val beta = sxy / (sxx + l)
      assert(math.abs(got.getAs[Double]("beta_x") - beta) < 1e-10,
        s"lambda $l")
      assert(math.abs(got.getAs[Double]("intercept") -
        (my - beta * mx)) < 1e-10)
    }
    // shrinkage is monotone in lambda
    val b = Seq(0.0, 1.0, 10.0).map(l =>
      Regression.ridgeFit(df, Seq("x"), "y", l).head()
        .getAs[Double]("beta_x"))
    assert(b(0) > b(1) && b(1) > b(2) && b(2) > 0)
  }

  test("collinear features: lambda=0 -> NaN, lambda>0 -> finite") {
    val df = (1 to 20).map { i =>
      (i.toDouble, 2.0 * i, 5.0 + i) }.toDF("x1", "x2", "y")
    val sing = Regression.ridgeFit(df, Seq("x1", "x2"), "y").head()
    assert(sing.getAs[Double]("beta_x1").isNaN)
    val reg = Regression.ridgeFit(df, Seq("x1", "x2"), "y",
      lambda = 0.5).head()
    assert(!reg.getAs[Double]("beta_x1").isNaN)
    assert(!reg.getAs[Double]("beta_x2").isNaN)
  }

  test("applyLinear scores with literal weights; null rows dropped " +
      "by fit") {
    val df = Seq((Some(1.0), Some(2.0)), (None, Some(3.0)),
      (Some(4.0), None)).toDF("x", "y")
    assert(Regression.ridgeFit(df, Seq("x"), "y").head()
      .getAs[Long]("n") == 1L)
    val scored = Regression.applyLinear(
      Seq((1.0, 0.0), (2.0, 0.0)).toDF("x", "z"),
      Seq("x"), Seq(3.0), intercept = 1.0)
    assert(scored.select("prediction").as[Double].collect().toSeq ==
      Seq(4.0, 7.0))
  }
}
