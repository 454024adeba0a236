package graft.eval

import graft.SparkSpec

class ForecastEvalSpec extends SparkSpec {

  test("forecastEval matches hand-computed metrics, global and keyed") {
    import spark.implicits._
    val df = Seq(
      ("s1", 10.0, 12.0), // err +2
      ("s1", 20.0, 19.0), // err -1
      ("s2", 0.0, 1.0),   // zero actual: excluded from mape, in smape
      ("s2", 4.0, 4.0))   // perfect
      .toDF("series", "y", "p")
    val g = ForecastEval.forecastEval(df, "y", "p").head()
    assert(g.getLong(0) == 4L && g.getLong(1) == 1L)
    assert(math.abs(g.getDouble(2) - (2 + 1 + 1 + 0) / 4.0) < 1e-12) // mae
    assert(math.abs(g.getDouble(3) - math.sqrt((4 + 1 + 1 + 0) / 4.0))
      < 1e-12)                                                       // rmse
    assert(math.abs(g.getDouble(4) - (2 - 1 + 1 + 0) / 4.0) < 1e-12) // bias
    assert(math.abs(g.getDouble(5) - (0.2 + 0.05 + 0.0) / 3) < 1e-12) // mape
    val sm = (2.0 * 2 / 22 + 2.0 * 1 / 39 + 2.0 * 1 / 1 + 0.0) / 4
    assert(math.abs(g.getDouble(6) - sm) < 1e-12)                    // smape
    assert(math.abs(g.getDouble(7) - 4.0 / 34) < 1e-12)              // wape
    val keyed = ForecastEval.forecastEval(df, "y", "p", Seq("series"))
      .orderBy("series").collect()
    assert(keyed.length == 2)
    assert(math.abs(keyed(0).getDouble(3) - (2 + 1) / 2.0) < 1e-12)  // s1 mae
    assert(keyed(1).getLong(2) == 1L)                                // s2 zero
  }

  test("all-zero actuals: null mape/wape, smape scores the zero-zero row 0") {
    import spark.implicits._
    val df = Seq((0.0, 0.0), (0.0, 2.0)).toDF("y", "p")
    val g = ForecastEval.forecastEval(df, "y", "p").head()
    assert(g.isNullAt(5) && g.isNullAt(7))
    assert(math.abs(g.getDouble(6) - (0.0 + 2.0) / 2) < 1e-12)
  }
}
