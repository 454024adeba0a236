package graft.eval

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MulticlassSpec extends SparkSpec {

  /** Hand confusion: labels a,a,a,b,b,c — preds a,a,b,b,b,a.
    * tp: a=2, b=2, c=0; support a=3 b=2 c=1; predicted a=3 b=3 c=0. */
  private def toy = {
    import spark.implicits._
    Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"),
      ("c", "a")).toDF("label", "pred")
  }

  test("perClass matches the hand-computed confusion") {
    import spark.implicits._
    val pc = Multiclass.perClass(toy, "pred", "label").orderBy("cls")
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
    assert(pc.map(_._1).toSeq == Seq("a", "b", "c"))
    val a = pc(0); val b = pc(1); val c = pc(2)
    assert(a == (("a", 3L, 3L, 2L, 2.0 / 3, 2.0 / 3, 2.0 / 3)))
    assert(b._2 == 2L && b._3 == 3L && b._4 == 2L)
    assert(math.abs(b._5 - 2.0 / 3) < 1e-12 && b._6 == 1.0)
    assert(math.abs(b._7 - 0.8) < 1e-12) // f1 = 2·(2/3)·1/(5/3)
    // c: never predicted → precision NaN, recall 0, f1 NaN
    assert(c._2 == 1L && c._3 == 0L && c._4 == 0L)
    assert(c._5.isNaN && c._6 == 0.0 && c._7.isNaN)
  }

  test("summary: accuracy + macro skip NaN classes; weighted by support") {
    val s = Multiclass.summary(toy, "pred", "label").head()
    assert(s.getAs[Long]("n") == 6L)
    assert(math.abs(s.getAs[Double]("accuracy") - 4.0 / 6) < 1e-12)
    // macro precision over {a: 2/3, b: 2/3} (c NaN skipped)
    assert(math.abs(s.getAs[Double]("macro_precision") - 2.0 / 3) < 1e-12)
    // macro recall over {2/3, 1, 0} — c's recall is defined (0)
    assert(math.abs(s.getAs[Double]("macro_recall") -
      (2.0 / 3 + 1.0 + 0.0) / 3) < 1e-12)
    assert(math.abs(s.getAs[Double]("macro_f1") - (2.0 / 3 + 0.8) / 2) < 1e-12)
    // weighted f1 over defined classes: (3·2/3 + 2·0.8) / 5... support
    // sums include c (f1 NaN → skipped in numerator, kept in denominator
    // via sum(support)) — pin the actual contract: denominator is ALL
    // support (6), numerator only defined classes
    assert(math.abs(s.getAs[Double]("weighted_f1") -
      (3 * 2.0 / 3 + 2 * 0.8) / 6) < 1e-12)
  }

  test("a class present only in predictions gets support 0 / recall NaN") {
    import spark.implicits._
    val df = Seq(("a", "a"), ("a", "z")).toDF("label", "pred")
    val z = Multiclass.perClass(df, "pred", "label")
      .filter(col("cls") === "z").head()
    assert(z.getAs[Long]("support") == 0L &&
      z.getAs[Long]("predicted") == 1L)
    assert(z.getAs[Double]("recall").isNaN)
    assert(z.getAs[Double]("precision") == 0.0)
  }

  test("empty input: empty perClass, NaN summary") {
    import spark.implicits._
    val empty = spark.emptyDataset[(String, String)].toDF("label", "pred")
    assert(Multiclass.perClass(empty, "pred", "label").count() == 0)
    val s = Multiclass.summary(empty, "pred", "label").head()
    assert(s.getAs[Long]("n") == 0L)
    assert(s.getAs[Double]("accuracy").isNaN)
  }
}
