package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeatureEncodeSpec extends SparkSpec {

  test("targetEncodeTable blends category mean with the global prior") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0)).toDF("c", "y")
    // prior = 14/3; m=1: enc_a = (4 + 14/3)/(2+1), enc_b = (10 + 14/3)/2
    val got = FeatureEncode.targetEncodeTable(df, "c", "y", smoothing = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val prior = 14.0 / 3
    assert(math.abs(got("a") - (4 + prior) / 3) < 1e-12)
    assert(math.abs(got("b") - (10 + prior) / 2) < 1e-12)
    // m=0 degenerates to the plain category mean
    val plain = FeatureEncode.targetEncodeTable(df, "c", "y", smoothing = 0.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(plain == Map("a" -> 2.0, "b" -> 10.0))
  }

  test("targetEncode joins the table back and falls back to the prior") {
    import spark.implicits._
    val train = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0),
      (null.asInstanceOf[String], 5.0)).toDF("c", "y")
    val got = FeatureEncode.targetEncode(train, "c", "y", smoothing = 0.0)
      .select("c", "c_enc").collect()
      .map(r => Option(r.getString(0)).getOrElse("<null>") -> r.getDouble(1))
      .toMap
    assert(got("a") == 2.0 && got("b") == 10.0)
    assert(math.abs(got("<null>") - 14.0 / 3) < 1e-12) // prior fallback
  }

  test("targetEncodeLoo excludes each row's own target") {
    import spark.implicits._
    val df = Seq((1L, "a", 1.0), (2L, "a", 3.0), (3L, "a", 5.0),
      (4L, "b", 10.0)).toDF("id", "c", "y")
    val got = FeatureEncode.targetEncodeLoo(df, "c", "y", smoothing = 0.0)
      .select("id", "c_enc").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) Double.NaN
        else r.getDouble(1))).toMap
    assert(got(1L) == 4.0) // (9-1)/2
    assert(got(2L) == 3.0) // (9-3)/2
    assert(got(3L) == 2.0) // (9-5)/2
    assert(got(4L).isNaN)  // singleton with m=0 -> null
    // with smoothing the singleton stays defined and shrinks to prior
    val sm = FeatureEncode.targetEncodeLoo(df, "c", "y", smoothing = 2.0)
      .filter(col("id") === 4).head().getAs[Double]("c_enc")
    val prior = 19.0 / 4
    assert(math.abs(sm - (10.0 - 10.0 + 2 * prior) / 2) < 1e-12)
  }

  test("woeTable and informationValue agree with brute force") {
    import spark.implicits._
    val rows = Seq(("a", 1), ("a", 1), ("a", 0), ("b", 0), ("b", 0),
      ("b", 1), ("c", 1))
    val df = rows.toDF("c", "y")
    val eps = 0.5
    val pt = 4.0; val nt = 3.0
    def woe(p: Double, n: Double): Double =
      math.log(((p + eps) / (pt + 1)) / ((n + eps) / (nt + 1)))
    val got = FeatureEncode.woeTable(df, "c", "y", eps)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("a")._1 == 2L && got("a")._2 == 1L)
    assert(math.abs(got("a")._3 - woe(2, 1)) < 1e-12)
    val ivA = ((2 + eps) / 5 - (1 + eps) / 4) * woe(2, 1)
    assert(math.abs(got("a")._4 - ivA) < 1e-12)
    // multi-column IV in one pass matches the per-column woeTable sum
    val df2 = df.withColumn("c2", concat(col("c"), lit("x")))
    val iv = FeatureEncode.informationValue(df2, Seq("c", "c2"), "y", eps)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val ivRef = FeatureEncode.woeTable(df, "c", "y", eps)
      .agg(sum("iv")).head().getDouble(0)
    assert(math.abs(iv("c") - ivRef) < 1e-12)
    assert(math.abs(iv("c2") - ivRef) < 1e-12) // renamed cats, same structure
  }

  test("oneHot emits data-independent 0/1 columns, zeros for unknown/null") {
    import spark.implicits._
    val df = Seq(Some("a"), Some("b"), Some("z"), None).toDF("c")
    val got = FeatureEncode.oneHot(df, "c", Seq("a", "b"), "f")
    assert(got.columns.toSeq == Seq("c", "f_a", "f_b"))
    val rows = got.collect().map(r =>
      Option(r.getString(0)).getOrElse("<null>") ->
        ((r.getInt(1), r.getInt(2)))).toMap
    assert(rows("a") == ((1, 0)) && rows("b") == ((0, 1)))
    assert(rows("z") == ((0, 0)) && rows("<null>") == ((0, 0)))
    intercept[IllegalArgumentException](
      FeatureEncode.oneHot(df, "c", Seq("a", "a")))
  }

  test("frequencyEncode matches value shares") {
    import spark.implicits._
    val df = Seq("a", "a", "a", "b").toDF("c")
    val got = FeatureEncode.frequencyEncode(df, "c")
      .select("c", "c_freq").distinct().as[(String, Double)].collect().toMap
    assert(got == Map("a" -> 0.75, "b" -> 0.25))
  }
}
