package graft.expr

import graft.SparkSpec
import graft.agg.CountHist
import org.apache.spark.sql.functions._

class HistQuantilesSpec extends SparkSpec {

  test("grouped HistQuantiles equals HistCounts + quantilesOf per group") {
    val lo = 0.0; val hi = 100.0; val bins = 40
    val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    val df = spark.range(1000)
      .selectExpr("id % 7 as g",
        "cast(pmod(hash(id * 40503), 10000) as double) / 100.0 as v")
    val viaCounts = df.groupBy("g")
      .agg(HistCounts.of(col("v"), lo, hi, bins).as("sk"))
      .select(col("g"),
        CountHist.quantilesOf(col("sk.counts"), lo, hi, bins, ps).as("qs"))
    val direct = df.groupBy("g")
      .agg(HistQuantiles.of(col("v"), lo, hi, bins, ps).as("sk"))
      .select(col("g"), col("sk.quantiles").as("qs"),
        col("sk.n"), col("sk.below"), col("sk.above"))
    val a = viaCounts.collect().map(r => r.getLong(0) ->
      r.getSeq[Double](1)).toMap
    val b = direct.collect()
    assert(b.length == 7)
    b.foreach { r =>
      assert(r.getSeq[Double](1) == a(r.getLong(0)),
        s"group ${r.getLong(0)} quantile mismatch")
      assert(r.getLong(3) == 0L && r.getLong(4) == 0L)
      assert(r.getLong(2) > 0L)
    }
  }

  test("empty in-range mass yields null quantiles but live tallies") {
    import spark.implicits._
    val df = Seq(("a", -5.0), ("a", 200.0)).toDF("g", "v")
    val r = df.groupBy("g")
      .agg(HistQuantiles.of(col("v"), 0.0, 100.0, 10,
        Seq(0.5)).as("sk"))
      .select(col("sk.n"), col("sk.below"), col("sk.above"),
        col("sk.quantiles")).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 1L && r.getLong(2) == 1L)
    assert(r.isNullAt(3))
  }

  test("nulls and NaN are skipped like HistCounts.of") {
    import spark.implicits._
    val df = Seq(Some(10.0), None, Some(Double.NaN), Some(30.0))
      .toDF("v").withColumn("g", lit(1))
    val r = df.groupBy("g")
      .agg(HistQuantiles.of(col("v"), 0.0, 100.0, 100,
        Seq(0.0, 1.0)).as("sk"))
      .select(col("sk.n"), col("sk.quantiles")).head()
    assert(r.getLong(0) == 2L)
    val qs = r.getSeq[Double](1)
    // p=0 -> inside the 10-cell; p=1 -> inside the 30-cell
    assert(qs.head >= 10.0 && qs.head <= 11.0, qs)
    assert(qs(1) >= 30.0 && qs(1) <= 31.0, qs)
  }

  test("ascending-ps requirement and bad params are rejected") {
    intercept[IllegalArgumentException] {
      HistQuantiles.of(col("v"), 0.0, 1.0, 10, Seq(0.5, 0.25))
    }
    intercept[IllegalArgumentException] {
      HistQuantiles.of(col("v"), 1.0, 0.0, 10, Seq(0.5))
    }
    intercept[IllegalArgumentException] {
      HistQuantiles.of(col("v"), 0.0, 1.0, 0, Seq(0.5))
    }
  }
}
