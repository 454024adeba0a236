package graft.agg

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class CountHistSpec extends SparkSpec {

  private def values(xs: Seq[Double]) = {
    import spark.implicits._
    xs.toDF("v")
  }

  test("cells, out-of-range tallies, and the v == hi clamp") {
    val sk = CountHist.sketchCol(
      values(Seq(0.0, 0.5, 1.0, 2.5, 9.99, 10.0, -0.1, 10.1)),
      "v", lo = 0.0, hi = 10.0, bins = 10)
    assert(sk.counts(0) == 2)      // 0.0, 0.5
    assert(sk.counts(1) == 1)      // 1.0
    assert(sk.counts(2) == 1)      // 2.5
    assert(sk.counts(9) == 2)      // 9.99 and the clamped 10.0
    assert(sk.below == 1 && sk.above == 1)
    assert(sk.n == 6)
  }

  test("merge equals single-pass; config mismatch refused") {
    val xs = (0 until 500).map(i => (i * 37 % 100) / 10.0)
    val whole = CountHist.sketchCol(values(xs), "v", 0.0, 10.0, 20)
    val a = CountHist.sketchCol(values(xs.take(200)), "v", 0.0, 10.0, 20)
    val b = CountHist.sketchCol(values(xs.drop(200)), "v", 0.0, 10.0, 20)
    val merged = a.merge(b)
    assert(merged.counts.sameElements(whole.counts))
    val other = CountHist.sketchCol(values(xs), "v", 0.0, 10.0, 21)
    intercept[IllegalArgumentException](merged.merge(other))
  }

  test("quantile lands within 2 cell widths of the exact; rank bounds bracket") {
    // skewed data: squares in [0, 100]
    val xs = (0 until 1000).map(i => (i * i).toDouble / 10000.0 * 100.0 / 100.0)
    val sk = CountHist.sketchCol(values(xs), "v", 0.0, 100.0, 50)
    val sorted = xs.sorted
    for (p <- Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val r = p * (xs.length - 1)
      val lo = sorted(r.toInt)
      val hi = sorted(math.min(r.toInt + 1, xs.length - 1))
      val exact = lo + (r - r.toInt) * (hi - lo)
      assert(math.abs(sk.quantile(p) - exact) <= 2.0 * sk.width + 1e-9,
        s"p=$p sketch=${sk.quantile(p)} exact=$exact")
    }
    val (rLo, rHi) = sk.rankBounds(25.0)
    val exactRank = xs.count(_ < 25.0)
    assert(rLo <= exactRank && exactRank <= rHi)
    assert(sk.rankBounds(-5.0) == ((0L, 0L)))
    assert(sk.rankBounds(200.0) == ((1000L, 1000L)))
  }

  test("write / read / append round-trip equals whole-corpus sketch") {
    implicit val sp: SparkSession = spark
    val xs = (0 until 800).map(i => (i * 13 % 64).toDouble)
    val path = java.nio.file.Files.createTempDirectory("graft-counthist").toString
    CountHist.write(CountHist.sketchCol(values(xs.take(300)), "v", 0.0, 64.0, 16), path)
    CountHist.append(values(xs.drop(300)), "v", path)
    val back = CountHist.read(path)
    val whole = CountHist.sketchCol(values(xs), "v", 0.0, 64.0, 16)
    assert(back.counts.sameElements(whole.counts))
    assert(back.below == whole.below && back.above == whole.above)
    assert(back.lo == 0.0 && back.hi == 64.0 && back.bins == 16)
  }

  test("HistCounts aggregate: byGroup cells equal sketchCol per group; partition-independent") {
    import spark.implicits._
    val rows = (0 until 900).map { i =>
      (if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c",
        (i * 37 % 120) / 10.0 - 0.5) // spills below 0 and above 10
    }
    val df = rows.toDF("g", "v")
    val g = CountHist.byGroup(df, Seq("g"), "v", 0.0, 10.0, 20)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getSeq[Long](2), r.getLong(3))).toMap
    Seq("a", "b", "c").foreach { k =>
      val sk = CountHist.sketchCol(
        rows.filter(_._1 == k).map(_._2).toDF("v"), "v", 0.0, 10.0, 20)
      val (below, counts, above) = g(k)
      assert(below == sk.below && above == sk.above, s"group $k tallies")
      assert(counts == sk.counts.toSeq, s"group $k cells")
    }
    // merge-order independence: a different partitioning gives the same
    // counter tables (addition is exact)
    val g12 = CountHist.byGroup(df.repartition(12), Seq("g"), "v",
        0.0, 10.0, 20)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getSeq[Long](2), r.getLong(3))).toMap
    assert(g12 == g)
    // nulls and NaN are skipped, not binned
    val dirty = Seq(("a", Some(1.0)), ("a", None),
      ("a", Some(Double.NaN))).toDF("g", "v")
    val d = CountHist.byGroup(dirty, Seq("g"), "v", 0.0, 10.0, 10)
      .head()
    assert(d.getLong(1) == 0L && d.getLong(3) == 0L)
    assert(d.getSeq[Long](2).sum == 1L)
  }

  test("groupQuantiles: estimates within 2 cell widths of each group's exact quantile") {
    import spark.implicits._
    val rows = (0 until 1200).map { i =>
      (if (i % 2 == 0) "x" else "y", (i * 53 % 1000) / 10.0)
    }
    val df = rows.toDF("g", "v")
    val ps = Seq(0.25, 0.5, 0.9)
    val width = 100.0 / 40
    val got = CountHist.groupQuantiles(df, Seq("g"), "v", 0.0, 100.0, 40, ps)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getSeq[Double](4))).toMap
    Seq("x", "y").foreach { k =>
      val vs = rows.filter(_._1 == k).map(_._2).sorted
      val (n, qs) = got(k)
      assert(n == vs.length)
      ps.zip(qs).foreach { case (p, q) =>
        val r = p * (vs.length - 1) // exact type-7 quantile
        val lo = vs(r.toInt)
        val exact = lo + (r - r.toInt) * (vs(math.min(r.toInt + 1,
          vs.length - 1)) - lo)
        assert(math.abs(q - exact) <= 2 * width + 1e-9,
          s"group $k p=$p: $q vs exact $exact")
      }
    }
  }

  test("quantileCheck refuses out-of-range mass; empty and bad params guarded") {
    import spark.implicits._
    val df = values(Seq(1.0, 5.0, 20.0))
    // wrapped by the error prettifier: the framed summary names the operator
    val e = intercept[graft.util.GraftException](
      CountHist.quantileCheck(df, "v", 0.0, 10.0, 10, Seq(0.5)))
    assert(e.getMessage.contains("quantileCheck"))
    intercept[IllegalArgumentException](new CountHist.Sketch(5.0, 5.0, 10))
    intercept[IllegalArgumentException](new CountHist.Sketch(0.0, 1.0, 0))
    val empty = CountHist.sketchCol(Seq.empty[Double].toDF("v"), "v", 0.0, 1.0, 4)
    assert(empty.n == 0)
    intercept[IllegalArgumentException](empty.quantile(0.5))
  }
}
