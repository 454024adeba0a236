package graft.stat

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {

  /** JVM-side replica of the engine's Lehmer-uniform → Poisson(1)
    * weight (the exact modular op chain from Resample.uniform). */
  private def weightOf(id: Long, b: Int, seed: Long): Double = {
    val M = 2147483647L; val A = 48271L
    val lo = java.lang.Math.floorMod(id, 2147483648L)
    val hi = id >>> 31
    val x0 = java.lang.Math.floorMod(lo + hi * A, M - 1) + 1L
    val x3 = (1 to 3).foldLeft(x0)((x, _) => x * A % M)
    val inj = (java.lang.Math.floorMod(seed, M - 1) + b * A) % (M - 1)
    val y0 = (x3 + inj) % (M - 1) + 1L
    val y3 = (1 to 3).foldLeft(y0)((x, _) => x * A % M)
    val u = y3.toDouble / M.toDouble
    val k = Resample.poisCdf.indexWhere(u < _)
    if (k < 0) 12.0 else k.toDouble
  }

  test("bootstrapMeanCI: replica means match a JVM replay bit-for-bit") {
    import spark.implicits._
    val rows = (1L to 40L).map(i => (i, "g", (i * 7 % 13).toDouble))
    val df = rows.toDF("id", "g", "x")
    val got = Resample.bootstrapMeanCI(df, "id", "x", Seq("g"),
      b = 20, alpha = 0.1, seed = 3).collect()(0)
    // point estimate + n
    assert(got.getLong(1) == 40)
    val xs = rows.map(_._3)
    assert(math.abs(got.getDouble(2) - xs.sum / 40) < 1e-12)
    // replay all 20 replica means and take exact percentile band
    val means = (0 until 20).flatMap { b =>
      val ws = rows.map { case (id, _, _) => weightOf(id, b, 3L) }
      val sw = ws.sum
      if (sw > 0) Some(ws.zip(xs).map { case (w, x) => w * x }.sum / sw)
      else None
    }.sorted
    def pct(p: Double): Double = {
      val pos = p * (means.size - 1)
      val lo = means(pos.toInt); val hi = means(math.ceil(pos).toInt)
      lo + (pos - pos.toInt) * (hi - lo)
    }
    assert(math.abs(got.getDouble(3) - pct(0.05)) < 1e-9,
      s"ci_lo ${got.getDouble(3)} vs ${pct(0.05)}")
    assert(math.abs(got.getDouble(4) - pct(0.95)) < 1e-9)
    assert(got.getLong(5) == 20)
  }

  test("bootstrapMeanCI: deterministic across runs; CI brackets the mean") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, if (i % 2 == 0) "a" else "b",
      (i % 17).toDouble)).toDF("id", "g", "x")
    val r1 = Resample.bootstrapMeanCI(df, "id", "x", Seq("g"), b = 50)
      .orderBy("g").collect()
    val r2 = Resample.bootstrapMeanCI(df, "id", "x", Seq("g"), b = 50)
      .orderBy("g").collect()
    assert(r1.toSeq == r2.toSeq)
    r1.foreach { r =>
      assert(r.getDouble(3) <= r.getDouble(2) + 1e-9 &&
        r.getDouble(2) <= r.getDouble(4) + 1e-9,
        s"CI [${r.getDouble(3)}, ${r.getDouble(4)}] vs mean ${r.getDouble(2)}")
    }
  }

  test("conformalInterval: hand-checked order statistic") {
    import spark.implicits._
    // residuals 1..10 (pred 0, actual ±r alternating sign)
    val calib = (1 to 10).map(i =>
      (0.0, if (i % 2 == 0) i.toDouble else -i.toDouble)).toDF("p", "y")
    val target = Seq((5.0, 0.0)).toDF("p", "y")
    // alpha=0.2: k = ceil(0.8*11) = 9 → q = 9
    val got = Resample.conformalInterval(calib, target, "p", "y", 0.2)
      .select("ci_lo", "ci_hi").collect()(0)
    assert(got.getDouble(0) == 5.0 - 9.0 && got.getDouble(1) == 5.0 + 9.0)
  }

  test("conformalInterval: alpha too small for n yields null bands") {
    import spark.implicits._
    val calib = Seq((0.0, 1.0), (0.0, 2.0), (0.0, 3.0)).toDF("p", "y")
    val target = Seq((1.0, 0.0)).toDF("p", "y")
    // k = ceil(0.9*4) = 4 > n = 3
    val got = Resample.conformalInterval(calib, target, "p", "y", 0.1)
      .select("ci_lo", "ci_hi").collect()(0)
    assert(got.isNullAt(0) && got.isNullAt(1))
  }

  test("conformalInterval: empirical coverage >= 1 - alpha on exchangeable data") {
    import spark.implicits._
    // actual = pred + deterministic pseudo-noise in [-5, 5]
    val all = (1L to 400L).map { i =>
      val noise = ((i * 2654435761L) % 1000) / 100.0 - 5.0
      (i, 10.0, 10.0 + noise)
    }.toDF("id", "p", "y")
    val calib = all.filter(col("id") % 2 === 0)
    val target = all.filter(col("id") % 2 === 1)
    val banded = Resample.conformalInterval(calib, target, "p", "y", 0.2)
    val n = banded.count().toDouble
    val covered = banded
      .filter(col("y") >= col("ci_lo") && col("y") <= col("ci_hi"))
      .count().toDouble
    assert(covered / n >= 0.8 - 0.05, s"coverage ${covered / n}")
  }
}
