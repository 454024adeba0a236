package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  // deterministic pseudo-random vectors (no RNG — SplitMix-ish mixing)
  private def synth(n: Int, d: Int) = {
    import spark.implicits._
    (0 until n).map { r =>
      (r.toLong, Array.tabulate(d) { c =>
        val x = (r * 2654435761L + c * 40503L + 12345L) * 0x9E3779B97F4A7C15L
        ((x >>> 11).toDouble / (1L << 53).toDouble - 0.5) * 2.0
      }.map(_.toFloat))
    }.toDF("id", "vec")
  }

  test("fit recovers the hand-computed eigensystem of a 2-D cloud") {
    import spark.implicits._
    // points (2,1),(-2,-1),(1,2),(-1,-2): mean 0, sample cov
    // [[10/3, 8/3], [8/3, 10/3]] -> eigenvalues 6 and 2/3, axes (1,1)/√2
    // and (1,-1)/√2 (sign-normalized: largest entry positive)
    val pts = Seq(
      (0L, Array(2f, 1f)), (1L, Array(-2f, -1f)),
      (2L, Array(1f, 2f)), (3L, Array(-1f, -2f))
    ).toDF("id", "vec")
    val m = Pca.fit(pts, "id", "vec")
    assert(math.abs(m.eigenvalues(0) - 6.0) < 1e-12)
    assert(math.abs(m.eigenvalues(1) - 2.0 / 3.0) < 1e-12)
    val r2 = 1.0 / math.sqrt(2.0)
    assert(math.abs(m.components(0)(0) - r2) < 1e-12 &&
      math.abs(m.components(0)(1) - r2) < 1e-12)
    assert(math.abs(m.components(1)(0) + r2) < 1e-12 !=
      math.abs(m.components(1)(0) - r2) < 1e-12) // (1,-1) or (-1,1) pre-sign
    assert(m.components(1)(0) * m.components(1)(1) < 0)
    assert(math.abs(m.totalVariance - (6.0 + 2.0 / 3.0)) < 1e-12)
    assert(math.abs(m.explainedVarianceRatio.sum - 1.0) < 1e-12)
  }

  test("components are orthonormal; eigenvalues desc; trace preserved") {
    val df = synth(200, 7)
    val m = Pca.fit(df, "id", "vec")
    for (a <- 0 until m.k; b <- a until m.k) {
      val dot = (0 until m.dim).map(i => m.components(a)(i) * m.components(b)(i)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9,
        s"components $a,$b dot $dot")
    }
    assert(m.eigenvalues.sliding(2).forall(w => w.length < 2 || w(0) >= w(1) - 1e-12))
    assert(math.abs(m.eigenvalues.sum - m.totalVariance) < 1e-9)
  }

  test("covFrameExact: exact co-moment longs on a hand case; chain " +
      "reproduces the quantized covariance; agrees with covFrame") {
    import spark.implicits._
    // hand case at scaleBits = 1 (q = floor(2v)): vectors (1.0, 0.5),
    // (2.0, 1.5) -> q rows (2,1), (4,3): n=2, sx/sy/sxy exact
    val tiny = Seq((0L, Array(1.0f, 0.5f)), (1L, Array(2.0f, 1.5f)))
      .toDF("id", "vec")
    val ex = Pca.covFrameExact(tiny, "id", "vec", scaleBits = 1)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
    val c01 = ex((0, 1))
    assert(c01.getLong(2) == 2L)            // n
    assert(c01.getLong(3) == 6L)            // sx = 2+4
    assert(c01.getLong(4) == 4L)            // sy = 1+3
    assert(c01.getLong(5) == 14L)           // sxy = 2*1 + 4*3
    // chain: (14 - 6*4/2)/1/4 = 2/4 = 0.5 (covariance of v, since the
    // halves quantize exactly at scaleBits=1)
    assert(c01.getDouble(6) == 0.5)
    // quantization agreement: |covFrameExact - covFrame| < 2^-scaleBits
    // per cell on a bounded cloud (loose bound; observed ~2^-20 here)
    val df = synth(200, 6)
    val exact = Pca.covFrameExact(df, "id", "vec", scaleBits = 20)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(6)).toMap
    val dbl = Pca.covFrame(df, "id", "vec")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(exact.keySet == dbl.keySet && exact.size == 21)
    exact.foreach { case (k, v) =>
      assert(math.abs(v - dbl(k)) < 1e-5, s"cell $k exact=$v dbl=${dbl(k)}")
    }
  }

  test("projected sample variance equals the eigenvalue; whiten gives unit variance") {
    val df = synth(150, 5)
    val m = Pca.fit(df, "id", "vec", k = 3)
    val proj = Pca.transform(df, "id", "vec", m).collect()
      .map(r => r.getAs[Seq[Double]]("projection").toArray)
    for (c <- 0 until 3) {
      val xs = proj.map(_(c))
      val mu = xs.sum / xs.length
      val v = xs.map(x => (x - mu) * (x - mu)).sum / (xs.length - 1)
      assert(math.abs(v - m.eigenvalues(c)) < 1e-9, s"component $c var $v")
      // components of a centered projection have mean ~0
      assert(math.abs(mu) < 1e-9)
    }
    val white = Pca.transform(df, "id", "vec", m, whiten = true).collect()
      .map(r => r.getAs[Seq[Double]]("projection").toArray)
    for (c <- 0 until 3) {
      val xs = white.map(_(c))
      val mu = xs.sum / xs.length
      val v = xs.map(x => (x - mu) * (x - mu)).sum / (xs.length - 1)
      assert(math.abs(v - 1.0) < 1e-9, s"whitened component $c var $v")
    }
  }

  test("reconstruction error shrinks with k and hits ~0 at full rank") {
    val df = synth(120, 6)
    val rows = df.collect().map(r =>
      r.getAs[Seq[Float]]("vec").map(_.toDouble).toArray)
    def reconErr(k: Int): Double = {
      val m = Pca.fit(df, "id", "vec", k)
      rows.map { x =>
        // x̂ = mean + Σ_c (w_c · (x − mean)) w_c
        val xhat = m.mean.clone()
        for (c <- 0 until m.k) {
          val w = m.components(c)
          val y = (0 until m.dim).map(i => w(i) * (x(i) - m.mean(i))).sum
          for (i <- 0 until m.dim) xhat(i) += y * w(i)
        }
        (0 until m.dim).map(i => (x(i) - xhat(i)) * (x(i) - xhat(i))).sum
      }.sum
    }
    val errs = (1 to 6).map(reconErr)
    assert(errs.sliding(2).forall(w => w(0) >= w(1) - 1e-9), errs.toString)
    assert(errs.last < 1e-9)
  }

  test("jlProject matches a naive driver reference and preserves distances") {
    import spark.implicits._
    val n = 80; val d = 32; val k = 16; val seed = 11
    val df = synth(n, d)
    val got = Pca.jlProject(df, "id", "vec", k, seed)
      .as[(Long, Array[Double])].collect().toMap
    assert(got.size == n && got.values.forall(_.length == k))
    // naive reference off the same md5 sign basis
    val signs = Array.tabulate(k, d)((j, i) => Pca.jlSign(seed, j, i))
    val src = df.as[(Long, Array[Float])].collect().toMap
    val scale = 1.0 / math.sqrt(k.toDouble)
    src.foreach { case (id, xf) =>
      val x = xf.map(_.toDouble)
      val want = Array.tabulate(k)(j =>
        x.indices.map(i => signs(j)(i) * x(i)).sum * scale)
      val g = got(id)
      assert(want.indices.forall(j => math.abs(g(j) - want(j)) < 1e-12))
    }
    // JL distance preservation on sampled pairs: squared distances scale
    // by d/k in expectation; with k=16 individual pairs are loose, so
    // check the MEAN ratio (concentrates) plus a generous per-pair band
    def d2(a: Array[Double], b: Array[Double]) =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val ids = got.keys.toSeq.sorted
    val ratios = for (a <- ids.indices; b <- a + 1 until math.min(a + 4, ids.length))
      yield {
        val (ia, ib) = (ids(a), ids(b))
        d2(got(ia), got(ib)) /
          d2(src(ia).map(_.toDouble), src(ib).map(_.toDouble))
      }
    val mean = ratios.sum / ratios.size
    // k=16 is deliberately small: per-direction variance is ~sqrt(2/16),
    // and difference vectors share the one fixed basis, so the mean over
    // pairs keeps O(1/sqrt(k)) fluctuation — 0.25 is the honest band
    assert(math.abs(mean - 1.0) < 0.25, s"mean distortion $mean")
    assert(ratios.forall(r => r > 0.2 && r < 3.0))
    // different seed ⇒ different basis ⇒ different projection
    val other = Pca.jlProject(df, "id", "vec", k, seed + 1)
      .as[(Long, Array[Double])].collect().toMap
    assert(ids.exists(id => got(id).toSeq != other(id).toSeq))
    // the error prettifier frames the require into a GraftException
    intercept[graft.util.GraftException](Pca.jlProject(df, "id", "vec", 0))
  }

  test("fitCheck flags hold; guards fire on bad input") {
    val df = synth(60, 4)
    val row = Pca.fitCheck(df, "id", "vec").head()
    assert(row.getAs[Boolean]("monotone") && row.getAs[Boolean]("orthonormal"))
    assert(math.abs(row.getAs[Double]("trace_cov") - row.getAs[Double]("eig_sum")) < 1e-9)
    import spark.implicits._
    // wrapped by the error prettifier: the framed summary names the operator
    val one = Seq((0L, Array(1f, 2f))).toDF("id", "vec")
    val e1 = intercept[graft.util.GraftException](Pca.fit(one, "id", "vec"))
    assert(e1.getMessage.contains("Pca.fit"))
    intercept[graft.util.GraftException](Pca.fit(df, "id", "vec", k = 99))
    val ragged = Seq((0L, Array(1f, 2f)), (1L, Array(1f, 2f, 3f))).toDF("id", "vec")
    intercept[Exception](Pca.fit(ragged, "id", "vec"))
  }
}
