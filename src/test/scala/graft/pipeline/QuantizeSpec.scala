package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {

  private def vecs(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (1L to n.toLong).map(i =>
      (i, Array.fill(dim)((rnd.nextDouble() * 4 - 2).toFloat)))
  }

  test("dimRanges: exact per-dimension min/max, partitioning-independent") {
    import spark.implicits._
    val rows = vecs(200, 6, seed = 1)
    val want = (0 until 6).map { d =>
      (rows.map(_._2(d).toDouble).min, rows.map(_._2(d).toDouble).max)
    }
    Seq(1, 7).foreach { parts =>
      val (lo, hi) = Quantize.dimRanges(
        rows.toDF("id", "v").repartition(parts), "v")
      assert(lo.toSeq == want.map(_._1) && hi.toSeq == want.map(_._2),
        s"at $parts partitions")
    }
  }

  test("quantizeInt8: range endpoints map to 0/levels-1, values in range, constant dim to 0") {
    import spark.implicits._
    // dim 0 spans [-1, 3], dim 1 is constant, dim 2 spans [0, 1]
    val df = Seq(
      (1L, Array(-1.0f, 5.0f, 0.0f)),
      (2L, Array(3.0f, 5.0f, 1.0f)),
      (3L, Array(1.0f, 5.0f, 0.25f))).toDF("id", "v")
    val got = Quantize.quantizeInt8(df, "id", "v")
      .select("id", "qvec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1L) == Seq(0, 0, 0))
    assert(got(2L) == Seq(255, 0, 255))
    // (1-(-1))/4*255 = 127.5 rounds HALF_UP to 128; 0.25*255 = 63.75 -> 64
    assert(got(3L) == Seq(128, 0, 64))
  }

  test("quantizeInt8 + dequantize: reconstruction error bounded by half a step") {
    import spark.implicits._
    val rows = vecs(300, 5, seed = 2)
    val df = rows.toDF("id", "v")
    val clean = df.na.drop(Seq("id", "v"))
    val (lo, hi) = Quantize.dimRanges(clean, "v")
    val q = Quantize.quantizeInt8(df, "id", "v")
      .withColumn("vhat", Quantize.dequantize("qvec", lo, hi))
    val maxErr = q
      .select(expr("aggregate(zip_with(v, vhat, (a, b) -> abs(cast(a as double) - b)), " +
        "cast(0.0 as double), (acc, x) -> greatest(acc, x))").as("e"))
      .agg(max(col("e"))).head.getDouble(0)
    val worstStep = (0 until 5).map(d => (hi(d) - lo(d)) / 255.0 / 2).max
    assert(maxErr <= worstStep + 1e-12,
      s"max reconstruction error $maxErr exceeds half-step $worstStep")
  }

  test("levels parameter: coarser grids stay in range and hit both endpoints") {
    import spark.implicits._
    val df = vecs(100, 3, seed = 3).toDF("id", "v")
    val q = Quantize.quantizeInt8(df, "id", "v", levels = 16)
    val mm = q.select(explode(col("qvec")).as("q"))
      .agg(min("q"), max("q")).head
    assert(mm.getInt(0) == 0 && mm.getInt(1) == 15)
  }

  // ---- product quantization -----------------------------------------------

  test("PQ: codebook shape; codes in range; dim mismatch / indivisible dim refused") {
    import spark.implicits._
    val df = vecs(80, 8, seed = 11).toDF("id", "v")
    val cb = Quantize.pqTrain(df, "id", "v", m = 4, ksub = 16)
    assert(cb.m == 4 && cb.dsub == 2 && cb.ksub == 16 &&
      cb.centers.length == 4 && cb.centers.forall(_.length == 16))
    val codes = Quantize.pqEncode(df, "id", "v", cb)
      .select("codes").collect().map(_.getSeq[Int](0))
    assert(codes.length == 80)
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 16)))
    // wrapped by the error prettifier: the summary names the operator
    val ex = intercept[graft.util.GraftException] {
      Quantize.pqTrain(df, "id", "v", m = 3) // 8 % 3 != 0
    }
    assert(ex.getMessage.contains("pqTrain"))
    intercept[Exception] { // dim mismatch vs codebook surfaces from the map
      Quantize.pqEncode(vecs(5, 6, seed = 2).toDF("id", "v"), "id", "v", cb)
        .collect()
    }
  }

  test("PQ: ksub >= sample size makes encode/reconstruct exact, and ADC cosine exact") {
    import spark.implicits._
    // 40 vectors, ksub 64 > 40: Lloyd keeps every sample point as its own
    // centroid, so reconstruction is EXACT and ADC == true cosine
    val rows = vecs(40, 8, seed = 12)
    val df = rows.toDF("id", "v")
    val cb = Quantize.pqTrain(df, "id", "v", m = 4, ksub = 64)
    val enc = Quantize.pqEncode(df, "id", "v", cb)
    val decoded = enc.collect().map(r => r.getLong(0) ->
      Quantize.pqReconstruct(r.getSeq[Int](1).toArray, cb)).toMap
    rows.foreach { case (id, v) =>
      assert(decoded(id).zip(v.map(_.toDouble)).forall {
        case (a, b) => math.abs(a - b) < 1e-12
      }, s"vector $id not exactly reconstructed")
    }
    val q = rows.head._2.map(_.toDouble)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val got = Quantize.pqTopK(enc, cb, "id", q, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val want = rows.map { case (id, v) => (id, cos(q, v.map(_.toDouble))) }
      .sortBy { case (id, c) => (-c, id) }.take(5)
    got.zip(want).foreach { case ((gi, gc), (wi, wc)) =>
      assert(gi == wi && math.abs(gc - wc) < 1e-12)
    }
  }

  test("PQ: lossy codebook still ranks a clustered corpus usefully (recall@10 >= 0.7)") {
    import spark.implicits._
    // 5 well-separated cluster centers, 60 points each, dim 16
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(5)(Array.fill(16)(rnd.nextDouble() * 10 - 5))
    val rows = (0 until 300).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.3).toFloat))
    }
    val df = rows.toDF("id", "v").repartition(4)
    val cb = Quantize.pqTrain(df, "id", "v", m = 8, ksub = 32)
    val enc = Quantize.pqEncode(df, "id", "v", cb)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val recalls = (0 until 5).map { qi =>
      val q = rows(qi)._2.map(_.toDouble)
      val approx = Quantize.pqTopK(enc, cb, "id", q, k = 10)
        .collect().map(_.getLong(0)).toSet
      val exact = rows.map { case (id, v) => (id, cos(q, v.map(_.toDouble))) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
      (approx & exact).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, s"mean recall@10 $mean, per-query $recalls")
  }

  test("IVF-PQ: full probe degrades to plain pqTopK; narrow probe keeps cluster recall") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val centers = Array.fill(6)(Array.fill(16)(rnd.nextDouble() * 10 - 5))
    val rows = (0 until 360).map { i =>
      val c = centers(i % 6)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.3).toFloat))
    }
    val df = rows.toDF("id", "v").repartition(5)
    val (index, ivfC, cb) = Quantize.ivfPqIndex(df, "id", "v",
      nCells = 6, m = 8, ksub = 32)
    val q = rows(2)._2.map(_.toDouble)
    // full probe == pqTopK over everything (same codebook, same order)
    val full = Quantize.ivfPqTopK(index, ivfC, cb, "id", q, k = 10,
      nProbe = 6).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val plain = Quantize.pqTopK(index, cb, "id", q, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == plain)
    // narrow probe still finds the query's own cluster members
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val narrow = Quantize.ivfPqTopK(index, ivfC, cb, "id", q, k = 10,
      nProbe = 1).collect().map(_.getLong(0)).toSet
    val exact = rows.map { case (id, v) => (id, cos(q, v.map(_.toDouble))) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    assert((narrow & exact).size >= 7,
      s"nProbe=1 recall ${(narrow & exact).size}/10")
  }

  test("IVF-PQ persistence: round-trip search identical; append serves new vectors") {
    import spark.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(4)(Array.fill(12)(rnd.nextDouble() * 8 - 4))
    def near(c: Array[Double]) = c.map(x => (x + rnd.nextGaussian() * 0.2).toFloat)
    val rows = (0 until 200).map(i => (i.toLong, near(centers(i % 4))))
    val df = rows.toDF("id", "v").repartition(3)
    val (index, ivfC, cb) = Quantize.ivfPqIndex(df, "id", "v",
      nCells = 4, m = 4, ksub = 16)
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    Quantize.writeIvfPq(index, ivfC, cb, "id", path)
    val (index2, ivfC2, cb2) = Quantize.readIvfPq(path, "id")
    // models survive byte-for-byte
    assert(ivfC2.map(_.toSeq).toSeq == ivfC.map(_.toSeq).toSeq)
    assert(cb2.dim == cb.dim && cb2.m == cb.m && cb2.ksub == cb.ksub)
    assert((0 until cb.m).forall(s => (0 until cb.ksub).forall(c =>
      cb2.centers(s)(c).sameElements(cb.centers(s)(c)))))
    // search over the reloaded index is identical (full probe: order too)
    val q = rows(7)._2.map(_.toDouble)
    def top(ix: org.apache.spark.sql.DataFrame,
            cs: Array[Array[Double]], book: Quantize.PQCodebook) =
      Quantize.ivfPqTopK(ix, cs, book, "id", q, k = 8, nProbe = 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(index2, ivfC2, cb2) == top(index, ivfC, cb))
    // append a batch: its vectors become findable without refit; a vector
    // placed ON a centroid must dominate the ranking
    val batch = Seq((1000L, centers(1).map(_.toFloat))).toDF("id", "v")
    Quantize.appendIvfPq(batch, "id", "v", path)
    val (index3, ivfC3, cb3) = Quantize.readIvfPq(path, "id")
    assert(index3.count() == 201)
    val hits = Quantize.ivfPqTopK(index3, ivfC3, cb3, "id",
      centers(1), k = 3, nProbe = 4).collect().map(_.getLong(0))
    assert(hits.contains(1000L))
  }

  test("PQ: encode and topk are partitioning-independent") {
    import spark.implicits._
    val rows = vecs(120, 8, seed = 14)
    val q = rows(3)._2.map(_.toDouble)
    val out = Seq(1, 11).map { parts =>
      val df = rows.toDF("id", "v").repartition(parts)
      val cb = Quantize.pqTrain(df, "id", "v", m = 4, ksub = 16)
      val enc = Quantize.pqEncode(df, "id", "v", cb)
      Quantize.pqTopK(enc, cb, "id", q, k = 7)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    assert(out(0) == out(1))
  }
}
