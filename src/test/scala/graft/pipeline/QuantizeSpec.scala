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
}
