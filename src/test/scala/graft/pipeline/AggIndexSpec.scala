package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AggIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("aggidx").toString

  test("incremental state == one-shot aggregate, across appends and " +
      "compaction") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 300).map(i =>
      (s"k${i % 4}", rnd.nextInt(100).toDouble))
    val df = rows.toDF("k", "v")
    val path = tmpDir()
    AggIndex.write(df.filter(col("v") < 30), Seq("k"), "v", path)
    AggIndex.append(df.filter(col("v") >= 30 && col("v") < 70),
      Seq("k"), "v", path)
    AggIndex.append(df.filter(col("v") >= 70), Seq("k"), "v", path)
    def check(): Unit = {
      val got = AggIndex.stats(spark, path).collect()
        .map(r => r.getString(0) -> r).toMap
      rows.groupBy(_._1).foreach { case (k, g) =>
        val vs = g.map(_._2)
        val r = got(k)
        assert(r.getAs[Long]("n") == vs.length.toLong)
        assert(r.getAs[Double]("min") == vs.min)
        assert(r.getAs[Double]("max") == vs.max)
        assert(math.abs(r.getAs[Double]("sum") - vs.sum) < 1e-9)
        assert(math.abs(r.getAs[Double]("mean") -
          vs.sum / vs.length) < 1e-9)
        val m = vs.sum / vs.length
        val popVar = vs.map(x => x * x).sum / vs.length - m * m
        assert(math.abs(r.getAs[Double]("variance") - popVar) < 1e-9)
      }
    }
    check()
    // partial rows accumulated: one per (batch, key) before compaction
    assert(spark.read.parquet(s"$path/state").count() == 12L)
    AggIndex.compact(spark, path)
    assert(spark.read.parquet(s"$path/state").count() == 4L)
    check() // identical stats after the swap
  }

  test("write resets; null keys/values dropped; __ keys refused") {
    val path = tmpDir()
    AggIndex.write(Seq(("a", 1.0)).toDF("k", "v"), Seq("k"), "v", path)
    AggIndex.write(Seq(("b", 2.0)).toDF("k", "v"), Seq("k"), "v", path)
    val got = AggIndex.stats(spark, path).collect()
    assert(got.length == 1 && got.head.getString(0) == "b")
    val nulls = Seq((Some("a"), Some(1.0)), (None, Some(2.0)),
      (Some("c"), None)).toDF("k", "v")
    AggIndex.write(nulls, Seq("k"), "v", path)
    assert(AggIndex.stats(spark, path).count() == 1L)
    intercept[IllegalArgumentException](
      AggIndex.write(Seq(("a", 1.0)).toDF("__k", "v"), Seq("__k"), "v",
        path))
  }
}
