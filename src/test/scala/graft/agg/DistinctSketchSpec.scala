package graft.agg

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

class DistinctSketchSpec extends SparkSpec {

  private implicit def sp: SparkSession = spark

  private def ids(xs: Seq[Long]) = {
    import spark.implicits._
    xs.toDF("v")
  }

  test("small cardinalities are exact; union of halves equals single pass") {
    val xs = (0L until 200L) ++ (0L until 200L) // dups collapse
    val whole = DistinctSketch.sketchCol(ids(xs), "v")
    assert(DistinctSketch.estimate(whole) == 200L)
    val a = DistinctSketch.sketchCol(ids(xs.take(150)), "v")
    val b = DistinctSketch.sketchCol(ids(xs.drop(150)), "v")
    val merged = DistinctSketch.union(Seq(a, b))
    assert(DistinctSketch.estimate(merged) == DistinctSketch.estimate(whole))
  }

  test("envelope holds at scale; estimate is within 4 rsd of exact") {
    val xs = (0L until 50000L).map(i => i % 30000L)
    val row = DistinctSketch.estimateCheck(ids(xs), "v").head()
    assert(row.getLong(0) == 30000L)
    assert(row.getBoolean(1))
  }

  test("write / append / read accumulates across overlapping batches") {
    val path = java.nio.file.Files.createTempDirectory("graft-hll").toString
    DistinctSketch.write(DistinctSketch.sketchCol(ids(0L until 120L), "v"), path)
    // overlapping batch: 60..180 — overlap must not double-count
    DistinctSketch.append(ids(60L until 180L), "v", path)
    val est = DistinctSketch.estimate(DistinctSketch.read(path))
    assert(est == 180L) // still in the exact (coupon) regime
    // a third batch of already-seen values changes nothing
    DistinctSketch.append(ids(0L until 180L), "v", path)
    assert(DistinctSketch.estimate(DistinctSketch.read(path)) == 180L)
  }

  test("guards: bad lgK, empty union, empty read") {
    intercept[IllegalArgumentException](
      DistinctSketch.sketchCol(ids(Seq(1L)), "v", lgK = 2))
    intercept[IllegalArgumentException](DistinctSketch.union(Seq.empty))
  }
}
