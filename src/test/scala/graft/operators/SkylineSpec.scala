package graft.operators

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, Double, Double)]) =
    rows.filter { case (_, px, py) =>
      !rows.exists { case (_, qx, qy) =>
        qx >= px && qy >= py && (qx > px || qy > py) }
    }.map(_._1).toSet

  test("skyline2d == quadratic domination check on random points") {
    val rnd = new scala.util.Random(3)
    val rows = (1L to 300L).map(i =>
      (i, rnd.nextInt(20).toDouble, rnd.nextInt(20).toDouble))
    val got = Skyline.skyline2d(rows.toDF("id", "x", "y"), "x", "y")
      .select("id").as[Long].collect().toSet
    assert(got == brute(rows))
  }

  test("skyline2d: duplicates of a frontier point all survive; " +
      "dominated duplicates all fall") {
    val rows = Seq((1L, 5.0, 5.0), (2L, 5.0, 5.0), // frontier twins
      (3L, 5.0, 4.0),                              // same x, lower y
      (4L, 6.0, 1.0), (5L, 1.0, 6.0),              // frontier corners
      (6L, 4.0, 4.0))                              // dominated by 1/2
    val got = Skyline.skyline2d(rows.toDF("id", "x", "y"), "x", "y")
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 4L, 5L))
  }

  test("skyline2d: monotone staircase keeps everything; total order " +
      "keeps one; nulls dropped") {
    val stairs = Seq((1L, 1.0, 3.0), (2L, 2.0, 2.0), (3L, 3.0, 1.0))
    assert(Skyline.skyline2d(stairs.toDF("id", "x", "y"), "x", "y")
      .count() == 3)
    val chain = Seq((1L, 1.0, 1.0), (2L, 2.0, 2.0), (3L, 3.0, 3.0))
    val top = Skyline.skyline2d(chain.toDF("id", "x", "y"), "x", "y")
      .select("id").as[Long].collect().toSeq
    assert(top == Seq(3L))
    val withNull = Seq((Some(1.0), Some(1.0), 1L),
      (None, Some(9.0), 2L), (Some(9.0), None, 3L))
      .toDF("x", "y", "id")
    assert(Skyline.skyline2d(withNull, "x", "y")
      .select("id").as[Long].collect().toSeq == Seq(1L))
  }
}
