package graft.util

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RangeCumSpec extends SparkSpec {

  test("unkeyed cumSum matches a sequential window exactly on counts") {
    import spark.implicits._
    // values interleaved across partitions; counts are exact integers so
    // the offset chain must be BIT-identical to the sequential window
    val df = (1 to 500).map(i => ((i * 7919 % 1000).toDouble, (i % 5 + 1).toDouble))
      .toDF("v", "c")
    val got = RangeCum.cumSum(df, Nil, "v", Seq("c"))
      .select("v", "c", "__cum_c").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2, x._3))
    val want = df.withColumn("__cum_c", sum("c").over(
        Window.orderBy("v").rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2, x._3))
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }

  test("keyed cumSum resets per key and handles keys spanning partitions") {
    import spark.implicits._
    // few keys, many values per key -> every key spans range partitions
    val df = (for (k <- Seq("a", "b", "c"); i <- 1 to 200)
      yield (k, i.toDouble, 1.0)).toDF("k", "v", "c")
    val got = RangeCum.cumSum(df, Seq("k"), "v", Seq("c"))
      .select("k", "v", "__cum_c").collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    for (k <- Seq("a", "b", "c"); i <- 1 to 200)
      assert(got((k, i.toDouble)) == i.toDouble, s"key $k v $i")
  }

  test("descending order and multiple sum columns") {
    import spark.implicits._
    val df = Seq((1.0, 2.0, 10.0), (2.0, 3.0, 20.0), (3.0, 5.0, 30.0))
      .toDF("v", "a", "b")
    val got = RangeCum.cumSum(df, Nil, "v", Seq("a", "b"), ascending = false)
      .collect().map(r => r.getDouble(0) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    assert(got(3.0) == ((5.0, 30.0)))
    assert(got(2.0) == ((8.0, 50.0)))
    assert(got(1.0) == ((10.0, 60.0)))
  }

  test("plan has no unpartitioned WindowExec; guard refuses entry blowup") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toDouble, 1.0)).toDF("v", "c")
    val plan = RangeCum.cumSum(df, Nil, "v", Seq("c"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
    val e = intercept[IllegalArgumentException] {
      RangeCum.cumSum(df, Nil, "v", Seq("c"), maxDriverEntries = 0)
    }
    assert(e.getMessage.contains("maxDriverEntries"))
  }
}
