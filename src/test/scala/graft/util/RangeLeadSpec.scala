package graft.util

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RangeLeadSpec extends SparkSpec {

  test("lead1 matches a sequential window exactly on a unique order key") {
    import spark.implicits._
    // keys interleaved so range partitions each hold a contiguous slice;
    // every partition boundary exercises the broadcast handoff
    val df = (1 to 500).map(i => ((i * 7919) % 1009, s"name_$i"))
      .toDF("k", "name")
    val got = RangeLead.lead1(df, Seq("k"), Seq("name"))
      .select("k", "__lead_name").collect()
      .map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    val want = df.withColumn("nx", lead("name", 1).over(Window.orderBy("k")))
      .collect().map(r => r.getInt(0) -> Option(r.getString(2))).toMap
    assert(got.size == want.size)
    want.foreach { case (k, v) => assert(got(k) == v, s"k=$k") }
  }

  test("globally last row gets null; multiple lead columns keep their types") {
    import spark.implicits._
    val df = Seq((3, "c", 30L), (1, "a", 10L), (2, "b", 20L))
      .toDF("k", "s", "v")
    val got = RangeLead.lead1(df, Seq("k"), Seq("s", "v"))
      .orderBy("k").collect()
    assert(got.map(_.getString(3)).toSeq == Seq("b", "c", null))
    assert(got.map(r => if (r.isNullAt(4)) -1L else r.getLong(4)).toSeq ==
      Seq(20L, 30L, -1L))
  }

  test("handoff skips empty range partitions") {
    import spark.implicits._
    // two distinct keys under 4 shuffle partitions -> at least two empty
    // range partitions between/after the occupied ones
    val df = Seq((1, "a"), (1000000, "z")).toDF("k", "s")
    val got = RangeLead.lead1(df, Seq("k"), Seq("s"))
      .orderBy("k").collect().map(r => Option(r.getString(2))).toSeq
    assert(got == Seq(Some("z"), None))
  }

  test("empty input yields an empty frame with the lead column appended") {
    import spark.implicits._
    val df = Seq.empty[(Int, String)].toDF("k", "s")
    val out = RangeLead.lead1(df, Seq("k"), Seq("s"))
    assert(out.columns.toSeq == Seq("k", "s", "__lead_s"))
    assert(out.count() == 0)
  }
}
