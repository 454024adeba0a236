package graft.strata

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StrataSpec extends SparkSpec {

  lazy val df = {
    import spark.implicits._
    Seq(("a", 0.0), ("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0),
      ("b", 5.0), ("a", 6.0), ("b", 7.0), ("a", 8.0), ("b", 10.0))
      .toDF("g", "v")
  }

  test("Bucket produces equal-width indices with edge value in last bin") {
    val sf = StratifiedFrame(df, Seq(Bucket("v", 5)))
    val counts = sf.agg((d, sc) => d.groupBy(col(sc.head).as("b"))
      .agg(count(lit(1)).as("n"))).orderBy("b").collect()
    // edges 0,2,4,6,8,10; values 0,1 → b0; 2,3 → b1; 4,5 → b2; 6,7 → b3; 8,10 → b4
    assert(counts.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((0, 2L), (1, 2L), (2, 2L), (3, 2L), (4, 2L)))
  }

  test("clause strings follow the reference contract") {
    val sf = StratifiedFrame(df, Seq(ColStratum("g"), Bucket("v", 2)))
    assert(sf.strata.exists(_.clause == """g == "a" and (v >= 0.0) and (v < 5.0)"""))
    assert(sf.strata.exists(_.clause == """g == "b" and (v >= 5.0) and (v <= 10.0)"""))
  }

  test("grouped path equals per-stratum filtered path") {
    val sf = StratifiedFrame(df, Seq(ColStratum("g")))
    val grouped = sf.agg((d, sc) => d.groupBy(sc.map(col): _*)
      .agg(sum("v").as("s"))).orderBy("g")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val filtered = sf.perStratum(d => d.agg(sum("v").as("s")))
      .orderBy("__stratum")
      .collect().map(r => r.getDouble(0)).toSeq
    assert(grouped.map(_._2) == filtered)
  }

  test("null strata values are dropped from combo discovery") {
    import spark.implicits._
    val withNull = Seq[(String, java.lang.Double)](
      ("a", 1.0), ("b", 2.0), (null, 3.0)).toDF("g", "v")
    val sf = StratifiedFrame(withNull, Seq(ColStratum("g")))
    assert(sf.strata.map(_.values.head._2).toSet == Set("a", "b"))
    // filtered path covers exactly the non-null rows
    val total = sf.perStratum(d => d.agg(count(lit(1)).as("n")))
      .agg(sum("n")).head().getLong(0)
    assert(total == 2L)
  }

  test("Quantile exact edges give equal-count bins") {
    val sf = StratifiedFrame(df, Seq(Quantile("v", 2, exact = true)))
    val counts = sf.agg((d, sc) => d.groupBy(col(sc.head).as("b"))
      .agg(count(lit(1)).as("n"))).orderBy("b").collect()
    assert(counts.map(_.getLong(1)).sum == 10L)
    assert(counts.length == 2)
    assert(math.abs(counts(0).getLong(1) - counts(1).getLong(1)) <= 1)
  }
}
