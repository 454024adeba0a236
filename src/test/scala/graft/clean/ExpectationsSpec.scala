package graft.clean

import graft.SparkSpec
import graft.clean.Expectations._

class ExpectationsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def byName(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(1), r.getString(2)) ->
      ((r.getDouble(3), r.getBoolean(5)))).toMap

  test("completeness / in_range / allowed / non_negative metrics") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a"), Some(5.0)),
      (Some(2L), Some("b"), Some(-1.0)),
      (None, Some("z"), Some(50.0)),
      (Some(4L), None, None)
    ).toDF("id", "cat", "x")
    val out = byName(Expectations.run(df, Seq(
      Completeness("id", 0.8),
      Completeness("x", 1.0),
      InRange("x", 0.0, 10.0, 0.5),
      AllowedValues("cat", Seq("a", "b"), 0.9),
      NonNegative("x", 0.5))))
    assert(out(("completeness", "id")) == ((0.75, false)))
    assert(out(("completeness", "x")) == ((0.75, false)))
    // x non-null: 5, -1, 50 → in [0,10]: only 5 → 1/3
    assert(math.abs(out(("in_range", "x"))._1 - 1.0 / 3) < 1e-12)
    assert(!out(("in_range", "x"))._2)
    // cat non-null: a, b, z → 2/3 allowed
    assert(math.abs(out(("allowed_values", "cat"))._1 - 2.0 / 3) < 1e-12)
    // x >= 0: 5, 50 of 3 → 2/3 ≥ 0.5 passes
    assert(out(("non_negative", "x")) ==
      ((2.0 / 3, true)) || math.abs(out(("non_negative", "x"))._1 - 2.0 / 3) < 1e-12)
    assert(out(("non_negative", "x"))._2)
  }

  test("uniqueness: dup rows lower the metric, null tuples fail it") {
    import spark.implicits._
    val df = Seq(Some(1L), Some(2L), Some(2L), None).toDF("id")
    val out = byName(Expectations.run(df, Seq(Uniqueness(Seq("id"), 1.0))))
    // distinct non-null = 2, null rows = 1 → (2+1)/4
    assert(out(("uniqueness", "id")) == ((0.75, false)))
    val clean = Seq(1L, 2L, 3L).toDF("id")
    val ok = byName(Expectations.run(clean, Seq(Uniqueness(Seq("id")))))
    assert(ok(("uniqueness", "id")) == ((1.0, true)))
  }

  test("in_range on a dirty string column: unparseable is a miss, not a crash") {
    import spark.implicits._
    val df = Seq("5", "oops", "7").toDF("v")
    val out = byName(Expectations.run(df, Seq(InRange("v", 0, 10, 1.0))))
    assert(math.abs(out(("in_range", "v"))._1 - 2.0 / 3) < 1e-12)
  }

  test("empty table: every share metric is vacuously 1.0") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "cat").filter(lit(false))
    val out = Expectations.run(df, Seq(
      Completeness("id"), Uniqueness(Seq("id")),
      InRange("id", 0, 1), AllowedValues("cat", Seq("a")),
      NonNegative("id"))).collect()
    assert(out.length == 5)
    out.foreach(r => assert(r.getDouble(3) == 1.0 && r.getBoolean(5)))
  }

  test("check_id preserves input order for stable reports") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
    val out = Expectations.run(df,
      Seq(NonNegative("b"), Completeness("a"))).collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((0L, "non_negative"), (1L, "completeness")))
  }

  test("fdViolations: reports only multi-dependent determinants") {
    import spark.implicits._
    val df = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "y"), (3L, "z"))
      .toDF("k", "v")
    val v = Expectations.fdViolations(df, Seq("k"), "v").collect()
    assert(v.length == 1)
    assert(v(0).getLong(0) == 2L && v(0).getLong(2) == 2L)
    assert(v(0).getString(3) == "x" && v(0).getString(4) == "y")
    val holds = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    assert(Expectations.fdViolations(holds, Seq("k"), "v").count() == 0)
  }

  test("fkOrphans: unmatched child keys only; null keys are not orphans") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val orphans = Expectations.fkOrphans(child, "fk", parent, "pk").collect()
    assert(orphans.map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("nullPatterns counts joint missingness masks in column order") {
    import spark.implicits._
    val df = Seq[(Option[Int], Option[String], Option[Double])](
      (Some(1), Some("x"), Some(1.0)),
      (Some(2), Some("y"), Some(2.0)),
      (None, None, Some(3.0)),  // a and b drop together
      (None, None, Some(4.0)),
      (Some(5), None, None))
      .toDF("a", "b", "c")
    val got = Expectations.nullPatterns(df, Seq("a", "b", "c")).collect()
    val byMask = got.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byMask == Map("000" -> 2L, "110" -> 2L, "011" -> 1L))
    // ordered count-desc then mask; shares sum to 1
    assert(got.map(_.getString(0)).toSeq == Seq("000", "110", "011"))
    assert(math.abs(got.map(_.getDouble(2)).sum - 1.0) < 1e-12)
    intercept[IllegalArgumentException] {
      Expectations.nullPatterns(df, Nil)
    }
  }
}
