package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class SemistructuredSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private lazy val mixed = {
    import spark.implicits._
    Seq(
      """{"a": 1, "b": "x"}""",
      """{"a": 2, "b": "x", "c": 1.5}""",
      """{"a": "oops", "b": "y"}""",
      """{"b": "y"}""",
      null
    ).toDF("js")
  }

  test("jsonProfile: per-key counts, numeric share, row share") {
    val p = Semistructured.jsonProfile(mixed, "js")
      .orderBy("key").collect()
    assert(p.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    val a = p(0)
    assert(a.getLong(1) == 3)          // cnt: a present in 3 rows
    assert(a.getLong(2) == 3)          // "1","2","oops" distinct
    assert(a.getLong(3) == 2)          // only 1 and 2 numeric
    assert(math.abs(a.getDouble(4) - 1.5) < 1e-12) // avg of 1,2
    assert(math.abs(a.getDouble(5) - 0.75) < 1e-12) // 3 of 4 non-null rows
    val c = p(2)
    assert(c.getLong(1) == 1 && math.abs(c.getDouble(4) - 1.5) < 1e-12)
  }

  test("jsonProfile: all-null column yields empty profile, not NPE") {
    import spark.implicits._
    val df = Seq[String](null, null).toDF("js")
    assert(Semistructured.jsonProfile(df, "js").count() == 0)
  }

  test("extractFields: typed extraction, missing/mismatched keys null") {
    val out = Semistructured.extractFields(mixed, "js",
      Seq(("a_l", "a", LongType), ("b_s", "b", StringType),
        ("c_d", "c", DoubleType)))
      .select("a_l", "b_s", "c_d").collect()
    assert(out(0) == Row(1L, "x", null))
    assert(out(1) == Row(2L, "x", 1.5))
    assert(out(2) == Row(null, "y", null)) // "oops" is not a long
    assert(out(3) == Row(null, "y", null)) // a missing entirely
    assert(out(4) == Row(null, null, null)) // null JSON
  }

  test("extractFields: preserves original columns and row count") {
    val withId = mixed.withColumn("id", monotonically_increasing_id())
    val out = Semistructured.extractFields(withId, "js",
      Seq(("a_l", "a", LongType)))
    assert(out.columns.toSeq == Seq("js", "id", "a_l"))
    assert(out.count() == 5)
  }

  test("inferJsonSchema: union of sampled keys with sensible types") {
    val schema = Semistructured.inferJsonSchema(mixed, "js")
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    assert(byName.keySet == Set("a", "b", "c"))
    // "a" holds 1, 2 and "oops" → inference widens to string
    assert(byName("a") == StringType)
    assert(byName("b") == StringType)
    assert(byName("c") == DoubleType)
  }

  test("jsonProfileDiff: added/removed/common with zero-coalesced sides") {
    import spark.implicits._
    val old = Seq("""{"a": 1, "b": 2}""", """{"a": 3}""").toDF("js")
    val neu = Seq("""{"a": 9}""", """{"c": "x"}""").toDF("js")
    val got = Semistructured.jsonProfileDiff(old, neu, "js")
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      ("a", "common", 2L, 1L, 1.0, 0.5),
      ("b", "removed", 1L, 0L, 0.5, 0.0),
      ("c", "added", 0L, 1L, 0.0, 0.5)))
  }
}
