package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class NormalizeTextSpec extends SparkSpec {

  private def norm(s: String): String =
    NormalizeText.normalize(UTF8String.fromString(s)).toString

  /** The exact column chain the expression replaced — parity oracle. */
  private def chain = (c: org.apache.spark.sql.Column) =>
    trim(regexp_replace(
      regexp_replace(lower(c), "[^a-z0-9\\s]", " "), "\\s+", " "))

  test("direct eval: basic lowering, punctuation, whitespace collapse") {
    assert(norm("Hello, World!") == "hello world")
    assert(norm("  a\t\tb\nc  ") == "a b c")
    assert(norm("a--b__c") == "a b c")
    assert(norm("ABC123xyz") == "abc123xyz")
    assert(norm("") == "")
    assert(norm("!!!???") == "")
    assert(norm("   ") == "")
    assert(norm("a") == "a")
  }

  test("byte-parity with the regex chain on adversarial inputs") {
    val cases = Seq(
      "Hello, World!", "  a\t\tb\nc  ", "", "   ", "!!!", "a",
      "MiXeD CaSe 42", "tab\tsep", "nl\nsep", "cr\rsep",
      "nbsp\u00a0sep",   // NBSP: not Java \s, first regex -> space
      "Ångström",     // accented letters → separators
      "İstanbul",          // İ lowers to i + U+0307 combining dot
      "ẞharp",             // capital sharp s ẞ → ß (separator)
      "ΚΕΛ",     // Greek capitals (all separators)
      "emoji 😀 mid", // astral code point mid-string
      "😀",           // astral only
      "pair😀😀pair", // astral run collapses once
      "ｆｗ",           // fullwidth latin letters
      "digits １２３ fw",     // fullwidth digits
      "\u212aelvin sign",   // Kelvin sign lowers to ASCII k
      "zero\u200bwidth",  // ZWSP: not Java \s, → space
      "vt\u000bsep", "ff\u000csep",  // the exotic Java \s members
      "a  b   c    d",
      "ends ", " starts", "ctlchr")
    import spark.implicits._
    val df = cases.toDF("t")
    val got = df.select(NormalizeText.of(col("t")).as("g"),
      chain(col("t")).as("e")).collect()
    got.zip(cases).foreach { case (r, in) =>
      assert(r.getString(0) == r.getString(1),
        s"mismatch for input ${in.map(c => f"\\u${c.toInt}%04x").mkString}: " +
          s"got '${r.getString(0)}' expected '${r.getString(1)}'")
    }
  }

  test("null propagates; non-string input rejected at analysis") {
    import spark.implicits._
    val df = Seq(Some("A b"), None).toDF("t")
    val got = df.select(NormalizeText.of(col("t"))).collect()
    assert(got(0).getString(0) == "a b")
    assert(got(1).isNullAt(0))
    val bad = intercept[Exception] {
      Seq(1).toDF("n").select(NormalizeText.of(col("n"))).collect()
    }
    assert(bad.getMessage.contains("normalize_text") ||
      bad.getMessage.toLowerCase.contains("string"))
  }

  test("stays inside whole-stage codegen over a non-foldable source") {
    val df = spark.range(100)
      .selectExpr("concat('Doc #', id, '  TEXT!') as t")
      .select(NormalizeText.of(col("t")).as("n"))
    // the `*(1)` marker is the WholeStageCodegen span in simpleString
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [normalize_text"), plan)
    assert(df.distinct().count() == 100)
    assert(df.head().getString(0) == "doc 0 text")
  }
}
