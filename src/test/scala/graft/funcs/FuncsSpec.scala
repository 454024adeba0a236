package graft.funcs

import graft.SparkSpec
import graft.funcs.implicits._
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class FuncsSpec extends SparkSpec {

  lazy val strDf = {
    import spark.implicits._
    Seq("hello world", "Mr. Owen Harris", "  pad  ", "café", "-42", "ABC")
      .toDF("s")
  }

  private def one(colExpr: org.apache.spark.sql.Column, input: String): Any = {
    import spark.implicits._
    Seq(input).toDF("s").select(colExpr).head().get(0)
  }

  test("clip leaves null and NaN untouched like pandas") {
    import spark.implicits._
    val df = Seq[java.lang.Double](5.0, -1.0, 100.0, null, Double.NaN).toDF("v")
    val out = df.select(col("v").series.clip(0.0, 10.0)).collect()
      .map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(out.count(_ == null) == 1)
    assert(out.count(v => v != null && v.asInstanceOf[Double].isNaN) == 1)
    assert(out.contains(0.0) && out.contains(10.0) && out.contains(5.0))
  }

  test("str.join interleaves separator between chars, array join joins elements") {
    import spark.implicits._
    assert(one(col("s").str.join("-"), "abc") == "a-b-c")
    assert(one(col("s").str.join("$1"), "ab") == "a$1b") // literal sep
    assert(one(col("s").str.join("-"), "x") == "x")
    val arr = Seq(Seq("a", "b", "c")).toDF("a")
      .select(StringFuncs.joinArray(col("a"), ",")).head().getString(0)
    assert(arr == "a,b,c")
  }

  test("dt.nanosecond/time/tz") {
    import spark.implicits._
    val df = Seq(Timestamp.valueOf("2026-03-01 13:45:30")).toDF("t")
    val r = df.select(col("t").dt.nanosecond, col("t").dt.time, col("t").dt.tz)
      .head()
    assert(r.getInt(0) == 0)
    assert(r.getString(1) == "13:45:30")
    assert(r.getString(2) == "UTC") // session tz fixed in SparkSpec
  }

  test("find returns pandas -1 semantics") {
    assert(one(col("s").str.find("Mr."), "Mr. Owen") == 0)
    assert(one(col("s").str.find("xyz"), "Mr. Owen") == -1)
    assert(one(col("s").str.find("Owen"), "Mr. Owen") == 4)
  }

  test("rfind finds last occurrence") {
    assert(one(col("s").str.rfind("l"), "hello world") == 9)
    assert(one(col("s").str.rfind("zz"), "hello") == -1)
  }

  test("slice is 0-based [start, stop)") {
    assert(one(col("s").str.slice(2, 5), "hello world") == "llo")
    assert(one(col("s").str.slice(0, 5), "hello world") == "hello")
  }

  test("replace is regex by default, literal on demand") {
    assert(one(col("s").str.replace("l+", "L"), "hello") == "heLo")
    assert(one(col("s").str.replace("l+", "L", regex = false), "well l+") == "well L")
  }

  test("zfill pads with sign handling") {
    assert(one(col("s").str.zfill(5), "42") == "00042")
    assert(one(col("s").str.zfill(5), "-42") == "-0042")
    assert(one(col("s").str.zfill(3), "123456") == "123456")
  }

  test("center matches pandas (extra char on right)") {
    assert(one(col("s").str.center(5, "*"), "ab") == "*ab**")
    assert(one(col("s").str.center(6, "*"), "ab") == "**ab**")
  }

  test("title/istitle/swapcase/capitalize match Python semantics") {
    assert(one(col("s").str.title, "mr. owen-harris") == "Mr. Owen-Harris")
    assert(one(col("s").str.istitle, "Mr. Owen") == true)
    assert(one(col("s").str.istitle, "MR. OWEN") == false)
    assert(one(col("s").str.swapcase, "AbC") == "aBc")
    assert(one(col("s").str.capitalize, "hELLO wORLD") == "Hello world")
  }

  test("removeAccents folds diacritics") {
    assert(one(col("s").str.removeAccents, "café naïve") == "cafe naive")
  }

  test("char-class predicates") {
    assert(one(col("s").str.isalpha, "abc") == true)
    assert(one(col("s").str.isalpha, "ab1") == false)
    assert(one(col("s").str.isdigit, "123") == true)
    assert(one(col("s").str.isspace, "  \t") == true)
    assert(one(col("s").str.islower, "abc1") == true)
    assert(one(col("s").str.isupper, "ABC1") == true)
  }

  test("wrap hard-wraps at width") {
    assert(one(col("s").str.wrap(5), "aa bb cc dd") == "aa bb\ncc dd")
  }

  // ---- datetime ----
  private def oneTs(colExpr: org.apache.spark.sql.Column, ts: String): Any = {
    import spark.implicits._
    Seq(Timestamp.valueOf(ts)).toDF("t").select(colExpr).head().get(0)
  }

  test("dayofweek is Monday=0 like pandas") {
    // 2012-01-02 was a Monday
    assert(oneTs(col("t").dt.dayofweek, "2012-01-02 00:00:00") == 0)
    assert(oneTs(col("t").dt.dayofweek, "2012-01-08 00:00:00") == 6) // Sunday
  }

  test("leap year / month boundaries") {
    assert(oneTs(col("t").dt.isLeapYear, "2012-06-15 00:00:00") == true)
    assert(oneTs(col("t").dt.isLeapYear, "2100-06-15 00:00:00") == false)
    assert(oneTs(col("t").dt.daysinmonth, "2012-02-10 00:00:00") == 29)
    assert(oneTs(col("t").dt.isMonthEnd, "2012-02-29 00:00:00") == true)
    assert(oneTs(col("t").dt.isQuarterStart, "2012-04-01 00:00:00") == true)
    assert(oneTs(col("t").dt.isYearEnd, "2012-12-31 00:00:00") == true)
  }

  test("strftime token translation") {
    assert(DateFuncs.translateFormat("%Y-%m-%d") == "yyyy-MM-dd")
    assert(oneTs(col("t").dt.strftime("%Y-%m"), "2012-03-15 10:30:00") == "2012-03")
    assert(oneTs(col("t").dt.strftime("%d of %B"), "2012-03-05 00:00:00")
      == "05 of March")
  }

  test("floor/ceil/round to day") {
    assert(oneTs(col("t").dt.floor("D"), "2012-03-15 10:30:00").toString
      == "2012-03-15 00:00:00.0")
    assert(oneTs(col("t").dt.ceil("D"), "2012-03-15 10:30:00").toString
      == "2012-03-16 00:00:00.0")
    assert(oneTs(col("t").dt.ceil("D"), "2012-03-15 00:00:00").toString
      == "2012-03-15 00:00:00.0")
    assert(oneTs(col("t").dt.round("D"), "2012-03-15 10:30:00").toString
      == "2012-03-15 00:00:00.0")
    assert(oneTs(col("t").dt.round("D"), "2012-03-15 15:00:00").toString
      == "2012-03-16 00:00:00.0")
  }

  test("remaining string surface: get/repeat/pad/count/translate/sliceReplace") {
    assert(one(col("s").str.get(1), "abc") == "b")
    assert(one(col("s").str.repeat(3), "ab") == "ababab")
    assert(one(col("s").str.pad(5, "left", "0"), "42") == "00042")
    assert(one(col("s").str.pad(6, "both", "*"), "ab") == "**ab**")
    assert(one(col("s").str.count("[ab]"), "abcab") == 4)
    assert(one(col("s").str.translate("abc", "xyz"), "aabbcc") == "xxyyzz")
    assert(one(col("s").str.sliceReplace(1, 3, "XY"), "abcde") == "aXYde")
    assert(one(col("s").str.ljust(4), "ab") == "ab  ")
    assert(one(col("s").str.matches("b"), "abc") == false)
    assert(one(col("s").str.matches("a.c"), "abc") == true)
  }

  test("dt tz conversion and microseconds") {
    assert(oneTs(col("t").dt.tzConvert("America/New_York"),
      "2020-06-15 12:00:00").toString == "2020-06-15 08:00:00.0")
    assert(oneTs(col("t").dt.microsecond, "2020-06-15 12:00:00.123456") == 123456)
    assert(oneTs(col("t").dt.weekdayName, "2020-06-15 00:00:00") == "Monday")
  }

  test("betweenTime keeps rows by time of day") {
    import spark.implicits._
    val df = Seq(
      Timestamp.valueOf("2020-01-01 09:30:00"),
      Timestamp.valueOf("2020-01-02 18:00:00")).toDF("t")
    val kept = df.filter(SeriesFuncs.betweenTime(col("t"), "09:00", "10:00"))
      .count()
    assert(kept == 1)
  }

  test("normalizeUnicode NFKD decomposition feeds accent removal") {
    assert(one(StringFuncs.normalizeUnicode("NFKD")(col("s"))
      .startsWith("cafe"), "café") == true)
  }

  test("series clip and replaceValues") {
    import spark.implicits._
    val df = Seq(1.0, 5.0, 10.0).toDF("v")
    val clipped = df.select(col("v").series.clip(2, 8)).collect().map(_.getDouble(0))
    assert(clipped.toSeq == Seq(2.0, 5.0, 8.0))
    val replaced = df.select(col("v").series.replaceValues(Map(5.0 -> 50.0)))
      .collect().map(_.getDouble(0))
    assert(replaced.toSeq == Seq(1.0, 50.0, 10.0))
  }
}
