package graft.funcs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** pandas Series-level boolean/transform surface (reference
  * handyspark/sql/pandas.py:8-14): between/isin/isna/notna/clip/replace/
  * round/abs/truncate — all native Columns.
  */
object SeriesFuncs {
  def between(c: Column, lo: Any, hi: Any): Column = c.between(lo, hi)
  def isin(c: Column, values: Seq[Any]): Column = c.isin(values: _*)
  def isna(c: Column): Column = c.isNull
  def notna(c: Column): Column = c.isNotNull
  // pandas clip leaves null/NaN untouched; Spark greatest/least skip nulls
  // (null would become the bound) and order NaN above all (least(NaN, hi)
  // = hi) — guard so only present values are clipped
  private def present(c: Column): Column =
    c.isNotNull && !isnan(c.cast("double"))
  def clip(c: Column, lo: Double, hi: Double): Column =
    when(present(c), least(greatest(c, lit(lo)), lit(hi))).otherwise(c)
  def clipLower(c: Column, lo: Double): Column =
    when(present(c), greatest(c, lit(lo))).otherwise(c)
  def clipUpper(c: Column, hi: Double): Column =
    when(present(c), least(c, lit(hi))).otherwise(c)
  /** value-map replace (pandas Series.replace with a dict). */
  def replaceValues(c: Column, mapping: Map[Any, Any]): Column =
    mapping.foldLeft(c) { case (acc, (from, to)) =>
      when(c === lit(from), lit(to)).otherwise(acc)
    }
  def roundTo(c: Column, scale: Int): Column = round(c, scale)
  def absOf(c: Column): Column = abs(c)

  /** pandas between_time: keep rows whose TIME-OF-DAY lies in
    * [start, end] (inclusive), "HH:mm" or "HH:mm:ss" bounds. */
  def betweenTime(c: Column, start: String, end: String): Column = {
    def secs(s: String): Int = {
      val p = s.split(":").map(_.toInt)
      p(0) * 3600 + p(1) * 60 + (if (p.length > 2) p(2) else 0)
    }
    val tod = hour(c) * 3600 + minute(c) * 60 + second(c)
    tod.between(secs(start), secs(end))
  }

  /** pandas Series.truncate(before, after) as a predicate: values (or
    * timestamps) within the inclusive bounds. */
  def truncateRange(c: Column, before: Any, after: Any): Column =
    c.between(before, after)
}

/** pandas-style accessors: `col.str.find(...)`, `col.dt.weekday` — sugar
  * over StringFuncs/DateFuncs/SeriesFuncs. */
object implicits {
  implicit final class HandyColumn(private val c: Column) extends AnyVal {
    def str: StrAccessor = new StrAccessor(c)
    def dt: DtAccessor = new DtAccessor(c)
    def series: SeriesAccessor = new SeriesAccessor(c)
  }

  final class StrAccessor(private val c: Column) extends AnyVal {
    def contains(sub: String): Column = StringFuncs.contains(c, sub)
    def startswith(s: String): Column = StringFuncs.startswith(c, s)
    def endswith(s: String): Column = StringFuncs.endswith(c, s)
    def matches(p: String): Column = StringFuncs.matches(c, p)
    def isalpha: Column = StringFuncs.isalpha(c)
    def isnumeric: Column = StringFuncs.isnumeric(c)
    def isalnum: Column = StringFuncs.isalnum(c)
    def isdigit: Column = StringFuncs.isdigit(c)
    def isdecimal: Column = StringFuncs.isdecimal(c)
    def isspace: Column = StringFuncs.isspace(c)
    def islower: Column = StringFuncs.islower(c)
    def isupper: Column = StringFuncs.isupper(c)
    def istitle: Column = StringFuncs.istitle(c)
    def replace(p: String, r: String, regex: Boolean = true): Column =
      StringFuncs.replace(c, p, r, regex)
    def repeat(n: Int): Column = StringFuncs.repeatStr(c, n)
    def pad(w: Int, side: String = "left", fill: String = " "): Column =
      StringFuncs.pad(c, w, side, fill)
    def center(w: Int, fill: String = " "): Column = StringFuncs.center(c, w, fill)
    def ljust(w: Int): Column = StringFuncs.ljust(c, w)
    def rjust(w: Int): Column = StringFuncs.rjust(c, w)
    def zfill(w: Int): Column = StringFuncs.zfill(c, w)
    def slice(start: Int, stop: Int): Column = StringFuncs.slice(c, start, stop)
    def sliceReplace(start: Int, stop: Int, r: String): Column =
      StringFuncs.sliceReplace(c, start, stop, r)
    def strip: Column = StringFuncs.strip(c)
    def lstrip: Column = StringFuncs.lstrip(c)
    def rstrip: Column = StringFuncs.rstrip(c)
    def get(i: Int): Column = StringFuncs.get(c, i)
    def lower: Column = StringFuncs.lowerCase(c)
    def upper: Column = StringFuncs.upperCase(c)
    def title: Column = StringFuncs.title(c)
    def capitalize: Column = StringFuncs.capitalize(c)
    def swapcase: Column = StringFuncs.swapcase(c)
    def translate(from: String, to: String): Column =
      StringFuncs.translateStr(c, from, to)
    def count(p: String): Column = StringFuncs.countMatches(c, p)
    def len: Column = StringFuncs.len(c)
    def find(sub: String): Column = StringFuncs.find(c, sub)
    def rfind(sub: String): Column = StringFuncs.rfind(c, sub)
    def removeAccents: Column = StringFuncs.removeAccents(c)
    def wrap(w: Int): Column = StringFuncs.wrap(w)(c)
    def join(sep: String): Column = StringFuncs.joinChars(c, sep)
  }

  final class DtAccessor(private val c: Column) extends AnyVal {
    def day: Column = DateFuncs.day(c)
    def dayofweek: Column = DateFuncs.dayofweekMonday0(c)
    def weekday: Column = DateFuncs.weekday(c)
    def dayofyear: Column = DateFuncs.dayofyearOf(c)
    def daysinmonth: Column = DateFuncs.daysinmonth(c)
    def hour: Column = DateFuncs.hourOf(c)
    def minute: Column = DateFuncs.minuteOf(c)
    def month: Column = DateFuncs.monthOf(c)
    def quarter: Column = DateFuncs.quarterOf(c)
    def second: Column = DateFuncs.secondOf(c)
    def microsecond: Column = DateFuncs.microsecondOf(c)
    def week: Column = DateFuncs.week(c)
    def year: Column = DateFuncs.yearOf(c)
    def isLeapYear: Column = DateFuncs.isLeapYear(c)
    def isMonthStart: Column = DateFuncs.isMonthStart(c)
    def isMonthEnd: Column = DateFuncs.isMonthEnd(c)
    def isQuarterStart: Column = DateFuncs.isQuarterStart(c)
    def isQuarterEnd: Column = DateFuncs.isQuarterEnd(c)
    def isYearStart: Column = DateFuncs.isYearStart(c)
    def isYearEnd: Column = DateFuncs.isYearEnd(c)
    def strftime(fmt: String): Column = DateFuncs.strftime(c, fmt)
    def weekdayName: Column = DateFuncs.weekdayName(c)
    def date: Column = DateFuncs.dateOf(c)
    def floor(freq: String): Column = DateFuncs.floorTo(c, freq)
    def ceil(freq: String): Column = DateFuncs.ceilTo(c, freq)
    def round(freq: String): Column = DateFuncs.roundTo(c, freq)
    def normalize: Column = DateFuncs.normalize(c)
    def tzConvert(tz: String): Column = DateFuncs.tzConvert(c, tz)
    def tzLocalize(tz: String): Column = DateFuncs.tzLocalize(c, tz)
    def nanosecond: Column = DateFuncs.nanosecondOf(c)
    def time: Column = DateFuncs.timeOf(c)
    def tz: Column = DateFuncs.tzName(c)
  }

  final class SeriesAccessor(private val c: Column) extends AnyVal {
    def between(lo: Any, hi: Any): Column = SeriesFuncs.between(c, lo, hi)
    def betweenTime(start: String, end: String): Column =
      SeriesFuncs.betweenTime(c, start, end)
    def isin(vs: Seq[Any]): Column = SeriesFuncs.isin(c, vs)
    def isna: Column = SeriesFuncs.isna(c)
    def notna: Column = SeriesFuncs.notna(c)
    def clip(lo: Double, hi: Double): Column = SeriesFuncs.clip(c, lo, hi)
    def clipLower(lo: Double): Column = SeriesFuncs.clipLower(c, lo)
    def clipUpper(hi: Double): Column = SeriesFuncs.clipUpper(c, hi)
    def replaceValues(m: Map[Any, Any]): Column = SeriesFuncs.replaceValues(c, m)
    def roundTo(n: Int): Column = SeriesFuncs.roundTo(c, n)
    def absOf: Column = SeriesFuncs.absOf(c)
    def truncateRange(before: Any, after: Any): Column =
      SeriesFuncs.truncateRange(c, before, after)
  }
}
