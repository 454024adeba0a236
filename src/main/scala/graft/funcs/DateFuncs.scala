package graft.funcs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** pandas `.dt` surface (reference handyspark/sql/datetime.py:5-46) as
  * native Catalyst builders. Parity traps (SURVEY §7.4): pandas dayofweek
  * is Monday=0 while Spark dayofweek is Sunday=1 (shifted here); pandas
  * `week` is ISO week (Spark weekofyear already is); strftime %-tokens are
  * translated to date_format patterns.
  */
object DateFuncs {

  // ---- integer-returning ----
  def day(c: Column): Column = dayofmonth(c)
  /** pandas semantics: Monday=0 … Sunday=6. */
  def dayofweekMonday0(c: Column): Column = (dayofweek(c) + 5) % 7
  def weekday(c: Column): Column = dayofweekMonday0(c)
  def dayofyearOf(c: Column): Column = dayofyear(c)
  def daysinmonth(c: Column): Column = dayofmonth(last_day(c))
  def hourOf(c: Column): Column = hour(c)
  def minuteOf(c: Column): Column = minute(c)
  def monthOf(c: Column): Column = month(c)
  def quarterOf(c: Column): Column = quarter(c)
  def secondOf(c: Column): Column = second(c)
  def microsecondOf(c: Column): Column =
    (unix_micros(c) % 1000000L).cast("int")
  /** pandas .dt.nanosecond: the sub-microsecond component — always 0 for
    * Spark's TimestampType (microsecond precision). */
  def nanosecondOf(c: Column): Column = (unix_micros(c) * 0L).cast("int")
  /** pandas .dt.time: the time-of-day as "HH:mm:ss". */
  def timeOf(c: Column): Column = date_format(c, "HH:mm:ss")
  /** pandas .dt.tz: Spark session timestamps are session-timezone-relative,
    * so the tz is the session zone. */
  def tzName(c: Column): Column = current_timezone()
  /** ISO week number (Spark weekofyear is ISO-8601). */
  def week(c: Column): Column = weekofyear(c)
  def yearOf(c: Column): Column = year(c)

  // ---- boolean-returning ----
  def isLeapYear(c: Column): Column = {
    val y = year(c)
    (y % 4 === 0 && y % 100 =!= 0) || y % 400 === 0
  }
  def isMonthStart(c: Column): Column = dayofmonth(c) === 1
  def isMonthEnd(c: Column): Column = to_date(c) === last_day(c)
  def isQuarterStart(c: Column): Column =
    dayofmonth(c) === 1 && (month(c) - 1) % 3 === 0
  def isQuarterEnd(c: Column): Column =
    isMonthEnd(c) && month(c) % 3 === 0
  def isYearStart(c: Column): Column = dayofyear(c) === 1
  def isYearEnd(c: Column): Column = month(c) === 12 && dayofmonth(c) === 31

  // ---- string-returning ----
  /** strftime with %-token translation to date_format patterns
    * (reference passes pandas strftime straight through; we translate the
    * common token set). */
  def strftime(c: Column, fmt: String): Column =
    date_format(c, translateFormat(fmt))
  def weekdayName(c: Column): Column = date_format(c, "EEEE")

  private[funcs] def translateFormat(fmt: String): String = {
    val out = new StringBuilder
    val literal = new StringBuilder
    def flushLiteral(): Unit = if (literal.nonEmpty) {
      out.append('\'').append(literal.toString.replace("'", "''")).append('\'')
      literal.clear()
    }
    var i = 0
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%' && i + 1 < fmt.length) {
        flushLiteral()
        out.append(fmt.charAt(i + 1) match {
          case 'Y' => "yyyy"
          case 'y' => "yy"
          case 'm' => "MM"
          case 'd' => "dd"
          case 'H' => "HH"
          case 'I' => "hh"
          case 'M' => "mm"
          case 'S' => "ss"
          case 'f' => "SSSSSS"
          case 'j' => "DDD"
          case 'B' => "MMMM"
          case 'b' => "MMM"
          case 'A' => "EEEE"
          case 'a' => "EEE"
          case 'p' => "a"
          case '%' => "%"
          case other => other.toString
        })
        i += 2
      } else {
        val ch = fmt.charAt(i)
        // collect literal letters into a single quoted run so
        // date_format doesn't interpret them as pattern tokens
        if (ch.isLetter || ch == '\'') literal.append(ch)
        else { flushLiteral(); out.append(ch) }
        i += 1
      }
    }
    flushLiteral()
    out.toString
  }

  // ---- date/timestamp-returning ----
  def dateOf(c: Column): Column = to_date(c)
  /** floor to a unit (pandas dt.floor with D/H/T/S). */
  def floorTo(c: Column, freq: String): Column =
    date_trunc(freqToUnit(freq), c)
  def normalize(c: Column): Column = date_trunc("DAY", c)
  def ceilTo(c: Column, freq: String): Column = {
    val unit = freqToUnit(freq)
    val floored = date_trunc(unit, c)
    when(floored === c, c).otherwise(
      floored + expr(unitInterval(freq)))
  }
  def roundTo(c: Column, freq: String): Column = {
    val unit = freqToUnit(freq)
    val floored = date_trunc(unit, c)
    val ceiled = ceilTo(c, freq)
    val toFloor = unix_micros(c) - unix_micros(floored)
    val toCeil = unix_micros(ceiled) - unix_micros(c)
    when(toFloor < toCeil, floored)
      .when(toFloor > toCeil, ceiled)
      // halfway: round to even multiple like pandas — approximate with ceil
      .otherwise(ceiled)
  }
  def tzConvert(c: Column, tz: String): Column = from_utc_timestamp(c, tz)
  def tzLocalize(c: Column, tz: String): Column = to_utc_timestamp(c, tz)

  private def freqToUnit(freq: String): String = freq.toUpperCase match {
    case "D"          => "DAY"
    case "H"          => "HOUR"
    case "T" | "MIN"  => "MINUTE"
    case "S"          => "SECOND"
    case other        => other
  }
  private def unitInterval(freq: String): String = freq.toUpperCase match {
    case "D"         => "INTERVAL 1 DAY"
    case "H"         => "INTERVAL 1 HOUR"
    case "T" | "MIN" => "INTERVAL 1 MINUTE"
    case "S"         => "INTERVAL 1 SECOND"
    case other       => s"INTERVAL 1 $other"
  }
}
