package graft.funcs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** pandas `.str` surface (reference handyspark/sql/string.py:6-29) as
  * NATIVE Catalyst column builders — the reference executes these as Arrow
  * pandas UDFs (sql/transform.py:50-72); on the JVM every method here stays
  * inside whole-stage codegen. The few true pandas-parity quirks that need
  * a closure (accent folding, exact titlecasing) are Scala UDFs, isolated
  * at the bottom.
  *
  * Parity traps handled (SURVEY §7.4):
  *  - pandas `find` returns −1 when absent, Spark `instr` returns 0 → shift;
  *  - pandas `replace`/`count`/`match` are REGEX-by-default → regexp_*;
  *  - `slice` is 0-based [start, stop) → substring is 1-based length-based.
  */
object StringFuncs {

  // ---- boolean-returning ----
  def contains(c: Column, sub: String, regex: Boolean = false): Column =
    if (regex) c.rlike(sub) else c.contains(sub)
  def startswith(c: Column, sub: String): Column = c.startsWith(sub)
  def endswith(c: Column, sub: String): Column = c.endsWith(sub)
  /** pandas str.match: regex anchored at the START only. */
  def matches(c: Column, pattern: String): Column = c.rlike("^(?:" + pattern + ")")
  def isalpha(c: Column): Column = c.rlike("^\\p{L}+$")
  def isnumeric(c: Column): Column = c.rlike("^[\\p{N}]+$")
  def isalnum(c: Column): Column = c.rlike("^[\\p{L}\\p{N}]+$")
  def isdigit(c: Column): Column = c.rlike("^[\\p{Nd}]+$")
  def isdecimal(c: Column): Column = c.rlike("^[0-9]+$")
  def isspace(c: Column): Column = c.rlike("^\\s+$")
  def islower(c: Column): Column = c === lower(c) && c.rlike("\\p{Ll}")
  def isupper(c: Column): Column = c === upper(c) && c.rlike("\\p{Lu}")

  // ---- string-returning ----
  /** pandas str.replace: regex by default. */
  def replace(c: Column, pattern: String, repl: String,
              regex: Boolean = true): Column =
    if (regex) regexp_replace(c, pattern, repl)
    else regexp_replace(c, java.util.regex.Pattern.quote(pattern),
      java.util.regex.Matcher.quoteReplacement(repl))
  def repeatStr(c: Column, n: Int): Column = repeat(c, n)
  def pad(c: Column, width: Int, side: String = "left",
          fillchar: String = " "): Column = side match {
    case "left"  => lpad(c, width, fillchar)
    case "right" => rpad(c, width, fillchar)
    case "both"  => center(c, width, fillchar)
  }
  def ljust(c: Column, width: Int, fillchar: String = " "): Column =
    rpad(c, width, fillchar) // pandas ljust = left-justify = pad right
  def rjust(c: Column, width: Int, fillchar: String = " "): Column =
    lpad(c, width, fillchar)
  /** center: pandas puts the extra fill char on the RIGHT. */
  def center(c: Column, width: Int, fillchar: String = " "): Column = {
    val total = lit(width) - length(c)
    val leftN = greatest(floor(total / 2).cast("int"), lit(0))
    rpad(lpad(c, leftN + length(c), lit(fillchar)), lit(width), lit(fillchar))
  }
  def zfill(c: Column, width: Int): Column =
    when(c.startsWith("-"),
      concat(lit("-"), lpad(substring_index(c, "-", -1),
        greatest(lit(width) - 1, length(c) - 1).cast("int"), lit("0"))))
      .otherwise(lpad(c, greatest(lit(width), length(c)).cast("int"), lit("0")))
  /** pandas str.slice(start, stop): 0-based, [start, stop). */
  def slice(c: Column, start: Int, stop: Int): Column =
    substring(c, start + 1, math.max(stop - start, 0))
  def sliceReplace(c: Column, start: Int, stop: Int, repl: String): Column =
    concat(substring(c, 1, start), lit(repl),
      substring(c, stop + 1, Int.MaxValue))
  def strip(c: Column): Column = trim(c)
  def lstrip(c: Column): Column = ltrim(c)
  def rstrip(c: Column): Column = rtrim(c)
  def get(c: Column, i: Int): Column = substring(c, i + 1, 1)
  /** pandas str.join(sep) on a string treats it as a char sequence:
    * "abc".join("-") == "a-b-c". Lookahead keeps the last char bare. */
  def joinChars(c: Column, sep: String): Column =
    regexp_replace(c, "(?s)(.)(?=.)",
      "$1" + java.util.regex.Matcher.quoteReplacement(sep))
  /** pandas str.join(sep) on a list-typed column: join the elements. */
  def joinArray(c: Column, sep: String): Column = array_join(c, sep)
  def lowerCase(c: Column): Column = lower(c)
  def upperCase(c: Column): Column = upper(c)
  /** capitalize: first char upper, REST lower (unlike initcap). */
  def capitalize(c: Column): Column =
    concat(upper(substring(c, 1, 1)), lower(substring(c, 2, Int.MaxValue)))
  def translateStr(c: Column, from: String, to: String): Column =
    translate(c, from, to)

  // ---- integer-returning ----
  /** pandas str.count: regex occurrence count. */
  def countMatches(c: Column, pattern: String): Column =
    regexp_count(c, lit(pattern))
  def len(c: Column): Column = length(c)
  /** pandas find: 0-based index or −1 (instr is 1-based, 0 when absent). */
  def find(c: Column, sub: String): Column = instr(c, sub) - 1
  def rfind(c: Column, sub: String): Column = {
    // last index: len - len(substring_index suffix) … simplest native form:
    // position of sub in reversed string, mapped back
    val rev = when(instr(reverse(c), reverse(lit(sub))) > 0,
      length(c) - instr(reverse(c), reverse(lit(sub))) - lit(sub.length) + 1)
      .otherwise(lit(-1))
    rev.cast("int")
  }

  /** Unicode normalization (pandas str.normalize): NFC/NFD/NFKC/NFKD. */
  def normalizeUnicode(form: String): Column => Column = {
    val f = udf { s: String =>
      if (s == null) null
      else java.text.Normalizer.normalize(s,
        java.text.Normalizer.Form.valueOf(form))
    }
    c => f(c)
  }

  /** NFKD-normalize + strip combining marks (reference remove_accents,
    * sql/string.py:22-29) — a codegen'd Catalyst expression, not a UDF
    * (graft.expr.RemoveAccents). */
  val removeAccents: Column => Column = c => graft.expr.RemoveAccents.of(c)

  /** Python str.title semantics: uppercase after every non-letter. */
  val title: Column => Column = {
    val f = udf { s: String =>
      if (s == null) null
      else {
        val sb = new StringBuilder
        var prevLetter = false
        s.foreach { ch =>
          sb.append(
            if (ch.isLetter && !prevLetter) ch.toUpper
            else if (ch.isLetter) ch.toLower else ch)
          prevLetter = ch.isLetter
        }
        sb.toString
      }
    }
    c => f(c)
  }

  val swapcase: Column => Column = {
    val f = udf { s: String =>
      if (s == null) null
      else s.map(ch => if (ch.isUpper) ch.toLower
        else if (ch.isLower) ch.toUpper else ch)
    }
    c => f(c)
  }

  /** Python str.istitle. */
  val istitle: Column => Column = {
    val f = udf { s: String =>
      if (s == null) null.asInstanceOf[java.lang.Boolean]
      else java.lang.Boolean.valueOf {
        var prevLetter = false
        var sawLetter = false
        var ok = true
        s.foreach { ch =>
          if (ch.isLetter) {
            if (!prevLetter && !ch.isUpper) ok = false
            if (prevLetter && !ch.isLower) ok = false
            sawLetter = true
            prevLetter = true
          } else prevLetter = false
        }
        ok && sawLetter
      }
    }
    c => f(c)
  }

  /** textwrap.wrap-style hard wrap at `width`, joined by \n. */
  def wrap(width: Int): Column => Column = {
    val f = udf { s: String =>
      if (s == null) null
      else {
        val words = s.split("\\s+").filter(_.nonEmpty)
        val lines = scala.collection.mutable.ArrayBuffer.empty[String]
        val cur = new StringBuilder
        words.foreach { w =>
          if (cur.isEmpty) cur.append(w)
          else if (cur.length + 1 + w.length <= width) {
            cur.append(' '); cur.append(w)
          } else { lines += cur.toString; cur.clear(); cur.append(w) }
        }
        if (cur.nonEmpty) lines += cur.toString
        lines.mkString("\n")
      }
    }
    c => f(c)
  }
}
