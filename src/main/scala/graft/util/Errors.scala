package graft.util

/** Error-context prettifier (reference util.py:42-92 prints a framed
  * "HANDY EXCEPTION SUMMARY" by parsing the Python traceback; it is hooked
  * into the DataFrame facade at sql/dataframe.py:929-949). On the JVM the
  * traceback parse is unnecessary: the wrapper captures the failing
  * OPERATOR and COLUMNS at the call site — exactly the information the
  * reference was reconstructing — and frames the root cause, so a typo'd
  * column name surfaces as one readable block instead of a 200-line Spark
  * analysis-exception stack. */
final class GraftException(val summaryText: String, cause: Throwable)
    extends RuntimeException(summaryText, cause)

object Errors {

  private val Line = "-" * 75

  @annotation.tailrec
  def rootCause(e: Throwable): Throwable =
    if (e.getCause == null || (e.getCause eq e)) e else rootCause(e.getCause)

  def summary(op: String, cols: Seq[String], e: Throwable): String = {
    val colPart =
      if (cols.isEmpty) "" else s"\nColumns : ${cols.mkString(", ")}"
    val root = rootCause(e)
    val msg = Option(root.getMessage).getOrElse("").linesIterator
      .take(3).mkString(" / ")
    s"""$Line
       |GRAFT EXCEPTION SUMMARY
       |Operator: $op$colPart
       |Error   : ${root.getClass.getSimpleName}: $msg
       |$Line""".stripMargin
  }

  /** Run `body`; wrap any failure with the framed summary naming the
    * operator and columns. Already-wrapped exceptions pass through, so the
    * summary names the INNERMOST failing operator as the error bubbles up
    * (the reference's `summary=False` re-raise chain, util.py:46-52). */
  def context[T](op: String, cols: Seq[String] = Nil)(body: => T): T =
    try body
    catch {
      case e: GraftException => throw e
      case scala.util.control.NonFatal(e) =>
        throw new GraftException(summary(op, cols, e), e)
    }
}
