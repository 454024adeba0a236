package graft.core

/** Learned, replayable side-state carried by a [[HandyFrame]].
  *
  * Mirrors the reference's `Handy` object (reference:
  * handyspark/sql/dataframe.py:44-67): response column + classification
  * metadata, imputation statistics keyed by filter clause, fence values
  * keyed by filter clause, and the safety limit that bounds driver-side
  * collects. Implemented as an immutable case class threaded through every
  * combinator (the reference deep-copies mutable state on each wrap,
  * dataframe.py:69-76; immutability gives us the same semantics for free).
  */
final case class HandyState(
    responseCol: Option[String] = None,
    /** classes of the response column when it is categorical */
    classes: Option[Seq[Any]] = None,
    /** colName -> (filterClause -> imputedValue); global fills use clause "" */
    statistics: Map[String, Map[String, Any]] = Map.empty,
    /** colName -> (filterClause -> (lowerFence, upperFence)) */
    fences: Map[String, Map[String, (Double, Double)]] = Map.empty,
    /** rows returned by safety-limited collect (reference default 1000) */
    safetyLimit: Int = 1000,
    /** one-shot override — cleared after a single collect, matching the
      * reference's `safety_off()` semantics (dataframe.py:1137-1138) */
    safetyOff: Boolean = false,
    /** active stratification clauses (empty = not stratified) */
    strataClauses: Seq[String] = Seq.empty
) {
  def isClassification: Boolean = classes.isDefined
  def nClasses: Option[Int] = classes.map(_.size)

  def withStatistics(col: String, clause: String, value: Any): HandyState = {
    val m = statistics.getOrElse(col, Map.empty) + (clause -> value)
    copy(statistics = statistics + (col -> m))
  }

  def withFences(col: String, clause: String, lo: Double, hi: Double): HandyState = {
    val m = fences.getOrElse(col, Map.empty) + (clause -> ((lo, hi)))
    copy(fences = fences + (col -> m))
  }
}
