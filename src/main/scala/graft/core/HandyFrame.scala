package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-class partition of a schema, mirroring the reference's
  * `_update_types` (handyspark/sql/dataframe.py:202-211):
  *   numerical   = byte/short/int/long/float/double
  *   continuous  = float/double
  *   categorical = byte/short/int/long/boolean/string  (the reference has a
  *                 'boolan' typo that silently drops booleans; we fix it)
  *   array       = array/map
  *   string      = string
  */
object ColumnClasses {
  private val integral: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType)
  private val fractional: Set[DataType] = Set(FloatType, DoubleType)

  def numerical(schema: StructType): Seq[String] =
    schema.fields.collect {
      case f if integral(f.dataType) || fractional(f.dataType) => f.name
    }.toSeq
  def continuous(schema: StructType): Seq[String] =
    schema.fields.collect { case f if fractional(f.dataType) => f.name }.toSeq
  def categorical(schema: StructType): Seq[String] =
    schema.fields.collect {
      case f if integral(f.dataType) || f.dataType == BooleanType ||
        f.dataType == StringType => f.name
    }.toSeq
  def arrayLike(schema: StructType): Seq[String] =
    schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] => f.name
    }.toSeq
  def stringCols(schema: StructType): Seq[String] =
    schema.fields.collect { case f if f.dataType == StringType => f.name }.toSeq

  /** Resolve a type-alias selector ('continuous', 'categorical', 'numerical',
    * 'string', 'array') or a plain column name list, as the reference's
    * HandyColumns aliases do (dataframe.py:1486-1490). */
  def resolve(schema: StructType, selector: String): Seq[String] = selector match {
    case "numerical"   => numerical(schema)
    case "continuous"  => continuous(schema)
    case "categorical" => categorical(schema)
    case "array"       => arrayLike(schema)
    case "string"      => stringCols(schema)
    case name          => Seq(name)
  }
}

/** A DataFrame decorated with replayable state — the engine's fundamental
  * abstraction (reference `HandyFrame`, handyspark/sql/dataframe.py:858-949).
  * Scala has no dynamic method interception, so combinators return a new
  * `HandyFrame` explicitly and `.df` exposes the raw frame.
  */
final case class HandyFrame(df: DataFrame, state: HandyState = HandyState()) {

  def schema: StructType = df.schema

  def numericalCols: Seq[String] = ColumnClasses.numerical(schema)
  def continuousCols: Seq[String] = ColumnClasses.continuous(schema)
  def categoricalCols: Seq[String] = ColumnClasses.categorical(schema)
  def stringCols: Seq[String] = ColumnClasses.stringCols(schema)

  /** Safety-limited collect (reference dataframe.py:1112-1150): collects at
    * most `state.safetyLimit` rows unless `safetyOff` was set; the off flag
    * is one-shot. Returns (rows, frameWithResetFlag). */
  def safeCollect(): (Array[Row], HandyFrame) = {
    val rows =
      if (state.safetyOff) df.collect()
      else df.limit(state.safetyLimit).collect()
    (rows, copy(state = state.copy(safetyOff = false)))
  }

  /** One-shot disable of the safety limit for the next collect. */
  def safetyOff(): HandyFrame = copy(state = state.copy(safetyOff = true))
  def setSafetyLimit(n: Int): HandyFrame =
    copy(state = state.copy(safetyLimit = n))

  /** Record the response/label column; non-continuous response implies
    * classification and materializes the distinct class labels
    * (reference dataframe.py:475-484). */
  def setResponse(col: String): HandyFrame = {
    require(schema.fieldNames.contains(col), s"unknown column $col")
    val isCont = continuousCols.contains(col)
    val classes =
      if (isCont) None
      else Some(df.select(col).distinct().collect().map(_.get(0)).toSeq)
    copy(state = state.copy(responseCol = Some(col), classes = classes))
  }

  /** Map any DataFrame transformation while preserving state. */
  def transform(f: DataFrame => DataFrame): HandyFrame = copy(df = f(df))

  // -- assign/transform/apply analogs (reference sql/transform.py:96-131) --

  /** `transform(f, name)`: add one computed column (withColumn). */
  def addColumn(name: String, c: Column): HandyFrame =
    copy(df = df.withColumn(name, c))

  /** `apply(f, name)`: project ONLY the computed column. */
  def applyColumn(name: String, c: Column): HandyFrame =
    copy(df = df.select(c.as(name)))

  /** `assign(**kwargs)`: append many computed columns at once. In the
    * reference, callable kwargs bind by parameter-name=column-name
    * (sql/transform.py:54-57); in Scala the binding is explicit Columns. */
  def assign(cols: (String, Column)*): HandyFrame =
    copy(df = df.withColumns(cols.toMap))

  /** Stratify — enter the reference's signature dataflow operator. */
  def stratify(specs: graft.strata.StratumSpec*): graft.strata.StratifiedFrame =
    graft.strata.StratifiedFrame(df, specs.toSeq)

  /** Stage count of the physical plan (reference counts RDD debug-string
    * indents, sql/dataframe.py:112-116; here: shuffle exchanges + 1,
    * descending through AQE wrapper plans). */
  def stages: Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def countEx(p: SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeLike => 1
        case _                      => 0
      }
      val inner = p match {
        case a: AdaptiveSparkPlanExec => countEx(a.executedPlan)
        case _                        => p.children.map(countEx).sum
      }
      self + inner
    }
    countEx(df.queryExecution.executedPlan) + 1
  }
}

object HandyFrame {
  /** Null-or-NaN predicate used by fill/isnull — `isnan` is only valid on
    * float/double (reference mixes them: dataframe.py:253-260; Spark 4 ANSI
    * mode makes the distinction mandatory). */
  def isMissing(df: DataFrame, colName: String): Column = {
    val dt = df.schema(colName).dataType
    dt match {
      case FloatType | DoubleType => col(colName).isNull || isnan(col(colName))
      case _                      => col(colName).isNull
    }
  }
}
