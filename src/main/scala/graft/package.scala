package object graft {
  import org.apache.spark.sql.DataFrame
  import graft.core.{HandyFrame, HandyState}

  /** Entry point into the decorated world — `df.toHandy` (reference
    * monkey-patches `toHandy()` onto DataFrame, sql/dataframe.py:25-34). */
  implicit class HandyOps(private val df: DataFrame) extends AnyVal {
    def toHandy: HandyFrame = HandyFrame(df, HandyState())
    def toHandy(state: HandyState): HandyFrame = HandyFrame(df, state)
  }
}
