package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the `private[sql]` Column↔Expression converters —
  * the supported way for external Catalyst extensions (custom Expressions /
  * aggregates) to surface as user-facing Columns in Spark 4 classic. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column to a catalyst Expression TREE (unresolved
    * functions become real `UnresolvedFunction` nodes the analyzer will
    * resolve). `expression` above wraps the column node opaquely, which is
    * fine inside normal Dataset plans but NOT for expressions returned
    * from a FunctionRegistry builder — the analyzer never descends into
    * the opaque leaf and codegen then fails on it. */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
