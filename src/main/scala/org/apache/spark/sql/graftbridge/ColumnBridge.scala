package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression conversions became `private[sql]` in
  * Spark 4's Column-node refactor; this minimal bridge (the standard
  * extension-library technique) re-exports just the two converters the
  * engine's native expressions need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER conversion of a composed Column to a catalyst tree the
    * analyzer can resolve. `expression` wraps lazily in a
    * ColumnNodeExpression, which resolves fine through the Dataset API
    * but is NEVER unwrapped when returned from a function-registry
    * builder (SQL path) — codegen then dies on the wrapper. Converting
    * the node eagerly yields the plain (possibly unresolved-function)
    * tree that ResolveFunctions handles like any parsed SQL.
    */
  def analyzableExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
