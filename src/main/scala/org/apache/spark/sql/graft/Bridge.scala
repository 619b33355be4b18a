package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge. Spark 4 made the Column→Expression
  * conversion `private[sql]` (columnNodeSupport.scala), so the engine's
  * custom-expression surface lives in this package to use the supported
  * internal utilities — the same technique extension libraries use.
  */
object Bridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
