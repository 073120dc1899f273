package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made `Column.expr` / `new Column(expr)` private behind the
  * ColumnNode API; `classic.ExpressionUtils` is `private[sql]`. Housing
  * this one-file shim inside the org.apache.spark.sql namespace is the
  * standard extension pattern for libraries that ship native expressions
  * (everything else in this repo lives under `graft.*`).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
