package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ⇄ Column bridge. Spark 4 moved the classic `new Column(expr)`
  * constructor behind `private[sql] classic.ExpressionUtils`; this shim
  * (in the sql package namespace, the standard extension-point idiom for
  * libraries shipping custom Catalyst expressions) re-exposes exactly the
  * two conversions graft's native expressions need. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
