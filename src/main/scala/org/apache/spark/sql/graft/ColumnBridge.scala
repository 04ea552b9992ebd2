package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Column ↔ Expression converters
  * (Spark 4 removed the public `new Column(expr)` constructor). Lives
  * under org.apache.spark.sql so it can see
  * org.apache.spark.sql.classic.ExpressionUtils — the supported
  * pattern for Catalyst-extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** AbstractDataType is private[sql] in Spark 4; expressions outside
    * the sql package need this alias to declare `inputTypes` for
    * ImplicitCastInputTypes.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
