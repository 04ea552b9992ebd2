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

  /** Wrap an RDD[InternalRow] produced from a plan's `toRdd` back
    * into a DataFrame without a Row round-trip (internalCreateDataFrame
    * is private[sql]). The rows the RDD emits may be reused mutable
    * instances, same contract as any physical operator's output.
    */
  def internalDataFrame(
      spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)

  /** AbstractDataType is private[sql] in Spark 4; expressions outside
    * the sql package need this alias to declare `inputTypes` for
    * ImplicitCastInputTypes.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
