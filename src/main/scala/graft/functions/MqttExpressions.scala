package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}

import graft.sources.TopicMatcher

/** `mqtt_topic_matches(topic, filter)` as a native Catalyst expression
  * (SURVEY §2.1 C4): MQTT wildcard matching inside WholeStageCodegen —
  * the generated code calls the same static matcher the broker uses,
  * so a topic-filter predicate over billions of rows stays a tight
  * per-row call with no UDF/serialization overhead and full
  * null-safety from BinaryExpression's nullSafeCodegen scaffolding.
  */
case class MqttTopicMatches(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[ColumnBridge.AbstractType] =
    Seq(StringType, StringType)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(topic: Any, filter: Any): Any =
    TopicMatcher.matches(topic.toString, filter.toString)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, f) =>
      s"${ev.value} = graft.sources.TopicMatcher.matches($t.toString(), $f.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MqttFunctions {
  /** Column API. */
  def mqtt_topic_matches(topic: Column, filter: Column): Column =
    ColumnBridge.column(MqttTopicMatches(
      ColumnBridge.expression(topic), ColumnBridge.expression(filter)))

  /** SQL registration: `SELECT ... WHERE mqtt_topic_matches(t, 'a/+')`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mqtt_topic_matches",
      exprs => MqttTopicMatches(exprs.head, exprs(1)), "scala_udf")
}
