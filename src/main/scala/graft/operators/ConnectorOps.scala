package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.MqttFunctions.mqtt_topic_matches
import graft.functions.Payloads

/** Batch projections of the connector surface (SURVEY §2.1 C2–C4):
  * the `events` table is mapped onto the EmqxMessage envelope —
  * topic from event_type/user, JSON payload from props — so the
  * envelope construction, payload decoding and topic-filter matching
  * are all oracle-checkable against DuckDB on the same rows.
  */
object ConnectorOps {

  /** The envelope mapping shared by the three queries: two-level
    * topic `t/<event_type>/<user_id%5>`, qos cycling 0–2, every 10th
    * message retained, payload = props JSON bytes.
    */
  private def envelope(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir).select(
      col("event_id"),
      concat(lit("t/"), col("event_type"), lit("/"),
        (col("user_id") % 5).cast("string")).as("topic"),
      (col("event_id") % 3).as("qos"),
      (col("event_id") % 10 === 0).as("retained"),
      encode(col("props"), "UTF-8").as("payload"))

  /** C2 — envelope projection. */
  def emqxEnvelope(spark: SparkSession, sfDir: String): DataFrame =
    envelope(spark, sfDir)
      .select(col("event_id"), col("topic"), col("qos"), col("retained"),
        length(col("payload")).as("payload_len"))
      .orderBy(col("event_id"))

  /** C3 — payload decoding: binary → string → field extraction (the
    * DeserializationSchema path, column-level).
    */
  def emqxDecode(spark: SparkSession, sfDir: String): DataFrame =
    envelope(spark, sfDir)
      .select(col("event_id"),
        length(Payloads.asString(col("payload"))).as("decoded_len"),
        Payloads.jsonField(col("payload"), "k").cast("int").as("k"))
      .orderBy(col("event_id"))

  /** C4 — MQTT topic-filter matching via the native Catalyst
    * expression; the oracle states the equivalent predicates on the
    * underlying columns, so this checks wildcard semantics end-to-end.
    */
  def emqxTopicFilter(spark: SparkSession, sfDir: String): DataFrame =
    envelope(spark, sfDir)
      .select(col("event_id"), col("topic"),
        mqtt_topic_matches(col("topic"), lit("t/+/+")).as("m_all"),
        mqtt_topic_matches(col("topic"), lit("t/purchase/#")).as("m_purchase"),
        mqtt_topic_matches(col("topic"), lit("t/+/3")).as("m_user3"))
      .orderBy(col("event_id"))
}
