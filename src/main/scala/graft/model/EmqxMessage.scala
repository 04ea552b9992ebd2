package graft.model

import org.apache.spark.sql.types._

/** The message envelope, mirroring the reference's
  * EMQXMessage (flink-emqx-connector-core/.../EMQXMessage.java:5):
  * topic, qos, retained flag, user properties, payload.
  *
  * `properties` maps MQTT5 user properties (string→string);
  * `payload` is the raw bytes — typed decoding is column-level
  * (graft.functions.Payloads), mirroring the reference's pluggable
  * DeserializationSchema.
  */
case class EmqxMessage(
    topic: String,
    qos: Int,
    retained: Boolean,
    properties: Map[String, String],
    payload: Array[Byte])

object EmqxMessage {
  /** Fixed DataFrame schema of the envelope (what `format("emqx")`
    * streams produce).
    */
  val schema: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("qos", IntegerType, nullable = false),
    StructField("retained", BooleanType, nullable = false),
    StructField("properties", MapType(StringType, StringType),
      nullable = true),
    StructField("payload", BinaryType, nullable = true)))
}
