package graft.sources

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row}
import graft.model.EmqxMessage
import graft.sources.broker.BrokerRegistry

/** EMQX publish path (SURVEY §2.1 C8) — the reverse direction of the
  * reference connector. Rows must carry the envelope columns
  * (topic, qos, retained, properties, payload); missing columns fall
  * back to defaults.
  *
  * Streaming: `df.writeStream.foreach(new EmqxForeachWriter(name))` —
  * one writer per partition per epoch, publishing row-by-row (the
  * broker call is the per-message network publish a real client
  * would make; batching happens naturally per partition).
  * Batch: `EmqxSink.publish(df, name)` via foreachPartition.
  */
class EmqxForeachWriter(brokerName: String) extends ForeachWriter[Row] {
  override def open(partitionId: Long, epochId: Long): Boolean = true
  override def process(row: Row): Unit =
    BrokerRegistry.get(brokerName).publish(EmqxSink.rowToMessage(row))
  override def close(errorOrNull: Throwable): Unit = ()
}

object EmqxSink {

  def rowToMessage(row: Row): EmqxMessage = {
    def has(n: String) = row.schema != null && row.schema.names.contains(n)
    EmqxMessage(
      topic = row.getAs[String]("topic"),
      qos = if (has("qos")) row.getAs[Int]("qos") else 0,
      retained = if (has("retained")) row.getAs[Boolean]("retained") else false,
      properties =
        if (has("properties")) row.getAs[Map[String, String]]("properties")
        else Map.empty,
      payload = if (has("payload")) row.getAs[Array[Byte]]("payload")
        else Array.empty[Byte])
  }

  /** Batch publish: distributed foreachPartition, one broker handle
    * per partition.
    */
  def publish(df: DataFrame, brokerName: String): Unit =
    df.foreachPartition { rows: Iterator[Row] =>
      val broker = BrokerRegistry.get(brokerName)
      rows.foreach(r => broker.publish(rowToMessage(r)))
    }
}
