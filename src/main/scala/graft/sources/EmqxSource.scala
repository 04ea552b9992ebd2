package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.model.EmqxMessage
import graft.sources.broker.BrokerRegistry

/** Structured Streaming source for EMQX — the Spark-first counterpart
  * of the reference's EMQXSource (EMQXSource.java:34).
  *
  * Architecture mapping (SURVEY §4):
  *   - Flink split = clientid per subtask (EMQXSplitEnumerator.java:55)
  *     → one InputPartition per reader slot, clientid = base+i, all
  *     members of the same `$share/<group>/<filter>` subscription.
  *   - ack-on-checkpoint (EMQXSourceReader.java:186) →
  *     MicroBatchStream.commit(offset) acks up to the committed
  *     offset; un-acked messages are replayed after recovery
  *     (at-least-once).
  *   - DeserializationSchema → column-level decoders
  *     (graft.functions.Payloads) applied to the fixed envelope
  *     schema.
  *
  * Options: `broker` (registry name — the host:port analogue),
  * `clientid` (base), `group`, `topicfilter`, `qos`, `readers`.
  */
class EmqxSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "emqx"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EmqxMessage.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EmqxTable(new CaseInsensitiveStringMap(properties))
}

class EmqxTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String =
    s"emqx:${options.get("broker")}/${options.get("topicfilter")}"
  override def schema(): StructType = EmqxMessage.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = EmqxMessage.schema
      override def toMicroBatchStream(loc: String): MicroBatchStream =
        new EmqxMicroBatchStream(
          options.get("broker"),
          Option(options.get("clientid")).getOrElse("spark-emqx-"),
          Option(options.get("group")).getOrElse("spark"),
          Option(options.get("topicfilter")).getOrElse("#"),
          options.getInt("qos", 1),
          options.getInt("readers", 2))
    }
}

/** Offset = per-clientid next-sequence map (the multi-reader analogue
  * of the reference's per-checkpoint pending-ack bookkeeping).
  */
case class EmqxOffset(positions: Map[String, Long]) extends Offset {
  override def json(): String =
    positions.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
}

object EmqxOffset {
  def fromJson(s: String): EmqxOffset = {
    val body = s.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) EmqxOffset(Map.empty)
    else EmqxOffset(body.split(",").map { kv =>
      val Array(k, v) = kv.split(":", 2)
      k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toLong
    }.toMap)
  }
}

class EmqxMicroBatchStream(brokerName: String, baseClientid: String,
    group: String, topicFilter: String, qos: Int, numReaders: Int)
    extends MicroBatchStream {

  private def broker = BrokerRegistry.get(brokerName)
  private val clientids =
    (0 until numReaders).map(i => s"$baseClientid$i")
  private val sharedFilter = s"$$share/$group/$topicFilter"

  // connect+subscribe all readers (cleanStart=false: resume pending
  // sessions after a restart, like EMQXSourceReader.startClient2)
  ensureSubscribed()

  private def ensureSubscribed(): Unit = clientids.foreach { cid =>
    val present = broker.connect(cid, cleanStart = false)
    if (!present) broker.subscribe(cid, sharedFilter, qos)
  }

  override def initialOffset(): Offset =
    EmqxOffset(clientids.map(c => c -> broker.committedOffset(c)).toMap)

  override def latestOffset(): Offset =
    EmqxOffset(clientids.map(c => c -> broker.endOffset(c)).toMap)

  override def deserializeOffset(json: String): Offset =
    EmqxOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset):
      Array[InputPartition] = {
    val s = start.asInstanceOf[EmqxOffset].positions
    val e = end.asInstanceOf[EmqxOffset].positions
    clientids.map { cid =>
      EmqxInputPartition(brokerName, cid,
        s.getOrElse(cid, 0L), e.getOrElse(cid, 0L))
        .asInstanceOf[InputPartition]
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EmqxPartitionReaderFactory

  /** The reference acks on notifyCheckpointComplete; here the
    * completed micro-batch's offset is the checkpoint.
    */
  override def commit(end: Offset): Unit =
    end.asInstanceOf[EmqxOffset].positions.foreach {
      case (cid, upTo) => broker.ack(cid, upTo)
    }

  override def stop(): Unit = clientids.foreach(broker.disconnect)
}

case class EmqxInputPartition(brokerName: String, clientid: String,
    from: Long, until: Long) extends InputPartition

class EmqxPartitionReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[EmqxInputPartition]
    new PartitionReader[InternalRow] {
      private val msgs = BrokerRegistry.get(part.brokerName)
        .fetch(part.clientid, part.from, part.until).iterator
      private var current: EmqxMessage = _
      override def next(): Boolean =
        if (msgs.hasNext) { current = msgs.next(); true } else false
      override def get(): InternalRow = toRow(current)
      override def close(): Unit = ()
    }
  }

  private def toRow(m: EmqxMessage): InternalRow = {
    val props = if (m.properties == null) null
    else ArrayBasedMapData(
      m.properties.keys.map(UTF8String.fromString).toArray,
      m.properties.values.map(UTF8String.fromString).toArray)
    InternalRow(UTF8String.fromString(m.topic), m.qos, m.retained,
      props, m.payload)
  }
}
