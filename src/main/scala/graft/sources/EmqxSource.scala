package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
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
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String =
    s"emqx:${options.get("broker")}/${options.get("topicfilter")}"
  override def schema(): StructType = EmqxMessage.schema
  override def capabilities(): util.Set[TableCapability] =
    // ACCEPT_ANY_SCHEMA: writes may provide a subset of the envelope
    // columns (only `topic` is required; EmqxWriterFactory defaults
    // the rest) — without it Spark validates against the fixed
    // 5-column schema and rejects partial writes at analysis time.
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new EmqxWrite(options.get("broker"), info.schema())
    }
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
          options.getInt("readers", 2),
          options.getLong("maxmessagesperbatch", Long.MaxValue))
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
  // quoted key (with escapes) : long — tolerant of ':' or ',' inside
  // clientids, which a naive split would corrupt on checkpoint restore
  private val Entry = """"((?:[^"\\]|\\.)*)"\s*:\s*(-?\d+)""".r

  def fromJson(s: String): EmqxOffset =
    EmqxOffset(Entry.findAllMatchIn(s)
      .map(m => m.group(1) -> m.group(2).toLong).toMap)
}

class EmqxMicroBatchStream(brokerName: String, baseClientid: String,
    group: String, topicFilter: String, qos: Int, numReaders: Int,
    maxPerBatch: Long = Long.MaxValue)
    extends MicroBatchStream with SupportsAdmissionControl {

  private def broker = BrokerRegistry.get(brokerName)
  private val clientids =
    (0 until numReaders).map(i => s"$baseClientid$i")
  private val sharedFilter = s"$$share/$group/$topicFilter"

  // connect+subscribe all readers (cleanStart=false: resume pending
  // sessions after a restart, like EMQXSourceReader.startClient2).
  // Connection failures are swallowed and retried on every offset
  // poll — the automaticReconnect behavior the reference relies on:
  // a query started while the broker is down begins consuming as
  // soon as it comes up.
  @volatile private var subscribed = false
  ensureSubscribed()

  private def ensureSubscribed(): Unit = synchronized {
    if (!subscribed) {
      try {
        clientids.foreach { cid =>
          val present = broker.connect(cid, cleanStart = false)
          // NOTE: like the reference (EMQXSourceReader.java:113 "session
          // already present; will NOT subscribe explicitly"), a resumed
          // session keeps its original subscription — changing
          // topicfilter/group across restarts of the same clientid
          // requires a new clientid base or an expired session.
          if (!present) broker.subscribe(cid, sharedFilter, qos)
        }
        subscribed = true
      } catch { case _: IllegalStateException => () /* broker down */ }
    }
  }

  override def initialOffset(): Offset = {
    ensureSubscribed()
    EmqxOffset(clientids.map(c => c -> broker.committedOffset(c)).toMap)
  }

  override def latestOffset(): Offset = {
    ensureSubscribed()
    EmqxOffset(clientids.map(c => c -> broker.endOffset(c)).toMap)
  }

  /** Admission control (backpressure): cap each micro-batch at
    * `maxmessagesperbatch` rows, split evenly across readers — the
    * maxOffsetsPerTrigger analogue; an un-capped burst otherwise
    * becomes one giant batch after downtime.
    */
  override def getDefaultReadLimit: ReadLimit =
    if (maxPerBatch == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxPerBatch)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    ensureSubscribed()
    val s = start.asInstanceOf[EmqxOffset].positions
    val cap = limit match {
      case m: ReadMaxRows => math.max(m.maxRows / numReaders, 1L)
      case _ => Long.MaxValue
    }
    EmqxOffset(clientids.map { c =>
      val from = s.getOrElse(c, broker.committedOffset(c))
      val end = broker.endOffset(c)
      c -> math.min(end, if (cap == Long.MaxValue) end else from + cap)
    }.toMap)
  }

  override def reportLatestOffset(): Offset = latestOffset()

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

/** DSv2 write path: `df.writeStream.format("emqx")` /
  * `df.write.format("emqx")` publish envelope rows (any column other
  * than `topic` may be omitted). Publishes are per-row as a real MQTT
  * client would; epoch commit is a no-op because MQTT publish has no
  * transactional abort — at-least-once, matching the source side.
  */
class EmqxWrite(brokerName: String, schema: StructType)
    extends Write with BatchWrite with StreamingWrite {

  override def useCommitCoordinator(): Boolean = false
  override def toBatch: BatchWrite = this
  override def toStreaming: StreamingWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new EmqxWriterFactory(brokerName, schema)
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new EmqxWriterFactory(brokerName, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

private case object EmqxCommit extends WriterCommitMessage

class EmqxWriterFactory(brokerName: String, schema: StructType)
    extends DataWriterFactory with StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    mkWriter()
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = mkWriter()

  private val idx: Map[String, Int] =
    schema.fieldNames.zipWithIndex.toMap

  private def mkWriter(): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val broker = BrokerRegistry.get(brokerName)
      override def write(row: InternalRow): Unit = {
        def opt[T](name: String, get: Int => T, dflt: T): T =
          idx.get(name).filterNot(row.isNullAt).map(get).getOrElse(dflt)
        val props = opt[Map[String, String]]("properties", i => {
          val m = row.getMap(i)
          val ks = m.keyArray(); val vs = m.valueArray()
          (0 until m.numElements()).map(j =>
            ks.getUTF8String(j).toString -> vs.getUTF8String(j).toString)
            .toMap
        }, Map.empty)
        broker.publish(EmqxMessage(
          topic = row.getUTF8String(idx("topic")).toString,
          qos = opt("qos", row.getInt, 0),
          retained = opt("retained", row.getBoolean, false),
          properties = props,
          payload = opt("payload", row.getBinary, Array.empty[Byte])))
      }
      override def commit(): WriterCommitMessage = EmqxCommit
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
