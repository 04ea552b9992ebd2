package graft.sources.broker

import scala.collection.mutable
import graft.model.EmqxMessage
import graft.sources.TopicMatcher

/** An embeddable MQTT-semantics broker backing the `emqx` source and
  * sink in tests — the container has no MQTT client library or
  * broker, so the network path is behind the MqttBroker trait and
  * this is the in-JVM implementation (fine under local[*]: executor
  * threads share the JVM; a cluster deployment would swap in a
  * network-client implementation).
  *
  * Semantics modeled after what the reference relies on
  * (EMQXSourceReader.java):
  *   - per-client sessions that survive disconnect within the expiry
  *     window (cleanStart=false resume, :103)
  *   - shared subscriptions `$share/<group>/<filter>` load-balancing
  *     messages round-robin across the group's members
  *   - manual acknowledgement: messages stay pending until acked
  *     (ack-on-checkpoint, :186); un-acked messages are redelivered
  *     to a resumed session
  *   - retained messages delivered on new non-shared subscriptions
  *   - effective delivery qos = min(publish qos, subscription qos)
  */
class InMemoryBroker extends MqttBroker {

  final class Session(val clientid: String) {
    var connected = false
    var expiresAtMs: Long = Long.MaxValue
    /** (filter, maxQos); shared filters keep their $share prefix. */
    val subscriptions = mutable.LinkedHashMap[String, Int]()
    /** undelivered + unacked messages, in arrival order */
    val log = mutable.ArrayBuffer[EmqxMessage]()
    /** absolute seq of the first entry still in `log` */
    var baseSeq: Long = 0L
    def endSeq: Long = baseSeq + log.length
  }

  /** Simulates broker downtime (the reference's startWithBrokerOffline
    * test): while offline, connect/subscribe/publish fail like a
    * refused TCP connection; clients are expected to retry.
    */
  @volatile var offline: Boolean = false

  private def requireOnline(): Unit =
    if (offline) throw new IllegalStateException("broker offline")

  private val sessions = mutable.LinkedHashMap[String, Session]()
  private val retained = mutable.LinkedHashMap[String, EmqxMessage]()
  /** shared-group round-robin cursors keyed by raw shared filter */
  private val rr = mutable.LinkedHashMap[(String, String), Int]()

  /** Broker-side credential requirement: when set, connects must
    * present exactly these (the EMQX username/password auth a
    * production deployment enforces — reference exposes the same
    * fields via Mqtt5Client simpleAuth).
    */
  @volatile private var credentials: Option[(String, String)] = None
  def requireCredentials(username: String, password: String): Unit =
    credentials = Some((username, password))

  /** Stored secret for `username` — the credential-store seam the
    * wire server's SCRAM layer derives its verifiers from (a real
    * deployment stores only the derived verifier; this in-memory
    * fixture keeps the plaintext that [[requireCredentials]] took).
    */
  def credentialFor(username: String): Option[String] =
    credentials.collect { case (u, p) if u == username => p }

  /** Auth presented at the client's most recent connect — lets specs
    * assert the option plumbing reaches the broker.
    */
  private val lastAuthByClient =
    mutable.LinkedHashMap[String, (Option[String], Option[String])]()
  def lastAuth(clientid: String): Option[(Option[String], Option[String])] =
    synchronized(lastAuthByClient.get(clientid))

  /** Connect (or resume) a session. Returns sessionPresent, like a
    * CONNACK (reference checks it before re-subscribing, :106).
    */
  override def connect(clientid: String, cleanStart: Boolean,
      sessionExpirySec: Long, username: Option[String],
      password: Option[String]): Boolean = synchronized {
    requireOnline()
    lastAuthByClient.put(clientid, (username, password))
    credentials.foreach { case (u, p) =>
      if (!username.contains(u) || !password.contains(p))
        throw new IllegalStateException(
          s"not authorized: $clientid") // CONNACK 0x86/0x87 analogue
    }
    expireSessions()
    val present = sessions.contains(clientid) && !cleanStart
    if (!present) sessions.put(clientid, new Session(clientid))
    val s = sessions(clientid)
    s.connected = true
    s.expiresAtMs = Long.MaxValue // while connected
    // on resume: pending messages in s.log are redelivered and the
    // session's subscriptions stay active — nothing to do here.
    expirySec.put(clientid, sessionExpirySec)
    present
  }

  private val expirySec = mutable.LinkedHashMap[String, Long]()

  override def isConnected(clientid: String): Boolean = synchronized {
    !offline && sessions.get(clientid).exists(_.connected)
  }

  def disconnect(clientid: String): Unit = synchronized {
    sessions.get(clientid).foreach { s =>
      s.connected = false
      val exp = expirySec.getOrElse(clientid, 3600L)
      s.expiresAtMs =
        if (exp <= 0) 0L else System.currentTimeMillis() + exp * 1000
    }
    expireSessions()
  }

  private def expireSessions(): Unit = {
    val now = System.currentTimeMillis()
    val dead = sessions.collect {
      case (id, s) if !s.connected && s.expiresAtMs <= now => id
    }.toSeq
    dead.foreach(sessions.remove)
  }

  def subscribe(clientid: String, filter: String, qos: Int): Unit =
    synchronized {
      val s = sessions.getOrElse(clientid,
        throw new IllegalStateException(s"not connected: $clientid"))
      val isNew = !s.subscriptions.contains(filter)
      s.subscriptions.put(filter, qos)
      // retained delivery on new non-shared subscriptions (MQTT:
      // shared subscriptions do not receive retained messages)
      if (isNew && !filter.startsWith("$share/")) {
        retained.values.toSeq
          .filter(m => TopicMatcher.matches(m.topic, filter))
          .foreach(m => enqueue(s, m.copy(qos = math.min(m.qos, qos),
            retained = true)))
      }
    }

  def unsubscribe(clientid: String, filter: String): Unit = synchronized {
    sessions.get(clientid).foreach(_.subscriptions.remove(filter))
  }

  private def enqueue(s: Session, msg: EmqxMessage): Unit =
    s.log += msg

  /** Broker-side publish dedup window (the idempotent-sink contract,
    * SURVEY §9): a publish carrying the reserved
    * [[InMemoryBroker.DedupKeyProp]] user property is routed at most
    * once per key — a replayed Spark epoch re-sends the same keys and
    * the broker drops them. The window is bounded (FIFO eviction) so
    * broker memory stays O(window), not O(history); a replay must
    * arrive within `dedupWindow` publishes of the original, which
    * epoch-level retries do.
    */
  private val seenDedup = mutable.LinkedHashSet[String]()
  @volatile var dedupWindow: Int = 100000
  def dedupSeenCount: Int = synchronized(seenDedup.size)

  /** Publish: route to every matching non-shared subscription, and to
    * exactly one member per matching shared group (round-robin —
    * the broker-side load balancing the reference's shared
    * subscription gets from EMQX).
    */
  def publish(msg: EmqxMessage): Unit = synchronized {
    requireOnline()
    msg.properties.get(InMemoryBroker.DedupKeyProp) match {
      case Some(key) =>
        if (seenDedup.contains(key)) return // duplicate epoch replay
        seenDedup.add(key)
        while (seenDedup.size > dedupWindow)
          seenDedup.remove(seenDedup.head)
      case None => ()
    }
    if (msg.retained) {
      if (msg.payload == null || msg.payload.isEmpty) retained.remove(msg.topic)
      else retained.put(msg.topic, msg)
    }
    // non-shared subscriptions: all sessions, all matching filters
    sessions.values.foreach { s =>
      s.subscriptions.foreach { case (filter, subQos) =>
        if (!filter.startsWith("$share/") &&
          TopicMatcher.matches(msg.topic, filter))
          enqueue(s, msg.copy(qos = math.min(msg.qos, subQos),
            retained = false))
      }
    }
    // shared subscriptions: group by (group, effective filter)
    val sharedMembers = mutable.LinkedHashMap[(String, String),
      mutable.ArrayBuffer[(Session, Int)]]()
    sessions.values.foreach { s =>
      s.subscriptions.foreach { case (filter, subQos) =>
        if (filter.startsWith("$share/") &&
          TopicMatcher.matches(msg.topic, filter)) {
          val key = (filter, TopicMatcher.unshare(filter))
          sharedMembers.getOrElseUpdate(key, mutable.ArrayBuffer())
            .append((s, subQos))
        }
      }
    }
    sharedMembers.foreach { case (key, members) =>
      val cursor = rr.getOrElse(key, 0)
      val (target, subQos) = members(cursor % members.length)
      rr.put(key, cursor + 1)
      enqueue(target, msg.copy(qos = math.min(msg.qos, subQos),
        retained = false))
    }
    notifyAll() // wake delivery loops blocked in awaitActivity
  }

  /** Block until new data MAY be available (woken by publish) or the
    * timeout elapses — lets a server delivery loop park instead of
    * polling. Spurious wakeups and missed-notify races are bounded by
    * the timeout; callers re-check their own end offsets.
    */
  def awaitActivity(timeoutMs: Long): Unit = synchronized {
    wait(timeoutMs)
  }

  /** Absolute end sequence of a session's delivery log (next offset a
    * reader would observe).
    */
  def endOffset(clientid: String): Long = synchronized {
    sessions.get(clientid).map(_.endSeq).getOrElse(0L)
  }

  /** First un-acked offset (the replay point after recovery). */
  def committedOffset(clientid: String): Long = synchronized {
    sessions.get(clientid).map(_.baseSeq).getOrElse(0L)
  }

  /** Read deliveries in session-local offset range [from, until). */
  def fetch(clientid: String, from: Long, until: Long): Seq[EmqxMessage] =
    synchronized {
      sessions.get(clientid) match {
        case None => Seq.empty
        case Some(s) =>
          val lo = math.max(from, s.baseSeq)
          (lo until math.min(until, s.endSeq))
            .map(i => s.log((i - s.baseSeq).toInt))
      }
    }

  /** Acknowledge everything below `upTo` — messages are dropped from
    * the session and will not be redelivered (the reference acks on
    * checkpoint-complete; the Spark source calls this from
    * MicroBatchStream.commit).
    */
  def ack(clientid: String, upTo: Long): Unit = synchronized {
    sessions.get(clientid).foreach { s =>
      val n = math.min(math.max(upTo - s.baseSeq, 0), s.log.length).toInt
      s.log.remove(0, n)
      s.baseSeq += n
    }
  }

  def sessionPresent(clientid: String): Boolean = synchronized {
    expireSessions(); sessions.contains(clientid)
  }

  def retainedCount: Int = synchronized(retained.size)
}

object InMemoryBroker {
  /** Reserved user property carrying a publish's idempotence key
    * (`<queryId>/<epoch>/<partition>/<rowIndex>` from the Spark
    * sink). Travels as an ordinary MQTT 5 user property, so the
    * dedup works identically through the wire path.
    */
  val DedupKeyProp = "graft.dedup.key"
}

/** JVM-wide broker registry so DataSourceV2 readers (running in
  * executor threads) and test drivers reach the same instance by
  * option string. `mem:<name>` (or a bare name) resolves to a shared
  * in-JVM [[InMemoryBroker]]; `tcp://host:port` / `ssl://host:port`
  * resolves to a cached [[NetworkMqttBroker]] speaking real MQTT 5.
  */
object BrokerRegistry {
  private val brokers =
    new java.util.concurrent.ConcurrentHashMap[String, InMemoryBroker]()
  private val network =
    new java.util.concurrent.ConcurrentHashMap[BrokerConf, NetworkMqttBroker]()

  private def stripMem(n: String) =
    if (n.startsWith("mem:")) n.substring(4) else n

  /** The in-memory broker by name (tests, local default). */
  def get(name: String): InMemoryBroker =
    brokers.computeIfAbsent(stripMem(name), _ => new InMemoryBroker)

  /** Resolve by full connection conf — the source/sink path. */
  def resolve(conf: BrokerConf): MqttBroker =
    if (conf.isNetwork)
      network.computeIfAbsent(conf, c => new NetworkMqttBroker(c))
    else get(conf.uri)

  def remove(name: String): Unit = brokers.remove(stripMem(name))
}
