package graft.sources.broker

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket, SocketException}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import scala.collection.mutable
import graft.model.EmqxMessage

/** Cluster-mode fetch path for the network MQTT client.
  *
  * WHY: MQTT has no server-side offset query — a consumer's "offset"
  * is a position in its own connection's delivery buffer. The
  * micro-batch planner (driver) therefore MUST own the broker
  * connections: `latestOffset`/`commit` interrogate and ack them every
  * trigger. Under `local[*]` partition readers share the driver JVM
  * and read the buffers directly; on a multi-JVM cluster they cannot —
  * and letting each executor open its own session per clientid would
  * corrupt the session state (duplicate clientids kick each other off
  * a real broker).
  *
  * SO: the driver runs this proxy next to its connections, and every
  * [[graft.sources.EmqxInputPartition]] carries its address; executor
  * readers fetch the planned range over one TCP round-trip
  * (length-framed request/response, pooled sockets). The reference has
  * the mirrored constraint solved the opposite way — Flink's aligned
  * checkpoints let each subtask own its connection outright
  * (EMQXSourceReader.java:92–120) because offsets never leave the
  * subtask; Spark's centralized offset planning moves the ownership to
  * the driver and ships rows instead.
  *
  * Scale note: this bounds source data-plane bandwidth by the driver
  * NIC. That is inherent to broker-side fan-in — total consumption is
  * already capped by the shared-subscription group, not by Spark
  * parallelism; for more throughput run several source instances on
  * disjoint topic shards (SURVEY §5). Row batches ride the same
  * micro-batch cadence as the planner, so the proxy adds one LAN
  * round-trip per (partition, batch).
  */
object FetchProxy {
  /** Wire ops */
  private[broker] val OpFetch: Int = 1

  /** Test/diagnostic hook: total fetch requests served by any proxy
    * server in this JVM — lets integration tests assert the executor
    * path really went through the proxy.
    */
  val requestsServed = new AtomicLong(0)

  private[broker] def writeMessages(out: DataOutputStream,
      msgs: Seq[EmqxMessage]): Unit = {
    out.writeInt(msgs.length)
    msgs.foreach { m =>
      out.writeUTF(m.topic)
      out.writeByte(m.qos)
      out.writeBoolean(m.retained)
      out.writeInt(m.properties.size)
      m.properties.foreach { case (k, v) =>
        out.writeUTF(k); out.writeUTF(v)
      }
      out.writeInt(m.payload.length)
      out.write(m.payload)
    }
    out.flush()
  }

  private[broker] def readMessages(in: DataInputStream): Seq[EmqxMessage] = {
    val n = in.readInt()
    (0 until n).map { _ =>
      val topic = in.readUTF()
      val qos = in.readByte().toInt
      val retained = in.readBoolean()
      val nProps = in.readInt()
      val props = (0 until nProps).map(_ => in.readUTF() -> in.readUTF()).toMap
      val payload = new Array[Byte](in.readInt())
      in.readFully(payload)
      EmqxMessage(topic, qos, retained, props, payload)
    }
  }
}

/** Serves [[MqttBroker.fetch]] over TCP for partition readers running
  * in other JVMs. One handler thread per connection; a connection
  * serves many requests (the executor side pools them). With
  * `sslKeystore` set (PKCS12/JKS path + password) the listener speaks
  * TLS and advertises an `ssl://` address; clients then need the
  * matching truststore (BrokerConf.truststorePath).
  */
class FetchProxyServer(broker: MqttBroker,
    sslKeystore: Option[(String, String)] = None, bindPort: Int = 0) {
  private def bindReusable(ss: ServerSocket): ServerSocket = {
    ss.setReuseAddress(true)
    // A restart on a PINNED port (bindPort != 0 — the same-advertised-
    // address recovery path) can race the previous listener's kernel
    // teardown: SO_REUSEADDR clears TIME_WAIT but not the window in
    // which the old fd is still closing. Retry briefly instead of
    // failing the restart; an ephemeral bind (port 0) never collides
    // and keeps the no-retry fast path.
    var attempt = 0
    var bound = false
    while (!bound) {
      try {
        ss.bind(new java.net.InetSocketAddress(bindPort))
        bound = true
      } catch {
        case _: java.net.BindException if bindPort != 0 && attempt < 50 =>
          attempt += 1
          Thread.sleep(20)
      }
    }
    ss
  }
  private val server: ServerSocket = sslKeystore match {
    case None => bindReusable(new ServerSocket())
    case Some((path, password)) =>
      val ks = java.security.KeyStore.getInstance(
        new java.io.File(path), password.toCharArray)
      val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
        javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
      kmf.init(ks, password.toCharArray)
      val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
      ctx.init(kmf.getKeyManagers, null, null)
      bindReusable(ctx.getServerSocketFactory.createServerSocket())
  }
  @volatile private var closed = false
  private val accepted = mutable.ArrayBuffer[Socket]()

  def port: Int = server.getLocalPort

  /** Address executors can reach — the partition-carried string;
    * `ssl://host:port` when the listener speaks TLS, bare `host:port`
    * otherwise. Host resolution prefers Spark's own driver host
    * (`spark.driver.host` — the address executors already reach the
    * driver on): `InetAddress.getLocalHost` resolves to 127.0.1.1 on
    * stock Debian/Ubuntu /etc/hosts, which would point every executor
    * at its own loopback in exactly the multi-JVM deployment this
    * proxy exists for.
    */
  val address: String = {
    val host =
      (try Option(org.apache.spark.SparkEnv.get)
        .flatMap(e => e.conf.getOption("spark.driver.host"))
      catch { case _: Throwable => None })
        .getOrElse(
          try InetAddress.getLocalHost.getHostAddress
          catch { case _: Throwable => "127.0.0.1" })
    if (sslKeystore.isDefined) s"ssl://$host:$port" else s"$host:$port"
  }

  private val acceptThread = new Thread(() => {
    while (!closed) {
      try {
        val s = server.accept()
        s.setTcpNoDelay(true)
        synchronized { accepted += s }
        val t = new Thread(() => handle(s), s"fetch-proxy-${s.getPort}")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: SocketException => () // closed
        case _: Throwable if closed => ()
      }
    }
  }, "fetch-proxy-accept")
  acceptThread.setDaemon(true)
  acceptThread.start()

  private def handle(sock: Socket): Unit = {
    try {
      val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
      val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
      while (!closed) {
        val op = in.readInt()
        require(op == FetchProxy.OpFetch, s"unknown proxy op $op")
        val clientid = in.readUTF()
        val from = in.readLong()
        val until = in.readLong()
        val msgs = broker.fetch(clientid, from, until)
        FetchProxy.requestsServed.incrementAndGet()
        FetchProxy.writeMessages(out, msgs)
      }
    } catch {
      case _: EOFException => ()
      case _: SocketException => ()
      case _: Throwable => ()
    } finally {
      try sock.close() catch { case _: Throwable => () }
      synchronized { accepted -= sock } // no leak across executor churn
    }
  }

  def close(): Unit = {
    closed = true
    try server.close() catch { case _: Throwable => () }
    synchronized {
      accepted.foreach(s => try s.close() catch { case _: Throwable => () })
      accepted.clear()
    }
  }
}

/** Executor-side client: fetches one planned range per call over a
  * pooled connection. Pool is per-address and JVM-wide — partition
  * readers are created per (batch × partition), and a fresh TCP dial
  * per reader would dominate small micro-batches.
  */
object FetchProxyClient {

  private final class PooledConn(val sock: Socket) {
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
  }

  private val pools =
    new ConcurrentHashMap[String, mutable.ArrayDeque[PooledConn]]()

  private def dial(addr: String, truststorePath: Option[String],
      truststorePassword: Option[String]): PooledConn = {
    val tls = addr.startsWith("ssl://")
    val hp = if (tls) addr.substring(6) else addr
    val i = hp.lastIndexOf(':')
    val host = hp.substring(0, i)
    val port = hp.substring(i + 1).toInt
    val s =
      if (!tls) new Socket(host, port)
      else {
        val factory = truststorePath match {
          case None => javax.net.ssl.SSLSocketFactory.getDefault
            .asInstanceOf[javax.net.ssl.SSLSocketFactory]
          case Some(path) =>
            val ks = java.security.KeyStore.getInstance(
              new java.io.File(path),
              truststorePassword.getOrElse("").toCharArray)
            val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
              javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
            tmf.init(ks)
            val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
            ctx.init(null, tmf.getTrustManagers, null)
            ctx.getSocketFactory
        }
        factory.createSocket(host, port)
      }
    s.setTcpNoDelay(true)
    new PooledConn(s)
  }

  private def borrow(addr: String, truststorePath: Option[String],
      truststorePassword: Option[String]): PooledConn = {
    // pool key includes the trust config: two callers with different
    // truststores must not share an established TLS session
    val key = s"$addr|${truststorePath.getOrElse("")}"
    val pool = pools.computeIfAbsent(key, _ => mutable.ArrayDeque())
    val pooled = pool.synchronized {
      if (pool.nonEmpty) Some(pool.removeHead()) else None
    }
    pooled.getOrElse(dial(addr, truststorePath, truststorePassword))
  }

  private def giveBack(key: String, c: PooledConn): Unit = {
    val pool = pools.computeIfAbsent(key, _ => mutable.ArrayDeque())
    pool.synchronized { pool.append(c) }
  }

  /** Fetch is a pure idempotent read, so a failure on a POOLED
    * connection (idle socket death between micro-batches) retries
    * once on a guaranteed-fresh dial — NOT on the next pooled socket,
    * which after a proxy bounce is just as stale — instead of
    * surfacing as a task failure.
    */
  def fetch(addr: String, clientid: String, from: Long, until: Long,
      truststorePath: Option[String] = None,
      truststorePassword: Option[String] = None): Seq[EmqxMessage] =
    try fetchOnce(addr, clientid, from, until, truststorePath,
      truststorePassword, usePool = true)
    catch {
      case _: java.io.IOException =>
        fetchOnce(addr, clientid, from, until, truststorePath,
          truststorePassword, usePool = false)
    }

  private def fetchOnce(addr: String, clientid: String, from: Long,
      until: Long, truststorePath: Option[String],
      truststorePassword: Option[String],
      usePool: Boolean): Seq[EmqxMessage] = {
    val c =
      if (usePool) borrow(addr, truststorePath, truststorePassword)
      else dial(addr, truststorePath, truststorePassword)
    try {
      c.out.writeInt(FetchProxy.OpFetch)
      c.out.writeUTF(clientid)
      c.out.writeLong(from)
      c.out.writeLong(until)
      c.out.flush()
      val msgs = FetchProxy.readMessages(c.in)
      giveBack(s"$addr|${truststorePath.getOrElse("")}", c)
      msgs
    } catch {
      case t: Throwable => // broken conn: drop it, don't pool it
        try c.sock.close() catch { case _: Throwable => () }
        throw t
    }
  }
}
