package graft.sources.broker

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** SCRAM-SHA-256 (RFC 5802 mechanics, RFC 7677 hash parameters) — the
  * enhanced-authentication exchange the reference connector gets for
  * free from HiveMQ's enhanced-auth support; here it rides MQTT 5
  * AUTH packets (spec §4.12): CONNECT carries the client-first
  * message, the broker challenges with server-first via AUTH 0x18,
  * the client answers with client-final, and the CONNACK's auth data
  * carries the server-final signature so the CLIENT also
  * authenticates the BROKER. The password itself never crosses the
  * wire, in either direction, on any round trip.
  *
  * No channel binding ("n,," GS2 header only) — TLS provides the
  * transport security; SCRAM provides mutual proof of the password.
  */
object ScramSha256 {

  private val b64e = Base64.getEncoder
  private val b64d = Base64.getDecoder

  private def hmac(key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
    val m = Mac.getInstance("HmacSHA256")
    m.init(new SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(msg)
  }

  private def sha256(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)

  private def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.zip(b).map { case (x, y) => (x ^ y).toByte }

  /** Hi(password, salt, i) — PBKDF2-HMAC-SHA256 (RFC 5802 §2.2). */
  def saltedPassword(password: String, salt: Array[Byte],
      iterations: Int): Array[Byte] = {
    val f = javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
    f.generateSecret(new PBEKeySpec(
      password.toCharArray, salt, iterations, 256)).getEncoded
  }

  /** What a server STORES per user (RFC 5802 §3): never the password.
    * StoredKey = H(ClientKey) authenticates the client; ServerKey
    * signs the server-final so the client authenticates the server.
    */
  final case class Verifier(salt: Array[Byte], iterations: Int,
      storedKey: Array[Byte], serverKey: Array[Byte])

  def verifier(password: String, salt: Array[Byte],
      iterations: Int = 4096): Verifier = {
    val sp = saltedPassword(password, salt, iterations)
    Verifier(salt, iterations,
      storedKey = sha256(hmac(sp, "Client Key".getBytes(UTF_8))),
      serverKey = hmac(sp, "Server Key".getBytes(UTF_8)))
  }

  def randomNonce(): String = {
    val b = new Array[Byte](18)
    new java.security.SecureRandom().nextBytes(b)
    b64e.encodeToString(b)
  }

  // saslname escaping (RFC 5802 §5.1): ',' and '=' are reserved
  private def escUser(u: String): String =
    u.replace("=", "=3D").replace(",", "=2C")
  private def unescUser(u: String): String =
    u.replace("=2C", ",").replace("=3D", "=")

  private def attrs(msg: String): Map[String, String] =
    msg.split(",").filter(_.length >= 2).map(a =>
      a.substring(0, 1) -> a.substring(2)).toMap

  /** Client half of the exchange. Holds no password-derived state
    * until the server's salt/iteration-count arrive.
    */
  final class Client(user: String, password: String,
      nonce: String = randomNonce()) {

    private val firstBare = s"n=${escUser(user)},r=$nonce"
    private var expectedServerSig: Array[Byte] = _

    /** GS2 header + client-first-bare — rides in the CONNECT's auth
      * data (property 0x16).
      */
    def clientFirst: String = s"n,,$firstBare"

    /** Consume server-first (from AUTH 0x18), produce client-final.
      * Throws on a tampered nonce — a reflected/replayed challenge.
      */
    def clientFinal(serverFirst: String): String = {
      val a = attrs(serverFirst)
      val combined = a.getOrElse("r",
        throw new IllegalArgumentException("server-first missing r="))
      require(combined.startsWith(nonce),
        "server nonce does not extend the client nonce")
      val salt = b64d.decode(a("s"))
      val iters = a("i").toInt
      require(iters >= 1024, s"suspiciously low iteration count $iters")
      val withoutProof = s"c=biws,r=$combined" // biws = b64("n,,")
      val authMessage =
        s"$firstBare,$serverFirst,$withoutProof".getBytes(UTF_8)
      val sp = saltedPassword(password, salt, iters)
      val clientKey = hmac(sp, "Client Key".getBytes(UTF_8))
      val storedKey = sha256(clientKey)
      val proof = xor(clientKey, hmac(storedKey, authMessage))
      expectedServerSig =
        hmac(hmac(sp, "Server Key".getBytes(UTF_8)), authMessage)
      s"$withoutProof,p=${b64e.encodeToString(proof)}"
    }

    /** Verify the server-final ("v=...") from the CONNACK auth data:
      * only a server holding the real ServerKey (derived from the
      * password) can produce it — a broker impostor fails here.
      */
    def verifyServerFinal(serverFinal: String): Boolean = {
      val sig = attrs(serverFinal).get("v").map(b64d.decode)
      expectedServerSig != null && sig.exists(
        java.security.MessageDigest.isEqual(_, expectedServerSig))
    }
  }

  /** Server half. `verifierFor` resolves a username to its stored
    * verifier (None = unknown user — answered with a real-looking
    * challenge only after the mock-salt derivation below).
    */
  final class Server(verifierFor: String => Option[Verifier],
      serverNonce: String = randomNonce()) {

    private var firstBare: String = _
    private var serverFirstMsg: String = _
    private var ver: Option[Verifier] = None
    private var combined: String = _

    def username: String =
      Option(firstBare).map(f => unescUser(attrs(f)("n"))).getOrElse("")

    /** Consume client-first (CONNECT auth data), produce the
      * server-first challenge (AUTH 0x18). Unknown users still get a
      * deterministic fake salt so user enumeration by error shape is
      * not possible; their proof then never verifies.
      */
    def serverFirst(clientFirst: String): String = {
      require(clientFirst.startsWith("n,,") || clientFirst.startsWith("y,,"),
        "unsupported GS2 header (channel binding not offered)")
      firstBare = clientFirst.substring(3)
      val a = attrs(firstBare)
      val clientNonce = a.getOrElse("r",
        throw new IllegalArgumentException("client-first missing r="))
      ver = verifierFor(unescUser(a("n")))
      combined = clientNonce + serverNonce
      val (salt, iters) = ver match {
        case Some(v) => (v.salt, v.iterations)
        case None => (sha256(a("n").getBytes(UTF_8)).take(16), 4096)
      }
      serverFirstMsg =
        s"r=$combined,s=${b64e.encodeToString(salt)},i=$iters"
      serverFirstMsg
    }

    /** Verify client-final (AUTH 0x18); Some(server-final) iff the
      * proof checks out against the stored key.
      */
    def verifyClientFinal(clientFinal: String): Option[String] = {
      val a = attrs(clientFinal)
      if (!a.get("r").contains(combined)) return None // nonce mismatch
      val v = ver.getOrElse(return None)
      val proof = a.get("p").map(b64d.decode).getOrElse(return None)
      val withoutProof =
        clientFinal.substring(0, clientFinal.lastIndexOf(",p="))
      val authMessage =
        s"$firstBare,$serverFirstMsg,$withoutProof".getBytes(UTF_8)
      val clientSig = hmac(v.storedKey, authMessage)
      val clientKey = xor(proof, clientSig)
      if (!java.security.MessageDigest.isEqual(sha256(clientKey), v.storedKey))
        None
      else Some("v=" + b64e.encodeToString(hmac(v.serverKey, authMessage)))
    }
  }
}
