package graft.multimodal

/** M4 — content signatures for media columns: a CONTAINER-INDEPENDENT
  * exact digest plus a 64-bit perceptual hash, both exact integer
  * arithmetic end to end (the kernel-determinism convention: same
  * bytes → same signature on every JVM, every partition count).
  *
  * Images: the digest is MD5 over (w, h, 8-bit luminance plane), so a
  * PNG and a BMP of the same pixels — or the same PNG re-compressed —
  * collide exactly, while any pixel change separates them. The
  * perceptual hash is dHash over a 9×8 box-mean luminance grid:
  * bit(y,x) = mean(y, x+1) > mean(y, x) compared CROSS-MULTIPLIED
  * (sum·cnt vs sum·cnt — no division, no floats; exact through
  * ~10-gigapixel images: cellSum ≤ 255·wh/72, cnt ≤ wh/72 →
  * product ≤ 255·(wh/72)² < 2⁶³ for wh ≤ 1.3×10¹⁰). Box cells make
  * the hash resolution-robust: a bilinear resize preserves cell means
  * up to interpolation error, so variants land within a small Hamming
  * distance (spec'd on structured fixtures; MediaDedupSpec).
  *
  * Audio: the digest is MD5 over (sampleRate, channels, raw
  * little-endian PCM16 data), exact content identity for the PCM
  * profile. The perceptual hash is the sign-of-delta over a 65-frame
  * |sample| envelope (64 bits), invariant under exact amplitude
  * doubling and robust to re-containering; exact through ~10⁹-sample
  * files (frameSum ≤ 32768·n/65, product < 2⁶³ for n ≤ 1.2×10⁹).
  */
object MediaSignature {

  final case class Sig(kind: String, contentDigest: String, phash: Long)

  private val GW = 9 // grid columns (dHash compares GW-1 = 8 per row)
  private val GH = 8 // grid rows

  private def md5hex(parts: Array[Byte]*): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(md.update)
    md.digest().map("%02x".format(_)).mkString
  }

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** Signature from a decoded luminance plane (row-major, w×h). */
  private[multimodal] def imageSig(w: Int, h: Int,
      lum: Array[Byte]): Sig = {
    val digest = md5hex("img".getBytes("US-ASCII"), be32(w), be32(h), lum)
    // box-mean grid: integer cell assignment gx = x·GW/w, gy = y·GH/h.
    // For w ≥ GW and h ≥ GH every cell is non-empty; tiny images
    // degrade deterministically (empty cells count 0 — documented,
    // not our media profile).
    val sum = new Array[Long](GW * GH)
    val cnt = new Array[Long](GW * GH)
    var y = 0
    while (y < h) {
      val gy = (y.toLong * GH / h).toInt
      var x = 0
      while (x < w) {
        val gx = (x.toLong * GW / w).toInt
        val c = gy * GW + gx
        sum(c) += (lum(y * w + x) & 0xff)
        cnt(c) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var gy = 0
    while (gy < GH) {
      var gx = 0
      while (gx < GW - 1) {
        val a = gy * GW + gx
        val b = a + 1
        // mean(b) > mean(a) without division: sum_b·cnt_a > sum_a·cnt_b
        if (sum(b) * cnt(a) > sum(a) * cnt(b))
          hash |= 1L << (gy * (GW - 1) + gx)
        gx += 1
      }
      gy += 1
    }
    Sig("image", digest, hash)
  }

  /** Signature from PCM16 little-endian data. */
  private[multimodal] def audioSig(sampleRate: Int, channels: Int,
      data: Array[Byte], off: Int, len: Int): Sig = {
    val digest = md5hex("aud".getBytes("US-ASCII"), be32(sampleRate),
      be32(channels), java.util.Arrays.copyOfRange(data, off, off + len))
    val n = len / 2
    val frames = 65
    val sum = new Array[Long](frames)
    val cnt = new Array[Long](frames)
    var i = 0
    while (i < n) {
      val lo = data(off + 2 * i) & 0xff
      val hi = data(off + 2 * i + 1).toInt
      val s = ((hi << 8) | lo).toShort.toInt
      val f = (i.toLong * frames / math.max(n, 1)).toInt.min(frames - 1)
      sum(f) += math.abs(s)
      cnt(f) += 1
      i += 1
    }
    var hash = 0L
    var f = 0
    while (f < frames - 1) {
      if (sum(f + 1) * cnt(f) > sum(f) * cnt(f + 1))
        hash |= 1L << f
      f += 1
    }
    Sig("audio", digest, hash)
  }

  /** Route by sniffed magic bytes (ingests lie about formats — the
    * decodeMediaFeatures convention). None for bytes no JDK codec
    * reads: opaque blobs carry no content identity and must be
    * exact-byte deduped upstream, never perceptually.
    */
  def of(bytes: Array[Byte]): Option[Sig] =
    MediaCodecs.sniffFormat(bytes) match {
      case "wav" =>
        MediaCodecs.wavLayout(bytes).map {
          case (rate, ch, _, dataOff, dataLen) =>
            audioSig(rate, ch, bytes, dataOff, dataLen)
        }
      case _ =>
        MediaCodecs.lumPlane(bytes).map { case (w, h, _, lum) =>
          imageSig(w, h, lum)
        }
    }
}
