package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{MediaCodecs, MediaSignature, Multimodal}

class MediaDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Structured fixture: a smooth horizontal+vertical gradient —
    * strong adjacent-cell contrast, so the dHash is stable under
    * bilinear resize (a noise image's near-tied cells would not be).
    */
  private def gradientPng(w: Int, h: Int): Array[Byte] = {
    val rgb = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val v = (x * 255 / math.max(w - 1, 1) +
        y * 128 / math.max(h - 1, 1)).min(255)
      (v << 16) | (v << 8) | v
    }
    MediaCodecs.encodePngRgb(w, h, rgb)
  }

  private def sigOf(bytes: Array[Byte]): MediaSignature.Sig =
    MediaSignature.of(bytes).get

  test("image digest is container-independent and pixel-sensitive") {
    val base = gradientPng(64, 48)
    // same pixels in a DIFFERENT container: BMP through ImageIO
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(base))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", out)
    val bmp = out.toByteArray
    assert(MediaCodecs.sniffFormat(bmp) == "bmp")
    assert(sigOf(bmp).contentDigest == sigOf(base).contentDigest,
      "PNG and BMP of the same pixels must share the content digest")
    // one-pixel change separates
    val rgb = Array.tabulate(64 * 48) { i =>
      val x = i % 64; val y = i / 64
      val v = (x * 255 / 63 + y * 128 / 47).min(255)
      (v << 16) | (v << 8) | v
    }
    rgb(100) ^= 0x080808
    val tweaked = MediaCodecs.encodePngRgb(64, 48, rgb)
    assert(sigOf(tweaked).contentDigest != sigOf(base).contentDigest)
  }

  test("fast and ImageIO decode paths produce the same signature") {
    val base = gradientPng(40, 32)
    val fast = MediaCodecs.pngLumPlane(base).get
    val io = MediaCodecs.imageIOLumPlane(base).get
    assert(fast._1 == io._1 && fast._2 == io._2)
    assert(java.util.Arrays.equals(fast._4, io._4),
      "luminance planes must be byte-identical across decode paths")
  }

  test("dHash survives bilinear resize; unrelated content is distant") {
    val big = gradientPng(64, 48)
    val small = MediaCodecs.resizePng(big, 32, 24).get
    val hBig = sigOf(big).phash
    val hSmall = sigOf(small).phash
    val d = java.lang.Long.bitCount(hBig ^ hSmall)
    assert(d <= 3, s"resize moved dHash by $d bits")
    // unrelated structured content (inverted gradient)
    val rgb = Array.tabulate(64 * 48) { i =>
      val x = i % 64; val y = i / 64
      val v = 255 - (x * 255 / 63 + y * 128 / 47).min(255)
      (v << 16) | (v << 8) | v
    }
    val other = MediaCodecs.encodePngRgb(64, 48, rgb)
    val dOther = java.lang.Long.bitCount(hBig ^ sigOf(other).phash)
    assert(dOther > 10, s"unrelated image unexpectedly close: $dOther")
  }

  test("audio signature: digest exact, envelope hash gain-invariant") {
    val rate = 8000; val n = 4000
    def wav(gain: Int): Array[Byte] = {
      val pcm = Array.tabulate(n) { i =>
        // deterministic multi-tone-ish waveform with real envelope
        // variation across the 65 signature frames
        val base = ((i * 37) % 501 - 250) * ((i / 400) % 5 + 1)
        (base * gain).toShort
      }
      val bytes = new Array[Byte](pcm.length * 2)
      pcm.zipWithIndex.foreach { case (s, i) =>
        bytes(2 * i) = (s & 0xff).toByte
        bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1,
        true, false)
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(in,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val a = sigOf(wav(1)); val b = sigOf(wav(1)); val loud = sigOf(wav(2))
    assert(a.kind == "audio")
    assert(a.contentDigest == b.contentDigest) // deterministic
    assert(a.phash == b.phash)
    assert(loud.contentDigest != a.contentDigest) // different samples
    assert(loud.phash == a.phash, // exact 2x gain: all deltas keep sign
      "envelope hash must be invariant under exact amplitude doubling")
  }

  test("mediaDedup verdicts on planted variants") {
    import spark.implicits._
    val base = gradientPng(64, 48)
    val exactCopy = base.clone()
    // same pixels, different container (digest dup, not byte dup)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(base))
    val bmpOut = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bmpOut)
    val reenc = bmpOut.toByteArray
    val resized = MediaCodecs.resizePng(base, 32, 24).get // near dup
    val rgb = Array.tabulate(64 * 48) { i =>
      val x = i % 64; val y = i / 64
      val v = 255 - (x * 255 / 63 + y * 128 / 47).min(255)
      (v << 16) | (v << 8) | v
    }
    val unrelated = MediaCodecs.encodePngRgb(64, 48, rgb)
    val opaque = Array[Byte](1, 2, 3, 4, 5)
    val media = Seq(
      (1L, "png", base), (2L, "png", exactCopy), (3L, "png", reenc),
      (4L, "png", resized), (5L, "png", unrelated),
      (6L, "bin", opaque), (7L, "bin", opaque.clone())
    ).toDF("doc_id", "fmt", "content")
    val got = Multimodal.mediaDedupOf(media).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 0, 1L), // keeper
      (2L, 1, 1L), // exact byte copy
      (3L, 1, 1L), // re-encoded same pixels: digest dup
      (4L, 1, 1L), // resized: perceptual dup
      (5L, 0, 5L), // unrelated
      (6L, 0, 6L), // opaque keeper (exact-byte identity only)
      (7L, 1, 6L)  // opaque exact byte copy
    ))
  }

  test("registered queries: one signature and one verdict row per media doc") {
    val sf = "/root/testdata/sf0.001"
    val nMedia = Multimodal.realMediaTable(spark, sf).count()
    val sigs = Multimodal.mediaSignatures(spark, sf)
    assert(sigs.columns.toSeq ==
      Seq("doc_id", "kind", "content_digest", "phash"))
    assert(sigs.count() == nMedia)
    // every fixture row decodes: no opaque fallbacks, phash present
    assert(sigs.filter("phash IS NULL").count() == 0)
    val verdicts = Multimodal.mediaDedup(spark, sf)
    assert(verdicts.columns.toSeq ==
      Seq("doc_id", "kind", "is_dup", "keeper_id"))
    assert(verdicts.count() == nMedia)
  }
}
