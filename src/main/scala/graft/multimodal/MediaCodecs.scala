package graft.multimodal

import java.awt.image.BufferedImage
import java.awt.RenderingHints
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}

/** Real media encode/decode on pure JDK codecs — no external
  * libraries: `javax.imageio` (PNG/BMP/GIF and usually JPEG) for
  * raster images, `javax.sound.sampled` for RIFF/WAVE PCM audio.
  * This replaces the round-1 stub for the formats the JDK can
  * actually decode; genuinely exotic codecs (mp4/webp/opus) still
  * fall back to [[Multimodal.StubDecoder]], detected by magic bytes.
  */
object MediaCodecs {

  // ---- detection ----

  def sniffFormat(bytes: Array[Byte]): String =
    if (bytes.length >= 8 &&
      (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
      bytes(3) == 'G') "png"
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
      bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') "wav"
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8) "jpeg"
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else "opaque"

  // ---- images ----

  /** Deterministic synthetic image: pixels derived from the seed
    * bytes (tiling), encoded through the REAL PNG codec. The probe
    * corpus's "ingested s3 object" stand-in.
    */
  def encodePng(width: Int, height: Int, seed: Array[Byte]): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val i = (y * width + x) % math.max(seed.length, 1)
        val v = if (seed.isEmpty) 0 else seed(i) & 0xff
        val r = v
        val g = (v + x) & 0xff
        val b = (v + y) & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  final case class ImageInfo(width: Int, height: Int, channels: Int,
      meanLum: Double, lumHistogram: Array[Float])

  /** Decode + featurize: dimensions, channel count, mean luminance,
    * 8-bin luminance histogram (the cheap content fingerprint an
    * image-dedup pass keys on). Non-interlaced 8-bit truecolor PNG —
    * what every standard encoder (including the JDK's) emits — takes
    * the raw Inflater fast path; everything else (palette, 16-bit,
    * interlaced, BMP/GIF/JPEG) falls back to ImageIO. Both paths
    * produce identical features (cross-checked by spec): ImageIO's
    * per-pixel getRGB does a color-model conversion per call and was
    * the dominant cost of the 100× decode probe.
    */
  def decodeImage(bytes: Array[Byte]): Option[ImageInfo] = {
    if (sniffFormat(bytes) == "png") {
      try {
        val fast = decodePngFast(bytes)
        if (fast.isDefined) return fast
      } catch { case _: Exception => () } // malformed/exotic: ImageIO decides
    }
    decodeImageIO(bytes)
  }

  /** Raw PNG decode for the common profile (features face): the
    * shared [[pngLumPlane]] unfilter pass followed by one histogram
    * loop over the luminance plane — numerically identical to the
    * former fused accumulation (same integer luminance, same
    * row-major order for the double sum).
    */
  private def decodePngFast(bytes: Array[Byte]): Option[ImageInfo] =
    pngLumPlane(bytes).map { case (w, h, bpp, lum) =>
      val hist = new Array[Float](8)
      var lumSum = 0.0
      var i = 0
      while (i < lum.length) {
        val l = lum(i) & 0xff
        lumSum += l
        hist((l >> 5) & 7) += 1f
        i += 1
      }
      val n = (w * h).toFloat
      var j = 0
      while (j < 8) { hist(j) /= n; j += 1 }
      ImageInfo(w, h, bpp, lumSum / n, hist)
    }

  /** Raw PNG decode for the common profile: 8-bit, colorType 2 (RGB)
    * or 6 (RGBA), non-interlaced. One Inflater pass over the IDAT
    * stream, per-scanline filter reconstruction (None/Sub/Up/Average/
    * Paeth), reduced to an 8-bit LUMINANCE plane (row-major) — the
    * shared substrate for feature extraction and content signatures.
    * No BufferedImage, no per-pixel virtual calls. Returns
    * (width, height, channels, lum).
    */
  private[graft] def pngLumPlane(
      bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    def i32(off: Int): Int =
      ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
    if (bytes.length < 45) return None
    // IHDR is mandated first: length 13 at offset 8
    if (i32(8) != 13 || bytes(12) != 'I' || bytes(13) != 'H' ||
      bytes(14) != 'D' || bytes(15) != 'R') return None
    val w = i32(16); val h = i32(20)
    val bitDepth = bytes(24) & 0xff
    val colorType = bytes(25) & 0xff
    val interlace = bytes(28) & 0xff
    if (w <= 0 || h <= 0 || bitDepth != 8 || interlace != 0 ||
      (colorType != 2 && colorType != 6)) return None
    val bpp = if (colorType == 2) 3 else 4
    // gather IDAT payloads
    val idat = new ByteArrayOutputStream()
    var off = 8 + 12 + 13
    var done = false
    while (!done && off + 8 <= bytes.length) {
      val len = i32(off)
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      if (typ == "IDAT") idat.write(bytes, off + 8, len)
      if (typ == "IEND") done = true
      off += 12 + len
    }
    val comp = idat.toByteArray
    if (comp.isEmpty) return None
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new java.util.zip.Inflater()
    inf.setInput(comp)
    var filled = 0
    while (filled < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, filled, raw.length - filled)
      if (n == 0 && inf.needsInput()) return None // truncated stream
      filled += n
    }
    inf.end()
    if (filled < raw.length) return None
    // filter reconstruction + luminance reduction
    val lum = new Array[Byte](w * h)
    val prev = new Array[Byte](stride)
    val cur = new Array[Byte](stride)
    var y = 0
    while (y < h) {
      val base = y * (stride + 1)
      val filter = raw(base) & 0xff
      System.arraycopy(raw, base + 1, cur, 0, stride)
      filter match {
        case 0 => ()
        case 1 => // Sub
          var i = bpp
          while (i < stride) {
            cur(i) = (cur(i) + cur(i - bpp)).toByte; i += 1
          }
        case 2 => // Up
          var i = 0
          while (i < stride) { cur(i) = (cur(i) + prev(i)).toByte; i += 1 }
        case 3 => // Average
          var i = 0
          while (i < stride) {
            val a = if (i >= bpp) cur(i - bpp) & 0xff else 0
            cur(i) = (cur(i) + ((a + (prev(i) & 0xff)) >> 1)).toByte
            i += 1
          }
        case 4 => // Paeth
          var i = 0
          while (i < stride) {
            val a = if (i >= bpp) cur(i - bpp) & 0xff else 0
            val b = prev(i) & 0xff
            val c = if (i >= bpp) prev(i - bpp) & 0xff else 0
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            cur(i) = (cur(i) + pred).toByte
            i += 1
          }
        case _ => return None
      }
      var x = 0
      var xi = 0
      while (x < stride) {
        lum(y * w + xi) = (((cur(x) & 0xff) * 299 +
          (cur(x + 1) & 0xff) * 587 +
          (cur(x + 2) & 0xff) * 114) / 1000).toByte
        x += bpp
        xi += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    Some((w, h, bpp, lum))
  }

  /** ImageIO-decoded luminance plane (any JDK-readable format) —
    * same integer luminance as [[pngLumPlane]], so a PNG and a BMP of
    * the same pixels reduce to the same plane.
    */
  private[graft] def imageIOLumPlane(
      bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      val pixels = img.getRGB(0, 0, w, h, null, 0, w)
      val lum = new Array[Byte](w * h)
      var i = 0
      while (i < pixels.length) {
        val p = pixels(i)
        lum(i) = ((((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
          (p & 0xff) * 114) / 1000).toByte
        i += 1
      }
      Some((w, h, img.getColorModel.getNumComponents, lum))
    }
  }

  /** Luminance plane with the [[decodeImage]] routing: fast PNG path
    * first, ImageIO for everything else the JDK can read.
    */
  def lumPlane(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (sniffFormat(bytes) == "png") {
      try {
        val fast = pngLumPlane(bytes)
        if (fast.isDefined) return fast
      } catch { case _: Exception => () }
    }
    imageIOLumPlane(bytes)
  }

  /** Encode EXPLICIT rgb pixels (0xRRGGBB, row-major) through the
    * real PNG codec — the pixel-controlled fixture encoder the
    * signature specs plant structured content with.
    */
  def encodePngRgb(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == width * height,
      s"rgb length ${rgb.length} != $width x $height")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, width, height, rgb, 0, width)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** ImageIO fallback (any format the JDK can read). Bulk getRGB into
    * one int[] — the per-pixel getRGB form pays a color-model lookup
    * per call.
    */
  private[graft] def decodeImageIO(bytes: Array[Byte]): Option[ImageInfo] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      val hist = new Array[Float](8)
      var lumSum = 0.0
      val pixels = img.getRGB(0, 0, w, h, null, 0, w)
      var i0 = 0
      while (i0 < pixels.length) {
        val rgb = pixels(i0)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        lumSum += lum
        hist((lum >> 5) & 7) += 1f
        i0 += 1
      }
      val n = (w * h).toFloat
      var i = 0
      while (i < 8) { hist(i) /= n; i += 1 }
      Some(ImageInfo(w, h, img.getColorModel.getNumComponents,
        lumSum / n, hist))
    }
  }

  /** Real resize (bilinear Graphics2D) + PNG re-encode — the
    * normalize-to-model-input step of an image pipeline.
    */
  def resizePng(bytes: Array[Byte], width: Int, height: Int): Option[Array[Byte]] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val dst = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, width, height, null)
      g.dispose()
      val out = new ByteArrayOutputStream()
      ImageIO.write(dst, "png", out)
      Some(out.toByteArray)
    }
  }

  // ---- audio ----

  /** Deterministic synthetic audio: 16-bit mono PCM samples derived
    * from the seed bytes, written through the REAL RIFF/WAVE encoder.
    */
  def encodeWav(sampleRate: Int, nSamples: Int, seed: Array[Byte]): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val b = if (seed.isEmpty) 0 else seed(i % seed.length) & 0xff
      // audible-ish deterministic waveform: seed-modulated sawtooth
      val s = (((b << 7) + i * 13) % 65536 - 32768).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val stream = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  final case class AudioInfo(sampleRate: Int, channels: Int,
      nFrames: Long, durationMs: Double, rms: Double,
      windowRms: Array[Float])

  /** Decode + featurize: format, duration, overall RMS level, and an
    * 8-window RMS envelope (the frame-level features an audio-quality
    * filter keys on). Plain PCM16 RIFF — what every PCM encoder
    * (including the JDK's) writes — takes a direct chunk-parse fast
    * path; compressed or exotic WAVs fall back to javax.sound. Both
    * paths produce identical features (cross-checked by spec).
    */
  def decodeWav(bytes: Array[Byte]): Option[AudioInfo] = {
    try {
      val fast = decodeWavFast(bytes)
      if (fast.isDefined) return fast
    } catch { case _: Exception => () }
    decodeWavJavax(bytes)
  }

  /** Direct RIFF chunk walk for uncompressed PCM16: no stream stack,
    * no AudioSystem provider lookup per row.
    */
  private def decodeWavFast(bytes: Array[Byte]): Option[AudioInfo] =
    wavLayout(bytes).map { case (sampleRate, channels, blockAlign,
        dataOff, dataLen) =>
      val frames = dataLen.toLong / blockAlign
      featurizePcm16(bytes, dataOff, dataLen, bigEndian = false,
        sampleRate, channels, frames)
    }

  /** RIFF/WAVE chunk walk for the plain PCM16 profile: locates the
    * fmt and data chunks without touching the samples. Returns
    * (sampleRate, channels, blockAlign, dataOff, dataLen) — the
    * shared parse for feature extraction and content signatures.
    */
  private[graft] def wavLayout(
      bytes: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    def u16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    if (bytes.length < 44 || sniffFormat(bytes) != "wav") return None
    var off = 12
    var sampleRate = -1; var channels = -1; var blockAlign = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= bytes.length && (dataOff < 0 || sampleRate < 0)) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val len = u32(off + 4).toInt
      if (id == "fmt ") {
        if (len < 16 || off + 8 + 16 > bytes.length) return None
        if (u16(off + 8) != 1) return None // not plain PCM: javax path
        channels = u16(off + 10)
        sampleRate = u32(off + 12).toInt
        blockAlign = u16(off + 20)
        if (u16(off + 22) != 16) return None // not 16-bit: javax path
      } else if (id == "data") {
        dataOff = off + 8
        dataLen = math.min(len.toLong, (bytes.length - dataOff).toLong).toInt
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (sampleRate <= 0 || channels <= 0 || blockAlign <= 0 ||
      dataOff < 0) return None
    Some((sampleRate, channels, blockAlign, dataOff, dataLen))
  }

  private[graft] def decodeWavJavax(bytes: Array[Byte]): Option[AudioInfo] = {
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      val frames = in.getFrameLength
      val data = in.readAllBytes()
      in.close()
      if (fmt.getSampleSizeInBits != 16) return None
      Some(featurizePcm16(data, 0, data.length, fmt.isBigEndian,
        fmt.getSampleRate.toInt, fmt.getChannels, frames))
    } catch { case _: Exception => None }
  }

  private def featurizePcm16(data: Array[Byte], off: Int, len: Int,
      bigEndian: Boolean, sampleRate: Int, channels: Int,
      frames: Long): AudioInfo = {
    val n = len / 2
    val windows = new Array[Double](8)
    val counts = new Array[Long](8)
    var sumSq = 0.0
    var i = 0
    while (i < n) {
      val lo = data(off + 2 * i) & 0xff
      val hi = data(off + 2 * i + 1).toInt
      val s = (if (bigEndian) (lo << 8) | (hi & 0xff)
               else (hi << 8) | lo).toShort / 32768.0
      sumSq += s * s
      val w = (i.toLong * 8 / math.max(n, 1)).toInt.min(7)
      windows(w) += s * s
      counts(w) += 1
      i += 1
    }
    AudioInfo(sampleRate, channels, frames,
      frames * 1000.0 / sampleRate,
      math.sqrt(sumSq / math.max(n, 1)),
      windows.indices.map(j => math.sqrt(
        windows(j) / math.max(counts(j), 1)).toFloat).toArray)
  }
}
