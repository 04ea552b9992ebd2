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

  /** Decode + featurize with ImageIO: dimensions, channel count, mean
    * luminance, 8-bin luminance histogram (the cheap content
    * fingerprint an image-dedup pass keys on).
    */
  def decodeImage(bytes: Array[Byte]): Option[ImageInfo] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      val hist = new Array[Float](8)
      var lumSum = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          lumSum += lum
          hist((lum >> 5) & 7) += 1f
          x += 1
        }
        y += 1
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

  /** Decode + featurize with javax.sound: format, duration, overall
    * RMS level, and an 8-window RMS envelope (the frame-level
    * features an audio-quality filter keys on).
    */
  def decodeWav(bytes: Array[Byte]): Option[AudioInfo] = {
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      val frames = in.getFrameLength
      val data = in.readAllBytes()
      in.close()
      if (fmt.getSampleSizeInBits != 16) return None
      val n = data.length / 2
      val windows = new Array[Double](8)
      val counts = new Array[Long](8)
      var sumSq = 0.0
      var i = 0
      while (i < n) {
        val lo = data(2 * i) & 0xff
        val hi = data(2 * i + 1).toInt
        val s = (if (fmt.isBigEndian) (lo << 8) | (hi & 0xff)
                 else (hi << 8) | lo).toShort / 32768.0
        sumSq += s * s
        val w = (i.toLong * 8 / math.max(n, 1)).toInt.min(7)
        windows(w) += s * s
        counts(w) += 1
        i += 1
      }
      Some(AudioInfo(fmt.getSampleRate.toInt, fmt.getChannels, frames,
        frames * 1000.0 / fmt.getSampleRate,
        math.sqrt(sumSq / math.max(n, 1)),
        windows.indices.map(j => math.sqrt(
          windows(j) / math.max(counts(j), 1)).toFloat).toArray))
    } catch { case _: Exception => None }
  }
}
