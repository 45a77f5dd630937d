package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

/**
 * Real media encode/decode on JDK-shipped codecs only (no external libs,
 * zero egress): PNG via `javax.imageio` (java.desktop), WAV/PCM via
 * `javax.sound.sampled`, and a minimal RIFF-style frame container for video
 * (magic + frame count + length-prefixed PNG frames — standard video codecs
 * do not ship with the JDK, so the container is custom but every frame is a
 * real PNG decode).
 *
 * Encoders exist to synthesize deterministic test media (BASELINE.json: "no
 * external data"); decoders are the production path and never see the
 * encoder — they parse the actual byte format.
 */
object MediaCodec {

  System.setProperty("java.awt.headless", "true")

  // ---- image: PNG ----

  /** Encode a wxh PNG whose every pixel is the grayscale value `px`. */
  def encodePng(w: Int, h: Int, px: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (px << 16) | (px << 8) | px
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Decode any ImageIO-supported image: (width, height, mean pixel value
    * over all RGB channels, exact when the image is constant). */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Double) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    (w, h, sum.toDouble / (3.0 * w * h))
  }

  /** Nearest-neighbour resize, re-encoded as PNG — the shape of a real
    * feature-pipeline resize stage (decode -> transform -> re-encode). */
  def resizePng(bytes: Array[Byte], ow: Int, oh: Int): Array[Byte] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "not a decodable image")
    val out = new BufferedImage(ow, oh, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        out.setRGB(x, y, img.getRGB(x * img.getWidth / ow, y * img.getHeight / oh))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  // ---- audio: WAV (RIFF, PCM16 mono LE) ----

  /** Encode `n` PCM16 samples of constant amplitude `amp` at `rate` Hz. */
  def encodeWavDc(rate: Int, n: Int, amp: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    val dataLen = n * 2
    def le32(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff); o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff) }
    def le16(v: Int): Unit = { o.write(v & 0xff); o.write((v >> 8) & 0xff) }
    o.writeBytes("RIFF"); le32(36 + dataLen); o.writeBytes("WAVE")
    o.writeBytes("fmt "); le32(16); le16(1); le16(1); le32(rate); le32(rate * 2); le16(2); le16(16)
    o.writeBytes("data"); le32(dataLen)
    var i = 0
    while (i < n) { le16(amp & 0xffff); i += 1 }
    bos.toByteArray
  }

  /** Decode a WAV through javax.sound: (sampleRate, nSamples, RMS amplitude
    * in raw PCM16 units). */
  def decodeWav(bytes: Array[Byte]): (Int, Int, Double) = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16, s"expected PCM16, got ${fmt.getSampleSizeInBits}-bit")
      val raw = in.readAllBytes()
      val n = raw.length / 2
      var sumSq = 0.0
      var i = 0
      val bigEndian = fmt.isBigEndian
      while (i < n) {
        val lo = raw(2 * i) & 0xff
        val hi = raw(2 * i + 1) & 0xff
        val s = (if (bigEndian) (lo << 8) | hi else (hi << 8) | lo).toShort.toDouble
        sumSq += s * s
        i += 1
      }
      (fmt.getSampleRate.toInt, n, if (n == 0) 0.0 else math.sqrt(sumSq / n))
    } finally in.close()
  }

  // ---- video: RIFF-style frame container of PNG frames ----

  private val VideoMagic = 0x47564944 // "GVID"

  /** Encode `frames` PNG frames; frame f's constant pixel = pxOf(f). */
  def encodeFrameContainer(frames: Int, w: Int, h: Int, pxOf: Int => Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.writeInt(VideoMagic)
    o.writeInt(frames)
    (0 until frames).foreach { f =>
      val png = encodePng(w, h, pxOf(f))
      o.writeInt(png.length)
      o.write(png)
    }
    bos.toByteArray
  }

  /** Decode the container, sampling every `step`-th frame (real pipelines
    * never decode all frames of a long video): returns (nFrames declared,
    * width, height, mean pixel over the sampled frames). */
  def decodeFrames(bytes: Array[Byte], step: Int): (Int, Int, Int, Double) = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readInt() == VideoMagic, "not a GVID frame container")
    val frames = in.readInt()
    var f = 0
    var w = 0
    var h = 0
    var sum = 0.0
    var sampled = 0
    while (f < frames) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      if (f % step == 0) {
        val (fw, fh, mean) = decodeImage(buf)
        w = fw; h = fh; sum += mean; sampled += 1
      }
      f += 1
    }
    (frames, w, h, if (sampled == 0) 0.0 else sum / sampled)
  }
}
