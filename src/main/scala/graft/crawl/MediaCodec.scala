package graft.crawl

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM audio/video container codecs for the multimodal pipeline:
  * PCM16 WAV (RIFF) render/parse with real signal features (RMS, zero
  * crossings, MFCC via FFT + mel filterbank + DCT), and motion-JPEG AVI
  * (RIFF) render/demux with frames decoded through the JDK's ImageIO.
  *
  * No external codec library ships in this environment; these two
  * container formats are fully implementable on the JDK alone, which is
  * what upgrades `MultimodalOps.audioFeatures` / `videoFrameSample` from
  * honest stubs to real operators. (The reference has no audio/video
  * path; this is part of the training-data-pipeline extension surface.)
  */
object MediaCodec {

  // ------------------------------------------------------------- WAV

  final case class Wav(sampleRate: Int, channels: Int,
      samples: Array[Short])

  /** Render PCM16 mono/interleaved samples as a RIFF/WAVE file. */
  def renderWav(samples: Array[Short], sampleRate: Int,
      channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36 + dataLen)
    buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes); buf.putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse a RIFF/WAVE file (PCM16 only); walks chunks, tolerates extra
    * chunks before `data`. Throws IllegalArgumentException on non-WAV or
    * non-PCM16 input — the caller decides drop-vs-fail semantics.
    */
  def parseWav(bytes: Array[Byte]): Wav = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(bytes.length >= 44 && tag() == "RIFF", "not RIFF")
    buf.getInt // riff size
    require(tag() == "WAVE", "not WAVE")
    var rate = -1; var channels = -1; var bits = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (samples == null || rate < 0)) {
      val id = tag()
      val len = buf.getInt
      val next = buf.position() + len + (len & 1) // chunks are word-aligned
      id match {
        case "fmt " =>
          val fmt = buf.getShort
          require(fmt == 1, s"not PCM (fmt $fmt)")
          channels = buf.getShort.toInt
          rate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          bits = buf.getShort.toInt
          require(bits == 16, s"not 16-bit ($bits)")
        case "data" =>
          val n = len / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = buf.getShort; i += 1 }
        case _ => // skip unknown chunk
      }
      buf.position(math.min(next, buf.limit()))
    }
    require(rate > 0 && samples != null, "missing fmt/data chunk")
    Wav(rate, channels, samples)
  }

  // --------------------------------------------------- audio features

  /** In-place iterative radix-2 FFT (n must be a power of two). */
  private[crawl] def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, "fft length must be a power of two")
    // bit reversal
    var j = 0
    for (i <- 0 until n - 1) {
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      var m = n >> 1
      while (m >= 1 && j >= m) { j -= m; m >>= 1 }
      j += m
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var i = 0
      while (i < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(i + k); val ui = im(i + k)
          val vr = re(i + k + len / 2) * cr - im(i + k + len / 2) * ci
          val vi = re(i + k + len / 2) * ci + im(i + k + len / 2) * cr
          re(i + k) = ur + vr; im(i + k) = ui + vi
          re(i + k + len / 2) = ur - vr; im(i + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        i += len
      }
      len <<= 1
    }
  }

  private def hzToMel(f: Double): Double = 2595.0 * math.log10(1 + f / 700.0)
  private def melToHz(m: Double): Double =
    700.0 * (math.pow(10, m / 2595.0) - 1)

  /** Mean MFCC vector over 512-sample frames (hop 256, Hamming window,
    * 26 mel filters to Nyquist, log energies, orthonormal DCT-II,
    * `nCoeffs` kept). Standard construction — deterministic, pure.
    */
  def mfccMean(w: Wav, nCoeffs: Int = 13, nFilters: Int = 26)
      : Array[Double] = {
    val frameLen = 512
    val hop = 256
    // mono fold
    val mono: Array[Double] =
      if (w.channels <= 1) w.samples.map(_.toDouble / 32768.0)
      else Array.tabulate(w.samples.length / w.channels) { i =>
        var s = 0.0
        var c = 0
        while (c < w.channels) { s += w.samples(i * w.channels + c); c += 1 }
        s / (w.channels * 32768.0)
      }
    if (mono.length < frameLen) return new Array[Double](nCoeffs)
    val window = Array.tabulate(frameLen)(i =>
      0.54 - 0.46 * math.cos(2 * math.Pi * i / (frameLen - 1)))
    // mel filterbank edges
    val melEdges = Array.tabulate(nFilters + 2)(i =>
      melToHz(hzToMel(w.sampleRate / 2.0) * i / (nFilters + 1)))
    val bins = melEdges.map(f =>
      math.min(frameLen / 2, (f * frameLen / w.sampleRate).round.toInt))
    val acc = new Array[Double](nCoeffs)
    var frames = 0
    var start = 0
    while (start + frameLen <= mono.length) {
      val re = Array.tabulate(frameLen)(i => mono(start + i) * window(i))
      val im = new Array[Double](frameLen)
      fft(re, im)
      val power = Array.tabulate(frameLen / 2 + 1)(k =>
        re(k) * re(k) + im(k) * im(k))
      val logMel = Array.tabulate(nFilters) { f =>
        var e = 0.0
        var k = bins(f)
        while (k < bins(f + 2)) {
          val weight =
            if (k < bins(f + 1)) {
              if (bins(f + 1) == bins(f)) 1.0
              else (k - bins(f)).toDouble / (bins(f + 1) - bins(f))
            } else {
              if (bins(f + 2) == bins(f + 1)) 1.0
              else (bins(f + 2) - k).toDouble / (bins(f + 2) - bins(f + 1))
            }
          e += power(math.min(k, frameLen / 2)) * weight
          k += 1
        }
        math.log(math.max(e, 1e-10))
      }
      // orthonormal DCT-II
      var c = 0
      while (c < nCoeffs) {
        var s = 0.0
        var f = 0
        while (f < nFilters) {
          s += logMel(f) * math.cos(math.Pi * c * (f + 0.5) / nFilters)
          f += 1
        }
        val norm =
          if (c == 0) math.sqrt(1.0 / nFilters) else math.sqrt(2.0 / nFilters)
        acc(c) += s * norm
        c += 1
      }
      frames += 1
      start += hop
    }
    if (frames > 0) { var i = 0; while (i < nCoeffs) { acc(i) /= frames; i += 1 } }
    acc
  }

  /** RMS amplitude (normalized to [-1,1] full scale). */
  def rms(samples: Array[Short]): Double = {
    if (samples.isEmpty) return 0.0
    var s = 0.0
    samples.foreach { v => val x = v / 32768.0; s += x * x }
    math.sqrt(s / samples.length)
  }

  /** Zero-crossing rate (fraction of adjacent pairs changing sign). */
  def zeroCrossRate(samples: Array[Short]): Double = {
    if (samples.length < 2) return 0.0
    var n = 0
    var i = 1
    while (i < samples.length) {
      if ((samples(i) >= 0) != (samples(i - 1) >= 0)) n += 1
      i += 1
    }
    n.toDouble / (samples.length - 1)
  }

  // ------------------------------------------------------------- AVI

  /** Render JPEG frames as a minimal motion-JPEG AVI (RIFF 'AVI ' with
    * avih/strh/strf headers and a movi list of 00dc chunks) — the
    * standard layout ffmpeg/VLC demux.
    */
  def renderMjpegAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
      fps: Int = 10): Array[Byte] = {
    def le32(v: Int): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
      id.getBytes ++ le32(body.length) ++ body ++ pad
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes ++ body)

    val avih = le32(1000000 / math.max(1, fps)) ++ le32(0) ++ le32(0) ++
      le32(0x10) ++ le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ Array.fill(16)(0.toByte)
    val strh = "vids".getBytes ++ "MJPG".getBytes ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++ le32(frames.length) ++
      le32(0) ++ le32(0) ++ le32(0) ++ Array.fill(8)(0.toByte)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putShort(1).putShort(24).array() ++
      "MJPG".getBytes ++ le32(w * h * 3) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes ++ hdrl ++ movi
    "RIFF".getBytes ++ le32(body.length) ++ body
  }

  /** Demux JPEG frame payloads out of an AVI (00dc/00db stream-0 chunks
    * inside the movi list). Tolerates unknown chunks; returns frames in
    * stream order.
    */
  def parseAviFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    if (bytes.length < 12 || tag() != "RIFF") return out.toSeq
    buf.getInt
    if (tag() != "AVI ") return out.toSeq
    def walk(limit: Int): Unit =
      while (buf.position() + 8 <= limit) {
        val id = tag()
        val len = buf.getInt
        val next = buf.position() + len + (len & 1)
        if (next > buf.limit()) return // malformed: truncated chunk
        if (id == "LIST") {
          tag() // list kind (hdrl / strl / movi)
          walk(next)
        } else if (id == "00dc" || id == "00db") {
          val frame = new Array[Byte](len)
          buf.get(frame)
          out += frame
        }
        buf.position(next)
      }
    walk(buf.limit())
    out.toSeq
  }
}
