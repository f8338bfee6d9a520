package graft.core

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Content signatures for change detection.
  *
  * MD5 over content bytes (falling back to the URL when content is empty)
  * re-expresses the reference default (reference: crawl/MD5Signature.java:32-50);
  * TextProfileSignature (crawl/TextProfileSignature.java:56-150) tokenizes,
  * quantizes term frequencies, and hashes the sorted profile — robust to
  * trivial edits.
  */
object Signature {
  // MessageDigest.getInstance walks synchronized JCA provider maps —
  // measurable contention at 32 fetch threads; reuse per thread.
  private val md5Local = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  def md5(content: Array[Byte], url: String): Array[Byte] = {
    val d = md5Local.get()
    d.reset()
    if (content != null && content.nonEmpty) d.digest(content)
    else d.digest(url.getBytes(StandardCharsets.UTF_8))
  }

  def md5Hex(content: Array[Byte], url: String): String =
    md5(content, url).map(b => f"$b%02x").mkString

  /** Quantized term-frequency profile signature
    * (TextProfileSignature semantics: min token length 2, lowercase,
    * letters+digits only, quantize freq by MIN_QUANT or maxFreq/8,
    * drop zero-quant terms, sort by (freq desc, term asc), MD5 the profile).
    */
  def textProfile(text: String, minTokenLen: Int = 2, quantRate: Float = 0.01f)
      : Array[Byte] = {
    val tokens = text.toLowerCase
      .map(c => if (c.isLetterOrDigit) c else ' ')
      .split("\\s+")
      .filter(_.length >= minTokenLen)
    val freq = tokens.groupBy(identity).view.mapValues(_.length).toMap
    val maxFreq = if (freq.isEmpty) 0 else freq.values.max
    val quant = math.max(1, math.round(maxFreq * quantRate))
    val profile = freq.iterator
      .map { case (t, f) => (t, (f / quant) * quant) }
      .filter(_._2 > 0)
      .toSeq
      .sortBy { case (t, f) => (-f, t) }
      .map { case (t, f) => s"$t $f" }
      .mkString("\n")
    val d = md5Local.get()
    d.reset()
    d.digest(profile.getBytes(StandardCharsets.UTF_8))
  }
}
