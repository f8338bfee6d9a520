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
    * (reference crawl/TextProfileSignature.java:68-135: lowercase
    * letters+digits tokens of length STRICTLY > minTokenLen; quant =
    * round(maxFreq*quantRate) floored to 2 whenever maxFreq > 1 (else 1);
    * frequencies rounded down to the quant, sub-quant terms dropped; sorted
    * by freq desc; profile lines "term freq" MD5-hashed). One deliberate
    * divergence: the reference's equal-frequency tie order is HashMap
    * iteration order (nondeterministic across JVMs); we tie-break on the
    * term ascending so the signature is reproducible.
    */
  def textProfile(text: String, minTokenLen: Int = 2, quantRate: Float = 0.01f)
      : Array[Byte] = {
    val tokens = text.toLowerCase
      .map(c => if (c.isLetterOrDigit) c else ' ')
      .split("\\s+")
      .filter(_.length > minTokenLen)
    val freq = tokens.groupBy(identity).view.mapValues(_.length).toMap
    val maxFreq = if (freq.isEmpty) 0 else freq.values.max
    val quant = math.round(maxFreq * quantRate) match {
      case q if q >= 2 => q
      case _ => if (maxFreq > 1) 2 else 1
    }
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
