package graft.crawl

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.{Charset, StandardCharsets}
import java.util.zip.GZIPInputStream

import graft.core.Urls

/** The parse stage's pure row-level logic (no Spark): content bytes ->
  * outlinks + text + parse status.
  *
  * Re-expresses the reference's parse path (reference:
  * parse/ParseUtil.java:244-367 parse + outlink extraction + relative
  * resolution; parse/ParserJob.java isTruncated truncation check;
  * util/GZIPUtils.java gzip decode; util/EncodingDetector.java charset from
  * header/meta; html/Entities.java entity decode). The reference walks a
  * NekoHTML DOM (parse/html/, util/NodeWalker.java); over the synthetic
  * corpus a tag scanner yields identical link sets, so the DOM dependency
  * is dropped — the extraction contract (a[href] anchors + img[src] alt,
  * entity-decoded, base-resolved) is what's re-expressed.
  *
  * Shared verbatim by the Spark pipeline and the single-threaded simulator
  * oracle, like Schedule.next: parity tests pin the crawl semantics around
  * it, unit tests (ParseSpec) pin these functions themselves.
  */
object Parse {

  /** parseStatus codes (reference ParseStatus majorCodes analog). */
  val StatusOk = 0
  val StatusTruncated = 1 // wire bytes shorter than declared Content-Length
  val StatusNotParsed = 2 // non-HTML content (images: payload path instead)
  val StatusFailed = 3 // undecodable content (bad gzip stream etc.)
  val StatusRedirect = 4 // meta-refresh page (SUCCESS_REDIRECT analog)

  /** A meta refresh faster than this many seconds counts as a PERMANENT
    * redirect for reprUrl purposes (reference fetcher/FetcherJob.java:62
    * PERM_REFRESH_TIME, applied parse/ParseUtil.java:271).
    */
  val PermRefreshTime = 5

  /** `refreshUrl`/`refreshTime` are set only for meta-refresh pages
    * (status == StatusRedirect): the absolute redirect target and the
    * declared delay in seconds.
    */
  final case class ParseOut(outlinks: Map[String, String], text: String,
      status: Int, refreshUrl: String = null, refreshTime: Int = -1)

  // ------------------------------------------------------------ gzip (C8)

  // one native zlib stream per thread: a fresh Deflater per page (what
  // GZIPOutputStream allocates) is native malloc + finalizer pressure on
  // the fetch hot path at high thread counts
  private val deflaterLocal =
    ThreadLocal.withInitial[java.util.zip.Deflater](() =>
      new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true))

  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val d = deflaterLocal.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val bos = new ByteArrayOutputStream(bytes.length / 2 + 64)
    // RFC 1952 header (deflate, no flags/mtime, unknown OS)
    bos.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0))
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(buf)
      bos.write(buf, 0, n)
    }
    val crc = new java.util.zip.CRC32()
    crc.update(bytes)
    def le32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    le32(crc.getValue)
    le32(bytes.length.toLong)
    bos.toByteArray
  }

  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
    val bos = new ByteArrayOutputStream(bytes.length * 3 + 64)
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
    bos.toByteArray
  }

  // ------------------------------------------- charset detection (C8)

  private val HeaderCharsetRe = "(?i)charset=([\\w-]+)".r
  private val MetaCharsetRe =
    "(?i)<meta[^>]*charset=[\"']?([\\w-]+)".r

  /** Charset resolution order (reference util/EncodingDetector.java —
    * declared sources first, BYTE SNIFF when they lie or are absent):
    *  1. a BOM is authoritative (UTF-8 / UTF-16LE / UTF-16BE);
    *  2. Content-Type header parameter, then `<meta charset=...>` in the
    *     first 1024 bytes — EXCEPT that a declared single-byte Latin
    *     charset is overridden to UTF-8 when the head bytes contain a
    *     valid multi-byte UTF-8 sequence (a mislabeled UTF-8 page would
    *     otherwise decode as mojibake straight into the corpus; valid
    *     non-ASCII UTF-8 appearing by chance in real Latin-1 text is
    *     statistically negligible);
    *  3. no declaration: UTF-8 if the head validates (pure ASCII included),
    *     else ISO-8859-1 (any byte sequence is valid Latin-1).
    */
  def detectCharset(contentType: String, bytes: Array[Byte]): Charset = {
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte &&
      bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte)
      return StandardCharsets.UTF_8
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte &&
      bytes(1) == 0xFE.toByte) return StandardCharsets.UTF_16LE
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte &&
      bytes(1) == 0xFF.toByte) return StandardCharsets.UTF_16BE
    val fromHeader = Option(contentType)
      .flatMap(ct => HeaderCharsetRe.findFirstMatchIn(ct))
      .map(_.group(1))
    val name = fromHeader.orElse {
      val head = new String(bytes, 0, math.min(1024, bytes.length),
        StandardCharsets.ISO_8859_1)
      MetaCharsetRe.findFirstMatchIn(head).map(_.group(1))
    }
    val (utf8Valid, utf8Multibyte) = sniffUtf8(bytes)
    name.flatMap { n =>
      try Some(Charset.forName(n)) catch { case _: Exception => None }
    } match {
      case Some(cs)
          if isLatinFamily(cs) && utf8Valid && utf8Multibyte =>
        StandardCharsets.UTF_8 // declared charset lies; the bytes don't
      case Some(cs) => cs
      case None =>
        if (utf8Valid) StandardCharsets.UTF_8
        else StandardCharsets.ISO_8859_1
    }
  }

  private def isLatinFamily(cs: Charset): Boolean = {
    val n = cs.name.toLowerCase
    n.startsWith("iso-8859-") || n.startsWith("windows-125") ||
      n == "us-ascii"
  }

  /** (validUtf8, sawMultibyteSequence) over the first 8 KB. */
  private def sniffUtf8(bytes: Array[Byte]): (Boolean, Boolean) = {
    val n = math.min(8192, bytes.length)
    var i = 0
    var multi = false
    while (i < n) {
      val b = bytes(i) & 0xFF
      val len =
        if (b < 0x80) 1
        else if ((b & 0xE0) == 0xC0) 2
        else if ((b & 0xF0) == 0xE0) 3
        else if ((b & 0xF8) == 0xF0) 4
        else return (false, multi)
      if (len > 1) {
        // a sequence truncated by the sniff window (or a truncated
        // transfer) is not evidence of invalid UTF-8 — stop leniently
        if (i + len > n) return (true, multi)
        var k = 1
        while (k < len) {
          if ((bytes(i + k) & 0xC0) != 0x80) return (false, multi)
          k += 1
        }
        multi = true
      }
      i += len
    }
    (true, multi)
  }

  // --------------------------------------------- entity decode (C8)

  private val NamedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ")
  private val EntityRe = "&(#x?[0-9a-fA-F]+|[a-zA-Z]+);".r

  /** Decode named + numeric (&#NNN; / &#xHH;) character references
    * (reference html/Entities.java).
    */
  def decodeEntities(s: String): String =
    EntityRe.replaceAllIn(s, m => {
      val body = m.group(1)
      val out =
        if (body.startsWith("#x") || body.startsWith("#X"))
          Character.toString(Integer.parseInt(body.drop(2), 16))
        else if (body.startsWith("#"))
          Character.toString(Integer.parseInt(body.drop(1)))
        else NamedEntities.getOrElse(body, m.matched)
      scala.util.matching.Regex.quoteReplacement(out)
    })

  def encodeEntities(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  // ----------------------------------------- link extraction (C7)

  // tag matchers: the ATTRIBUTE LIST is captured raw and parsed by
  // parseAttrs — real-web HTML uses single/double/no quotes and any
  // attribute order (the round-2 fixed-order double-quote regexes silently
  // dropped such links once WARC ingestion started feeding real archives)
  private val ARe = "(?is)<a\\b([^>]*)>(.*?)</a>".r
  private val ImgRe = "(?is)<img\\b([^>]*)>".r
  private val BaseRe = "(?is)<base\\b([^>]*)>".r
  private val TagRe = "(?s)<[^>]*>".r
  private val AttrRe =
    ("(?s)([a-zA-Z][a-zA-Z0-9_:.-]*)\\s*" +
      "(?:=\\s*(?:\"([^\"]*)\"|'([^']*)'|([^\\s\"'>]+)))?").r

  /** Attributes of a tag body (the text between the tag name and `>`):
    * double-quoted, single-quoted, unquoted, and valueless forms, any
    * order, whitespace around `=` tolerated; names lowercased; the FIRST
    * occurrence of a repeated attribute wins (browser behavior).
    */
  private[crawl] def parseAttrs(tagBody: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    // a self-closing tag's trailing '/' must not be absorbed into a final
    // unquoted attribute value (`<img src=x.png/>` is src="x.png")
    val body = tagBody.trim.stripSuffix("/")
    AttrRe.findAllMatchIn(body).foreach { m =>
      val name = m.group(1).toLowerCase
      val value = Option(m.group(2)).orElse(Option(m.group(3)))
        .orElse(Option(m.group(4))).getOrElse("")
      if (!out.contains(name)) out(name) = value
    }
    out.toMap
  }

  /** Effective resolution base of a document: the first `<base href>` if
    * present (itself resolved against the page URL, per spec), else the
    * page URL.
    */
  private[crawl] def effectiveBase(html: String, pageUrl: String): String =
    BaseRe.findFirstMatchIn(html)
      .flatMap(m => parseAttrs(m.group(1)).get("href"))
      .filter(_.nonEmpty)
      .flatMap(h => Urls.resolveOutlink(pageUrl, decodeEntities(h)))
      .getOrElse(pageUrl)

  /** Outlinks of an HTML document: a[href] with anchor text plus img[src]
    * with alt text (the image-caption channel — a payload's caption is its
    * inlink's alt, the reference's inlinks anchor map). Attribute scanning
    * is quote/order tolerant (parseAttrs), `<base href>` is honored, hrefs
    * are entity-decoded and resolved against the effective base; per-page
    * dedup (D2, reference ParseUtil.java:362-367) keeps the FIRST anchor
    * per target. (Known scanner limit vs a full DOM: a literal `>` inside
    * a quoted attribute value ends the tag early.)
    */
  def extractLinks(html: String, baseUrl: String): Seq[(String, String)] = {
    val base = effectiveBase(html, baseUrl)
    val found =
      ARe.findAllMatchIn(html).flatMap { m =>
        parseAttrs(m.group(1)).get("href")
          .map(h => (h, stripTags(m.group(2))))
      } ++
        ImgRe.findAllMatchIn(html).flatMap { m =>
          val attrs = parseAttrs(m.group(1))
          attrs.get("src").map(s => (s, attrs.getOrElse("alt", "")))
        }
    val seen = scala.collection.mutable.LinkedHashMap[String, String]()
    found.foreach { case (rawHref, rawAnchor) =>
      Urls.resolveOutlink(base, decodeEntities(rawHref)).foreach { u =>
        if (!seen.contains(u)) seen(u) = decodeEntities(rawAnchor).trim
      }
    }
    seen.toSeq
  }

  private def stripTags(html: String): String =
    TagRe.replaceAllIn(html, " ")

  private val MetaRe = "(?is)<meta\\b([^>]*)>".r

  /** `<meta http-equiv="refresh">` detection (reference
    * parse-html/HTMLMetaProcessor.java:123-170, surfaced as
    * SUCCESS_REDIRECT by HtmlParser.java:336-341 and turned into a
    * discovery + reprUrl in ParseUtil.java:244-279): returns the ABSOLUTE
    * refresh target and the declared delay seconds.
    *
    * Content grammar per the reference: the part before the first `;` must
    * parse as an integer or there is no refresh at all; the target is the
    * text after `url=` (case-insensitive), or — mis-formatted but common —
    * everything after the `;`; a bare time refreshes the page ITSELF (the
    * parked-page self-refresh idiom). Targets resolve like hrefs (the spec
    * says absolute-only; the reference deliberately accepts relative, with
    * the crawler-trap caveat noted at HTMLMetaProcessor.java:147-156).
    * First refresh tag wins (browser behavior).
    */
  def metaRefresh(html: String, pageUrl: String): Option[(String, Int)] = {
    MetaRe.findAllMatchIn(html).flatMap { m =>
      val attrs = parseAttrs(m.group(1))
      val equiv = attrs.get("http-equiv").map(_.trim.toLowerCase)
      if (!equiv.contains("refresh")) Iterator.empty
      else attrs.get("content").flatMap { raw =>
        val content = decodeEntities(raw)
        val idx = content.indexOf(';')
        val timeStr = if (idx == -1) content else content.substring(0, idx)
        timeStr.trim.toIntOption.map { time =>
          val target =
            if (idx == -1) Some(pageUrl)
            else {
              val lower = content.toLowerCase
              val u = lower.indexOf("url=")
              val tgt = content.substring(if (u == -1) idx + 1 else u + 4)
              Urls.resolveOutlink(pageUrl, tgt)
            }
          (target.getOrElse(pageUrl), time)
        }
      }.iterator
    }.nextOption()
  }

  /** Visible text: tags stripped, entities decoded, whitespace collapsed. */
  def extractText(html: String): String =
    decodeEntities(stripTags(html)).split("\\s+").filter(_.nonEmpty)
      .mkString(" ")

  // ------------------------------------------------- the parse function

  /** Parse one fetched page. `bytes` are the raw wire bytes (possibly
    * gzip-encoded per the Content-Encoding header); `declaredLength` is the
    * Content-Length header value for the truncation check
    * (reference ParserJob isTruncated; parser.skip.truncated=true —
    * truncated pages are not parsed, so they contribute no outlinks).
    *
    * Dispatches on content type through [[PayloadParsers]] (reference
    * parse/ParserFactory.java:87): HTML/XHTML, JSON, XML/feeds, plain
    * text, PDF and ZIP all contribute text; types with no parser (images,
    * audio, video — the payload path owns those) stay StatusNotParsed.
    */
  def page(url: String, contentType: String, headers: Map[String, String],
      bytes: Array[Byte], declaredLength: Long): ParseOut = {
    if (bytes == null) return ParseOut(Map.empty, "", StatusFailed)
    if (declaredLength >= 0 && bytes.length < declaredLength)
      return ParseOut(Map.empty, "", StatusTruncated)
    PayloadParsers.forType(contentType) match {
      case None => ParseOut(Map.empty, "", StatusNotParsed)
      case Some(parser) =>
        val decoded =
          if (headers.get("content-encoding").contains("gzip"))
            try gunzip(bytes)
            catch { case _: Exception =>
              return ParseOut(Map.empty, "", StatusFailed) }
          else bytes
        try parser.parse(url, contentType, decoded)
        catch { case scala.util.control.NonFatal(_) =>
          ParseOut(Map.empty, "", StatusFailed) }
    }
  }
}
