package graft.crawl

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{Inflater, ZipInputStream}

import graft.core.Urls

/** Content-type parser dispatch (reference: parse/ParserFactory.java:87
  * `getParsers(contentType, url)` routes each fetched record to a plugin —
  * parse-html, parse-tika for PDF/Office, parse-zip, feed parsers, …).
  *
  * Without dispatch a WARC-scale ingest silently drops every non-HTML
  * document from the corpus; with it, the majority non-HTML document mass
  * (JSON APIs, feeds, plain text, PDFs, zips) contributes text. All
  * parsers are pure JVM — no added dependencies:
  *
  *  - HTML/XHTML: the tolerant tag scanner in [[Parse]];
  *  - JSON: recursive-descent parse, string VALUES in document order are
  *    the text; URL-shaped values become outlinks (anchor = their key);
  *  - XML (incl. RSS/Atom): tag-stripped text; outlinks from href/src/url
  *    attributes and URL-shaped element text (`<link>http://…</link>`);
  *  - plain text: body as-is; URL-shaped tokens become outlinks;
  *  - PDF: content streams located by `stream…endstream`, FlateDecode
  *    via `java.util.zip.Inflater`, text from Tj / ' / " / TJ operators
  *    (paren strings with escape + octal decode); outlinks from `/URI`
  *    link annotations. Covers the Flate+simple-font mainstream the
  *    reference reaches through parse-tika; CID/encrypted PDFs fail
  *    closed to StatusFailed;
  *  - ZIP: entries dispatched by extension to the parsers above
  *    (reference parse-zip), bounded per-entry and per-archive.
  */
object PayloadParsers {

  import Parse.ParseOut

  /** A parser takes DECODED (post-gzip) body bytes. Implementations throw
    * on undecodable input; Parse.page maps that to StatusFailed.
    */
  trait PayloadParser extends Serializable {
    def parse(url: String, contentType: String, bytes: Array[Byte]): ParseOut
  }

  /** Primary content type: parameters stripped, lowercased. */
  def normalizeType(contentType: String): String =
    Option(contentType).map(_.split(';')(0).trim.toLowerCase).getOrElse("")

  /** The registry (exact primary-type keys; `+xml`/`+json` structured
    * syntax suffixes fall through to the XML/JSON parsers).
    */
  def forType(contentType: String): Option[PayloadParser] = {
    val ct = normalizeType(contentType)
    ct match {
      case "text/html" | "application/xhtml+xml" => Some(Html)
      case "application/json" | "text/json" => Some(Json)
      case "text/xml" | "application/xml" | "application/rss+xml" |
          "application/atom+xml" => Some(Xml)
      case "text/plain" => Some(PlainText)
      case "application/pdf" => Some(Pdf)
      case "application/zip" | "application/java-archive" => Some(Zip)
      case "text/javascript" | "application/javascript" |
          "application/x-javascript" => Some(JavaScript)
      // OOXML (docx/xlsx/pptx) = zip-of-XML: the Zip walker + Xml parser
      // compose; hyperlinks ride in _rels parts (reference routes these
      // through parse-tika — ParserFactory.java:87 type dispatch)
      case t if t.startsWith("application/vnd.openxmlformats-") =>
        Some(Ooxml)
      case t if t.endsWith("+json") => Some(Json)
      case t if t.endsWith("+xml") => Some(Xml)
      case _ => None
    }
  }

  private def charsetOf(contentType: String, bytes: Array[Byte]) =
    Parse.detectCharset(contentType, bytes)

  // ---------------------------------------------------------------- html

  object Html extends PayloadParser {
    def parse(url: String, ct: String, bytes: Array[Byte]): ParseOut = {
      val html = new String(bytes, charsetOf(ct, bytes))
      Parse.metaRefresh(html, url) match {
        case Some((target, time)) =>
          // SUCCESS_REDIRECT contract (reference ParseUtil.java:259-279):
          // the refresh target is the page's SOLE contribution — regular
          // outlinks and text are NOT taken from a redirecting page (the
          // else branch at :293-296 that copies them never runs)
          ParseOut(Map.empty, "", Parse.StatusRedirect,
            refreshUrl = target, refreshTime = time)
        case None =>
          ParseOut(Parse.extractLinks(html, url).toMap,
            Parse.extractText(html), Parse.StatusOk)
      }
    }
  }

  // ---------------------------------------------------------------- json

  /** Minimal recursive-descent JSON reader: enough to walk the value tree
    * in document order. Malformed input throws (→ StatusFailed).
    */
  private final class JsonReader(s: String) {
    private var i = 0
    private def ws(): Unit =
      while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
    private def fail(msg: String) =
      throw new IllegalArgumentException(s"$msg at $i")
    private def expect(c: Char): Unit = {
      if (i >= s.length || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }

    /** (key-or-null, stringValue) pairs in document order. */
    def strings(): Seq[(String, String)] = {
      val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
      ws(); value(null, out); ws()
      if (i != s.length) fail("trailing content")
      out.toSeq
    }

    private def value(key: String,
        out: scala.collection.mutable.ArrayBuffer[(String, String)])
        : Unit = {
      ws()
      if (i >= s.length) fail("eof")
      s.charAt(i) match {
        case '{' =>
          i += 1; ws()
          if (i < s.length && s.charAt(i) == '}') { i += 1; return }
          var more = true
          while (more) {
            ws()
            val k = string()
            ws(); expect(':')
            value(k, out)
            ws()
            if (i < s.length && s.charAt(i) == ',') i += 1
            else { expect('}'); more = false }
          }
        case '[' =>
          i += 1; ws()
          if (i < s.length && s.charAt(i) == ']') { i += 1; return }
          var more = true
          while (more) {
            value(key, out)
            ws()
            if (i < s.length && s.charAt(i) == ',') i += 1
            else { expect(']'); more = false }
          }
        case '"' => out += ((key, string()))
        case 't' => literal("true")
        case 'f' => literal("false")
        case 'n' => literal("null")
        case _ => number()
      }
    }

    private def literal(lit: String): Unit = {
      if (!s.startsWith(lit, i)) fail(s"expected $lit")
      i += lit.length
    }

    private def number(): Unit = {
      val start = i
      if (i < s.length && s.charAt(i) == '-') i += 1
      while (i < s.length && "0123456789.eE+-".indexOf(s.charAt(i)) >= 0)
        i += 1
      if (i == start) fail("expected value")
      java.lang.Double.parseDouble(s.substring(start, i))
    }

    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (i >= s.length) fail("bad escape")
          s.charAt(i) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'u' =>
              if (i + 4 >= s.length) fail("bad \\u")
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16)
                .toChar)
              i += 4
            case other => fail(s"bad escape \\$other")
          }
        } else sb.append(c)
        i += 1
      }
      expect('"')
      sb.toString
    }
  }

  object Json extends PayloadParser {
    def parse(url: String, ct: String, bytes: Array[Byte]): ParseOut = {
      val strings =
        new JsonReader(new String(bytes, charsetOf(ct, bytes))).strings()
      val links = scala.collection.mutable.LinkedHashMap[String, String]()
      strings.foreach { case (k, v) =>
        if (isUrl(v))
          Urls.resolveOutlink(url, v).foreach { u =>
            if (!links.contains(u)) links(u) = Option(k).getOrElse("")
          }
      }
      ParseOut(links.toMap,
        strings.map(_._2).filterNot(isUrl).mkString(" ")
          .split("\\s+").filter(_.nonEmpty).mkString(" "),
        Parse.StatusOk)
    }
  }

  private def isUrl(s: String): Boolean =
    (s.startsWith("http://") || s.startsWith("https://")) &&
      s.length > 8 && !s.exists(Character.isWhitespace)

  // ----------------------------------------------------------------- xml

  private val XmlCommentRe = "(?s)<!--.*?-->".r
  private val CdataRe = "(?s)<!\\[CDATA\\[(.*?)\\]\\]>".r
  private val XmlUrlAttrRe =
    "(?is)\\b(?:href|src|url)\\s*=\\s*[\"']([^\"']+)[\"']".r
  private val TextUrlRe = "https?://[^\\s<>\"']+".r

  object Xml extends PayloadParser {
    def parse(url: String, ct: String, bytes: Array[Byte]): ParseOut = {
      val raw = new String(bytes, charsetOf(ct, bytes))
      // surface CDATA payloads as text, drop comments
      val xml = XmlCommentRe.replaceAllIn(
        CdataRe.replaceAllIn(raw, m =>
          scala.util.matching.Regex.quoteReplacement(
            Parse.encodeEntities(m.group(1)))), " ")
      val links = scala.collection.mutable.LinkedHashMap[String, String]()
      def add(raw: String): Unit =
        Urls.resolveOutlink(url, Parse.decodeEntities(raw.trim)).foreach {
          u => if (!links.contains(u)) links(u) = ""
        }
      XmlUrlAttrRe.findAllMatchIn(xml).foreach(m => add(m.group(1)))
      val text = Parse.extractText(xml)
      // RSS/Atom style <link>http://…</link>: URL-shaped element text
      TextUrlRe.findAllIn(text).foreach(u => add(trimPunct(u)))
      ParseOut(links.toMap,
        TextUrlRe.replaceAllIn(text, " ")
          .split("\\s+").filter(_.nonEmpty).mkString(" "),
        Parse.StatusOk)
    }
  }

  private def trimPunct(u: String): String =
    u.reverse.dropWhile(".,;:!?)".contains(_)).reverse

  // ---------------------------------------------------------- plain text

  object PlainText extends PayloadParser {
    def parse(url: String, ct: String, bytes: Array[Byte]): ParseOut = {
      val text = new String(bytes, charsetOf(ct, bytes))
      val links = scala.collection.mutable.LinkedHashMap[String, String]()
      TextUrlRe.findAllIn(text).foreach { u =>
        Urls.resolveOutlink(url, trimPunct(u)).foreach { r =>
          if (!links.contains(r)) links(r) = ""
        }
      }
      ParseOut(links.toMap,
        text.split("\\s+").filter(_.nonEmpty).mkString(" "),
        Parse.StatusOk)
    }
  }

  // ----------------------------------------------------------------- pdf

  // the dict CLOSE immediately before a stream keyword; the dict START is
  // found by balancing '<<'/'>>' backwards from it — a lazy `<<(.*?)>>`
  // match would stop at the first '>>' inside a NESTED dict (e.g.
  // /DecodeParms<<...>> before /Filter) and hide the /FlateDecode that
  // follows, so the deflate bytes would be scanned as clear text
  private val PdfStreamStartRe =
    "(?s)>>\\s*stream\\r?\\n".r

  /** Start index of the stream dict whose `>>` is at `close`, by
    * backward `<<`/`>>` balancing (bounded span); -1 when unbalanced.
    */
  private[crawl] def pdfDictStart(raw: String, close: Int,
      maxSpan: Int = 4096): Int = {
    var depth = 1
    var i = close - 1
    val floor = math.max(0, close - maxSpan)
    // run-length walk: a run of n '<' or '>' is n/2 delimiter tokens
    // (right-aligned), so adjacent tokens like `>>>>` count correctly
    while (i >= floor) {
      val c = raw.charAt(i)
      if (c == '>' || c == '<') {
        var j = i
        while (j >= floor && raw.charAt(j) == c) j -= 1
        val pairs = (i - j) / 2
        if (c == '>') depth += pairs
        else {
          if (pairs >= depth) return i - 1 - 2 * (depth - 1)
          depth -= pairs
        }
        i = j
      } else i -= 1
    }
    -1
  }
  private val PdfStringOpRe =
    "(?s)\\(((?:\\\\.|[^\\\\()])*)\\)\\s*(?:Tj|'|\")".r
  private val PdfArrayOpRe = "(?s)\\[((?:\\\\.|[^\\]])*)\\]\\s*TJ".r
  private val PdfInnerStringRe = "(?s)\\(((?:\\\\.|[^\\\\()])*)\\)".r
  private val PdfUriRe = "(?s)/URI\\s*\\(((?:\\\\.|[^\\\\()])*)\\)".r

  /** Decode a PDF literal string body: escapes `\n \r \t \b \f \( \) \\`,
    * octal `\ddd`, and line continuations.
    */
  private[crawl] def pdfUnescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        i += 1
        s.charAt(i) match {
          case 'n' => sb.append('\n')
          case 'r' => sb.append('\r')
          case 't' => sb.append('\t')
          case 'b' => sb.append('\b')
          case 'f' => sb.append('\f')
          case '\n' => // line continuation
          case d if d >= '0' && d <= '7' =>
            var oct = d - '0'
            var k = 0
            while (k < 2 && i + 1 < s.length &&
              s.charAt(i + 1) >= '0' && s.charAt(i + 1) <= '7') {
              i += 1; oct = oct * 8 + (s.charAt(i) - '0'); k += 1
            }
            sb.append(oct.toChar)
          case other => sb.append(other)
        }
      } else sb.append(c)
      i += 1
    }
    sb.toString
  }

  private def inflate(bytes: Array[Byte], off: Int, len: Int)
      : Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(bytes, off, len)
      val bos = new java.io.ByteArrayOutputStream(len * 4 + 64)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsDictionary()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) return bos.toByteArray // truncated
        bos.write(buf, 0, n)
      }
      bos.toByteArray
    } finally inf.end()
  }

  object Pdf extends PayloadParser {
    def parse(url: String, ct: String, bytes: Array[Byte]): ParseOut = {
      // latin-1 preserves bytes 1:1 so regex offsets == byte offsets
      val raw = new String(bytes, StandardCharsets.ISO_8859_1)
      if (!raw.startsWith("%PDF"))
        throw new IllegalArgumentException("not a PDF")
      val text = new StringBuilder
      val links = scala.collection.mutable.LinkedHashMap[String, String]()
      PdfStreamStartRe.findAllMatchIn(raw).foreach { m =>
        val ds = pdfDictStart(raw, m.start)
        // full dict span INCLUDING nested dicts — /Filter /FlateDecode
        // must be found even after a /DecodeParms<<...>> sub-dict
        val dict = if (ds >= 0) raw.substring(ds, m.start) else ""
        val start = m.end
        val end = raw.indexOf("endstream", start)
        if (end > start) {
          val content =
            if (dict.contains("/FlateDecode"))
              new String(inflate(bytes, start, end - start),
                StandardCharsets.ISO_8859_1)
            else raw.substring(start, end)
          PdfStringOpRe.findAllMatchIn(content).foreach(sm =>
            text.append(pdfUnescape(sm.group(1))).append(' '))
          PdfArrayOpRe.findAllMatchIn(content).foreach { am =>
            PdfInnerStringRe.findAllMatchIn(am.group(1)).foreach(sm =>
              text.append(pdfUnescape(sm.group(1))))
            text.append(' ')
          }
        }
      }
      // /URI link annotations live in object dicts, not content streams
      PdfUriRe.findAllMatchIn(raw).foreach { m =>
        Urls.resolveOutlink(url, pdfUnescape(m.group(1))).foreach { u =>
          if (!links.contains(u)) links(u) = ""
        }
      }
      ParseOut(links.toMap,
        text.toString.split("\\s+").filter(_.nonEmpty).mkString(" "),
        Parse.StatusOk)
    }
  }

  // ----------------------------------------------------------------- zip

  private val ZipMaxEntries = 256
  private val ZipMaxEntryBytes = 4 << 20
  private val ZipMaxTotalBytes = 16 << 20

  private def extOf(name: String): String = {
    val i = name.lastIndexOf('.')
    if (i == -1) "" else name.substring(i + 1).toLowerCase
  }

  object Zip extends PayloadParser {
    def parse(url: String, ct: String, bytes: Array[Byte]): ParseOut = {
      val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
      val text = new StringBuilder
      val links = scala.collection.mutable.LinkedHashMap[String, String]()
      var entries = 0
      var total = 0
      try {
        var e = zin.getNextEntry
        while (e != null && entries < ZipMaxEntries &&
          total < ZipMaxTotalBytes) {
          if (!e.isDirectory) {
            entries += 1
            val inner = extOf(e.getName) match {
              case "html" | "htm" => Some(Html)
              case "json" => Some(Json)
              case "xml" | "rss" | "atom" => Some(Xml)
              case "txt" | "text" | "md" => Some(PlainText)
              case _ => None
            }
            if (inner.isDefined) {
              val body = readCapped(zin, ZipMaxEntryBytes)
              total += body.length
              // entry parse failures skip the ENTRY, not the archive
              try {
                val po = inner.get.parse(url, "", body)
                if (po.text.nonEmpty) text.append(po.text).append(' ')
                po.outlinks.foreach { case (u, a) =>
                  if (!links.contains(u)) links(u) = a
                }
              } catch { case _: Exception => }
            }
          }
          e = zin.getNextEntry
        }
      } finally zin.close()
      ParseOut(links.toMap, text.toString.trim, Parse.StatusOk)
    }
  }

  // ---------------------------------------------------------- ooxml (docx)

  // OOXML content parts that carry document text (docx body/notes, xlsx
  // shared strings, pptx slides); everything else in the package is
  // styling/metadata noise
  private def isOoxmlContentPart(name: String): Boolean =
    name == "word/document.xml" || name == "word/footnotes.xml" ||
      name == "word/endnotes.xml" || name == "xl/sharedStrings.xml" ||
      (name.startsWith("ppt/slides/") && name.endsWith(".xml") &&
        !name.contains("_rels"))

  private val RelsTargetRe =
    """Target="(https?://[^"]+)"""".r

  /** OOXML (docx/xlsx/pptx): a zip of XML parts. Text comes from the
    * content parts via the XML parser (tag strip — `<w:t>` runs etc.);
    * outlinks from `_rels` relationship parts' external `Target`
    * attributes (how Word stores hyperlinks) plus any URL-shaped text the
    * XML parser finds. Same entry/total caps as Zip.
    */
  object Ooxml extends PayloadParser {
    def parse(url: String, ct: String, bytes: Array[Byte]): ParseOut = {
      val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
      val text = new StringBuilder
      val links = scala.collection.mutable.LinkedHashMap[String, String]()
      var entries = 0
      var total = 0
      var sawPart = false
      try {
        var e = zin.getNextEntry
        while (e != null && entries < ZipMaxEntries &&
          total < ZipMaxTotalBytes) {
          if (!e.isDirectory) {
            entries += 1
            val name = e.getName
            if (isOoxmlContentPart(name)) {
              sawPart = true
              val body = readCapped(zin, ZipMaxEntryBytes)
              total += body.length
              try {
                val po = Xml.parse(url, "application/xml", body)
                if (po.text.nonEmpty) text.append(po.text).append(' ')
                po.outlinks.foreach { case (u, a) =>
                  if (!links.contains(u)) links(u) = a
                }
              } catch { case _: Exception => }
            } else if (name.endsWith(".rels")) {
              val body = readCapped(zin, ZipMaxEntryBytes)
              total += body.length
              val xml = new String(body, StandardCharsets.UTF_8)
              RelsTargetRe.findAllMatchIn(xml).foreach { m =>
                Urls.resolveOutlink(url, m.group(1)).foreach { u =>
                  if (!links.contains(u)) links(u) = ""
                }
              }
            }
          }
          e = zin.getNextEntry
        }
      } finally zin.close()
      if (!sawPart)
        throw new IllegalArgumentException("no OOXML content part")
      ParseOut(links.toMap, text.toString.trim, Parse.StatusOk)
    }
  }

  // ------------------------------------------------------------ javascript

  private val JsStringRe =
    """"((?:\\.|[^"\\])*)"|'((?:\\.|[^'\\])*)'""".r
  private val JsRelativeRe =
    """[A-Za-z0-9_./-]+\.(?:html?|php|jsp|aspx?|js|css|png|jpe?g|gif|pdf)(?:[?#][^\s]*)?""".r

  /** JavaScript link extraction (reference parse-js JSParseFilter:
    * string literals that look like URLs become outlinks): absolute
    * http(s) literals and relative-path-shaped literals resolve against
    * the page URL. Script text is NOT corpus text — text stays empty.
    */
  object JavaScript extends PayloadParser {
    def parse(url: String, ct: String, bytes: Array[Byte]): ParseOut = {
      val src = new String(bytes, charsetOf(ct, bytes))
      val links = scala.collection.mutable.LinkedHashMap[String, String]()
      JsStringRe.findAllMatchIn(src).foreach { m =>
        val lit = Option(m.group(1)).getOrElse(m.group(2))
        val candidate =
          if (lit.startsWith("http://") || lit.startsWith("https://") ||
            lit.startsWith("//")) Some(lit)
          else if (lit.startsWith("/") && lit.length > 1 &&
            !lit.startsWith("//")) Some(lit)
          else if (JsRelativeRe.pattern.matcher(lit).matches() &&
            !lit.endsWith(".js") && !lit.endsWith(".css")) Some(lit)
          else None
        candidate.foreach { c =>
          Urls.resolveOutlink(url, c).foreach { u =>
            if (!links.contains(u)) links(u) = ""
          }
        }
      }
      ParseOut(links.toMap, "", Parse.StatusOk)
    }
  }

  private def readCapped(in: java.io.InputStream, cap: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(8192)
    val buf = new Array[Byte](8192)
    var remaining = cap
    var n = in.read(buf, 0, math.min(buf.length, remaining))
    while (n > 0 && remaining > 0) {
      bos.write(buf, 0, n)
      remaining -= n
      n = in.read(buf, 0, math.min(buf.length, math.max(1, remaining)))
    }
    bos.toByteArray
  }
}
