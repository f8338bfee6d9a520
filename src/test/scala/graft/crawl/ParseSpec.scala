package graft.crawl

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** Unit gates for the parse stage's pure row logic: gzip decode, charset
  * detection (header vs meta), entity decode, link extraction with
  * relative resolution + alt captions, truncation handling — and the
  * render->parse round-trip over the synthetic protocol layer.
  */
class ParseSpec extends AnyFunSuite {

  test("gzip round-trips") {
    val data = ("crawl " * 100).getBytes(StandardCharsets.UTF_8)
    val gz = Parse.gzip(data)
    assert(gz.length < data.length)
    assert(Parse.gunzip(gz).sameElements(data))
  }

  test("entity decode: named, decimal, hex; unknown left intact") {
    assert(Parse.decodeEntities("a &amp; b &lt;c&gt; &quot;d&quot;") ===
      "a & b <c> \"d\"")
    assert(Parse.decodeEntities("&#233; &#xe9;") === "é é")
    assert(Parse.decodeEntities("&bogus; x") === "&bogus; x")
    assert(Parse.decodeEntities(Parse.encodeEntities("q=1&l=2 <&> \"x\"")) ===
      "q=1&l=2 <&> \"x\"")
  }

  test("charset sniffing: BOM authoritative; a lying Latin-1 header on " +
    "valid multi-byte UTF-8 is overridden (EncodingDetector semantics)") {
    // BOM wins over any declaration
    val bom = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++
      "<html>x</html>".getBytes(StandardCharsets.UTF_8)
    assert(Parse.detectCharset("text/html; charset=iso-8859-1", bom) ===
      StandardCharsets.UTF_8)
    // UTF-8 page whose server lies charset=iso-8859-1: the bytes contain
    // a valid multi-byte sequence, so the sniffer overrides the header
    val utf8Body = "<html><body>café résumé — naïve</body></html>"
      .getBytes(StandardCharsets.UTF_8)
    assert(Parse.detectCharset("text/html; charset=iso-8859-1", utf8Body)
      === StandardCharsets.UTF_8)
    val text = new String(utf8Body,
      Parse.detectCharset("text/html; charset=iso-8859-1", utf8Body))
    assert(text.contains("café") && text.contains("naïve"))
    // a REAL Latin-1 page keeps its declared charset (0xE9 'é' is not a
    // valid UTF-8 sequence start+continuation)
    val latin = "<html>café</html>".getBytes(StandardCharsets.ISO_8859_1)
    assert(Parse.detectCharset("text/html; charset=iso-8859-1", latin) ===
      StandardCharsets.ISO_8859_1)
    // nothing declared: valid UTF-8 bytes sniff to UTF-8, invalid to
    // Latin-1 (never mojibake via a wrong UTF-8 default)
    assert(Parse.detectCharset("text/html", utf8Body) ===
      StandardCharsets.UTF_8)
    assert(Parse.detectCharset("text/html", latin) ===
      StandardCharsets.ISO_8859_1)
    // a declared NON-Latin charset is trusted even if bytes validate as
    // UTF-8 (EUC/Shift_JIS pages often do not, but the rule is scoped)
    assert(Parse.detectCharset("text/html; charset=gb2312",
      "<html>abc</html>".getBytes) === java.nio.charset.Charset
      .forName("gb2312"))
  }

  test("charset detection: header param beats meta; meta beats default") {
    val iso = "<html><head><meta charset=\"ISO-8859-1\"></head></html>"
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(Parse.detectCharset("text/html", iso) ===
      StandardCharsets.ISO_8859_1)
    assert(Parse.detectCharset("text/html; charset=utf-8", iso) ===
      StandardCharsets.UTF_8)
    assert(Parse.detectCharset("text/html", "<html></html>".getBytes) ===
      StandardCharsets.UTF_8)
  }

  test("link extraction: hrefs resolved, entities decoded, img alt = anchor") {
    val html =
      """<html><body>
        |<a href="/a/b.html">first</a>
        |<a href="c.html">second &amp; more</a>
        |<a href="http://other.example/x?q=1&amp;l=en">abs</a>
        |<img src="/img1_0.png" alt="caption 1"/>
        |<a href="/a/b.html">dup ignored</a>
        |</body></html>""".stripMargin
    val links = Parse.extractLinks(html, "http://h.example/d/p.html")
    assert(links === Seq(
      "http://h.example/a/b.html" -> "first",
      "http://h.example/d/c.html" -> "second & more",
      "http://other.example/x?q=1&l=en" -> "abs",
      "http://h.example/img1_0.png" -> "caption 1"))
  }

  test("link extraction survives real-web HTML: quote styles, attribute " +
    "order, valueless attrs, base href") {
    // single quotes, no quotes, reordered attributes, attributes between
    // the tag name and href, valueless attrs, missing alt, <base href>
    val html =
      """<html><head><base target=_blank href='/sub/dir/'></head><body>
        |<a class=nav href='/single.html'>sq</a>
        |<a href=unquoted.html>uq</a>
        |<a data-x="1" download href = "spaced.html" rel=nofollow>sp</a>
        |<A HREF="/UPPER.html">caps tag</A>
        |<a name="no-href-anchor">not a link</a>
        |<img alt='reordered alt' class="x" src=img/pic1.png>
        |<img src='/noalt.png'>
        |<a
        |  href="multi.html">multiline</a>
        |</body></html>""".stripMargin
    val links = Parse.extractLinks(html, "http://h.example/d/p.html")
    assert(links === Seq(
      "http://h.example/single.html" -> "sq",
      "http://h.example/sub/dir/unquoted.html" -> "uq",
      "http://h.example/sub/dir/spaced.html" -> "sp",
      "http://h.example/UPPER.html" -> "caps tag",
      "http://h.example/sub/dir/multi.html" -> "multiline",
      "http://h.example/sub/dir/img/pic1.png" -> "reordered alt",
      "http://h.example/noalt.png" -> ""))
  }

  test("base href: absolute base wins; relative base resolves against page") {
    val abs = """<base href="http://cdn.example/assets/"><a href=x.html>x</a>"""
    assert(Parse.extractLinks(abs, "http://h.example/d/p.html") ===
      Seq("http://cdn.example/assets/x.html" -> "x"))
    // no base => page URL is the base
    val none = """<a href=x.html>x</a>"""
    assert(Parse.extractLinks(none, "http://h.example/d/p.html") ===
      Seq("http://h.example/d/x.html" -> "x"))
    // repeated attribute: first occurrence wins
    assert(Parse.parseAttrs("href=\"a\" href=\"b\"") === Map("href" -> "a"))
  }

  test("truncated content parses to no outlinks; bad gzip fails safely") {
    val html = "<html><a href=\"/x.html\">x</a></html>".getBytes
    val ok = Parse.page("http://h.example/", "text/html", Map.empty, html,
      html.length)
    assert(ok.status === Parse.StatusOk && ok.outlinks.size === 1)
    val trunc = Parse.page("http://h.example/", "text/html", Map.empty,
      html.take(10), html.length)
    assert(trunc.status === Parse.StatusTruncated && trunc.outlinks.isEmpty)
    val badGz = Parse.page("http://h.example/", "text/html",
      Map("content-encoding" -> "gzip"), html, html.length)
    assert(badGz.status === Parse.StatusFailed && badGz.outlinks.isEmpty)
  }

  test("render->parse round-trip recovers the semantic outlink map") {
    val cfg = WebConfig(numHosts = 6, pagesPerHost = 30)
    var pages = 0
    var sawGzip = false
    var sawIso = false
    var sawRelative = false
    var sawEntityHref = false
    for (h <- 0 until cfg.numHosts; p <- 0 until cfg.pagesPerHost) {
      val url = SyntheticWeb.pageUrl(h, p)
      SyntheticWeb.content(url, cfg) match {
        case HtmlPage(outlinks) =>
          SyntheticWeb.raw(url, cfg) match {
            case RawPage(ct, headers, bytes, declared) =>
              if (headers.contains("content-encoding")) sawGzip = true
              val html = new String(
                if (headers.contains("content-encoding"))
                  (try Parse.gunzip(bytes)
                  catch { case _: Exception => Array.emptyByteArray })
                else bytes,
                Parse.detectCharset(ct, bytes))
              if (html.contains("ISO-8859-1")) sawIso = true
              if (html.contains("href=\"/")) sawRelative = true
              if (html.contains("&amp;")) sawEntityHref = true
              val po = Parse.page(url, ct, headers, bytes, declared)
              if (bytes.length == declared) {
                pages += 1
                assert(po.status === Parse.StatusOk)
                assert(po.outlinks === outlinks, s"outlink mismatch at $url")
                assert(po.text.nonEmpty)
              } else assert(po.status === Parse.StatusTruncated)
            case other => fail(s"$url rendered $other")
          }
        case _ => // redirects/errors have no render
      }
    }
    assert(pages > 50)
    assert(sawGzip && sawIso && sawRelative && sawEntityHref,
      s"variant coverage: gzip=$sawGzip iso=$sawIso rel=$sawRelative " +
        s"ent=$sawEntityHref")
  }

  test("meta refresh: content grammar, resolution, permanence " +
    "(HTMLMetaProcessor.java:123-170 / ParseUtil.java:244-279 semantics)") {
    val page = "http://a.example/dir/x.html"
    // full form, absolute target
    assert(Parse.metaRefresh(
      """<html><head><meta http-equiv="refresh" content="0; url=http://b.example/y"></head></html>""",
      page) === Some(("http://b.example/y", 0)))
    // relative target resolves against the page URL; case-insensitive
    // http-equiv/URL=; single quotes
    assert(Parse.metaRefresh(
      """<meta HTTP-EQUIV='Refresh' content='30; URL=../z.html'>""",
      page) === Some(("http://a.example/z.html", 30)))
    // time-only refresh targets the page ITSELF
    assert(Parse.metaRefresh("""<meta http-equiv=refresh content=45>""",
      page) === Some((page, 45)))
    // mis-formatted (no url=): everything after ';' is the target
    assert(Parse.metaRefresh(
      """<meta http-equiv="refresh" content="5;http://c.example/">""",
      page) === Some(("http://c.example/", 5)))
    // entity-encoded target survives
    assert(Parse.metaRefresh(
      """<meta http-equiv="refresh" content="9; url=http://c.example/?a=1&amp;b=2">""",
      page) === Some(("http://c.example/?a=1&b=2", 9)))
    // unparseable time => NO refresh at all (reference: parse failure
    // skips setRefresh)
    assert(Parse.metaRefresh(
      """<meta http-equiv="refresh" content="soon; url=http://b.example/">""",
      page) === None)
    // unrelated meta tags don't trigger
    assert(Parse.metaRefresh(
      """<meta charset="utf-8"><meta name="refresh" content="5">""",
      page) === None)
  }

  test("meta-refresh page parses to SUCCESS_REDIRECT: sole discovery is " +
    "the target, body links and text dropped") {
    val html =
      """<html><head><meta http-equiv="refresh" content="0; url=/moved.html">
        |</head><body>some text <a href="/other.html">other</a></body></html>"""
        .stripMargin
    val po = Parse.page("http://a.example/old.html", "text/html",
      Map.empty, html.getBytes(StandardCharsets.UTF_8), html.length.toLong)
    assert(po.status === Parse.StatusRedirect)
    assert(po.refreshUrl === "http://a.example/moved.html")
    assert(po.refreshTime === 0)
    assert(po.outlinks.isEmpty && po.text.isEmpty)
    // permanence boundary: < PermRefreshTime is permanent
    assert(0 < Parse.PermRefreshTime && 30 >= Parse.PermRefreshTime)
  }

  test("synthetic web renders refresh pages the parser recovers") {
    val cfg = WebConfig(numHosts = 12, pagesPerHost = 40)
    var perm = 0
    var temp = 0
    for (h <- 0 until cfg.numHosts; p <- 0 until cfg.pagesPerHost) {
      val url = SyntheticWeb.pageUrl(h, p)
      SyntheticWeb.content(url, cfg) match {
        case RefreshPage(to, secs, _) =>
          SyntheticWeb.raw(url, cfg) match {
            case RawPage(ct, headers, bytes, declared) =>
              val po = Parse.page(url, ct, headers, bytes, declared)
              if (bytes.length == declared) {
                assert(po.status === Parse.StatusRedirect, s"at $url")
                assert(po.refreshUrl === to, s"at $url")
                assert(po.refreshTime === secs)
                assert(po.outlinks.isEmpty, s"body links leaked at $url")
                if (secs < Parse.PermRefreshTime) perm += 1 else temp += 1
              } else assert(po.status === Parse.StatusTruncated)
            case other => fail(s"$url rendered $other")
          }
        case _ =>
      }
    }
    assert(perm > 0 && temp > 0, s"coverage: perm=$perm temp=$temp")
  }

  test("ISO-8859-1 page text decodes accents correctly") {
    val cfg = WebConfig(numHosts = 12, pagesPerHost = 40)
    val isoTexts = for {
      h <- 0 until cfg.numHosts
      p <- 0 until cfg.pagesPerHost
      url = SyntheticWeb.pageUrl(h, p)
      po = SyntheticWeb.raw(url, cfg) match {
        case RawPage(ct, headers, bytes, declared) =>
          Parse.page(url, ct, headers, bytes, declared)
        case _ => Parse.ParseOut(Map.empty, "", Parse.StatusFailed)
      }
      if po.status == Parse.StatusOk && po.text.contains("café")
    } yield po.text
    assert(isoTexts.nonEmpty, "no ISO-8859-1 page exercised")
    isoTexts.foreach(t => assert(t.contains("résumé") && !t.contains("�")))
  }
}
