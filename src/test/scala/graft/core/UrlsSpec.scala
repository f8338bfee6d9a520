package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Canonicalizer fixtures lifted from the reference's normalizer test table
  * (reference: src/plugin/urlnormalizer-basic/src/test/.../TestBasicURLNormalizer.java:38-106)
  * plus reverseUrl round-trip properties (util/TableUtil.java:53-104).
  */
class UrlsSpec extends AnyFunSuite {

  /** Deterministic mini property runner (no scalatestplus bridge offline). */
  private def forAll[T](gen: Gen[T], n: Int = 300)(f: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }

  private val table = Seq(
    " http://foo.com/ " -> "http://foo.com/",
    "HTTP://foo.com/" -> "http://foo.com/",
    "http://Foo.Com/index.html" -> "http://foo.com/index.html",
    "http://foo.com:80/index.html" -> "http://foo.com/index.html",
    "http://foo.com:81/" -> "http://foo.com:81/",
    "http://foo.com" -> "http://foo.com/",
    "http://foo.com/foo.html#ref" -> "http://foo.com/foo.html",
    "http://foo.com/aa/./foo.html" -> "http://foo.com/aa/foo.html",
    "http://foo.com/aa/../" -> "http://foo.com/",
    "http://foo.com/aa/bb/../" -> "http://foo.com/aa/",
    "http://foo.com/aa/.." -> "http://foo.com/aa/..",
    "http://foo.com/aa/bb/cc/../../foo.html" -> "http://foo.com/aa/foo.html",
    "http://foo.com/aa/bb/../cc/dd/../ee/foo.html" ->
      "http://foo.com/aa/cc/ee/foo.html",
    "http://foo.com/../foo.html" -> "http://foo.com/foo.html",
    "http://foo.com/../../foo.html" -> "http://foo.com/foo.html",
    "http://foo.com/../aa/../foo.html" -> "http://foo.com/foo.html",
    "http://foo.com/aa/../../foo.html" -> "http://foo.com/foo.html",
    "http://foo.com/aa/../bb/../foo.html/../../" -> "http://foo.com/",
    "http://foo.com/../aa/foo.html" -> "http://foo.com/aa/foo.html",
    "http://foo.com/a..a/foo.html" -> "http://foo.com/a..a/foo.html",
    "http://foo.com/a..a/../foo.html" -> "http://foo.com/foo.html",
    "http://foo.com/foo.foo/../foo.html" -> "http://foo.com/foo.html",
    "http://foo.com//aa/bb/foo.html" -> "http://foo.com/aa/bb/foo.html",
    "http://foo.com/aa//bb/foo.html" -> "http://foo.com/aa/bb/foo.html",
    "http://foo.com/aa/bb//foo.html" -> "http://foo.com/aa/bb/foo.html",
    "http://foo.com//aa//bb//foo.html" -> "http://foo.com/aa/bb/foo.html",
    "http://foo.com////aa////bb////foo.html" -> "http://foo.com/aa/bb/foo.html")

  test("canonicalize matches the reference normalizer table") {
    table.foreach { case (weird, normal) =>
      assert(Urls.canonicalize(weird) === Some(normal), s"input: '$weird'")
    }
  }

  test("canonicalize rejects non-http schemes and garbage") {
    assert(Urls.canonicalize("ftp://foo.com/a") === None)
    assert(Urls.canonicalize("file:///etc/passwd") === None)
    assert(Urls.canonicalize("mailto:a@b.com") === None)
    assert(Urls.canonicalize("not a url") === None)
    assert(Urls.canonicalize("") === None)
    assert(Urls.canonicalize("https://foo.com:443/x") === Some("https://foo.com/x"))
  }

  test("canonicalize strips session ids but keeps real params") {
    assert(Urls.canonicalize("http://a.com/p?JSESSIONID=abc&x=1") ===
      Some("http://a.com/p?x=1"))
    assert(Urls.canonicalize("http://a.com/p?sid=9") === Some("http://a.com/p"))
  }

  test("canonicalize is idempotent on the fixture table") {
    table.foreach { case (_, normal) =>
      assert(Urls.canonicalize(normal) === Some(normal))
    }
  }

  test("reverseUrl matches the reference example") {
    // util/TableUtil.java:47-52 javadoc example
    assert(Urls.reverseUrl("http://bar.foo.com:8983/to/index.html?a=b") ===
      "com.foo.bar:http:8983/to/index.html?a=b")
    assert(Urls.unreverseUrl("com.foo.bar:http:8983/to/index.html?a=b") ===
      "http://bar.foo.com:8983/to/index.html?a=b")
  }

  private val hostGen: Gen[String] = for {
    n <- Gen.choose(1, 4)
    labels <- Gen.listOfN(n, Gen.choose(1, 8).flatMap(l =>
      Gen.listOfN(l, Gen.alphaLowerChar).map(_.mkString)))
  } yield labels.mkString(".")

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https")
    h <- hostGen
    port <- Gen.oneOf("", ":81", ":8983")
    depth <- Gen.choose(0, 4)
    segs <- Gen.listOfN(depth, Gen.choose(1, 6).flatMap(l =>
      Gen.listOfN(l, Gen.alphaNumChar).map(_.mkString)))
    q <- Gen.oneOf("", "?a=b", "?x=1&y=2")
  } yield s"$scheme://$h$port/${segs.mkString("/")}$q"

  test("property: reverseUrl round-trips") {
    forAll(urlGen) { url =>
      assert(Urls.unreverseUrl(Urls.reverseUrl(url)) === url)
    }
  }

  test("property: canonicalize is idempotent") {
    forAll(urlGen) { url =>
      Urls.canonicalize(url).foreach { c =>
        assert(Urls.canonicalize(c) === Some(c))
      }
    }
  }

  test("host/domain extraction") {
    assert(Urls.host("http://www.test-3.example:81/p/q?x=1") === "www.test-3.example")
    assert(Urls.host("https://a.b.c/") === "a.b.c")
    assert(Urls.host("http://[::1]:8080/x") === "[::1]") // bracketed IPv6
    assert(Urls.domain("www.foo.com") === "foo.com")
    assert(Urls.domain("a.b.site.co.uk") === "site.co.uk")
    assert(Urls.domain("foo.com") === "foo.com")
    // full public-suffix list: 2-level suffixes beyond the old built-ins
    assert(Urls.publicSuffixes.size > 2000)
    assert(Urls.domain("shop.firm.com.tr") === "firm.com.tr")
    assert(Urls.domain("www.portal.co.kr") === "portal.co.kr")
    assert(Urls.domain("m.news.co.in") === "news.co.in")
    // 3-level suffixes take precedence over their 2-level parent
    assert(Urls.domain("www.school.nsw.edu.au") === "school.nsw.edu.au")
    assert(Urls.domain("x.schools.ma.us") === "schools.ma.us") // 2-level us
    // no listed suffix -> last two labels; suffix-only host stays whole
    assert(Urls.domain("deep.sub.example.zz") === "example.zz")
    assert(Urls.domain("co.uk") === "co.uk")
  }

  test("pathOf starts at the first '/' after the authority (ports, query)") {
    assert(Urls.pathOf("http://h.example/private/p.html") === "/private/p.html")
    // the robots-path regression: a non-default port must not leak into
    // the path (":8080/private/..." never prefix-matches "/private/")
    assert(Urls.pathOf("http://h.example:8080/private/p.html") ===
      "/private/p.html")
    assert(Urls.pathOf("http://h.example") === "/")
    assert(Urls.pathOf("http://h.example/a?b=/c") === "/a?b=/c")
  }

  test("resolveOutlink resolves relative links against the page URL") {
    assert(Urls.resolveOutlink("http://a.com/d/p.html", "q.html") ===
      Some("http://a.com/d/q.html"))
    assert(Urls.resolveOutlink("http://a.com/d/p.html", "/r/s.html") ===
      Some("http://a.com/r/s.html"))
    assert(Urls.resolveOutlink("http://a.com/d/p.html", "HTTP://B.com/x") ===
      Some("http://b.com/x"))
    assert(Urls.resolveOutlink("http://a.com/", "mailto:x@y.z") === None)
  }

  // the reference's regex-normalize.xml default ruleset, verbatim XML
  // shape (urlnormalizer-regex/sample/regex-normalize-default.xml)
  private val defaultNormalizeXml =
    """<?xml version="1.0"?>
      |<regex-normalize>
      |<!-- session ids -->
      |<regex>
      |  <pattern>([;_]?((?i)l|j|bv_)?((?i)sid|phpsessid|sessionid)=.*?)(\?|&amp;|#|$)</pattern>
      |  <substitution>$4</substitution>
      |</regex>
      |<regex>
      |  <pattern>/((?i)index|default)\.((?i)js[pf]{1}?[afx]?|cgi|cfm|asp[x]?|[psx]?htm[l]?|php[3456]?)(\?|&amp;|#|$)</pattern>
      |  <substitution>/$3</substitution>
      |</regex>
      |<regex>
      |  <pattern>#.*?(\?|&amp;|$)</pattern>
      |  <substitution>$1</substitution>
      |</regex>
      |<regex>
      |  <pattern>\?&amp;</pattern>
      |  <substitution>\?</substitution>
      |</regex>
      |<regex>
      |  <pattern>&amp;{2,}</pattern>
      |  <substitution>&amp;</substitution>
      |</regex>
      |<regex>
      |  <pattern>[\?&amp;\.]$</pattern>
      |  <substitution></substitution>
      |</regex>
      |</regex-normalize>""".stripMargin

  test("normalize rules: reference regex-normalize-default golden cases") {
    val rules = NormalizeRules.parseXml(defaultNormalizeXml)
    // lifted from urlnormalizer-regex/sample/regex-normalize-default.test
    val golden = Seq(
      "http://foo.com/foo.php?PHPSESSID=cdc993a493e899bed04f4d0c8a462a03"
        -> "http://foo.com/foo.php",
      "http://foo.com/foo.php?f=2&PHPSESSID=cdc993a493e899bed04f4d0c8a462a03"
        -> "http://foo.com/foo.php?f=2",
      "http://foo.com/foo.php?f=2&PHPSESSID=cdc993a493e899bed04f4d0c8a462a03&q=3"
        -> "http://foo.com/foo.php?f=2&q=3",
      "http://www.foo.com/foo.php?Bv_SessionID=fassassddsajkl&x=y"
        -> "http://www.foo.com/foo.php?x=y",
      "http://www.foo.com/foo.html;jsessionid=1E6FEC0D14D044541DD84D2D013D29ED"
        -> "http://www.foo.com/foo.html",
      "http://www.foo.com/foo.php?&x=1&sid=xyz&something=1"
        -> "http://www.foo.com/foo.php?x=1&something=1",
      "http://www.foo.com/home/index.html" -> "http://www.foo.com/home/",
      "http://www.foo.com/index.asp" -> "http://www.foo.com/",
      "http://www.foo.com/default.php3" -> "http://www.foo.com/",
      "http://www.foo.com/something.php3"
        -> "http://www.foo.com/something.php3",
      "http://www.foo.com/index.phtml" -> "http://www.foo.com/",
      "http://www.foo.com/index.HTML" -> "http://www.foo.com/",
      "http://www.foo.com/foo.html#something" -> "http://www.foo.com/foo.html",
      "http://www.foo.com/foo.html#something?x=y"
        -> "http://www.foo.com/foo.html?x=y",
      "http://www.foo.com/foo.html?&x=y" -> "http://www.foo.com/foo.html?x=y",
      "http://www.foo.com/foo.html?x=y&&&z=a"
        -> "http://www.foo.com/foo.html?x=y&z=a",
      "http://www.foo.com/foo.html?" -> "http://www.foo.com/foo.html")
    golden.foreach { case (in, want) =>
      assert(rules(in) === want, s"input $in")
    }
  }

  test("normalize rules: a substitution-less block before a full block " +
    "parses as TWO rules (no cross-block regex fusion)") {
    val rules = NormalizeRules.parseXml(
      "<regex-normalize>" +
        "<regex><pattern>a+</pattern></regex>" + // delete-match rule
        "<regex><pattern>b</pattern><substitution>c</substitution></regex>" +
        "</regex-normalize>")
    assert(rules("xaaayb") === "xyc")
  }

  test("normalize rules: nested XML escapes decode exactly once " +
    "('&amp;lt;' is a literal '&lt;', not '<')") {
    // '&amp;lt;' in rule XML decodes ONCE to the 4-char text '&lt;' (what
    // a real XML parser yields); the old sequential replace() chain
    // double-decoded it to '<', silently altering the rule
    val rules = NormalizeRules.parseXml(
      "<regex-normalize>" +
        "<regex><pattern>&amp;lt;</pattern>" +
        "<substitution>X</substitution></regex>" +
        "</regex-normalize>")
    // the rule pattern must be the 4-char string "&lt;" — it rewrites
    // occurrences of that literal text, NOT of '<'
    assert(rules("http://e.example/a&lt;b") === "http://e.example/aXb")
    assert(rules("http://e.example/a<b") === "http://e.example/a<b")
  }

  test("normalize rules: text form, canonicalize integration, " +
    "defaults unchanged") {
    // pattern~substitution text form (F6 rewrite syntax)
    val rules = NormalizeRules.parse(Seq(
      "# drop tracking params",
      "[?&]utm_[a-z]+=[^&#]*~",
      "//m\\.~//www."))
    assert(Urls.canonicalize(
      "http://m.shop.example/p?id=3&utm_source=x", rules) ===
      Some("http://www.shop.example/p?id=3"))
    // empty ruleset == structural behavior, exactly
    assert(Urls.canonicalize("http://A.example:80/x/../y?sid=1&k=2",
      NormalizeRules.none) ===
      Urls.canonicalize("http://A.example:80/x/../y?sid=1&k=2"))
  }
}
