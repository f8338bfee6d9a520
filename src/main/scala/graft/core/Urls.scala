package graft.core

import java.net.{URI, URISyntaxException}

/** URL canonicalization + key derivation for the crawl frontier.
  *
  * Semantics re-expressed from the reference's normalizer/filter chain
  * (reference: src/plugin/urlnormalizer-basic/.../BasicURLNormalizer.java:40-140,
  * conf/regex-normalize.xml, net/URLNormalizers.java:81-97) and key scheme
  * (reference: util/TableUtil.java:53-104 reverseUrl/unreverseUrl).
  *
  * The engine keys rows on `urlHash` (64-bit XXH64 of the canonical URL) —
  * the reference's reversed-URL HBase rowkey is kept only as a parity
  * helper. Pure functions: no Spark, unit-testable, usable inside codegen'd
  * expressions via UDF registration.
  */
object Urls {

  /** Canonicalize a raw URL string. Returns None when the URL is not
    * crawlable (bad syntax, unsupported scheme, empty host).
    *
    * Rules (BasicURLNormalizer semantics):
    *  - trim surrounding whitespace
    *  - lowercase scheme + host
    *  - strip a trailing dot on the host
    *  - drop default ports (http:80, https:443)
    *  - strip the `#fragment`
    *  - resolve `/./` and `/../`, collapse `//` in the path
    *  - empty path becomes "/"
    *  - strip common session-id query params (regex-normalize.xml analog)
    */
  /** Canonicalize with user NORMALIZE RULES applied first (reference
    * urlnormalizer-regex before urlnormalizer-basic in the normalizer
    * chain): the regex pass rewrites the raw string (session ids, default
    * pages, anchors…), then the structural pass below canonicalizes.
    */
  def canonicalize(raw: String, rules: NormalizeRules): Option[String] =
    if (rules.isEmpty) canonicalize(raw)
    else canonicalize(rules(raw.trim))

  def canonicalize(raw: String): Option[String] = {
    val s = raw.trim
    if (s.isEmpty) return None
    val uri =
      try new URI(s)
      catch { case _: URISyntaxException => return None }
    val scheme = Option(uri.getScheme).map(_.toLowerCase).getOrElse(return None)
    if (scheme != "http" && scheme != "https") return None
    var host = Option(uri.getHost).map(_.toLowerCase).getOrElse(return None)
    if (host.isEmpty) return None
    if (host.endsWith(".")) host = host.dropRight(1)
    val port = uri.getPort match {
      case -1 => -1
      case 80 if scheme == "http" => -1
      case 443 if scheme == "https" => -1
      case p => p
    }
    val path = normalizePath(Option(uri.getRawPath).getOrElse(""))
    val query = Option(uri.getRawQuery).map(stripSessionIds).filter(_.nonEmpty)
    val sb = new StringBuilder(s.length)
    sb.append(scheme).append("://").append(host)
    if (port != -1) sb.append(':').append(port)
    sb.append(path)
    query.foreach(q => sb.append('?').append(q))
    Some(sb.toString)
  }

  /** Resolve `.`/`..` segments and collapse duplicate slashes.
    *
    * Reference quirk kept for parity (TestBasicURLNormalizer:
    * `/aa/..` -> `/aa/..`): a FINAL `..` segment with no trailing slash is
    * literal; only `../` is resolved.
    */
  private[core] def normalizePath(rawPath: String): String = {
    if (rawPath.isEmpty) return "/"
    val segs = rawPath.split("/", -1)
    val literalTailDots = !rawPath.endsWith("/") && segs.last == ".."
    val out = new scala.collection.mutable.ArrayBuffer[String]
    var i = 0
    while (i < segs.length) {
      segs(i) match {
        case "" | "." => // collapse `//` and drop `.`
        case ".." =>
          if (literalTailDots && i == segs.length - 1) out += ".."
          else if (out.nonEmpty) out.remove(out.length - 1)
        case seg => out += seg
      }
      i += 1
    }
    val trail = rawPath.endsWith("/") || rawPath.endsWith("/.") ||
      rawPath.endsWith("/../")
    val p = out.mkString("/", "/", if (trail && out.nonEmpty) "/" else "")
    if (p.isEmpty) "/" else p
  }

  private val SessionIdParam =
    "(?i)^(?:sid|phpsessid|jsessionid|sessionid|cfid|cftoken)=".r

  private[core] def stripSessionIds(query: String): String =
    query
      .split("&")
      .filter(p => SessionIdParam.findFirstIn(p).isEmpty)
      .mkString("&")

  /** Host of a canonical URL (already lowercase). Handles bracketed IPv6. */
  def host(canonicalUrl: String): String = {
    val afterScheme = canonicalUrl.indexOf("://") + 3
    if (afterScheme < canonicalUrl.length && canonicalUrl.charAt(afterScheme) == '[') {
      val close = canonicalUrl.indexOf(']', afterScheme)
      if (close != -1) return canonicalUrl.substring(afterScheme, close + 1)
    }
    val end = canonicalUrl.indexWhere(c => c == '/' || c == ':' || c == '?',
      afterScheme)
    if (end == -1) canonicalUrl.substring(afterScheme)
    else canonicalUrl.substring(afterScheme, end)
  }

  /** Path (+query) of a canonical URL: everything from the first '/' after
    * the authority; "/" when absent. The one safe way to derive the robots
    * match path — chopping at indexOf(host)+host.length leaves a leading
    * ":port" on non-default-port URLs and silently disables robots rules.
    */
  def pathOf(canonicalUrl: String): String = {
    val afterScheme = canonicalUrl.indexOf("://") + 3
    val slash = canonicalUrl.indexOf('/', afterScheme)
    if (slash == -1) "/" else canonicalUrl.substring(slash)
  }

  /** Multi-level public suffixes (effective TLDs), loaded once from the
    * classpath resource (reference: util/URLUtil.java getDomainName over
    * conf/domain-suffixes.xml — IANA + publicsuffix.org data). 2- and
    * 3-label suffixes; single-label TLDs are the implicit fallback.
    */
  private[core] lazy val publicSuffixes: Set[String] = {
    val in = getClass.getResourceAsStream("/graft/public-suffixes.txt")
    if (in == null) Set.empty
    else
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toSet
      finally in.close()
  }
  private lazy val maxSuffixLabels: Int =
    if (publicSuffixes.isEmpty) 2
    else publicSuffixes.iterator.map(_.count(_ == '.') + 1).max

  /** Registered domain of a host: the LONGEST matching public suffix plus
    * one label; hosts under no listed suffix fall back to the last two
    * labels. `co.kr`, `com.tr`, `co.in` etc. group correctly for byDomain
    * politeness queues (a wrong boundary would merge every *.com.tr host
    * into one queue — or split a registrant across queues).
    */
  def domain(host: String): String = {
    val parts = host.split('.')
    if (parts.length <= 2) return host
    var k = math.min(parts.length - 1, maxSuffixLabels)
    while (k >= 2) {
      if (publicSuffixes.contains(parts.takeRight(k).mkString(".")))
        return parts.takeRight(k + 1).mkString(".")
      k -= 1
    }
    parts.takeRight(2).mkString(".")
  }

  /** Reversed-URL parity helper (reference util/TableUtil.java:53-82):
    * `http://bar.foo.com:8983/to/index.html?a=b`
    *   -> `com.foo.bar:http:8983/to/index.html?a=b`
    */
  def reverseUrl(url: String): String = {
    val schemeEnd = url.indexOf("://")
    val scheme = url.substring(0, schemeEnd)
    val rest = url.substring(schemeEnd + 3)
    val pathStart = rest.indexWhere(c => c == '/' || c == '?')
    val hostPort = if (pathStart == -1) rest else rest.substring(0, pathStart)
    val path = if (pathStart == -1) "" else rest.substring(pathStart)
    val (h, port) = hostPort.indexOf(':') match {
      case -1 => (hostPort, "")
      case i => (hostPort.substring(0, i), hostPort.substring(i))
    }
    h.split('.').reverse.mkString(".") + ":" + scheme + port + path
  }

  def unreverseUrl(reversed: String): String = {
    val firstColon = reversed.indexOf(':')
    val revHost = reversed.substring(0, firstColon)
    val rest = reversed.substring(firstColon + 1)
    val pathStart = rest.indexWhere(c => c == '/' || c == '?')
    val schemePort = if (pathStart == -1) rest else rest.substring(0, pathStart)
    val path = if (pathStart == -1) "" else rest.substring(pathStart)
    val (scheme, port) = schemePort.indexOf(':') match {
      case -1 => (schemePort, "")
      case i => (schemePort.substring(0, i), schemePort.substring(i))
    }
    scheme + "://" + revHost.split('.').reverse.mkString(".") + port + path
  }

  /** 64-bit key of the canonical URL — XXH64 (same algorithm family Spark's
    * `xxhash64` uses, seed 42) so the Scala-side key and the Catalyst
    * `xxhash64(col)` column agree bit-for-bit.
    */
  def urlHash(canonicalUrl: String): Long =
    XxHash64.hashUtf8(canonicalUrl, 42L)

  /** Resolve a possibly-relative outlink against a base canonical URL. */
  def resolveOutlink(base: String, link: String): Option[String] = {
    val t = link.trim
    if (t.isEmpty) return None
    try {
      val resolved = new URI(base).resolve(t).toString
      canonicalize(resolved)
    } catch { case _: Exception => None }
  }
}
