package graft.core

import scala.util.matching.Regex

/** Ordered ±regex URL filter chain.
  *
  * Re-expresses the reference's filter-chain contract (reference:
  * net/URLFilters.java:35-74 — first matching signed rule decides; no match
  * => accept is FALSE for regex-urlfilter because its last rule is `+.`)
  * with the default ruleset modeled on conf/regex-urlfilter.txt:
  *   - skip file:/ftp:/mailto: (handled structurally by canonicalize)
  *   - skip media/binary extensions (images are NOT skipped here: this
  *     engine crawls image payloads, so the image-extension line of the
  *     reference default is replaced by an archive/binary blacklist)
  *   - guard against URL loops (repeated path segments)
  *   - accept everything else
  */
final case class FilterRule(accept: Boolean, pattern: Regex)

final class UrlFilterChain(rules: Seq[FilterRule]) extends Serializable {
  /** First matching rule decides; no match => reject (chain contract). */
  def accepts(url: String): Boolean = {
    var i = 0
    while (i < rules.length) {
      val r = rules(i)
      if (r.pattern.findFirstIn(url).isDefined) return r.accept
      i += 1
    }
    false
  }
}

object UrlFilterChain {
  /** Default chain (conf/regex-urlfilter.txt analog, image-crawl variant). */
  val default: UrlFilterChain = new UrlFilterChain(Seq(
    // binary/archive extensions we never fetch
    FilterRule(accept = false,
      "(?i)\\.(?:zip|gz|bz2|7z|rar|exe|dmg|iso|tar|css|js|swf)(?:\\?|$)".r),
    // URL loop guard: same path segment 3x (regex-urlfilter.txt loop rule)
    FilterRule(accept = false, "(?s).*(/[^/]+)/[^/]+\\1/[^/]+\\1/.*".r),
    // excessively long URLs
    FilterRule(accept = false, "^.{2048,}$".r),
    // everything else passes (`+.` terminal rule)
    FilterRule(accept = true, ".".r)))

  def parse(lines: Seq[String]): UrlFilterChain =
    new UrlFilterChain(lines.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val sign = l.charAt(0) match {
          case '+' => true
          case '-' => false
          case c =>
            throw new IllegalArgumentException(s"rule must start with +/-: $l")
        }
        FilterRule(sign, l.substring(1).r)
      }
      .toSeq)
}
