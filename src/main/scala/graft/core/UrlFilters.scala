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

/** Date-window URL filter (reference urlfilter/DateFilter.java:36-57,
  * built from `datecalc:`/`datespec:` rules by SubURLFilters.java:88-107):
  * extract a date string from the URL via regex + `$N` substitution and
  * REJECT the URL when the extracted value is lexicographically OLDER than
  * the cutoff — the incremental-news-crawl rule that skips archive URLs
  * whose embedded date has aged out.
  *
  * Failure modes all ACCEPT (the reference returns true on no-match, null
  * substitution, eval failure, or length mismatch): the filter only bites
  * when it positively extracts a comparable date.
  *
  * `calc` evaluates the substituted string as integer arithmetic first
  * (reference: AviatorEvaluator.exec — used for rules like
  * `$1*10000+$2*100+$3` that fold path segments into a sortable number).
  */
final case class DateRule(pattern: Regex, substitution: String,
    cutoff: String, calc: Boolean) extends Serializable {

  def accepts(url: String): Boolean =
    pattern.findFirstMatchIn(url) match {
      case None => true
      case Some(m) =>
        DateRule.substitute(m, substitution) match {
          case None => true
          case Some(extracted0) =>
            val extracted =
              if (!calc) Some(extracted0)
              else DateRule.evalArith(extracted0).map(_.toString)
            extracted match {
              case Some(d) if d.length == cutoff.length => d >= cutoff
              case _ => true
            }
        }
    }
}

object DateRule {

  /** `$N` group substitution (reference crawl/NutchConstant.java:1664-1691
    * ReplaceRegex): each `$N` becomes group N's value ("" when the group
    * did not participate); a reference to a group beyond groupCount
    * yields None-equivalent leniency by dropping the reference.
    */
  private[core] def substitute(m: Regex.Match, substitution: String)
      : Option[String] =
    try {
      val sb = new StringBuilder
      var i = 0
      while (i < substitution.length) {
        val c = substitution.charAt(i)
        if (c == '$' && i + 1 < substitution.length &&
          substitution.charAt(i + 1).isDigit) {
          var j = i + 1
          while (j < substitution.length && substitution.charAt(j).isDigit)
            j += 1
          val g = substitution.substring(i + 1, j).toInt
          if (g <= m.groupCount) sb.append(Option(m.group(g)).getOrElse(""))
          i = j
        } else { sb.append(c); i += 1 }
      }
      Some(sb.toString)
    } catch { case _: Exception => None }

  /** Integer arithmetic over `+ - * /` with parentheses and unary minus —
    * the deterministic stand-in for the reference's Aviator expression
    * evaluation (only ever fed arithmetic over substituted digit groups).
    */
  private[core] def evalArith(s: String): Option[Long] = {
    var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def atom(): Long = {
      ws()
      if (i < s.length && s.charAt(i) == '(') {
        i += 1
        val v = expr()
        ws()
        if (i >= s.length || s.charAt(i) != ')') throw new Exception(")")
        i += 1
        v
      } else if (i < s.length && s.charAt(i) == '-') { i += 1; -atom() }
      else {
        val st = i
        while (i < s.length && s.charAt(i).isDigit) i += 1
        if (i == st) throw new Exception("digit")
        s.substring(st, i).toLong
      }
    }
    def term(): Long = {
      var v = atom()
      ws()
      while (i < s.length && (s.charAt(i) == '*' || s.charAt(i) == '/')) {
        val op = s.charAt(i); i += 1
        val r = atom()
        v = if (op == '*') v * r else v / r
        ws()
      }
      v
    }
    def expr(): Long = {
      var v = term()
      ws()
      while (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) {
        val op = s.charAt(i); i += 1
        val r = term()
        v = if (op == '+') v + r else v - r
        ws()
      }
      v
    }
    try {
      val v = expr()
      ws()
      if (i == s.length) Some(v) else None
    } catch { case _: Exception => None }
  }
}

/** Sub-filter rule-set parser (reference urlfilter/SubURLFilters.java
  * buildExp:71-119 grammar, minus its redundant `regex:` prefix — this
  * engine's config rows already use bare `±regex` lines):
  *   `+regex` / `-regex`                         — signed regex rule
  *   `datecalc:regex $subst agoMillis format [calc]` — cutoff computed
  *      from `now - ago` rendered with the java.time `format` (UTC — the
  *      reference's SimpleDateFormat uses box-local time; a distributed
  *      engine needs every executor to agree)
  *   `datespec:regex $subst cutoff [calc]`       — explicit cutoff string
  *   `# comment` / blank                         — skipped
  * Malformed rules are dropped (the reference logs + continues).
  */
object SubFilters {
  def parse(text: String, nowMs: Long)
      : (Seq[FilterRule], Seq[DateRule]) = {
    val regex = Seq.newBuilder[FilterRule]
    val date = Seq.newBuilder[DateRule]
    Option(text).getOrElse("").split("\n").map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#")).foreach { line =>
        try {
          if (line.startsWith("datecalc:")) {
            val rs = line.stripPrefix("datecalc:").split(" ")
            val ago = rs(2).toLong
            val cutoff = java.time.format.DateTimeFormatter.ofPattern(rs(3))
              .withZone(java.time.ZoneOffset.UTC)
              .format(java.time.Instant.ofEpochMilli(nowMs - ago))
            date += DateRule(rs(0).r, rs(1), cutoff,
              calc = rs.length > 4 && rs(4).toBoolean)
          } else if (line.startsWith("datespec:")) {
            val rs = line.stripPrefix("datespec:").split(" ")
            date += DateRule(rs(0).r, rs(1), rs(2),
              calc = rs.length > 3 && rs(3).toBoolean)
          } else if (line.startsWith("+") || line.startsWith("-")) {
            regex += FilterRule(accept = line.startsWith("+"),
              line.substring(1).r)
          }
        } catch { case _: Exception => () }
      }
    (regex.result(), date.result())
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
