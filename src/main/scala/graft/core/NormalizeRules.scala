package graft.core

import scala.util.matching.Regex

/** User-configurable URL normalize rules — an ordered (pattern →
  * substitution) list applied to the raw URL string before structural
  * canonicalization (reference: urlnormalizer-regex
  * RegexURLNormalizer.java:184 — each rule is one `matcher.replaceAll`
  * pass, in file order; rules live in conf/regex-normalize.xml).
  *
  * Substitutions use Java `Matcher.replaceAll` syntax (`$1` groups,
  * backslash escapes) — compatible with the reference's Perl5 rules.
  */
final class NormalizeRules private (rules: Seq[(Regex, String)])
    extends Serializable {
  def apply(url: String): String =
    rules.foldLeft(url) { case (u, (p, s)) => p.replaceAllIn(u, s) }
  def isEmpty: Boolean = rules.isEmpty
}

object NormalizeRules {

  /** No custom rules — `Urls.canonicalize`'s structural behavior alone. */
  val none: NormalizeRules = new NormalizeRules(Nil)

  def apply(rules: Seq[(String, String)]): NormalizeRules =
    new NormalizeRules(rules.map { case (p, s) => (p.r, s) })

  /** Text form, one rule per line: `pattern~substitution` (the F6 rewrite
    * syntax, reference urlfilter/RegexRule.java); `~` absent means delete
    * the match. `#` comments and blank lines skipped.
    */
  def parse(lines: Seq[String]): NormalizeRules =
    new NormalizeRules(lines.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val i = l.indexOf('~')
        if (i == -1) (l.r, "")
        else (l.substring(0, i).r, l.substring(i + 1))
      }
      .toSeq)

  // [^<]* not (.*?): pattern/substitution text is XML-escaped, so it
  // cannot contain a raw '<' — and a lazy dot-star would backtrack ACROSS
  // block boundaries when a substitution-less block precedes a full one,
  // fusing two rules into one garbage rule
  private val RegexBlockRe =
    "(?s)<regex>\\s*<pattern>([^<]*)</pattern>\\s*" +
      "<substitution>([^<]*)</substitution>\\s*</regex>"
  private val RegexBlockNoSubRe =
    "(?s)<regex>\\s*<pattern>([^<]*)</pattern>\\s*</regex>"
  private val CommentRe = "(?s)<!--.*?-->".r

  /** The reference's `regex-normalize.xml` format, so an existing ruleset
    * drops in unchanged. Minimal scan (comments stripped, `&amp;`/`&lt;`/
    * `&gt;` entities decoded) — no XML library needed for this fixed
    * two-element shape.
    */
  def parseXml(xml: String): NormalizeRules = {
    val clean = CommentRe.replaceAllIn(xml, "")
    // single left-to-right pass: sequential replace() would DOUBLE-decode
    // nested escapes ('&amp;lt;' -> '&lt;' -> '<'), while an XML parser
    // decodes each entity exactly once ('&amp;lt;' -> '&lt;')
    val entRe = "&(amp|lt|gt|quot|apos);".r
    def unent(s: String) = entRe.replaceAllIn(s, m =>
      scala.util.matching.Regex.quoteReplacement(m.group(1) match {
        case "amp" => "&"
        case "lt" => "<"
        case "gt" => ">"
        case "quot" => "\""
        case "apos" => "'"
      }))
    val withSub = RegexBlockRe.r.findAllMatchIn(clean)
      .map(m => (m.start, (unent(m.group(1).trim).r, unent(m.group(2)))))
    // a <regex> with no <substitution> element deletes the match
    val noSub = RegexBlockNoSubRe.r.findAllMatchIn(clean)
      .filter(m => !m.matched.contains("<substitution>"))
      .map(m => (m.start, (unent(m.group(1).trim).r, "")))
    new NormalizeRules(
      (withSub ++ noSub).toSeq.sortBy(_._1).map(_._2))
  }
}
