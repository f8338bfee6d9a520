package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** DateRule / SubFilters gates — semantics lifted from the reference's
  * urlfilter/DateFilter.java:36-57 (accept-on-any-failure, length-guarded
  * lexicographic compare) and SubURLFilters.java:71-119 (rule grammar,
  * rejecting date filter short-circuits the ± regex logic).
  */
class UrlFilterSpec extends AnyFunSuite {

  // 2013-06-15T00:00:00Z — fixed "now" for datecalc determinism
  private val now = 1371254400000L

  test("datespec: URL date >= cutoff accepted, older rejected, " +
    "failure modes all accept (DateFilter.java:36-57)") {
    val r = DateRule(""".+?/(\d{8})/.+""".r, "$1", "20130101", calc = false)
    assert(r.accepts("http://news.example/a/20130515/story.html"))
    assert(r.accepts("http://news.example/a/20130101/story.html")) // boundary
    assert(!r.accepts("http://news.example/a/20121231/story.html"))
    // no regex match => accept
    assert(r.accepts("http://news.example/about.html"))
    // extracted length != cutoff length => accept (reference :52-53)
    val short = DateRule(""".+?/(\d{6})/.+""".r, "$1", "20130101",
      calc = false)
    assert(short.accepts("http://news.example/a/201305/x.html"))
  }

  test("calc rules fold date parts arithmetically before comparing " +
    "(AviatorEvaluator.exec analog)") {
    val r = DateRule(""".+?/(\d{4})-(\d{2})-(\d{2})/.+""".r,
      "$1*10000+$2*100+$3", "20130101", calc = true)
    assert(r.accepts("http://news.example/p/2013-05-15/s.html")) // 20130515
    assert(!r.accepts("http://news.example/p/2012-12-31/s.html")) // 20121231
    // eval failure => accept
    val bad = DateRule(""".+?/(\w+)/.+""".r, "$1*2", "20130101", calc = true)
    assert(bad.accepts("http://news.example/abc/s.html"))
  }

  test("substitute: $N groups, missing group empty, out-of-range dropped") {
    val m = """(\d+)-(\d+)(?:-(\d+))?""".r.findFirstMatchIn("12-34").get
    assert(DateRule.substitute(m, "$1:$2") === Some("12:34"))
    assert(DateRule.substitute(m, "$1$3x$2") === Some("12x34")) // $3 null
    assert(DateRule.substitute(m, "$1$9") === Some("12")) // out of range
    assert(DateRule.substitute(m, "y$2") === Some("y34"))
  }

  test("evalArith: precedence, parens, unary minus, garbage => None") {
    assert(DateRule.evalArith("2013*10000+5*100+15") === Some(20130515L))
    assert(DateRule.evalArith("2+3*4") === Some(14L))
    assert(DateRule.evalArith("(2+3)*4") === Some(20L))
    assert(DateRule.evalArith("-5+2") === Some(-3L))
    assert(DateRule.evalArith("100/7") === Some(14L))
    assert(DateRule.evalArith("2+") === None)
    assert(DateRule.evalArith("abc") === None)
  }

  test("SubFilters.parse: grammar, datecalc cutoff from now-ago, " +
    "comments and malformed lines dropped (SubURLFilters.java:71-119)") {
    val thirtyDaysMs = 30L * 24 * 3600 * 1000
    val (regex, date) = SubFilters.parse(
      s"""+/story/
         |# a comment
         |-\\.pdf$$
         |datecalc:.+?/(\\d{8})/.+ $$1 $thirtyDaysMs yyyyMMdd
         |datespec:.+?/d(\\d{4})/.+ $$1 2020
         |datecalc:broken rule
         |""".stripMargin, now)
    assert(regex.map(_.accept) === Seq(true, false))
    assert(date.length === 2)
    // now = 2013-06-15Z, ago 30d => cutoff 20130516
    assert(date.head.cutoff === "20130516")
    assert(date.head.accepts("http://n.example/x/20130516/a.html"))
    assert(!date.head.accepts("http://n.example/x/20130515/a.html"))
    assert(date(1).cutoff === "2020")
  }

  test("a rejecting date filter short-circuits acceptsSub regardless of " +
    "matching +regex (SubURLFilters.java:38-39)") {
    val (regex, date) = SubFilters.parse(
      "+/story/\ndatespec:.+?/(\\d{8})/.+ $1 20130101", now)
    val cfg = SiteConfig(cfgId = 1, subFilters = regex, dateFilters = date)
    assert(cfg.acceptsSub("http://n.example/story/20130515/a.html"))
    assert(!cfg.acceptsSub("http://n.example/story/20120101/a.html"))
    // +regex still binds when the date rule passes (no match => accept)
    assert(!cfg.acceptsSub("http://n.example/other/a.html"))
    // date-only config: regex set empty, date rule alone decides
    val dateOnly = SiteConfig(cfgId = 2, dateFilters = date)
    assert(dateOnly.acceptsSub("http://n.example/x/20140101/a.html"))
    assert(!dateOnly.acceptsSub("http://n.example/x/20110101/a.html"))
  }
}
