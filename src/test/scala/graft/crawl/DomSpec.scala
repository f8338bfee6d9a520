package graft.crawl

import org.scalatest.funsuite.AnyFunSuite

/** Unit gates for the DOM tree builder, node walker, selectors, and the
  * DOM-walking list rule (C7 full — reference DomListSegmentRule shape).
  */
class DomSpec extends AnyFunSuite {

  test("tree building: nesting, void elements, self-closing, comments") {
    val root = Dom.parse(
      """<html><!-- c --><body><div id="a"><br><img src=x.png/>
        |<p>one<p>two</div></body></html>""".stripMargin)
    val div = root.selectFirst("#a").get
    assert(div.tag === "div")
    // implied </p>: the second <p> is a SIBLING, not a child of the first
    val ps = div.select("p")
    assert(ps.map(_.text) === Seq("one", "two"))
    assert(ps.forall(_.select("p").isEmpty))
    assert(div.select("img").head.attrs("src") === "x.png")
  }

  test("selectors: tag, .class, #id, tag.class; class lists") {
    val root = Dom.parse(
      "<div class='x y'>1</div><div class='y'>2</div><span class=y>3</span>")
    assert(root.select(".y").map(_.text) === Seq("1", "2", "3"))
    assert(root.select("div.y").map(_.text) === Seq("1", "2"))
    assert(root.select("div.x").map(_.text) === Seq("1"))
    assert(root.select("span").map(_.text) === Seq("3"))
  }

  test("script/style raw text is swallowed; unmatched close tags ignored") {
    val root = Dom.parse(
      "<body><script>if (a<b) { x(\"</div>\"); }</script></i><p>ok</p></body>")
    assert(root.select("p").map(_.text) === Seq("ok"))
    assert(root.select("div").isEmpty)
    assert(!root.text.contains("if (a"))
  }

  test("text: entity decode, whitespace collapse, nested inline tags") {
    val root = Dom.parse("<p> a &amp;  <b>b</b>\n c </p>")
    assert(root.select("p").head.text === "a & b c")
  }

  test("DomListRule: block/row/cols over quirky HTML, missing cols -> empty") {
    val html =
      """<ul class='other'><li><span class=name>no</span></li></ul>
        |<ul class="items">
        |<li id=1><span class='name'>alpha</span><a href=/l/1 rel=x>g</a>
        |<li id=2><span class='name'>beta</span>
        |<li id=3><a href='/l/3'>g</a></ul>""".stripMargin
    val rule = Dom.DomListRule("ul.items", "li", Seq(
      Dom.DomColRule("name", "span.name"),
      Dom.DomColRule("link", "a", Some("href"))))
    assert(rule.extract(html) === Seq(
      Seq("alpha", "/l/1"),
      Seq("beta", ""), // row without a link: column empty, row kept
      Seq("", "/l/3")))
    // no matching block: no rows
    assert(rule.extract("<ul class='other'><li>x</li></ul>") === Nil)
  }

  test("fixture page renderer round-trips through the DOM rule") {
    val html = graft.operators.ExtractOps.renderItemsPage(7L,
      "aa bb cc dd ee ff gg")
    val rule = Dom.DomListRule("ul.items", "li", Seq(
      Dom.DomColRule("name", "span.name"),
      Dom.DomColRule("link", "a", Some("href"))))
    assert(rule.extract(html) === Seq(
      Seq("aa", "/item/1?d=7"), Seq("bb", "/item/2?d=7"),
      Seq("cc", "/item/3?d=7"), Seq("dd", "/item/4?d=7"),
      Seq("ee", "/item/5?d=7")))
  }
}
