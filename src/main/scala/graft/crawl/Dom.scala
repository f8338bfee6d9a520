package graft.crawl

/** A small HTML DOM: tree builder + node walker + CSS-ish selectors —
  * the foundation the reference's DOM-walking extraction rules assume
  * (reference: parse/DomParser.java:1-383 NekoHTML parse,
  * util/NodeWalker.java depth-first walk,
  * parse/element/DomListSegmentRule.java:31-440 block/row/column
  * extraction over DOM nodes).
  *
  * Deliberately forgiving, like browser parsers on the happy path:
  * single/double/unquoted attributes (shared `Parse.parseAttrs`), void
  * elements, self-closing syntax, comments, unmatched close tags
  * ignored, and implied end tags for the repeating-row elements
  * (`li`, `tr`, `td`, `th`, `option`, `p`) — the cases that matter for
  * list extraction from real pages. Not a full HTML5 tree constructor.
  */
object Dom {

  sealed trait DomNode
  final case class Text(s: String) extends DomNode
  final case class Elem(tag: String, attrs: Map[String, String],
      children: Vector[DomNode]) extends DomNode {

    /** Concatenated descendant text, entity-decoded, whitespace-collapsed
      * (NodeWalker text accumulation).
      */
    def text: String = {
      val sb = new StringBuilder
      def walk(n: DomNode): Unit = n match {
        case Text(s) => sb.append(s).append(' ')
        case e: Elem => e.children.foreach(walk)
      }
      children.foreach(walk)
      Parse.decodeEntities(sb.toString).split("\\s+")
        .filter(_.nonEmpty).mkString(" ")
    }

    /** Depth-first descendant elements (document order). */
    def descendants: Iterator[Elem] = children.iterator.flatMap {
      case e: Elem => Iterator.single(e) ++ e.descendants
      case _ => Iterator.empty
    }

    /** All descendants matching a selector. */
    def select(selector: String): Seq[Elem] =
      descendants.filter(matches(_, selector)).toSeq

    def selectFirst(selector: String): Option[Elem] =
      descendants.find(matches(_, selector))
  }

  /** Selector subset: `tag`, `.class`, `#id`, `tag.class`, `tag#id`. */
  private[crawl] def matches(e: Elem, selector: String): Boolean = {
    val (tagPart, rest) = selector.span(c => c != '.' && c != '#')
    val tagOk = tagPart.isEmpty || e.tag == tagPart.toLowerCase
    val restOk =
      if (rest.isEmpty) true
      else if (rest.startsWith("."))
        e.attrs.getOrElse("class", "").split("\\s+").contains(rest.drop(1))
      else e.attrs.get("id").contains(rest.drop(1))
    tagOk && restOk
  }

  private val voidTags = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "source", "track", "wbr")
  // opening one of these implicitly closes an open sibling of the same tag
  private val impliedClose = Set("li", "tr", "td", "th", "option", "p")
  private val rawTextTags = Set("script", "style")

  // group 3 (attribute body) is LAZY so the self-closing '/' lands in
  // group 4 instead of being absorbed by an unquoted attribute value
  private val TokenRe =
    ("(?s)<!--.*?-->|<!\\[CDATA\\[.*?\\]\\]>|<![^>]*>|" +
      "<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)(/?)>").r

  /** Parse HTML into a synthetic root element (tag "#root"). */
  def parse(html: String): Elem = {
    // mutable frame: (tag, attrs, children under construction)
    final class Frame(val tag: String, val attrs: Map[String, String]) {
      val children = Vector.newBuilder[DomNode]
    }
    val stack = scala.collection.mutable.Stack[Frame]()
    stack.push(new Frame("#root", Map.empty))

    def closeTo(tag: String): Unit =
      if (stack.exists(_.tag == tag)) {
        while (stack.top.tag != tag) popFrame()
        popFrame()
      } // unmatched close tag: ignored
    def popFrame(): Unit = {
      val f = stack.pop()
      stack.top.children += Elem(f.tag, f.attrs, f.children.result())
    }

    val lower = html.toLowerCase
    val m = TokenRe.pattern.matcher(html)
    var pos = 0
    while (pos < html.length && m.find(pos)) {
      if (m.start > pos) {
        val txt = html.substring(pos, m.start)
        if (txt.trim.nonEmpty) stack.top.children += Text(txt)
      }
      pos = m.end
      if (m.group(2) != null) {
        val tag = m.group(2).toLowerCase
        if (m.group(1) == "/") closeTo(tag)
        else {
          val attrs = Parse.parseAttrs(m.group(3))
          val selfClosed = m.group(4) == "/" || voidTags(tag)
          if (impliedClose(tag) && stack.top.tag == tag) popFrame()
          if (selfClosed)
            stack.top.children += Elem(tag, attrs, Vector.empty)
          else {
            stack.push(new Frame(tag, attrs))
            if (rawTextTags(tag)) {
              // RAW TEXT: the content is script, not markup — jump to the
              // literal close tag (a '<' inside the code must not be
              // tokenized); content is swallowed, the element stays empty
              val close = lower.indexOf(s"</$tag", pos)
              if (close == -1) pos = html.length
              else {
                val gt = html.indexOf('>', close)
                pos = if (gt == -1) html.length else gt + 1
                popFrame()
              }
            }
          }
        }
      }
    }
    if (pos < html.length) {
      val txt = html.substring(pos)
      if (txt.trim.nonEmpty) stack.top.children += Text(txt)
    }
    while (stack.size > 1) popFrame() // EOF closes everything
    val root = stack.pop()
    Elem(root.tag, root.attrs, root.children.result())
  }

  // ------------------------------------------------- list extraction (C7)

  /** One output column of a DOM list rule: `selector` picks the first
    * matching descendant of the row node; `attr` reads that attribute
    * (entity-decoded), absent `attr` reads the node's text.
    */
  final case class DomColRule(name: String, selector: String,
      attr: Option[String] = None) extends Serializable

  /** DOM-walking list extraction (reference
    * parse/element/DomListSegmentRule.java:31-440: a block node located
    * in the DOM, its repeated child rows, per-row column values): `block`
    * selects the list container, `row` its repeated records, `cols` the
    * per-record fields. Rows missing a column emit "" for it — one
    * malformed record never drops the rest (the reference's per-node
    * try/continue).
    */
  final case class DomListRule(block: String, row: String,
      cols: Seq[DomColRule]) extends Serializable {

    def extract(html: String): Seq[Seq[String]] =
      Dom.parse(html).selectFirst(block).toSeq.flatMap { blockNode =>
        blockNode.select(row).map { rowNode =>
          cols.map { c =>
            val target =
              if (c.selector.isEmpty) Some(rowNode)
              else rowNode.selectFirst(c.selector)
            target.map { n =>
              c.attr match {
                case Some(a) =>
                  Parse.decodeEntities(n.attrs.getOrElse(a, ""))
                case None => n.text
              }
            }.getOrElse("")
          }
        }
      }
  }
}
