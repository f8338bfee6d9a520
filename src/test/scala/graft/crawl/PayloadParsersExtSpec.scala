package graft.crawl

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

/** Round-5 parser increments: OOXML (docx = zip-of-XML), JavaScript link
  * extraction (reference parse-js), and the PDF nested-stream-dict fix
  * (a /DecodeParms<<...>> sub-dict before /Filter must not hide
  * FlateDecode).
  */
class PayloadParsersExtSpec extends AnyFunSuite {

  private val DocxType =
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document"

  private def zipOf(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, body) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(body.getBytes(StandardCharsets.UTF_8))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  test("docx: text from word/document.xml, hyperlinks from _rels Targets") {
    val docXml =
      """<?xml version="1.0"?><w:document><w:body>""" +
        """<w:p><w:r><w:t>Hello docx</w:t></w:r>""" +
        """<w:r><w:t>second run</w:t></w:r></w:p>""" +
        """</w:body></w:document>"""
    val rels =
      """<?xml version="1.0"?><Relationships>""" +
        """<Relationship Id="rId1" Type="hyperlink" """ +
        """Target="http://linked.example/page.html" TargetMode="External"/>""" +
        """<Relationship Id="rId2" Type="styles" Target="styles.xml"/>""" +
        """</Relationships>"""
    val docx = zipOf(
      "[Content_Types].xml" -> "<Types/>",
      "word/document.xml" -> docXml,
      "word/_rels/document.xml.rels" -> rels,
      "word/styles.xml" -> "<w:styles><w:t>NOISE</w:t></w:styles>")
    val parser = PayloadParsers.forType(DocxType)
    assert(parser.isDefined, "no parser routed for docx")
    val po = parser.get.parse("http://src.example/doc.docx", DocxType, docx)
    assert(po.text.contains("Hello docx") && po.text.contains("second run"))
    assert(!po.text.contains("NOISE"), "styles part leaked into text")
    assert(po.outlinks.contains("http://linked.example/page.html"))
  }

  test("xlsx shared strings and pptx slides route through the same parser") {
    val xlsxType = "application/vnd.openxmlformats-officedocument" +
      ".spreadsheetml.sheet"
    val xlsx = zipOf(
      "xl/sharedStrings.xml" -> "<sst><si><t>cell text</t></si></sst>")
    val po = PayloadParsers.forType(xlsxType).get
      .parse("http://src.example/w.xlsx", xlsxType, xlsx)
    assert(po.text.contains("cell text"))
    // a zip with no OOXML content part fails closed (not silently empty)
    val junk = zipOf("whatever.bin" -> "xx")
    assertThrows[IllegalArgumentException](
      PayloadParsers.forType(xlsxType).get
        .parse("http://src.example/w.xlsx", xlsxType, junk))
  }

  test("javascript: string-literal URLs become outlinks; script is not text") {
    val js =
      """var a = "http://abs.example/x.html";
        |var b = 'https://sec.example/y?q=1';
        |var c = "/rooted/path.html";
        |var d = "images/pic.png";
        |var e = "not a url";
        |var f = "wat.js"; // script refs skipped
        |""".stripMargin
    val po = PayloadParsers.forType("text/javascript").get
      .parse("http://src.example/app/main.js", "text/javascript",
        js.getBytes(StandardCharsets.UTF_8))
    assert(po.text === "")
    assert(po.outlinks.contains("http://abs.example/x.html"))
    assert(po.outlinks.contains("https://sec.example/y?q=1"))
    assert(po.outlinks.contains("http://src.example/rooted/path.html"))
    assert(po.outlinks.contains("http://src.example/app/images/pic.png"))
    assert(!po.outlinks.keys.exists(_.contains("not%20a")))
    assert(!po.outlinks.keys.exists(_.endsWith("wat.js")))
  }

  test("pdf: FlateDecode found behind a nested /DecodeParms dict") {
    // content stream: "(Hidden text) Tj" deflate-compressed
    val content = "BT (Hidden text) Tj ET".getBytes(StandardCharsets.ISO_8859_1)
    val d = new Deflater()
    d.setInput(content); d.finish()
    val buf = new Array[Byte](1024)
    val n = d.deflate(buf); d.end()
    val deflated = java.util.Arrays.copyOf(buf, n)
    val bos = new ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n1 0 obj\n<< /Length " + deflated.length +
      " /DecodeParms << /Predictor 1 /Columns 4 >> /Filter /FlateDecode >>\n" +
      "stream\n")
    bos.write(deflated)
    w("\nendstream\nendobj\n%%EOF")
    val po = PayloadParsers.forType("application/pdf").get
      .parse("http://src.example/a.pdf", "application/pdf", bos.toByteArray)
    assert(po.text.contains("Hidden text"),
      s"nested dict hid FlateDecode: '${po.text.take(120)}'")
  }

  test("pdf dict start balances nested and adjacent delimiters") {
    val raw = "xx<</A<</B 1>>/Filter /FlateDecode>>stream\n"
    val close = raw.indexOf(">>stream")
    val start = PayloadParsers.pdfDictStart(raw, close)
    assert(start === 2, s"got $start")
    assert(raw.substring(start, close).contains("/FlateDecode"))
  }
}
