package graft.crawl

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.spark

/** S9 WARC source/sink gates: byte-level render/parse round-trip, and the
  * archive-ingestion path — a crawl batch exported to .warc files, read
  * back as FetchResult rows, and parsed by the SAME parse stage with
  * identical outlinks/signature inputs.
  */
class WarcSpec extends AnyFunSuite {
  import spark.implicits._

  test("record render/parse round-trips bytes, headers, truncation info") {
    val body = Array.tabulate(512)(i => (i * 31).toByte)
    val rec = Warc.renderRecord("http://h.example/x?a=1", "image/png",
      Map("content-length" -> "512", "x-extra" -> "v"), body,
      "2024-01-01T00:00:00Z")
    val parsed = Warc.parseRecords(rec)
    assert(parsed.size === 1)
    val r = parsed.head
    assert(r.url === "http://h.example/x?a=1")
    assert(r.contentType === "image/png")
    assert(r.httpHeaders("x-extra") === "v")
    assert(r.body.sameElements(body))
    // multiple concatenated records
    val two = rec ++ Warc.renderRecord("http://h.example/y", "text/html",
      Map("content-length" -> "3"), "abc".getBytes, "2024-01-01T00:00:00Z")
    assert(Warc.parseRecords(two).map(_.url) ===
      Seq("http://h.example/x?a=1", "http://h.example/y"))
  }

  test("crawl batch -> warc -> read -> parse matches the pipeline's parse") {
    val dir = Files.createTempDirectory("warc-crawl").toString
    val cfg = WebConfig(numHosts = 4, pagesPerHost = 12)
    val p = new CrawlPipeline(spark, dir, cfg, numBuckets = 4)
    p.runBatches(2, 40, 8)

    val fetched = spark.read.parquet(s"$dir/batches/b2/fetched")
      .as[FetchResult]
    val warcDir = Files.createTempDirectory("warc-out").toString
    Warc.write(fetched, warcDir)
    assert(new java.io.File(warcDir).listFiles()
      .exists(_.getName.endsWith(".warc")))

    val back = Warc.read(spark, warcDir, "warc1")
    // every archivable (Success + content) row round-trips; the parse
    // stage extracts the identical outlink sets from archived bytes
    val origParsed = spark.read.parquet(s"$dir/batches/b2/parsed")
      .as[ParsedPage].collect()
      .filter(r => r.outcome == graft.core.FetchOutcome.Success)
      .map(r => r.url -> r.outlinks).toMap
    val warcParsed = p.parse(back, "warc1", 0L).collect()
      .map(r => r.url -> r.outlinks).toMap
    assert(warcParsed.keySet === origParsed.keySet)
    origParsed.foreach { case (url, links) =>
      assert(warcParsed(url) === links, s"outlinks differ for $url")
    }
    // truncated transfers stay truncated through the archive
    val truncOrig = spark.read.parquet(s"$dir/batches/b2/parsed")
      .filter(org.apache.spark.sql.functions.col("parseStatus") ===
        Parse.StatusTruncated)
      .select("url").as[String].collect().toSet
    if (truncOrig.nonEmpty) {
      val truncWarc = spark.read
        .parquet(s"$dir/batches/warc1/parsed")
        .filter(org.apache.spark.sql.functions.col("parseStatus") ===
          Parse.StatusTruncated)
        .select("url").as[String].collect().toSet
      assert(truncWarc === truncOrig)
    }
  }

  test("parseRecords is robust on archives we didn't write") {
    val good = Warc.renderRecord("http://h.example/ok", "text/html",
      Map("content-length" -> "2"), "ok".getBytes, "2024-01-01T00:00:00Z")

    // malformed WARC Content-Length: scan stops at the broken record
    val badLen = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replaceFirst("Content-Length: \\d+", "Content-Length: banana")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(Warc.parseRecords(badLen ++ good).isEmpty)
    assert(Warc.parseRecords(good ++ badLen).map(_.url) ===
      Seq("http://h.example/ok"))

    // response block whose HTTP head never terminates (no CRLFCRLF inside
    // the block): record skipped, scan continues at the declared boundary
    val headless = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://h.example/bad\r\nContent-Length: 10\r\n\r\n" +
      "0123456789\r\n\r\n").getBytes
    assert(Warc.parseRecords(headless).isEmpty)
    assert(Warc.parseRecords(headless ++ good).map(_.url) ===
      Seq("http://h.example/ok"))

    // block overrunning the file: skipped, no exception
    assert(Warc.parseRecords(good.dropRight(20)).isEmpty)

    // gzip bytes fail loudly instead of parsing to zero records
    intercept[IllegalArgumentException] {
      Warc.parseRecords(Parse.gzip(good))
    }
  }

  test(".warc.gz reads transparently; real-web HTML extracts full link set") {
    import spark.implicits._
    // an archive captured elsewhere: single quotes, unquoted attrs,
    // reordered attributes, <base href> — nothing the synthetic web emits
    val html =
      """<html><head><base href='/r/'></head><body>
        |<a class=m href='/abs.html'>A</a>
        |<a href=rel.html>B</a>
        |<img alt='cap' src=i.png>
        |</body></html>""".stripMargin
    val body = html.getBytes
    val rec = Warc.renderRecord("http://ext.example/page", "text/html",
      Map("content-length" -> body.length.toString), body,
      "2024-01-01T00:00:00Z")
    val dir = Files.createTempDirectory("warc-gz").toString
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/a.warc.gz"))
    out.write(rec); out.close()

    val rows = Warc.read(spark, dir, "wgz").collect()
    assert(rows.length === 1)
    val po = Parse.page(rows.head.url, rows.head.contentType,
      rows.head.headers, rows.head.content, rows.head.contentLength)
    assert(po.status === Parse.StatusOk)
    assert(po.outlinks === Map(
      "http://ext.example/abs.html" -> "A",
      "http://ext.example/r/rel.html" -> "B",
      "http://ext.example/r/i.png" -> "cap"))
  }

  test("mixed-format archive: JSON/XML/plain/PDF records all contribute " +
    "text through the shared parse (no silent non-HTML drop)") {
    import spark.implicits._
    def rec(url: String, ct: String, body: Array[Byte]) =
      Warc.renderRecord(url, ct,
        Map("content-length" -> body.length.toString), body,
        "2024-01-01T00:00:00Z")
    val pdf = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("%PDF-1.1\n1 0 obj <</Length 22>> stream\n".getBytes)
      bos.write("BT (archived pdf) Tj ET\nendstream endobj\n%%EOF\n".getBytes)
      bos.toByteArray
    }
    val all =
      rec("http://m.example/d.json", "application/json",
        """{"body":"archived json","next":"http://m.example/n"}"""
          .getBytes) ++
        rec("http://m.example/f.xml", "application/rss+xml",
          "<rss><item><title>archived xml</title></item></rss>".getBytes) ++
        rec("http://m.example/t.txt", "text/plain", "archived text".getBytes) ++
        rec("http://m.example/doc.pdf", "application/pdf", pdf) ++
        rec("http://m.example/img.png", "image/png",
          Array[Byte](1, 2, 3))
    val dir = Files.createTempDirectory("warc-mixed").toString
    val fos = new java.io.FileOutputStream(s"$dir/mixed.warc")
    fos.write(all); fos.close()

    val parsed = Warc.read(spark, dir, "wmix").collect().map { r =>
      r.url -> Parse.page(r.url, r.contentType, r.headers, r.content,
        r.contentLength)
    }.toMap
    assert(parsed("http://m.example/d.json").text === "archived json")
    assert(parsed("http://m.example/d.json").outlinks.keySet ===
      Set("http://m.example/n"))
    assert(parsed("http://m.example/f.xml").text === "archived xml")
    assert(parsed("http://m.example/t.txt").text === "archived text")
    assert(parsed("http://m.example/doc.pdf").text === "archived pdf")
    // payload types still take the payload path, not the text path
    assert(parsed("http://m.example/img.png").status ===
      Parse.StatusNotParsed)
  }

  test("splittable .warc.gz: member boundaries found, ranges chunked, " +
    "read spreads over >1 task, records match the whole-file read") {
    import spark.implicits._
    // Common Crawl convention: ONE GZIP MEMBER PER RECORD
    val n = 40
    val recs = (1 to n).map { i =>
      Parse.gzip(Warc.renderRecord(s"http://sp.example/p$i",
        "text/html",
        Map("content-length" -> "34"),
        // embed gzip-magic-like bytes in bodies to exercise validation
        (s"<a href='/n${i + 1}.html'>x</a>" + "ZZZ")
          .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
        "2024-01-01T00:00:00Z"))
    }
    val all = recs.reduce(_ ++ _)
    val dir = Files.createTempDirectory("warc-split").toString
    val fos = new java.io.FileOutputStream(s"$dir/multi.warc.gz")
    fos.write(all); fos.close()

    // boundary scan finds exactly the member starts
    val offsets = Warc.memberOffsets(all)
    val expected = recs.map(_.length.toLong).scanLeft(0L)(_ + _).dropRight(1)
    assert(offsets === expected)

    // chunking: small target -> several ranges covering [0, len) exactly
    val ranges = Warc.rangesOf("f", offsets, all.length.toLong,
      targetChunkBytes = all.length / 5L)
    assert(ranges.length > 1)
    assert(ranges.head.start === 0L && ranges.last.end === all.length.toLong)
    assert(ranges.sliding(2).forall {
      case Seq(a, b) => a.end == b.start
      case _ => true
    })

    // the distributed read: same records as the whole-file path, >1 task
    val split = Warc.readSplittable(spark, dir, "wsp",
      targetChunkBytes = all.length / 5L)
    assert(split.rdd.getNumPartitions > 1)
    val a = split.collect().map(r => (r.url, r.content.toSeq)).sortBy(_._1)
    val b = Warc.read(spark, dir, "wsp").collect()
      .map(r => (r.url, r.content.toSeq)).sortBy(_._1)
    assert(a.length === n)
    assert(a.toSeq === b.toSeq)
  }

  test("splittable read keeps plain .warc files in a mixed directory " +
    "(no silent drop)") {
    import spark.implicits._
    def body(s: String) =
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    def rec(url: String, b: Array[Byte]) =
      Warc.renderRecord(url, "text/html",
        Map("content-length" -> b.length.toString), b,
        "2024-01-01T00:00:00Z")
    val dir = Files.createTempDirectory("warc-mixed").toString
    val gz = (1 to 5)
      .map(i => Parse.gzip(rec(s"http://mx.example/gz$i", body(s"<p>g$i</p>"))))
      .reduce(_ ++ _)
    val fos = new java.io.FileOutputStream(s"$dir/a.warc.gz")
    fos.write(gz); fos.close()
    val plain = (1 to 3)
      .map(i => rec(s"http://mx.example/pl$i", body(s"<p>p$i</p>")))
      .reduce(_ ++ _)
    val fos2 = new java.io.FileOutputStream(s"$dir/b.warc")
    fos2.write(plain); fos2.close()
    val got = Warc.readSplittable(spark, dir, "mx").collect()
      .map(_.url).toSet
    val want = ((1 to 5).map(i => s"http://mx.example/gz$i") ++
      (1 to 3).map(i => s"http://mx.example/pl$i")).toSet
    assert(got === want, s"missing=${want.diff(got)}")
  }

  test("streaming ingestion: archives landing in a directory stream " +
    "through the shared parse, exactly once per file, with URL dedup") {
    import spark.implicits._
    def rec(url: String, body: String) =
      Warc.renderRecord(url, "text/html",
        Map("content-length" -> body.getBytes.length.toString),
        body.getBytes, "2024-01-01T00:00:00Z")
    val dir = Files.createTempDirectory("warc-stream").toString
    val ckpt = Files.createTempDirectory("warc-stream-ckpt").toString
    // file 1 present before the stream starts
    val f1 = new java.io.FileOutputStream(s"$dir/a1.warc")
    f1.write(rec("http://st.example/p1", "<p>one</p>") ++
      rec("http://st.example/p2", "<p>two</p>")); f1.close()

    val q = Warc.readStream(spark, dir, "ws")
      .dropDuplicates("urlHash") // streaming URL-seen gate (stateful)
      .select("url")
      .writeStream.format("memory").queryName("warc_stream")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT url FROM warc_stream").as[String]
        .collect().sorted.toSeq ===
        Seq("http://st.example/p1", "http://st.example/p2"))
      // file 2 lands mid-stream: one NEW record + one DUPLICATE of p1,
      // which the stateful dedup must drop
      val f2 = new java.io.FileOutputStream(s"$dir/a2.warc")
      f2.write(rec("http://st.example/p3", "<p>three</p>") ++
        rec("http://st.example/p1", "<p>one again</p>")); f2.close()
      q.processAllAvailable()
      val urls = spark.sql("SELECT url FROM warc_stream").as[String]
        .collect().sorted.toSeq
      assert(urls === Seq("http://st.example/p1", "http://st.example/p2",
        "http://st.example/p3"), s"got $urls")
    } finally q.stop()
  }

  test("O4: salted host buckets spread hosts uniformly (fetch randomization)") {
    // the reference randomizes mapper keys so one huge host cannot
    // monopolize reducers (FetcherJob.java:82-95); our analog is the
    // salted host-hash bucket. Gate: 3000 hosts over 64 buckets land
    // within 3x of uniform occupancy, and a host's bucket is stable.
    val counts = new Array[Int](64)
    (0 until 3000).foreach { i =>
      counts(Keys.bucketOf(SyntheticWeb.hostName(i), 64)) += 1
    }
    val expected = 3000.0 / 64
    assert(counts.min > 0, "empty bucket")
    assert(counts.max < expected * 3, s"skewed buckets: max=${counts.max}")
    assert(Keys.bucketOf("www.test-1.example", 64) ===
      Keys.bucketOf("www.test-1.example", 64))
  }
}
