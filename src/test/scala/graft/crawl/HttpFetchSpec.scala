package graft.crawl

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.spark
import graft.core.{CrawlStatus, FetchOutcome}

/** The real HTTP protocol implementation (T3/T6/T7 over live sockets)
  * tested against an in-process HTTP server — the reference's own testbed
  * pattern (tools/proxy/TestbedProxy.java, FakeHandler.java:46-140).
  * Covers: robots denial without a request, redirect surfacing, 404/5xx
  * status mapping, gzip transport, http.content.limit truncation,
  * per-request timeout (hung-request watchdog), politeness wall-clock
  * gaps, and a full crawl-loop integration with the same ordering
  * assertions as the synthetic web.
  */
class HttpFetchSpec extends AnyFunSuite with BeforeAndAfterAll {
  import spark.implicits._

  private val requests = new ConcurrentLinkedQueue[(String, Long)]()
  private var server: HttpServer = _
  private var base: String = _

  private def send(x: HttpExchange, code: Int, body: Array[Byte],
      headers: (String, String)*): Unit = {
    headers.foreach { case (k, v) => x.getResponseHeaders.set(k, v) }
    x.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
    if (body.nonEmpty) x.getResponseBody.write(body)
    x.close()
  }

  private def page(html: String): Array[Byte] =
    html.getBytes(StandardCharsets.UTF_8)

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    val port = server.getAddress.getPort
    base = s"http://127.0.0.1:$port"

    server.createContext("/", (x: HttpExchange) => {
      val path = x.getRequestURI.getPath
      requests.add((path, System.currentTimeMillis()))
      path match {
        case "/robots.txt" =>
          send(x, 200, page(
            "# testbed rules\nUser-agent: other-bot\nDisallow: /\n\n" +
              "User-agent: *\nDisallow: /private/\nDisallow: /also-private\n"),
            "Content-Type" -> "text/plain")
        case "/" =>
          // real-web HTML: single-quoted, unquoted, reordered attributes
          send(x, 200, page(
            """<html><body>
              |<a href='/a.html'>A</a>
              |<a href=/big.html>big</a>
              |<img alt='cap' src=/i.png>
              |</body></html>""".stripMargin),
            "Content-Type" -> "text/html; charset=utf-8")
        case "/a.html" =>
          send(x, 200, page(
            """<a href="/private/secret.html">s</a>
              |<a href='/redir'>r</a><a href='/permredir'>pr</a>
              |<a href=/gone>g</a><a href=/err>e</a><a href=/slow>sl</a>
              |<a href='/gz.html'>z</a>""".stripMargin),
            "Content-Type" -> "text/html")
        case "/gz.html" =>
          val body = Parse.gzip(page(
            "<html><a href='/a.html'>back</a> gzipped body</html>"))
          send(x, 200, body, "Content-Type" -> "text/html",
            "Content-Encoding" -> "gzip")
        case "/big.html" =>
          // 4000 bytes declared and sent; the fetcher keeps only 500
          send(x, 200, page("<html>" + "x" * 3987 + "</html>"),
            "Content-Type" -> "text/html")
        case "/i.png" =>
          send(x, 200, ImageCodec.encode(ImageCodec.pixels(7L, 24, 16),
            24, 16, "png"), "Content-Type" -> "image/png")
        case "/redir" =>
          send(x, 302, Array.emptyByteArray, "Location" -> "/a.html")
        case "/permredir" =>
          send(x, 301, Array.emptyByteArray,
            "Location" -> s"$base/a.html")
        case "/gone" => send(x, 404, page("nope"))
        case "/ratelimited" => send(x, 429, page("slow down"))
        case "/reqtimeout" => send(x, 408, page("too late"))
        case "/err" => send(x, 500, page("boom"))
        case "/slow" =>
          Thread.sleep(1500) // beyond the 300ms read timeout
          send(x, 200, page("<html>late</html>"),
            "Content-Type" -> "text/html")
        case _ => send(x, 404, Array.emptyByteArray)
      }
    })
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def fetcher(limit: Int = 500) = new HttpFetcher(HttpConfig(
    contentLimit = limit, connectTimeoutMs = 2000, readTimeoutMs = 300,
    requestBudgetMs = 5000))

  test("protocol mapping: 2xx/redirect/4xx/5xx/timeout -> RawResponse") {
    val f = fetcher()
    f.fetch(s"$base/") match {
      case RawPage(ct, headers, bytes, declared) =>
        assert(ct.startsWith("text/html"))
        assert(declared === bytes.length.toLong)
        assert(headers.contains("content-length"))
      case other => fail(s"got $other")
    }
    assert(f.fetch(s"$base/redir") ===
      RawRedirect(s"$base/a.html", permanent = false))
    assert(f.fetch(s"$base/permredir") ===
      RawRedirect(s"$base/a.html", permanent = true))
    assert(f.fetch(s"$base/gone") === RawNotFound)
    assert(f.fetch(s"$base/err") === RawServerError)
    assert(f.fetch(s"$base/slow") === RawServerError) // T6 watchdog
  }

  test("gzip transport: wire bytes stay encoded; shared parse decodes") {
    val f = fetcher()
    val RawPage(ct, headers, bytes, declared) =
      f.fetch(s"$base/gz.html"): @unchecked
    assert(headers.get("content-encoding").contains("gzip"))
    val po = Parse.page(s"$base/gz.html", ct, headers, bytes, declared)
    assert(po.status === Parse.StatusOk)
    assert(po.outlinks.keySet === Set(s"$base/a.html"))
    assert(po.text.contains("gzipped body"))
  }

  test("http.content.limit: body cut at the limit surfaces as TRUNCATED") {
    val f = fetcher(limit = 500)
    val RawPage(ct, headers, bytes, declared) =
      f.fetch(s"$base/big.html"): @unchecked
    assert(bytes.length === 500 && declared === 4000L)
    val po = Parse.page(s"$base/big.html", ct, headers, bytes, declared)
    assert(po.status === Parse.StatusTruncated)
  }

  test("robots parsing: group selection, Allow/Disallow precedence, " +
    "allow-all default") {
    val rules = fetcher().robotsRules(s"$base/x.html")
    assert(rules.disallows === Seq("/private/", "/also-private"))
    assert(!rules.isAllowed("/private/x.html"))
    assert(rules.isAllowed("/public.html"))
    // group matching: our agent token beats *, other-bot group ignored
    val txt = "User-agent: graft-crawler\nDisallow: /only-mine\n\n" +
      "User-agent: *\nDisallow: /everyone\n"
    assert(HttpFetcher.parseRobots(txt, "graft-crawler/0.1").disallows ===
      Seq("/only-mine"))
    assert(HttpFetcher.parseRobots(txt, "SomeOtherBot/2").disallows ===
      Seq("/everyone"))
    assert(HttpFetcher.parseRobots("User-agent: *\nDisallow:\n", "x") ===
      RobotRules.AllowAll)
    assert(HttpFetcher.parseRobots("", "x") === RobotRules.AllowAll)
    // RFC 9309 precedence: longest match wins; equal length -> Allow
    val mixed = HttpFetcher.parseRobots(
      "User-agent: *\nDisallow: /shop/\nAllow: /shop/public/\n" +
        "Allow: /tie\nDisallow: /tie\n", "x")
    assert(!mixed.isAllowed("/shop/cart.html"))
    assert(mixed.isAllowed("/shop/public/item.html"))
    assert(mixed.isAllowed("/tiebreak.html")) // equal-length tie -> allow
    assert(mixed.isAllowed("/elsewhere.html"))
  }

  test("4xx mapping: 429/408 are transient (retry), not Gone") {
    val f = fetcher()
    assert(f.fetch(s"$base/ratelimited") === RawServerError)
    assert(f.fetch(s"$base/reqtimeout") === RawServerError)
    assert(f.fetch(s"$base/gone") === RawNotFound) // 404 stays Gone
  }

  test("robots group selection: longest agent-token match beats an " +
    "earlier generic group (RFC 9309)") {
    // a generic `bot` group FIRST in the file must not shadow the more
    // specific `graft-crawler` group below it
    val txt = "User-agent: bot\nDisallow: /generic\n\n" +
      "User-agent: graft-crawler\nDisallow: /specific\n\n" +
      "User-agent: *\nDisallow: /star\n"
    assert(HttpFetcher.parseRobots(txt, "graft-crawler/0.1").disallows ===
      Seq("/specific"))
    // an agent matching only the generic token still gets that group
    assert(HttpFetcher.parseRobots(txt, "somebot/9").disallows ===
      Seq("/generic"))
  }

  test("robots Crawl-delay: parsed into crawlDelayMs, fractional ok, " +
    "group-scoped") {
    val txt = "User-agent: graft-crawler\nCrawl-delay: 0.25\n" +
      "Disallow: /x\n\nUser-agent: *\nCrawl-delay: 7\n"
    assert(HttpFetcher.parseRobots(txt, "graft-crawler/0.1").crawlDelayMs
      === 250L)
    assert(HttpFetcher.parseRobots(txt, "other/1").crawlDelayMs === 7000L)
    assert(HttpFetcher.parseRobots("User-agent: *\nDisallow: /a\n", "x")
      .crawlDelayMs === -1L)
    // junk values are ignored, not crashes
    assert(HttpFetcher.parseRobots(
      "User-agent: *\nCrawl-delay: soon\n", "x").crawlDelayMs === -1L)
  }

  test("robots Crawl-delay feeds the wall-clock politeness floor") {
    // second server = distinct authority, so the JVM-global robots cache
    // entry is exclusively this test's
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new ConcurrentLinkedQueue[Long]()
    srv.createContext("/", (x: HttpExchange) => {
      if (x.getRequestURI.getPath == "/robots.txt")
        send(x, 200, page("User-agent: *\nCrawl-delay: 0.2\n"),
          "Content-Type" -> "text/plain")
      else {
        hits.add(System.currentTimeMillis())
        send(x, 200, page("<html>ok</html>"), "Content-Type" -> "text/html")
      }
    })
    srv.start()
    try {
      val b2 = s"http://127.0.0.1:${srv.getAddress.getPort}"
      val f = new HttpFetcher(HttpConfig(readTimeoutMs = 2000)) // no cfg gap
      assert(f.robotsRules(s"$b2/p.html").crawlDelayMs === 200L)
      f.fetch(s"$b2/p1.html"); f.fetch(s"$b2/p2.html")
      val times = hits.toArray(Array.empty[java.lang.Long]).map(_.longValue)
      assert(times.length === 2)
      assert(times(1) - times(0) >= 150,
        s"gap ${times(1) - times(0)}ms under the robots-declared 200ms")
    } finally srv.stop(0)
  }

  test("LruMap: bounded, access-ordered eviction") {
    val m = new HttpFetcher.LruMap[String, Int](2)
    m.putIfAbsent("a", 1); m.putIfAbsent("b", 2)
    m.get("a") // touch a -> b is now eldest
    m.putIfAbsent("c", 3) // evicts b
    assert(m.get("a").contains(1))
    assert(m.get("b").isEmpty)
    assert(m.get("c").contains(3))
    assert(m.size === 2)
    // compute claims through the same bound
    m.compute("d")(_ => 4)
    assert(m.size === 2)
  }

  test("SlotMap: sweep over the soft bound never drops a pending slot " +
    "(politeness survives >softMax active hosts)") {
    val m = new HttpFetcher.SlotMap(4)
    val now = 1000000L
    // hot host claims a slot 500 ms in the FUTURE
    val hotSlot = m.claim("hot.example", now, 500L)
    assert(hotSlot === now)
    val hotSlot2 = m.claim("hot.example", now, 500L)
    assert(hotSlot2 === now + 500L) // pending: in the future
    // flood with more hosts than the soft bound — triggers the sweep
    (1 to 10).foreach(i => m.claim(s"h$i.example", now, 10L))
    // the hot host's pending slot survived: the next claim serializes
    // AFTER it, not at `now` (an LRU would have evicted it)
    val hotSlot3 = m.claim("hot.example", now, 500L)
    assert(hotSlot3 === hotSlot2 + 500L,
      s"pending slot was evicted (claimed $hotSlot3)")
    // entries whose slot + maxGap is in the past DO sweep once over bound
    val later = now + 100000L
    (1 to 10).foreach(i => m.claim(s"late$i.example", later, 10L))
    assert(m.size <= 12, s"stale slots not swept: ${m.size}")
  }

  test("politeness floor holds under CONCURRENT same-host callers " +
    "(slot claim is atomic)") {
    val f = new HttpFetcher(HttpConfig(minHostGapMs = 100,
      readTimeoutMs = 2000))
    requests.clear()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val futures = (1 to 4).map(_ => pool.submit(new Runnable {
      def run(): Unit = { f.fetch(s"$base/gone"); () }
    }))
    futures.foreach(_.get())
    pool.shutdown()
    val times = requests.toArray(Array.empty[(String, Long)])
      .map(_._2).sorted
    assert(times.length === 4)
    times.sliding(2).foreach { case Array(a, b) =>
      assert(b - a >= 60, s"concurrent gap ${b - a}ms under the 100ms floor")
    }
  }

  test("politeness sleep does not consume the request budget " +
    "(gap > budget still fetches)") {
    // regression: the T6 deadline was computed BEFORE politeWait, so a
    // politeness gap >= requestBudgetMs pre-exhausted the budget and the
    // body read failed on every same-host fetch after the first
    val f = new HttpFetcher(HttpConfig(minHostGapMs = 700,
      requestBudgetMs = 600, readTimeoutMs = 2000))
    f.fetch(s"$base/")
    f.fetch(s"$base/") match { // politeWait sleeps ~700ms > 600ms budget
      case RawPage(_, _, bytes, _) => assert(bytes.nonEmpty)
      case other => fail(s"second same-host fetch failed: $other")
    }
  }

  test("politeness floor: same-host requests observe minHostGapMs") {
    val f = new HttpFetcher(HttpConfig(minHostGapMs = 80,
      readTimeoutMs = 2000))
    requests.clear()
    f.fetch(s"$base/gone"); f.fetch(s"$base/gone"); f.fetch(s"$base/gone")
    val times = requests.toArray(Array.empty[(String, Long)]).map(_._2)
    assert(times.length === 3)
    times.sliding(2).foreach { case Array(a, b) =>
      assert(b - a >= 60, s"gap ${b - a}ms under the 80ms floor")
    }
  }

  test("crawl loop over live HTTP: robots denial without a request, " +
    "status mapping, ordering, image payload with caption") {
    val dir = Files.createTempDirectory("http-crawl").toString
    val p = new CrawlPipeline(spark, dir,
      WebConfig(crawlDelayMs = 10L), numBuckets = 4,
      fetcherOverride = new HttpFetcher(HttpConfig(contentLimit = 2000,
        connectTimeoutMs = 2000, readTimeoutMs = 300,
        requestBudgetMs = 5000)))
    p.inject(Seq(s"$base/"), 1700000000000L)
    requests.clear()
    val frontier = p.runBatches(depth = 3, topN = 50, maxPerHost = 50)
      .collect().map(r => r.url -> r).toMap

    // robots: the private URLs were discovered, marked Gone, NEVER hit
    val hit = requests.toArray(Array.empty[(String, Long)]).map(_._1).toSet
    assert(!hit.contains("/private/secret.html"))
    assert(frontier(s"$base/private/secret.html").status ===
      CrawlStatus.Gone)

    // status mapping end-to-end
    assert(frontier(s"$base/").status === CrawlStatus.Fetched)
    assert(frontier(s"$base/a.html").status === CrawlStatus.Fetched)
    assert(frontier(s"$base/gz.html").status === CrawlStatus.Fetched)
    assert(frontier(s"$base/gone").status === CrawlStatus.Gone)
    assert(frontier(s"$base/err").status === CrawlStatus.Retry)
    assert(frontier(s"$base/slow").status === CrawlStatus.Retry)
    assert(frontier(s"$base/redir").status === CrawlStatus.RedirTemp)
    val pr = frontier(s"$base/permredir")
    assert(pr.status === CrawlStatus.RedirPerm)
    assert(pr.reprUrl === s"$base/a.html")
    // truncated page fetched but contributed no outlinks
    assert(frontier(s"$base/big.html").status === CrawlStatus.Fetched)

    // ordering parity (same contract as the synthetic web): within the
    // single host queue, fetchStart order == (score desc, url asc)
    val b2 = spark.read.parquet(s"$dir/batches/b2/fetched")
      .as[FetchResult].collect().sortBy(_.fetchStart)
    val expected = b2.sortBy(r => (-r.srcScore, r.url)).map(_.url).toSeq
    assert(b2.map(_.url).toSeq === expected)

    // the image payload decoded over live HTTP with its alt caption
    val payload = spark.read.parquet(s"$dir/batches/b2/payload").collect()
    assert(payload.length === 1)
    val row = payload.head
    assert(row.getAs[String]("image_id") === s"$base/i.png")
    assert(row.getAs[Int]("w") === 24 && row.getAs[Int]("h") === 16)
    assert(row.getAs[String]("caption") === "cap")
  }
}
