package graft.crawl

import graft.core.{FetchOutcome, XxHash64}

/** Deterministic fake web — the test/bench substrate, modeled on the
  * reference's benchmark testbed (reference: tools/proxy/FakeHandler.java:46-140
  * — host/page pools with configurable fan-out; tools/proxy/DelayHandler.java:43-66
  * — seeded response delays; tools/Benchmark.java:47-60 — seeds
  * `http://www.test-<i>.com/`).
  *
  * Every property of every URL (status, delay, outlinks, image bytes,
  * caption) is a pure function of the URL string, so any executor — and the
  * single-threaded simulator oracle — sees the identical web with no shared
  * state. No wall clock, no RNG state.
  */
final case class WebConfig(
    numHosts: Int = 20,
    pagesPerHost: Int = 50,
    fanout: Int = 6, // page outlinks per page
    imagesPerPage: Int = 3,
    maxDelayMs: Int = 200,
    crawlDelayMs: Long = 50L, // politeness budget per host
    maxConcurrent: Int = 1, // concurrent fetches per host
    imgMinPx: Int = 16, // image payload size range (bench uses 64-160:
    imgPxRange: Int = 33) // realistic crawl payloads, compute-dominant)

sealed trait WebContent
final case class HtmlPage(outlinks: Map[String, String]) extends WebContent
final case class ImageFile(bytes: Array[Byte], w: Int, h: Int, fmt: String,
    caption: String, phash: Long) extends WebContent
case object NotFound extends WebContent
final case class Redirect(to: String, permanent: Boolean) extends WebContent
case object ServerError extends WebContent // transient -> retry

object SyntheticWeb {

  def hostName(i: Int): String = s"www.test-$i.example"
  def seedUrl(i: Int): String = s"http://${hostName(i)}/page0.html"
  def pageUrl(host: Int, page: Int): String =
    s"http://${hostName(host)}/page$page.html"
  def imageUrl(host: Int, page: Int, k: Int, fmt: String): String =
    s"http://${hostName(host)}/img${page}_$k.$fmt"
  def privateUrl(host: Int, page: Int): String =
    s"http://${hostName(host)}/private/page$page.html"

  def seeds(cfg: WebConfig): Seq[String] =
    (0 until cfg.numHosts).map(seedUrl)

  private val HostRe = """http://www\.test-(\d+)\.example(/.*)""".r
  private val PageRe = """/page(\d+)\.html""".r
  private val PrivateRe = """/private/page(\d+)\.html""".r
  private val ImgRe = """/img(\d+)_(\d+)\.(png|jpeg)""".r

  private def h64(url: String): Long = XxHash64.hashUtf8(url, 1234567890L)

  /** Per-host robots: every k-th host disallows /private/. Deterministic
    * robots "file" — the fetcher consults this through its robots cache.
    */
  def robotsDisallows(host: String): Seq[String] = host match {
    case h if h.startsWith("www.test-") =>
      val i = h.stripPrefix("www.test-").stripSuffix(".example")
      if (i.nonEmpty && i.forall(_.isDigit) && i.toInt % 7 == 3)
        Seq("/private/")
      else Nil
    case _ => Nil
  }

  def robotsAllowed(url: String): Boolean = {
    val host = graft.core.Urls.host(url)
    val path = graft.core.Urls.pathOf(url)
    !robotsDisallows(host).exists(path.startsWith)
  }

  /** Deterministic fetch delay for a URL (DelayHandler analog). */
  def delayMs(url: String, cfg: WebConfig): Long =
    math.floorMod(h64(url), cfg.maxDelayMs.toLong) + 1

  /** Image spec for an image URL: size, format, caption, pixels-seed. */
  def imageSpec(url: String, cfg: WebConfig): (Int, Int, String, String, Long) = {
    val h = h64(url)
    val w = cfg.imgMinPx + math.floorMod(h >>> 8, cfg.imgPxRange.toLong).toInt
    val ht = cfg.imgMinPx + math.floorMod(h >>> 16, cfg.imgPxRange.toLong).toInt
    val fmt = if (url.endsWith(".png")) "png" else "jpeg"
    val host = graft.core.Urls.host(url)
    val caption = f"caption ${h & 0xFFFFFFFFL}%08x of $host"
    (w, ht, fmt, caption, h)
  }

  /** The whole web, as one pure function. */
  def content(url: String, cfg: WebConfig): WebContent = url match {
    case HostRe(hostIdxS, path) =>
      val hostIdx = hostIdxS.toInt
      if (hostIdx >= cfg.numHosts) NotFound
      else path match {
        case PageRe(pageS) =>
          val page = pageS.toInt
          if (page >= cfg.pagesPerHost) NotFound
          else pageContent(url, hostIdx, page, cfg)
        case PrivateRe(pageS) =>
          // exists, but robots-disallowed on some hosts; plain page content
          val page = pageS.toInt
          if (page >= cfg.pagesPerHost) NotFound
          else HtmlPage(Map(pageUrl(hostIdx, page) -> "back"))
        case ImgRe(_, _, _) => imageContent(url, cfg)
        case _ => NotFound
      }
    case _ => NotFound
  }

  private def pageContent(url: String, hostIdx: Int, page: Int,
      cfg: WebConfig): WebContent = {
    val h = h64(url)
    // deterministic status mix (FakeHandler has none; we add the protocol
    // outcomes the reference's FetcherReducer dispatch handles,
    // FetcherReducer.java:557-605)
    math.floorMod(h, 100L) match {
      case m if m < 80 => HtmlPage(outlinksOf(hostIdx, page, h, cfg))
      case m if m < 84 =>
        Redirect(pageUrl(hostIdx, (page + 1) % cfg.pagesPerHost),
          permanent = m >= 82)
      case m if m < 90 => NotFound
      case m if m < 95 => ServerError
      case _ => HtmlPage(outlinksOf(hostIdx, page, h, cfg))
    }
  }

  private def imageContent(url: String, cfg: WebConfig): WebContent = {
    val (w, ht, fmt, caption, seed) = imageSpec(url, cfg)
    val px = ImageCodec.pixels(seed, w, ht)
    val bytes = ImageCodec.encode(px, w, ht, fmt)
    ImageFile(bytes, w, ht, fmt, caption, ImageCodec.phash(px, w, ht))
  }

  /** Outlink pool (FakeHandler UNIQUE-mode analog): same-host pages, one
    * cross-host page, image links, occasionally a /private/ page.
    */
  private def outlinksOf(hostIdx: Int, page: Int, h: Long, cfg: WebConfig)
      : Map[String, String] = {
    val links = scala.collection.mutable.LinkedHashMap[String, String]()
    var q = 0
    while (q < cfg.fanout - 1) {
      val dst = math.floorMod(page * 7L + q * 13L + (h >>> (q % 8)),
        cfg.pagesPerHost.toLong).toInt
      links(pageUrl(hostIdx, dst)) = s"link$q"
      q += 1
    }
    val crossHost = math.floorMod(hostIdx + page + 1L, cfg.numHosts.toLong).toInt
    val crossPage = math.floorMod(h >>> 32, cfg.pagesPerHost.toLong).toInt
    links(pageUrl(crossHost, crossPage)) = "cross"
    if (math.floorMod(h, 11L) == 0)
      links(privateUrl(hostIdx, page)) = "private"
    var k = 0
    while (k < cfg.imagesPerPage) {
      val fmt = if (((h >>> (8 + k)) & 1L) == 1L) "png" else "jpeg"
      links(imageUrl(hostIdx, page, k, fmt)) = s"img$k"
      k += 1
    }
    links.toMap
  }

  /** Map content to a fetch outcome code (FetcherReducer status dispatch). */
  def outcomeOf(c: WebContent): Int = c match {
    case _: HtmlPage | _: ImageFile => FetchOutcome.Success
    case NotFound => FetchOutcome.Gone
    case ServerError => FetchOutcome.RetryTransient
    case Redirect(_, true) => FetchOutcome.RedirPerm
    case Redirect(_, false) => FetchOutcome.RedirTemp
  }
}
