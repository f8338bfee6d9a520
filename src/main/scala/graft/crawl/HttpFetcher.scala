package graft.crawl

import java.io.{ByteArrayOutputStream, InputStream}
import java.net.{HttpURLConnection, SocketTimeoutException, URI}

import graft.core.Urls

/** HTTP protocol configuration (reference lib-http property names,
  * protocol-httpclient/.../HttpBase.java:60-115):
  *  - `contentLimit`   = http.content.limit — bytes kept per response; a
  *    longer body is cut there and surfaces as a TRUNCATED parse (the
  *    declared Content-Length stays larger), exactly the reference's
  *    isTruncated path;
  *  - `connectTimeoutMs`/`readTimeoutMs` = http.timeout — per-socket-op
  *    stall bounds;
  *  - `requestBudgetMs` — T6 hung-request watchdog: total wall budget for
  *    one request (reference FetcherReducer.java:905-909 kills fetches
  *    that outlive `mapred.task.timeout/2`); a response that trickles
  *    bytes forever is aborted mid-read;
  *  - `minHostGapMs` — a REAL-time politeness floor between requests to
  *    the same host, enforced inside the fetcher (the pipeline's
  *    virtual-clock lanes already serialize a host's queue; this adds the
  *    wall-clock gap a live server observes);
  *  - `acceptGzip` — offer Accept-Encoding: gzip; bytes stay encoded on
  *    the wire row and the SHARED parse stage decodes them (same split as
  *    the synthetic protocol layer).
  */
final case class HttpConfig(
    contentLimit: Int = 1 << 20,
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 10000,
    requestBudgetMs: Long = 30000L,
    userAgent: String = "graft-crawler/0.1",
    acceptGzip: Boolean = true,
    minHostGapMs: Long = 0L)

/** A real HTTP [[Fetcher]] over `HttpURLConnection` (JDK-only, no added
  * dependencies) — the production implementation of the reference's
  * `Protocol` extension point (plugin lib-http; HttpBase.java:60-115).
  *
  * Semantics:
  *  - redirects are NOT followed: 301/308 -> RawRedirect(perm=true),
  *    302/303/307 -> RawRedirect(perm=false) — the crawl loop treats them
  *    as discoveries (T7) exactly like the synthetic web;
  *  - 404/410 and other 4xx -> RawNotFound (Gone);
  *  - 5xx, connect/read timeouts, budget overruns, IO errors ->
  *    RawServerError (RetryTransient — retried with backoff by updatedb);
  *  - robots.txt fetched once per authority per executor (bounded LRU
  *    cache; robots are per-HOST even under byDomain/byIP queue
  *    modes, matching RobotRulesParser's cache keying); a declared
  *    `Crawl-delay` raises the wall-clock politeness floor.
  *
  * The robots and politeness caches live on the companion object — one
  * per executor JVM, shared by every deserialized closure copy, never
  * shipped with the task.
  */
final class HttpFetcher(cfg: HttpConfig = HttpConfig()) extends Fetcher {

  private def robotsCache = HttpFetcher.robotsCache
  private def lastHitMs = HttpFetcher.lastHitMs

  /** Virtual-time cost of a request — unknown for a live server, so the
    * virtual politeness lanes advance by crawlDelay alone.
    */
  def delayMs(url: String): Long = 0L

  private def authorityOf(url: String): String = {
    val u = new URI(url)
    val port = if (u.getPort == -1) "" else s":${u.getPort}"
    s"${u.getScheme}://${u.getHost}$port"
  }

  def fetch(url: String): RawResponse = {
    var conn: HttpURLConnection = null
    try {
      politeWait(Urls.host(url), authorityOf(url))
      // the T6 budget clock starts AFTER the politeness sleep — a
      // Crawl-delay comparable to requestBudgetMs must not pre-exhaust
      // the budget and fail every same-host fetch after the first
      val deadlineNs = System.nanoTime() + cfg.requestBudgetMs * 1000000L
      conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
      conn.setInstanceFollowRedirects(false)
      conn.setConnectTimeout(cfg.connectTimeoutMs)
      conn.setReadTimeout(cfg.readTimeoutMs)
      conn.setRequestProperty("User-Agent", cfg.userAgent)
      if (cfg.acceptGzip) conn.setRequestProperty("Accept-Encoding", "gzip")
      val code = conn.getResponseCode
      code match {
        case c if c >= 200 && c < 300 =>
          val headers = headerMap(conn)
          val declared = headers.get("content-length")
            .flatMap(_.trim.toLongOption).getOrElse(-1L)
          val bytes = readBounded(conn.getInputStream, cfg.contentLimit,
            deadlineNs)
          RawPage(
            headers.getOrElse("content-type", "application/octet-stream"),
            headers, bytes,
            if (declared >= 0) declared else bytes.length.toLong)
        case 301 | 308 =>
          redirectOf(conn, url, perm = true)
        case 302 | 303 | 307 =>
          redirectOf(conn, url, perm = false)
        // 408/429 are transient (the server is rate-limiting or timed the
        // request out) — marking them Gone would permanently drop URLs a
        // polite retry would recover; route to RetryTransient backoff
        case 408 | 429 => RawServerError
        case c if c >= 400 && c < 500 => RawNotFound
        case _ => RawServerError
      }
    } catch {
      case _: SocketTimeoutException => RawServerError // T6: stalled request
      case _: java.io.IOException => RawServerError
      case _: IllegalArgumentException => RawNotFound // unparseable URL
      case _: java.net.URISyntaxException => RawNotFound
    } finally if (conn != null) conn.disconnect()
  }

  private def redirectOf(conn: HttpURLConnection, url: String,
      perm: Boolean): RawResponse =
    Option(conn.getHeaderField("Location"))
      .flatMap(loc => Urls.resolveOutlink(url, loc)) match {
      case Some(to) => RawRedirect(to, perm)
      case None => RawNotFound // redirect with no usable target
    }

  private def headerMap(conn: HttpURLConnection): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    conn.getHeaderFields.forEach { (k, vs) =>
      if (k != null && !vs.isEmpty) out += k.toLowerCase -> vs.get(0)
    }
    out.result()
  }

  /** Read at most `limit` bytes; abort (SocketTimeoutException) past the
    * total request budget — the T6 watchdog against trickling responses.
    */
  private def readBounded(in: InputStream, limit: Int, deadlineNs: Long)
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream(math.min(limit, 64 * 1024))
    val buf = new Array[Byte](8192)
    try {
      var remaining = limit
      var n = 0
      while (remaining > 0 && n != -1) {
        if (System.nanoTime() > deadlineNs)
          throw new SocketTimeoutException("request budget exhausted")
        n = in.read(buf, 0, math.min(buf.length, remaining))
        if (n > 0) { bos.write(buf, 0, n); remaining -= n }
      }
    } finally in.close()
    bos.toByteArray
  }

  /** Wall-clock politeness floor. The gap is the larger of the configured
    * `minHostGapMs` and the host's robots-declared Crawl-delay (consulted
    * from the CACHE only — `robotsRules` populates it; a bare `fetch`
    * call that never consulted robots pays just the configured floor).
    *
    * Race-free: each caller atomically CLAIMS the next allowed start slot
    * (`max(now, lastSlot + gap)`) under the map's lock, then sleeps until
    * its slot — two threads hitting one host serialize at `gap` spacing
    * instead of both reading a stale timestamp and firing together.
    */
  private def politeWait(host: String, authority: String): Unit = {
    // robots delay honored up to the fetcher.max.crawl.delay analog — an
    // unbounded Thread.sleep from a hostile robots.txt would stall an
    // executor task thread for hours
    val robotsGap = math.min(
      robotsCache.get(authority).map(_.crawlDelayMs).getOrElse(-1L),
      RobotRules.MaxRobotsDelayMs)
    val gap = math.max(cfg.minHostGapMs, robotsGap)
    if (gap <= 0) return
    val slot = lastHitMs.claim(host, System.currentTimeMillis(), gap)
    val wait = slot - System.currentTimeMillis()
    if (wait > 0) Thread.sleep(wait)
  }

  // ------------------------------------------------------------- robots

  def robotsRules(url: String): RobotRules = {
    val auth = authorityOf(url)
    robotsCache.get(auth) match {
      case Some(r) => r
      // fetch OUTSIDE the cache lock (a slow robots server must not
      // serialize every other authority's lookup); a concurrent duplicate
      // fetch is tolerated and putIfAbsent keeps the first result
      case None => robotsCache.putIfAbsent(auth, fetchRobots(auth))
    }
  }

  private def fetchRobots(authority: String): RobotRules = {
    var conn: HttpURLConnection = null
    try {
      conn = new URI(s"$authority/robots.txt").toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setInstanceFollowRedirects(true)
      conn.setConnectTimeout(cfg.connectTimeoutMs)
      conn.setReadTimeout(cfg.readTimeoutMs)
      conn.setRequestProperty("User-Agent", cfg.userAgent)
      if (conn.getResponseCode / 100 == 2) {
        val txt = new String(
          readBounded(conn.getInputStream, 512 * 1024,
            System.nanoTime() + cfg.requestBudgetMs * 1000000L),
          java.nio.charset.StandardCharsets.UTF_8)
        HttpFetcher.parseRobots(txt, cfg.userAgent)
      } else RobotRules.AllowAll // 404 etc.: reference default
    } catch {
      case _: Exception => RobotRules.AllowAll
    } finally if (conn != null) conn.disconnect()
  }
}

object HttpFetcher {

  /** Thread-safe bounded LRU (access-ordered `LinkedHashMap`) — the
    * executor-JVM caches below live for the executor's whole lifetime and
    * see millions of hosts at web scale; unbounded maps are a slow OOM.
    * (Reference bounds its HostDb cache the same way: Guava LRU,
    * `hostdb.lru.size`, host/HostDb.java:74-94.)
    */
  private[crawl] final class LruMap[K, V](maxEntries: Int) {
    private val m = new java.util.LinkedHashMap[K, V](64, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[K, V]) =
        this.size > maxEntries
    }
    def get(k: K): Option[V] = m.synchronized(Option(m.get(k)))
    def putIfAbsent(k: K, v: V): V = m.synchronized {
      val prev = m.get(k)
      if (prev == null) { m.put(k, v); v } else prev
    }
    def compute(k: K)(f: Option[V] => V): V = m.synchronized {
      val v = f(Option(m.get(k))); m.put(k, v); v
    }
    def size: Int = m.synchronized(m.size)
  }

  /** Per-host politeness slot map. NOT an LRU: plain LRU eviction could
    * drop a HOT host's still-pending slot once active hosts exceed the
    * bound, letting the next same-host request fire before its
    * minHostGapMs/Crawl-delay elapsed. Instead, when the soft bound is
    * exceeded, only entries whose slot can no longer constrain a future
    * claim (slot + largest-gap-seen already in the past) are swept — a
    * pending or recent slot is never lost, and the map size is bounded by
    * the number of hosts ACTIVE within one politeness window rather than
    * a fixed count.
    */
  private[crawl] final class SlotMap(softMax: Int) {
    private val m = new java.util.HashMap[String, Long]()
    private var maxGapSeen = 1L
    def claim(host: String, now: Long, gap: Long): Long = m.synchronized {
      if (gap > maxGapSeen) maxGapSeen = gap
      if (m.size > softMax) {
        val cutoff = now - maxGapSeen
        val it = m.entrySet().iterator()
        while (it.hasNext) if (it.next().getValue < cutoff) it.remove()
      }
      val slot = math.max(now, m.getOrDefault(host, 0L) + gap)
      m.put(host, slot)
      slot
    }
    def size: Int = m.synchronized(m.size)
  }

  // per-executor-JVM shared state: robots rules per authority (LRU —
  // eviction only re-fetches robots), last claimed request slot per host
  // (slot-aware sweep — eviction must never break politeness)
  private val robotsCache = new LruMap[String, RobotRules](8192)
  private val lastHitMs = new SlotMap(8192)

  /** Robots.txt group parser: consecutive `User-agent` lines open a
    * group; its `Allow`/`Disallow` values are path PREFIXES combined by
    * RobotRules with RFC 9309 longest-match precedence; `Crawl-delay`
    * (seconds, fractional ok) rides on the group and feeds the politeness
    * floor (reference RobotRulesParser.java:369-380 getCrawlDelay).
    *
    * Group selection is RFC 9309 §2.2.1: the group whose agent token is
    * the LONGEST match against our product token wins (a generic `bot`
    * group earlier in the file must not shadow a specific
    * `graft-crawler` group); ties break by file order; fall back to the
    * `*` group. (Reference wraps crawler-commons'
    * SimpleRobotRulesParser, RobotRulesParser.java:414-496 — prefix
    * semantics; `*`/`$` wildcards are not interpreted.)
    */
  private[crawl] def parseRobots(txt: String, userAgent: String)
      : RobotRules = {
    final case class Group(agents: List[String], allows: List[String],
        disallows: List[String], delayMs: Long)
    val groups = scala.collection.mutable.ArrayBuffer[Group]()
    var agents = List.empty[String]
    var allow = List.empty[String]
    var dis = List.empty[String]
    var delayMs = -1L
    var openAgents = false
    def flush(): Unit = {
      if (agents.nonEmpty)
        groups += Group(agents.reverse, allow.reverse, dis.reverse, delayMs)
      agents = Nil; allow = Nil; dis = Nil; delayMs = -1L
    }
    txt.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim.toLowerCase
        val value = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            if (!openAgents) flush()
            agents ::= value.toLowerCase
            openAgents = true
          case "disallow" =>
            if (value.nonEmpty) dis ::= value
            openAgents = false
          case "allow" =>
            if (value.nonEmpty) allow ::= value
            openAgents = false
          case "crawl-delay" =>
            value.toDoubleOption.filter(d => d >= 0 && d.isFinite)
              .foreach(d => delayMs = (d * 1000).toLong)
            openAgents = false
          case _ =>
            openAgents = false
        }
      }
    }
    flush()
    val ua = userAgent.toLowerCase
    val named = for {
      g <- groups.toSeq
      a <- g.agents
      if a != "*" && ua.contains(a)
    } yield (a.length, g)
    named.sortBy(-_._1).headOption.map(_._2) // stable sort: order breaks ties
      .orElse(groups.find(_.agents.contains("*")))
      .map(g => RobotRules(g.allows, g.disallows, g.delayMs))
      .getOrElse(RobotRules.AllowAll)
  }
}
