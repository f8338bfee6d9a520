package graft.crawl

import scala.collection.mutable

import graft.core.{CrawlStatus, FetchOutcome, Schedule, ScheduleConfig, Urls, XxHash64}

/** Single-threaded reference simulator — the parity oracle (SURVEY.md §5).
  *
  * Implements the crawl semantics independently of Spark: generate
  * selection (eligibility -> score desc, url asc -> per-host cap -> topN),
  * per-host politeness timeline, robots, schedule state machine, seen-set
  * growth, outlink scoring. The Spark pipeline must match its crawl
  * ordering and final URL-seen set under the same seed list + politeness
  * budget (north rule).
  */
final class Simulator(
    webCfg: WebConfig,
    scheduleCfg: ScheduleConfig = ScheduleConfig(),
    maxDepth: Int = 3,
    configs: graft.core.ConfigTrie = graft.core.ConfigTrie.empty,
    queueMode: String = QueueMode.ByHost,
    fetchTimelimitMs: Long = -1L) {

  final case class SimRow(
      url: String,
      var status: Int,
      var score: Float,
      var fetchTime: Long,
      var prevFetchTime: Long,
      var interval: Int,
      var retries: Int,
      var modifiedTime: Long,
      var signature: Option[Seq[Byte]],
      var distance: Int,
      var lastBatch: String,
      var reprUrl: String = "",
      var anchor: String = "")

  val frontier = mutable.LinkedHashMap[String, SimRow]() // url -> row
  /** (batchId, url, fetchStart) in fetch-start order — the crawl ordering. */
  val fetchLog = mutable.ArrayBuffer[(String, String, Long)]()

  def inject(seeds: Seq[String], now: Long): Unit =
    seeds.foreach { raw =>
      Urls.canonicalize(raw).filter(graft.core.UrlFilterChain.default.accepts)
        .foreach { u =>
          if (!frontier.contains(u))
            frontier(u) = SimRow(u, CrawlStatus.Unfetched, 1.0f, now, 0L,
              scheduleCfg.defaultIntervalSec, 0, 0L, None, 0, "")
        }
    }

  def generate(now: Long, topN: Int, maxPerHost: Int): Seq[SimRow] = {
    val eligible = frontier.values.filter { r =>
      val cfg = configs.configOrDefault(r.url)
      val effDepth =
        if (cfg.fetchDepth != Int.MaxValue) cfg.fetchDepth else maxDepth
      r.status != CrawlStatus.Gone &&
        r.retries <= scheduleCfg.retryMax &&
        r.distance <= effDepth &&
        cfg.acceptsSub(r.url) &&
        // far-future rows are clamp-eligible; the clamp itself only lives
        // on the fetchlist copy (the merge reads frontier state), matching
        // CrawlPipeline.generate
        (r.fetchTime - now > scheduleCfg.maxIntervalSec * 1000L ||
          r.fetchTime <= now)
    }.toSeq
    val ordered = eligible.sortBy(r => (-r.score, r.url))
    val perHost = mutable.Map[String, Int]().withDefaultValue(0)
    val capped = ordered.filter { r =>
      val h = Urls.host(r.url)
      val cfg = configs.configOrDefault(r.url)
      val cap = if (cfg.maxPerHost > 0) cfg.maxPerHost else maxPerHost
      perHost(h) += 1
      perHost(h) <= cap
    }
    capped.take(topN)
  }

  /** Fetch a batch: per-host lanes with crawlDelay, exactly the pipeline's
    * virtual-clock contract; then merge outcomes + discoveries.
    */
  def fetchAndUpdate(list: Seq[SimRow], batchId: String, now: Long): Unit = {
    val byHost = list.groupBy(r => QueueMode.keyOf(queueMode, Urls.host(r.url)))
    val outcomes = mutable.ArrayBuffer[(SimRow, Int, Option[Seq[Byte]])]()
    // url, contrib, dist, anchor
    val discovered = mutable.ArrayBuffer[(String, Float, Int, String)]()
    val batchFetches = mutable.ArrayBuffer[(String, String, Long)]()

    def discover(raw: String, anchor: String, contrib: Float, dist: Int)
        : Unit =
      Urls.canonicalize(raw)
        .map(u => configs.configOrDefault(u).rewriteUrl(u))
        .flatMap(Urls.canonicalize)
        .filter(graft.core.UrlFilterChain.default.accepts)
        .foreach(u => discovered += ((u, contrib, dist, anchor)))

    byHost.foreach { case (qkey, rows) =>
      val sorted = rows.sortBy(r => (-r.score, r.url))
      val qCfg = configs.configOrDefault(s"http://$qkey/")
      val crawlDelayMs =
        if (qCfg.crawlDelayMs > 0) qCfg.crawlDelayMs
        else webCfg.crawlDelayMs
      val nLanes =
        if (qCfg.maxConcurrent > 1) qCfg.maxConcurrent
        else math.max(1, webCfg.maxConcurrent)
      val lanes = Array.fill(nLanes)(now)
      sorted.foreach { r =>
        val host = Urls.host(r.url)
        val disallows = SyntheticWeb.robotsDisallows(host)
        val lane = lanes.zipWithIndex.minBy { case (t, i) => (t, i) }._2
        val start = lanes(lane)
        val path = Urls.pathOf(r.url)
        if (fetchTimelimitMs > 0 && start - now >= fetchTimelimitMs) {
          // T5 timelimit purge: not fetched, row state untouched
        } else if (disallows.exists(path.startsWith)) {
          batchFetches += ((batchId, r.url, start))
          outcomes += ((r, FetchOutcome.Gone, None))
        } else {
          val end = start + SyntheticWeb.delayMs(r.url, webCfg)
          lanes(lane) = end + crawlDelayMs
          batchFetches += ((batchId, r.url, start))
          SyntheticWeb.raw(r.url, webCfg) match {
            case RawPage(ct, headers, bytes, declaredLen) =>
              outcomes += ((r, FetchOutcome.Success,
                Some(graft.core.Signature.md5(bytes, r.url).toSeq)))
              // the same pure parse function the pipeline's parse stage
              // runs (truncation / gzip / charset / entity handling)
              val po = Parse.page(r.url, ct, headers, bytes, declaredLen)
              val n = math.max(1,
                po.outlinks.size + (if (po.refreshUrl != null) 1 else 0))
              po.outlinks.foreach { case (raw, anchor) =>
                discover(raw, anchor, r.score / n, r.distance + 1)
              }
              // T7 parse-level redirect (meta refresh): the target is a
              // discovery; a fast refresh is PERMANENT for reprUrl
              // (ParseUtil.java:244-279)
              if (po.refreshUrl != null) {
                discover(po.refreshUrl, "", r.score / n, r.distance + 1)
                if (po.refreshTime >= 0 &&
                  po.refreshTime < Parse.PermRefreshTime)
                  r.reprUrl = po.refreshUrl
              }
            case RawRedirect(to, perm) =>
              outcomes += ((r,
                if (perm) FetchOutcome.RedirPerm else FetchOutcome.RedirTemp,
                None))
              if (perm) r.reprUrl = to
              discover(to, "", r.score, r.distance + 1)
            case RawNotFound => outcomes += ((r, FetchOutcome.Gone, None))
            case RawServerError =>
              outcomes += ((r, FetchOutcome.RetryTransient, None))
          }
        }
      }
    }

    // crawl ordering: global order by (start, url) — deterministic
    fetchLog ++= batchFetches.sortBy { case (_, u, t) => (t, u) }

    // updatedb merge (schedule state machine + signature change detection)
    outcomes.foreach { case (r, outcome, sig) =>
      // per-site interval refresh on re-crawl (reference
      // NutchConstant.checkInterval:975-989 via DbConfigFetchSchedule)
      val cfgI = configs.configOrDefault(r.url).customIntervalSec
      if (cfgI > 0 && r.interval < cfgI * 0.5) r.interval = cfgI
      val changed = r.signature.isEmpty || sig.isEmpty || r.signature != sig
      val eff =
        if (outcome == FetchOutcome.Success && !changed)
          FetchOutcome.NotModified
        else outcome
      val st = Schedule.next(
        graft.core.ScheduleState(r.status, r.fetchTime, r.prevFetchTime,
          r.interval, r.retries, r.modifiedTime), eff, now, scheduleCfg)
      r.status = st.status
      r.fetchTime = st.fetchTime
      r.prevFetchTime = st.prevFetchTime
      r.interval = st.fetchInterval
      r.retries = st.retries
      r.modifiedTime = st.modifiedTime
      if (sig.nonEmpty) r.signature = sig
      r.lastBatch = batchId
    }

    // new rows: max contribution, min distance, min anchor per url;
    // existing rows take the shorter path's distance
    // (DbUpdateReducer.java:235-250)
    discovered.groupBy(_._1).foreach { case (u, contribs) =>
      if (frontier.contains(u)) {
        val dist = contribs.map(_._3).min
        val r = frontier(u)
        if (dist < r.distance) r.distance = dist
      } else {
        val dist = contribs.map(_._3).min
        if (dist <= maxDepth) {
          val cfg = configs.configOrDefault(u)
          val score =
            if (cfg.customScore > 0f) cfg.customScore
            else contribs.map(_._2).max
          val interval =
            if (cfg.customIntervalSec > 0) cfg.customIntervalSec
            else scheduleCfg.defaultIntervalSec
          frontier(u) = SimRow(u, CrawlStatus.Unfetched, score, now, 0L,
            interval, 0, 0L, None, dist, "",
            anchor = contribs.map(_._4).min)
        }
      }
    }
  }

  def runBatches(depth: Int, topN: Int, maxPerHost: Int,
      startTime: Long = 1700000000000L): Unit = {
    inject(SyntheticWeb.seeds(webCfg), startTime)
    for (i <- 1 to depth) {
      val now = startTime + i * 3600000L
      val list = generate(now, topN, maxPerHost)
      if (list.nonEmpty) fetchAndUpdate(list, s"b$i", now)
    }
  }

  def seenSet: Set[String] = frontier.keySet.toSet
}
