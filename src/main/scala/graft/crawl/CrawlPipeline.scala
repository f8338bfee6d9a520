package graft.crawl

import java.io.File

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{CrawlStatus, FetchOutcome, Schedule, ScheduleConfig, Urls, XxHash64}

/** Parsed robots.txt rules with RFC 9309 precedence: the longest
  * matching path prefix wins; on equal length Allow wins; no match =>
  * allowed. The empty rule set is allow-all (missing robots.txt).
  * `crawlDelayMs` carries the group's `Crawl-delay` directive (reference
  * RobotRulesParser.java:369-380 getCrawlDelay); -1 = not declared.
  */
final case class RobotRules(allows: Seq[String], disallows: Seq[String],
    crawlDelayMs: Long = -1L)
    extends Serializable {
  def isAllowed(path: String): Boolean = {
    var bestAllow = -1
    var bestDis = -1
    allows.foreach(p =>
      if (path.startsWith(p) && p.length > bestAllow) bestAllow = p.length)
    disallows.foreach(p =>
      if (path.startsWith(p) && p.length > bestDis) bestDis = p.length)
    bestAllow >= bestDis
  }
}

object RobotRules {
  val AllowAll: RobotRules = RobotRules(Nil, Nil)

  /** Upper bound honored for a robots-declared Crawl-delay (the
    * reference's `fetcher.max.crawl.delay`, 30 s): a hostile or
    * misconfigured robots.txt must not stall politeness lanes or
    * executor threads for hours.
    */
  val MaxRobotsDelayMs: Long = 30000L
}

/** Pluggable fetcher (reference extension point `Protocol`,
  * plugin/ExtensionPoint.java; SURVEY.md §2.10). Returns the PROTOCOL
  * response — raw bytes + headers; deriving outlinks/text from them is the
  * parse stage's job, exactly the reference's Protocol/Parser split. The
  * synthetic implementation is the deterministic fake web.
  */
trait Fetcher extends Serializable {
  def fetch(url: String): RawResponse
  def delayMs(url: String): Long

  /** Robots rules for the AUTHORITY of `url` (reference
    * RobotRulesParser.java:414-496; the fetch stage caches one lookup
    * per host per queue group).
    */
  def robotsRules(url: String): RobotRules
}

final class SyntheticFetcher(cfg: WebConfig) extends Fetcher {
  def fetch(url: String): RawResponse = SyntheticWeb.raw(url, cfg)
  def delayMs(url: String): Long = SyntheticWeb.delayMs(url, cfg)
  def robotsRules(url: String): RobotRules =
    RobotRules(Nil, SyntheticWeb.robotsDisallows(Urls.host(url)))
}

/** The crawl loop — generate / fetch / parse / updatedb over a
  * bucket-partitioned parquet frontier with an atomic commit log
  * (SURVEY.md §3: reference lifecycle `Crawler.run` ->
  * GeneratorJob -> FetcherJob -> ParserJob -> DbUpdaterJob, re-expressed
  * as typed Dataset transformations; reference: crawl/Crawler.java:168-224).
  * Fetch returns raw content bytes (WebPage.content); parse derives
  * outlinks/text/signature from them; payload decodes image bytes.
  *
  * Scale design (10^10-URL frontier):
  *  - frontier partitioned by `bucket` = salted host hash — host-local
  *    politeness grouping without host skew concentrating data;
  *  - generate: one window shuffle (per-host cap) + TakeOrderedAndProject
  *    for the global topN — never a full sort of the frontier;
  *  - fetch: one repartition by (bucket ^ batch salt); per-host politeness
  *    is a sequential fold inside `flatMapGroups` (Catalyst-planned
  *    MapGroups — the reference's FetchItemQueues without threads);
  *  - parse: narrow map over the batch staging table, no shuffle;
  *  - updatedb: discovered side is pre-aggregated per URL before the
  *    frontier cogroup, capping the shuffle at |distinct urls|; the
  *    frontier side shuffles once on urlHash (with Iceberg
  *    storage-partitioned joins this becomes co-located; documented in
  *    README).
  */
final class CrawlPipeline(
    @transient private val spark: SparkSession,
    root: String,
    webCfg: WebConfig = WebConfig(),
    numBuckets: Int = 32,
    scheduleCfg: ScheduleConfig = ScheduleConfig(),
    maxDepth: Int = 3,
    additionsAllowed: Boolean = true,
    useBloomSeenFilter: Boolean = true,
    configs: graft.core.ConfigTrie = graft.core.ConfigTrie.empty,
    queueMode: String = QueueMode.ByHost,
    fetchTimelimitMs: Long = -1L,
    compactEvery: Int = 4,
    fetcherOverride: Fetcher = null,
    majorEvery: Int = 8,
    noExchangeMinBytes: Long = 512L << 20,
    normalizeRules: graft.core.NormalizeRules = graft.core.NormalizeRules.none,
    scoring: ScoringFilter = ScoringFilter.Default)
    extends Serializable {

  import spark.implicits._

  @transient val log = new CommitLog(root)
  // the protocol extension point: a real HttpFetcher (or any Fetcher)
  // plugs in here; the deterministic synthetic web is the default
  private val fetcher: Fetcher =
    Option(fetcherOverride).getOrElse(new SyntheticFetcher(webCfg))
  // J3: per-site config trie broadcast once, consulted by every stage
  // (reference: GeneratorMapper.java:91, FetcherReducer.java:515-520,
  // DbUpdateReducer.java:111-117 re-match the trie per row)
  @transient private val trieBc =
    spark.sparkContext.broadcast(configs)
  private val hasPerSiteCaps = configs ne graft.core.ConfigTrie.empty

  /** Bucket count of this frontier (ReadApi derives partition-pruning
    * predicates from it).
    */
  def bucketCount: Int = numBuckets

  private def snapshotDir(seq: Long): String =
    s"$root/frontier/snapshot-$seq"

  // ---------------------------------------------------------------- inject

  /** Seed injection (reference: crawl/InjectorJob.java:111-188 — normalize,
    * filter, build UNFETCHED rows, upsert). Seed lines support the
    * reference's `url \t nutch.score=F \t nutch.fetchInterval=I` metadata.
    *
    * Driver-side convenience wrapper over the distributed overload — for
    * small hand-lists and tests only; a production seed table (the
    * reference reads millions of seed URLs from an RDBMS) goes through
    * `inject(Dataset[String], now)` and never lands on the driver.
    */
  def inject(seedLines: Seq[String], now: Long): Dataset[CrawlRow] =
    inject(spark.createDataset(seedLines), now)

  /** Distributed seed injection: the seed lines stay a Dataset end-to-end
    * (JdbcSource.seeds / spark.read.textFile feed this directly).
    */
  def inject(seedLines: Dataset[String], now: Long): Dataset[CrawlRow] = {
    val nb = numBuckets
    val defaultInterval = scheduleCfg.defaultIntervalSec
    val normRules = normalizeRules
    val sc = scoring
    val rows = seedLines
      .flatMap { line =>
        val parts = line.split("\t")
        Urls.canonicalize(parts(0), normRules).filter(UrlFilters.accepts)
          .map { u =>
          var metaScore = Option.empty[Float]
          var interval = defaultInterval
          parts.drop(1).foreach { kv =>
            kv.split("=", 2) match {
              case Array("nutch.score", v) => metaScore = Some(v.toFloat)
              case Array("nutch.fetchInterval", v) => interval = v.toInt
              case _ =>
            }
          }
          Keys.rowOf(u, nb, now, score = sc.injectedScore(u, metaScore),
            intervalSec = interval)
        }
      }
      .dropDuplicates("urlHash")
    val seq = log.nextSeq()
    val path = snapshotDir(seq)
    val out = writeFrontier(rows, path)
    val tB = System.nanoTime()
    // sidecars only when the seen-filter is on — a pipeline that always
    // takes the exact anti-join must not pay bloom builds it never reads
    val bloomPaths =
      if (useBloomSeenFilter)
        Seq(writeBlooms(readFrontier(path), s"$root/blooms/$seq",
          out.values.sum))
      else Nil
    commitStage(seq, "b0", "inject", path, out, now,
      metrics = Map("bloomWallMs" -> (System.nanoTime() - tB) / 1e6),
      bloomPaths = bloomPaths)
    readFrontier(path)
  }

  private def writeFrontier(rows: Dataset[CrawlRow], path: String)
      : Map[String, Long] = {
    // align task partitions with bucket dirs: one file per bucket instead
    // of |tasks| x |buckets| small files (2048 -> 64 at the bench config)
    val (observed, obs) = observeBucketCounts(rows)
    observed.repartition(numBuckets, col("bucket"))
      .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(path)
    observedCounts(obs).getOrElse(footerCounts(path))
  }

  /** Attach a per-bucket row-count observation to a frontier write plan.
    * The commit log's partition counts come from the WRITE PASS itself —
    * a snapshot write must not be followed by a full re-scan of the bytes
    * just written only to count them (at the 10^10-row/2 TB design point
    * that re-scan doubles every compaction's I/O).
    */
  private def observeBucketCounts(rows: Dataset[CrawlRow])
      : (Dataset[CrawlRow], org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val agg = udaf(new BucketCountsAgg(numBuckets))
    (rows.observe(obs, agg(col("bucket")).as("bucketCounts")), obs)
  }

  /** Resolve an observed bucket-count map. Fallback (never expected, but
    * an Observation that misses its listener event would block forever):
    * parquet FOOTER row counts per bucket dir — metadata reads only,
    * still no data re-scan.
    */
  private def observedCounts(obs: org.apache.spark.sql.Observation)
      : Option[Map[String, Long]] =
    observedRow(obs).map(
      _.getAs[scala.collection.Map[String, Long]]("bucketCounts").toMap)

  /** Resolve an observation row (30 s guard against a lost listener
    * event — same rationale as observedCounts). Round-7: every stage's
    * commit counts now ride the stage's own write job via observe()
    * instead of a post-write read-back action; locally that removes one
    * Spark job per stage, at scale it removes a re-scan of bytes the
    * stage just wrote.
    */
  private def observedRow(obs: org.apache.spark.sql.Observation)
      : Option[org.apache.spark.sql.Row] =
    try
      Some(scala.concurrent.Await.result(obs.future,
        scala.concurrent.duration.Duration(30, "s")))
    catch {
      case _: java.util.concurrent.TimeoutException => None
    }

  private def footerCounts(path: String): Map[String, Long] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).filter(s => s.isDirectory &&
      s.getPath.getName.startsWith("bucket=")).flatMap { dir =>
      val bucket = dir.getPath.getName.stripPrefix("bucket=")
      val n = fs.listStatus(dir.getPath)
        .filter(_.getPath.getName.endsWith(".parquet")).map { f =>
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile
              .fromPath(f.getPath, conf))
          try reader.getRecordCount finally reader.close()
        }.sum
      if (n > 0) Some(bucket -> n) else None
    }.toMap
  }

  def readFrontier(path: String): Dataset[CrawlRow] =
    spark.read.parquet(path).as[CrawlRow]

  /** The last committed frontier STATE (inject / updatedb / compact),
    * whichever is newest in the log.
    */
  private[crawl] def lastState(): Option[Commit] =
    log.commits()
      .filter(c => c.stage == "updatedb" || c.stage == "inject" ||
        c.stage == "compact")
      .lastOption

  /** Resolve a commit's frontier view — Iceberg merge-on-read semantics:
    * base snapshot minus keys present in any delta, union the latest
    * delta version of each key. The delta chain is bounded by
    * `compactEvery`, so the delta union (and the anti-join's broadcast
    * side) stays topN-bounded; the base scan remains untouched columnar
    * parquet. A full snapshot (no deltas) reads directly.
    */
  /** Latest version of each key across an ordered list of delta frames
    * (later frames win) — the chain fold shared by the MoR view and both
    * compaction paths. Shuffle is DELTA-sized (topN-bounded per frame).
    */
  private def latestOf(frames: Seq[org.apache.spark.sql.DataFrame])
      : Dataset[CrawlRow] = {
    // single-frame fold is the identity: every delta is written as
    // `changed union newRows` — changed rows exist in the frontier, new
    // rows do not, and each side is unique by urlHash — so the
    // dedup window (a full shuffle of the delta) only matters across
    // frames. With compactEvery=1 every compaction folds exactly one
    // frame; skipping the no-op window removes one exchange per batch.
    if (frames.lengthCompare(1) == 0) return frames.head.as[CrawlRow]
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("urlHash")).orderBy(col("_dseq").desc)
    frames.zipWithIndex
      .map { case (df, i) => df.withColumn("_dseq", lit(i)) }
      .reduce(_ unionByName _)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_dseq")
      .as[CrawlRow]
  }

  private[crawl] def viewOf(c: Commit): Dataset[CrawlRow] = {
    if (c.deltas.isEmpty) readFrontier(c.frontierPath)
    else {
      val latest = latestOf(c.deltas.map(p => spark.read.parquet(p)))
      // unionByName: a partitionBy-layout base read appends `bucket` last,
      // while delta files carry case-class column order
      readFrontier(c.frontierPath)
        .join(broadcast(latest.select(col("urlHash"))), Seq("urlHash"),
          "left_anti")
        .unionByName(latest.toDF())
        .as[CrawlRow]
    }
  }

  /** Compaction snapshot write WITHOUT the full-width exchange (the
    * measured scaling soft spot of round 2: repartitioning every frontier
    * row for the snapshot write was memory-bandwidth bound at 0.54-0.62
    * efficiency). The base scan's tasks are already bucket-aligned — each
    * parquet split holds rows of exactly one `bucket=N` directory — so
    * untouched rows stream scan->writer with no exchange; only the folded
    * delta (topN-bounded) pays a small repartition and is APPENDED into
    * the same partition layout.
    *
    * Trade-off: each minor compaction adds ~numBuckets delta files to the
    * snapshot instead of rewriting one file per bucket; `majorEvery`
    * bounds the growth — every majorEvery-th compaction bin-packs through
    * the full exchange (Iceberg's minor/major compaction split).
    */
  private def writeSnapshotNoExchange(baseUntouched: Dataset[CrawlRow],
      latest: Dataset[CrawlRow], path: String, basePath: String)
      : Map[String, Long] = {
    // Size the scan splits from the BASE SNAPSHOT size so scan
    // parallelism replaces exchange parallelism at every scale: with the
    // default 128MB maxPartitionBytes a small frontier packs many bucket
    // files into ONE task, which (a) single-threads the write and (b)
    // makes the dynamic-partition writer sort mixed-bucket rows per task
    // (measured: the "exchange-free" compaction slower than the exchange
    // at bench scale). One-file-per-task splits keep each task on a
    // single bucket: constant-key sort, one output file, full
    // parallelism.
    val conf = spark.conf
    val prevMax = conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    val targetSplits =
      math.max(1, 4 * spark.sparkContext.defaultParallelism)
    val per = math.max(1L << 20,
      math.min(128L << 20, dirBytes(basePath) / targetSplits))
    try {
      conf.set("spark.sql.files.maxPartitionBytes", per.toString)
      // counts ride on the two write passes (observe) — summing the two
      // observations replaces the full-table re-scan this writer exists
      // to avoid paying
      val (obsBase, o1) = observeBucketCounts(baseUntouched)
      obsBase
        .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(path)
      val (obsLatest, o2) = observeBucketCounts(latest)
      obsLatest.repartition(math.max(1, numBuckets / 8), col("bucket"))
        .write.mode(SaveMode.Append).partitionBy("bucket").parquet(path)
      (observedCounts(o1), observedCounts(o2)) match {
        case (Some(base), Some(app)) =>
          app.foldLeft(base) { case (acc, (b, c)) =>
            acc.updated(b, acc.getOrElse(b, 0L) + c)
          }
        case _ => footerCounts(path)
      }
    } finally conf.set("spark.sql.files.maxPartitionBytes", prevMax)
  }

  private def dirBytes(path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try fs.getContentSummary(p).getLength catch { case _: Exception => 0L }
  }

  /** True when the NEXT compaction should bin-pack (major). */
  private def nextCompactionIsMajor(): Boolean = {
    val n = log.commits().count(c =>
      c.stage == "compact" || c.metrics.contains("compacted"))
    majorEvery > 0 && n % majorEvery == majorEvery - 1
  }

  /** Exchange-free compaction pays fixed overheads (a second write job,
    * the persisted chain fold) that only amortize once the avoided
    * exchange is big enough. Measured on this box at 4 cores (write
    * pattern alone): 66MB base — exchange wins 2.7s vs 5.3s; 178MB —
    * parity; 534MB — no-exchange wins 4.5s vs 7.6s; 1.8GB — 14s vs
    * 18-24s. Below the threshold the snapshot is small enough that the
    * exchange IS the parallelizer and costs nothing; above it, the
    * no-exchange path's scan-parallel write wins and keeps winning as
    * size grows (at the 10^10-row/2TB design point the exchange would
    * serialize the whole frontier through shuffle files).
    */
  private def useNoExchangeCompaction(basePath: String): Boolean =
    dirBytes(basePath) >= noExchangeMinBytes

  /** The current frontier state as a Dataset (test/ops surface). */
  def frontierState(): Dataset[CrawlRow] =
    viewOf(lastState().getOrElse(
      throw new IllegalStateException("no frontier committed yet")))

  /** Compact the delta chain into a full snapshot (the Iceberg MoR
    * compaction job). No-op when the state is already a full snapshot.
    * Minor by default (no base exchange); `binPack` forces a major
    * (exchange) rewrite that re-densifies the file layout.
    */
  def compact(now: Long, binPack: Boolean = false): Unit =
    lastState().foreach { c =>
      if (c.deltas.nonEmpty) {
        val seq = log.nextSeq()
        val path = snapshotDir(seq)
        val t0 = System.nanoTime()
        val latest = latestOf(c.deltas.map(p => spark.read.parquet(p)))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val baseUntouched = readFrontier(c.frontierPath)
          .join(broadcast(latest.select(col("urlHash"))), Seq("urlHash"),
            "left_anti")
        val counts =
          if (binPack || nextCompactionIsMajor() ||
              !useNoExchangeCompaction(c.frontierPath))
            writeFrontier(
              baseUntouched.unionByName(latest.toDF()).as[CrawlRow], path)
          else
            writeSnapshotNoExchange(baseUntouched.as[CrawlRow], latest, path,
              c.frontierPath)
        latest.unpersist()
        val compactMs = (System.nanoTime() - t0) / 1e6
        val tB = System.nanoTime()
        val bloomPaths =
          if (useBloomSeenFilter)
            Seq(writeBlooms(readFrontier(path), s"$root/blooms/$seq",
              counts.values.sum))
          else Nil
        commitStage(seq, c.batchId, "compact", path, counts, now,
          Map("compactWallMs" -> compactMs,
            "bloomWallMs" -> ((System.nanoTime() - tB) / 1e6)),
          bloomPaths = bloomPaths)
      }
    }

  private def commitStage(seq: Long, batchId: String, stage: String,
      frontierPath: String, partCounts: Map[String, Long], now: Long,
      metrics: Map[String, Double] = Map.empty,
      deltaPaths: Seq[String] = Nil,
      bloomPaths: Seq[String] = Nil): Commit =
    log.append(Commit(seq, batchId, stage, "complete", frontierPath,
      partCounts.values.sum, partCounts, metrics, now, deltaPaths,
      bloomPaths))

  /** Build per-bucket URL-seen bloom filters over `rows` and persist
    * them as a (bucket, bytes) parquet sidecar. Built DISTRIBUTED (each
    * task folds its slice into local filters; a bucket may yield several
    * partial filters — membership is exists(_), exactness never depends
    * on them). `expectedKeys` sizes the filters; an under-estimate only
    * raises the false-positive rate, which just sends more rows through
    * the exact anti-join.
    */
  private def writeBlooms(rows: Dataset[CrawlRow], path: String,
      expectedKeys: Long): String = {
    import org.apache.spark.util.sketch.BloomFilter
    val perBucketExpected =
      math.max(64L, 2L * expectedKeys / math.max(1, numBuckets))
    rows.select(col("bucket"), col("urlHash")).as[(Int, Long)]
      .mapPartitions { it =>
        val fs = scala.collection.mutable.Map[Int, BloomFilter]()
        it.foreach { case (b, h) =>
          fs.getOrElseUpdate(b,
            BloomFilter.create(perBucketExpected, 0.03)).putLong(h)
        }
        fs.iterator.map { case (b, f) =>
          val bos = new java.io.ByteArrayOutputStream()
          f.writeTo(bos)
          (b, bos.toByteArray)
        }
      }
      .toDF("bucket", "bytes")
      // repartition (NOT coalesce): a coalesce(1) here is a narrow
      // dependency that would collapse the whole scan+fold into ONE task
      // holding every bucket's filter; the shuffle barrier keeps the fold
      // distributed and only the small serialized filters move to the
      // single writer task
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(path)
    path
  }

  // -------------------------------------------------------------- generate

  /** Build the batch fetchlist (reference: crawl/GeneratorJob.java:149-202;
    * eligibility cascade GeneratorMapper.java:53-200; per-host caps + topN
    * GeneratorReducer.java:43-124). Ordering contract = score desc, url asc
    * (SelectorEntry.compareTo, GeneratorJob.java:92-98) — the parity
    * definition for the simulator oracle.
    */
  def generate(frontier: Dataset[CrawlRow], batchId: String, now: Long,
      topN: Int, maxPerHost: Int): Dataset[CrawlRow] = {
    val listFinal = fetchlistPlan(frontier, batchId, now, topN, maxPerHost)

    val path = s"$root/batches/$batchId/fetchlist"
    val t0 = System.nanoTime()
    // limit() collapses to one partition; spread the fetchlist by host so
    // the fetch stage's shuffle-write side is parallel, not one task.
    // Counts observe() the write itself — no read-back count job.
    val (observed, obs) = observeBucketCounts(listFinal)
    observed.repartition(numBuckets, col("host"))
      .write.mode(SaveMode.Overwrite).parquet(path)
    val generateWallMs = (System.nanoTime() - t0) / 1e6
    val out = spark.read.parquet(path).as[CrawlRow]
    val counts = observedCounts(obs).getOrElse(
      out.groupBy("bucket").count().as[(Int, Long)].collect()
        .map { case (b, c) => b.toString -> c }.toMap)
    commitStage(log.nextSeq(), batchId, "generate",
      lastState().map(_.frontierPath).getOrElse(""), counts, now,
      metrics = Map("generateWallMs" -> generateWallMs))
    out
  }

  /** The fetchlist as an UNEXECUTED plan (split from [[generate]] so specs
    * can assert on its physical shape: with no per-site config the whole
    * chain — eligibility cascade, per-host cap, topN, lastBatch stamp —
    * must plan with zero `DeserializeToObject` over the frontier).
    */
  private[crawl] def fetchlistPlan(frontier: Dataset[CrawlRow],
      batchId: String, now: Long, topN: Int, maxPerHost: Int)
      : Dataset[CrawlRow] = {
    val retryMax = scheduleCfg.retryMax
    val maxIntervalMs = scheduleCfg.maxIntervalSec * 1000L
    val clampedInterval = (scheduleCfg.maxIntervalSec * 0.9).toInt
    val depthCap = maxDepth
    val trie = trieBc

    // F1 eligibility cascade + O3 max-interval clamp. With no per-site
    // config (the common full-scale case) every check is a pure Column
    // expression, so the ONLY per-batch full-frontier pass stays inside
    // WholeStageCodegen with no object decode — same two-form pattern as
    // mergeColumnar, pinned by the same parity spec. The trie path keeps
    // the typed cascade (F4/F5: depth override + per-node sub-filters).
    // GRAFT_GENERATE_TYPED forces the typed cascade (A/B harness for the
    // columnar form; the per-host-cap branch below stays literal either
    // way so the comparison isolates the eligibility pass)
    val forceTyped = sys.env.contains("GRAFT_GENERATE_TYPED")
    val eligible: Dataset[CrawlRow] = if (!hasPerSiteCaps && !forceTyped) {
      val overdue = col("fetchTime") - lit(now) > lit(maxIntervalMs)
      frontier
        .filter(col("status") =!= lit(CrawlStatus.Gone) &&
          col("retries") <= lit(retryMax) &&
          col("distance") <= lit(depthCap) &&
          (col("fetchTime") <= lit(now) || overdue))
        // order matters: rewrite fetchInterval while fetchTime still holds
        // the original value `overdue` tests, then clamp fetchTime
        .withColumn("fetchInterval",
          when(overdue, lit(clampedInterval)).otherwise(col("fetchInterval")))
        .withColumn("fetchTime",
          when(overdue, lit(now)).otherwise(col("fetchTime")))
        .as[CrawlRow]
    } else frontier.flatMap { r =>
      val cfg = trie.value.configOrDefault(r.url)
      val effDepth =
        if (cfg.fetchDepth != Int.MaxValue) cfg.fetchDepth else depthCap
      if (r.status == CrawlStatus.Gone) None
      else if (r.retries > retryMax) None
      else if (r.distance > effDepth) None
      else if (!cfg.acceptsSub(r.url)) None
      else if (r.fetchTime - now > maxIntervalMs)
        Some(r.copy(fetchInterval = clampedInterval, fetchTime = now))
      else if (r.fetchTime <= now) Some(r)
      else None
    }

    // A2 per-host cap via ranked window (per-config onceCount override),
    // then exact global topN (O1+O2). With no per-site caps the rank
    // filter is a LITERAL, which Catalyst rewrites into WindowGroupLimit
    // (partial top-k BEFORE the window shuffle — the frontier never
    // shuffles un-capped rows); per-site caps fall back to a column
    // filter bounded by the trie's max cap so the pushdown still prunes.
    val defaultCap = maxPerHost
    // ScoringFilter generatorSortValue: ranking/selection Column (Default
    // = the score itself, so the default plan is unchanged)
    val sortVal = scoring.generatorSortValue(col("score"))
    val list = if (!hasPerSiteCaps) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("host"))
        .orderBy(sortVal.desc, col("url").asc)
      eligible
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= defaultCap)
        .drop("rn")
    } else {
      val withCap = eligible.map { r =>
        val cfg = trie.value.configOrDefault(r.url)
        (r, if (cfg.maxPerHost > 0) cfg.maxPerHost else defaultCap)
      }.withColumnRenamed("_1", "row").withColumnRenamed("_2", "cap")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("row.host"))
        .orderBy(scoring.generatorSortValue(col("row.score")).desc,
          col("row.url").asc)
      withCap
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= col("cap"))
        .select(col("row.*"))
    }
    // lastBatch stamp as a literal column (not a typed map) — keeps the
    // tail of the plan object-free too
    list
      .orderBy(sortVal.desc, col("url").asc)
      .limit(topN)
      .withColumn("lastBatch", lit(batchId))
      .as[CrawlRow]
  }

  // ----------------------------------------------------------------- fetch

  /** Politeness-scheduled fetch with inline parse (reference:
    * fetcher/FetcherReducer.java — FetchItemQueues :167-449 with per-host
    * crawlDelay/maxConcurrent; inline parse :682-686; status dispatch
    * :557-605; robots cache RobotRulesParser.java:54,414-496 — note the
    * fork comments robots *enforcement* out at :522-544; we enforce it,
    * deterministic in the synthetic web).
    *
    * Virtual clock: each host's timeline starts at `now`; `maxConcurrent`
    * lanes per host; lane pick = earliest-available (deterministic).
    * Cross-host parallelism is Spark's — politeness is per-host
    * serialization, exactly the reference's queue model.
    */
  def fetch(fetchlist: Dataset[CrawlRow], batchId: String, now: Long)
      : Dataset[FetchResult] = {
    val f = fetcher
    val defaultDelay = webCfg.crawlDelayMs
    val defaultLanes = math.max(1, webCfg.maxConcurrent)
    val trie = trieBc
    val mode = queueMode
    val timelimit = fetchTimelimitMs

    // J2 host-settings lookup join: politeness settings come from the
    // LATEST hostdb snapshot (the reference's HostDb.getByHostName LRU,
    // host/HostDb.java:41-110), restricted to the batch's own queue keys
    // before collection so the broadcast is fetchlist-bounded (<= topN
    // keys), never |all hosts|. Unseen keys (batch 1, new hosts) fall
    // back to the config trie — same values by construction.
    //
    // The hostdb is keyed by HOST, so the lookup applies in byHost queue
    // mode ONLY: a byDomain/byIP queue spans several hostdb rows whose
    // settings the scheduler contract (and the simulator oracle) resolves
    // from the config trie at the QUEUE key, not from any per-host
    // aggregate — so those modes skip the hostdb read explicitly instead
    // of silently never matching on it.
    val hostSettings: Map[String, (Long, Int)] =
      if (mode != QueueMode.ByHost) Map.empty
      else log.lastOf("hostdb") match {
        case Some(c) =>
          val keys = fetchlist
            .map(r => QueueMode.keyOf(mode, r.host)).distinct().toDF("host")
          spark.read.parquet(c.frontierPath)
            .join(broadcast(keys), Seq("host"))
            .select(col("host"), col("crawlDelayMs"), col("maxConcurrent"))
            .as[(String, Long, Int)].collect()
            .map(r => r._1 -> (r._2, r._3)).toMap
        case None => Map.empty
      }
    val hsBc = spark.sparkContext.broadcast(hostSettings)

    // groupByKey inserts one hash exchange on the queue key — the
    // politeness partitioner (reference URLPartitioner byHost/byDomain/
    // byIP). NOTE: AQE's post-shuffle coalescing must stay OFF for this
    // stage: rows are tiny but rows-per-second is compute-bound (image
    // decode/encode), and byte-based coalescing collapses it to one task
    // (measured: identical 24.8s fetch wall at 2 and 32 cores with
    // coalescing on).
    val sortSc = scoring
    val results = fetchlist
      .groupByKey(r => QueueMode.keyOf(mode, r.host))
      .flatMapGroups { (qkey, rows) =>
        // O5 in-queue order: generator sort value desc, url asc — under a
        // custom ScoringFilter the fetch order follows the same value the
        // generate rank used (Default = raw score, unchanged plan)
        val sorted = rows.toArray
          .sortBy(r => (-sortSc.generatorSortValueScalar(r.score), r.url))
        // robots cache: one lookup per HOST in the queue group == the
        // per-executor LRU in the reference (robots stay per-host even
        // when the politeness queue is per-domain/IP)
        val rulesOf = scala.collection.mutable.Map[String, RobotRules]()
        // queue politeness settings: hostdb row for the queue key, else
        // the config trie at the queue key (J2/J3)
        val (crawlDelay, lanes) = hsBc.value.getOrElse(qkey, {
          val qCfg = trie.value.configOrDefault(s"http://$qkey/")
          (if (qCfg.crawlDelayMs > 0) qCfg.crawlDelayMs else defaultDelay,
            if (qCfg.maxConcurrent > 1) qCfg.maxConcurrent else defaultLanes)
        })
        val laneAvail = Array.fill(lanes)(now)
        sorted.iterator.flatMap[FetchResult] { r =>
          val host = r.host
          val lane = laneAvail.zipWithIndex.minBy { case (t, i) => (t, i) }._2
          val start = laneAvail(lane)
          val path = Urls.pathOf(r.url)
          val robots =
            rulesOf.getOrElseUpdate(host, f.robotsRules(r.url))
          if (timelimit > 0 && start - now >= timelimit) {
            // T5 timelimit: queue purged once the virtual budget is spent
            // (reference FetcherReducer.java:739-756 feeder drain); the
            // row keeps its frontier state and re-generates next batch
            None
          } else if (!robots.isAllowed(path)) {
            // robots-denied: no request is made — no politeness cost
            Some(FetchResult(r.urlHash, r.url, host, FetchOutcome.Gone,
              "robots/denied", null, null, 0L, Map.empty, r.anchor,
              r.score, r.distance, start, start, batchId))
          } else {
            val delay = f.delayMs(r.url)
            val end = start + delay
            // a robots-declared Crawl-delay raises the politeness floor
            // for its host above the config/hostdb delay (reference
            // FetcherReducer queue setup reads getCrawlDelay), BOUNDED:
            // a hostile 'Crawl-delay: 9999999' must not starve the lane
            // (the reference's fetcher.max.crawl.delay cap, 30 s)
            laneAvail(lane) = end + math.max(crawlDelay,
              math.min(robots.crawlDelayMs, RobotRules.MaxRobotsDelayMs))
            Some(f.fetch(r.url) match {
              case RawPage(ct, headers, bytes, declaredLen) =>
                FetchResult(r.urlHash, r.url, host, FetchOutcome.Success,
                  ct, null, bytes, declaredLen, headers, r.anchor,
                  r.score, r.distance, start, end, batchId)
              case RawRedirect(to, perm) =>
                val oc = if (perm) FetchOutcome.RedirPerm
                  else FetchOutcome.RedirTemp
                FetchResult(r.urlHash, r.url, host, oc, "text/html", to,
                  null, 0L, Map.empty, r.anchor, r.score, r.distance,
                  start, end, batchId)
              case RawNotFound =>
                FetchResult(r.urlHash, r.url, host, FetchOutcome.Gone,
                  "text/html", null, null, 0L, Map.empty, r.anchor,
                  r.score, r.distance, start, end, batchId)
              case RawServerError =>
                FetchResult(r.urlHash, r.url, host,
                  FetchOutcome.RetryTransient, "text/html", null, null, 0L,
                  Map.empty, r.anchor, r.score, r.distance,
                  start, end, batchId)
            })
          }
        }
      }

    val path = s"$root/batches/$batchId/fetched"
    val t0 = System.nanoTime()
    // content bytes are jpeg/png/gzip — already entropy-coded; parquet
    // snappy on top is pure CPU/allocation overhead on the widest write,
    // and dictionary-encoding unique binaries is wasted hashing
    val obsF = org.apache.spark.sql.Observation()
    results.observe(obsF, count(lit(1)).as("n"),
        max(col("fetchEnd")).as("maxEnd"))
      .write.mode(SaveMode.Overwrite)
      .option("compression", "uncompressed")
      .option("parquet.enable.dictionary", "false").parquet(path)
    val fetchWallMs = (System.nanoTime() - t0) / 1e6
    val out = spark.read.parquet(path).as[FetchResult]
    val (n, maxEnd) = observedRow(obsF)
      .map(r => (r.getAs[Long]("n"),
        Option(r.getAs[java.lang.Long]("maxEnd")).map(_.toLong)
          .getOrElse(0L)))
      .getOrElse(out.agg(count(lit(1)), max(col("fetchEnd")))
        .as[(Long, Long)].head())
    val vWall = maxEnd - now
    commitStage(log.nextSeq(), batchId, "fetch", path,
      Map("all" -> n), now,
      Map("pages" -> n.toDouble,
        "fetchWallMs" -> fetchWallMs,
        "virtualWallMs" -> vWall.toDouble,
        "virtualPagesPerSec" ->
          (if (vWall > 0) n * 1000.0 / vWall else 0.0)))
    out
  }

  // ----------------------------------------------------------------- parse

  /** The parse stage (reference: parse/ParserJob.java over the batch's
    * WebPageIndex rows; ParseUtil.java:244-367): content bytes ->
    * outlinks + text + signature. One narrow map over the fetched batch —
    * no shuffle; row-level logic is the pure `Parse.page` shared with the
    * simulator oracle. Non-success rows pass through so updatedb consumes
    * parse output alone (outcome + redirect + signature in one table).
    */
  def parse(fetched: Dataset[FetchResult], batchId: String, now: Long)
      : Dataset[ParsedPage] = {
    val out = fetched.map { r =>
      val po =
        if (r.outcome == FetchOutcome.Success)
          Parse.page(r.url, r.contentType, r.headers, r.content,
            r.contentLength)
        else Parse.ParseOut(Map.empty, "", Parse.StatusNotParsed)
      val sig =
        if (r.outcome == FetchOutcome.Success)
          graft.core.Signature.md5(r.content, r.url)
        else null
      // T7 parse-level redirects (meta refresh, ParseUtil.java:244-279):
      // the target rides the SAME redirectTo channel fetch-level redirects
      // use — a Success outcome never has one otherwise — so discovery and
      // reprUrl handling fall out of the existing paths
      val redir =
        if (po.refreshUrl != null) po.refreshUrl else r.redirectTo
      ParsedPage(r.urlHash, r.url, r.host, r.outcome, r.contentType,
        redir, po.outlinks, po.text, sig, po.status, r.anchor,
        r.srcScore, r.srcDistance, r.fetchStart, r.fetchEnd, r.batchId,
        po.refreshTime)
    }
    val path = s"$root/batches/$batchId/parsed"
    val t0 = System.nanoTime()
    val obsP = org.apache.spark.sql.Observation()
    out.observe(obsP, count(lit(1)).as("n"))
      .write.mode(SaveMode.Overwrite).parquet(path)
    val parseWallMs = (System.nanoTime() - t0) / 1e6
    val res = spark.read.parquet(path).as[ParsedPage]
    val n = observedRow(obsP).map(_.getAs[Long]("n")).getOrElse(res.count())
    commitStage(log.nextSeq(), batchId, "parse", path,
      Map("all" -> n), now, Map("parseWallMs" -> parseWallMs))
    res
  }

  /** Decode+validate image payloads from fetched CONTENT bytes (C11 —
    * reference ImageParser: length-vs-Content-Length truncation check,
    * nutch-parse-image-plugin/.../ImageParser.java:41-79 — generalized to
    * full decode + phash; per input_hint the payload table is (image_id,
    * bytes, w, h, fmt, caption, phash)). The caption is the inlink's
    * alt/anchor text carried on the frontier row — nothing here re-touches
    * the fake web: bytes, dimensions, and phash all come from the fetch
    * output, as they must in a real crawl.
    */
  def payloads(fetched: Dataset[FetchResult], batchId: String,
      now: Long): Dataset[PayloadRow] = {
    val out = fetched
      .filter(r => r.outcome == FetchOutcome.Success &&
        r.contentType != null && r.contentType.startsWith("image/") &&
        r.content != null && r.content.length == r.contentLength) // C11 gate
      .map { r =>
        val (px, w, h) = ImageCodec.decodePixels(r.content)
        PayloadRow(r.url, r.content, w, h,
          r.contentType.stripPrefix("image/"), r.anchor,
          ImageCodec.phash(px, w, h), r.urlHash, batchId)
      }
    val path = s"$root/batches/$batchId/payload"
    val obsY = org.apache.spark.sql.Observation()
    out.observe(obsY, count(lit(1)).as("n"))
      .write.mode(SaveMode.Overwrite)
      .option("compression", "uncompressed").parquet(path) // encoded bytes
    val res = spark.read.parquet(path).as[PayloadRow]
    val n = observedRow(obsY).map(_.getAs[Long]("n")).getOrElse(res.count())
    commitStage(log.nextSeq(), batchId, "payload", path,
      Map("all" -> n), now)
    res
  }

  /** The updatedb merge as pure Catalyst column expressions — the whole
    * frontier pass stays inside WholeStageCodegen with no object
    * round-trip (the typed variant decodes/encodes every CrawlRow).
    * Semantics = graft.core.Schedule.next (non-adaptive) exactly; the
    * parity suite pins equality against the simulator which CALLS
    * Schedule.next, so drift between the two forms fails tests.
    */
  private def mergeColumnar(frontier: Dataset[CrawlRow],
      outcomes: Dataset[Outcome], discDist: Dataset[(Long, Int)],
      nowMs: Long, sched: ScheduleConfig,
      cfgIntervals: Option[org.apache.spark.sql.DataFrame] = None)
      : Dataset[CrawlRow] = {
    import org.apache.spark.sql.functions._
    val dayMs = 24L * 3600 * 1000
    val outDf = outcomes.toDF()
      .withColumnRenamed("signature", "osig")
      .withColumnRenamed("batchId", "obatch")
      .withColumnRenamed("redirectTo", "oredir")
    val j0 = frontier.toDF()
      .join(broadcast(outDf), Seq("urlHash"), "left_outer")
      .join(broadcast(discDist.toDF("urlHash", "newDist")), Seq("urlHash"),
        "left_outer")
    val j = cfgIntervals match {
      case Some(ci) => j0.join(broadcast(ci), Seq("urlHash"), "left_outer")
      case None => j0
    }
    // interval basis for rows WITH an outcome: the per-site refresh rule
    // (NutchConstant.checkInterval — config interval wins when the stored
    // one has drifted below half of it); identity when no config is set
    val storedInterval = cfgIntervals match {
      case Some(_) =>
        when(col("cfgInterval").isNotNull &&
          col("fetchInterval") < col("cfgInterval") * 0.5,
          col("cfgInterval")).otherwise(col("fetchInterval"))
      case None => col("fetchInterval")
    }
    val has = col("outcome").isNotNull
    // distance refinement applies regardless of an outcome this batch
    val dist = when(col("newDist").isNotNull &&
      col("newDist") < col("distance"), col("newDist"))
      .otherwise(col("distance"))
    val changed = col("signature").isNull || !(col("signature") === col("osig"))
    val eff = when(col("outcome") === FetchOutcome.Success && !changed,
      lit(FetchOutcome.NotModified)).otherwise(col("outcome"))
    val retriesNext = col("retries") + 1
    val retryExceeded = retriesNext > sched.retryMax
    // Gone interval penalty: min(max, (interval * 1.5).toLong).toInt
    val goneInterval = least(lit(sched.maxIntervalSec.toLong),
      floor(storedInterval * 1.5)).cast("int")
    val newStatus =
      when(eff === FetchOutcome.Success, lit(CrawlStatus.Fetched))
        .when(eff === FetchOutcome.NotModified, lit(CrawlStatus.NotModified))
        .when(eff === FetchOutcome.RetryTransient,
          when(retryExceeded, lit(CrawlStatus.Gone))
            .otherwise(lit(CrawlStatus.Retry)))
        .when(eff === FetchOutcome.Gone, lit(CrawlStatus.Gone))
        .when(eff === FetchOutcome.RedirTemp, lit(CrawlStatus.RedirTemp))
        .otherwise(lit(CrawlStatus.RedirPerm))
    val newFetchTime =
      when(eff === FetchOutcome.RetryTransient,
        when(retryExceeded, lit(nowMs) + storedInterval * 1000L)
          .otherwise(lit(nowMs + dayMs)))
        .when(eff === FetchOutcome.Gone, lit(nowMs) + goneInterval * 1000L)
        .otherwise(lit(nowMs) + storedInterval * 1000L)
    val newInterval =
      when(eff === FetchOutcome.Gone, goneInterval)
        .otherwise(storedInterval)
    val newRetries =
      when(eff === FetchOutcome.RetryTransient, retriesNext)
        .when(eff === FetchOutcome.Success ||
          eff === FetchOutcome.NotModified, lit(0))
        .otherwise(col("retries"))
    val newModified =
      when(eff === FetchOutcome.Success, lit(nowMs))
        .otherwise(col("modifiedTime"))
    val sigEmpty = length(col("osig")) === 0
    j.select(
      col("urlHash"), col("url"), col("host"), col("domain"), col("bucket"),
      when(has, newStatus).otherwise(col("status")).as("status"),
      col("score"),
      when(has, newFetchTime).otherwise(col("fetchTime")).as("fetchTime"),
      when(has, col("fetchTime")).otherwise(col("prevFetchTime"))
        .as("prevFetchTime"),
      when(has, newInterval).otherwise(col("fetchInterval"))
        .as("fetchInterval"),
      when(has, newRetries).otherwise(col("retries")).as("retries"),
      when(has, newModified).otherwise(col("modifiedTime"))
        .as("modifiedTime"),
      when(has, when(sigEmpty, col("signature")).otherwise(col("osig")))
        .otherwise(col("signature")).as("signature"),
      when(has, col("signature")).otherwise(col("prevSignature"))
        .as("prevSignature"),
      dist.as("distance"),
      when(has, col("obatch")).otherwise(col("lastBatch")).as("lastBatch"),
      // reprUrl: permanent fetch-level redirects, plus PERMANENT meta
      // refreshes (Success outcome, refreshTime < PERM_REFRESH_TIME —
      // ParseUtil.java:271's chooseRepr permanence rule)
      when(has && col("oredir") =!= "" &&
        (col("outcome") === FetchOutcome.RedirPerm ||
          (col("outcome") === FetchOutcome.Success &&
            col("refreshTime").between(0, Parse.PermRefreshTime - 1))),
        col("oredir"))
        .otherwise(col("reprUrl")).as("reprUrl"),
      col("anchor"), col("cfgId"), col("crawlType"))
      .as[CrawlRow]
  }

  /** Typed merge (adaptive schedules; also the readable reference form). */
  private def mergeTyped(frontier: Dataset[CrawlRow],
      outcomes: Dataset[Outcome], discDist: Dataset[(Long, Int)],
      now: Long, sched: ScheduleConfig,
      refreshCfgInterval: Boolean = false): Dataset[CrawlRow] = {
    val trie = trieBc
    frontier
      .joinWith(broadcast(outcomes),
        frontier("urlHash") === outcomes("urlHash"), "left_outer")
      .joinWith(broadcast(discDist.toDF("urlHash", "newDist")
        .as[(Long, Int)]),
        org.apache.spark.sql.functions.col("_1.urlHash") ===
          org.apache.spark.sql.functions.col("urlHash"), "left_outer")
      .map { case ((row0, outRaw), dd) =>
        val row1 =
          if (dd == null || dd._2 >= row0.distance) row0
          else row0.copy(distance = dd._2)
        val out = outRaw
        // per-site interval refresh on re-crawl (scalar twin of the
        // columnar storedInterval rule; NutchConstant.checkInterval)
        val row =
          if (out == null || !refreshCfgInterval) row1
          else {
            val ci = trie.value.configOrDefault(row1.url).customIntervalSec
            if (ci > 0 && row1.fetchInterval < ci * 0.5)
              row1.copy(fetchInterval = ci)
            else row1
          }
        if (out == null) row
        else {
          val st0 = graft.core.ScheduleState(row.status, row.fetchTime,
            row.prevFetchTime, row.fetchInterval, row.retries,
            row.modifiedTime)
          val changed = row.signature == null ||
            !java.util.Arrays.equals(row.signature, out.signature)
          val effOutcome =
            if (out.outcome == FetchOutcome.Success && !changed)
              FetchOutcome.NotModified
            else out.outcome
          val st1 = Schedule.next(st0, effOutcome, now, sched)
          row.copy(
            status = st1.status,
            fetchTime = st1.fetchTime,
            prevFetchTime = st1.prevFetchTime,
            fetchInterval = st1.fetchInterval,
            retries = st1.retries,
            modifiedTime = st1.modifiedTime,
            prevSignature = row.signature,
            signature =
              if (out.signature.isEmpty) row.signature else out.signature,
            reprUrl =
              if (out.redirectTo.nonEmpty &&
                (out.outcome == FetchOutcome.RedirPerm ||
                  (out.outcome == FetchOutcome.Success &&
                    out.refreshTime >= 0 &&
                    out.refreshTime < Parse.PermRefreshTime)))
                out.redirectTo
              else row.reprUrl,
            lastBatch = out.batchId)
        }
      }
  }

  // --------------------------------------------------------------- updatedb

  /** Merge fetch outcomes + discovered outlinks into the frontier
    * (reference: crawl/DbUpdateMapper.java:55-118 emit,
    * DbUpdateReducer.java:102-274 merge, UrlWithScore secondary sort).
    *
    * Discovered outlinks are aggregated per destination FIRST (min
    * distance, best inherited score, inlink count — the explode+groupBy
    * analog of the reducer's sorted-inlink fold, capped semantics of
    * db.update.max.inlinks), then cogrouped with the frontier on urlHash.
    */
  def updatedb(frontier: Dataset[CrawlRow], parsed: Dataset[ParsedPage],
      batchId: String, now: Long): Dataset[CrawlRow] = {
    val nb = numBuckets
    val sched = scheduleCfg
    val depthCap = maxDepth
    val additions = additionsAllowed
    val trie = trieBc
    val normRules = normalizeRules
    val sc = scoring

    // T7: redirects feed the discovery stream like outlinks
    val discovered: Dataset[Discovered] = parsed.flatMap { r =>
      val outs = r.outlinks.iterator ++
        Option(r.redirectTo).iterator.map(to => (to, ""))
      val n = math.max(1, r.outlinks.size + Option(r.redirectTo).size)
      outs.flatMap { case (raw, anchor) =>
        // F6: per-site rewrite applied between canonicalize passes — the
        // rewritten URL is what enters the frontier (the reference's
        // delete-old-key + emit-new collapses to this at steady state)
        Urls.canonicalize(raw, normRules)
          .map(u => trie.value.configOrDefault(u).rewriteUrl(u))
          .flatMap(Urls.canonicalize)
          .filter(UrlFilters.accepts)
          .map { u =>
            val host = Urls.host(u)
            Discovered(XxHash64.hashUtf8(u, 42L), u, host,
              Urls.domain(host), Keys.bucketOf(host, nb),
              contrib = sc.outlinkContribution(r.url, r.srcScore, n),
              inlinks = 1,
              distance = r.srcDistance + 1, anchor = anchor)
          }
      }
    }

    // per-destination aggregation (J1 analog of the reducer's sorted
    // inlink fold): min distance, max score contribution, min anchor as
    // the representative inlink anchor (all order-independent =>
    // deterministic under any shuffle order).
    // Columnar agg, not mapGroups: codegen'd hash aggregate WITH map-side
    // partial aggregation — the outlink explosion is the largest data
    // volume in the pipeline, and partial agg collapses it before the
    // shuffle. first() is safe: same urlHash => same url/host/bucket.
    val discAgg = discovered
      .groupBy(col("urlHash"))
      .agg(first(col("url")).as("url"),
        first(col("host")).as("host"),
        first(col("domain")).as("domain"),
        first(col("bucket")).as("bucket"),
        max(col("contrib")).as("contrib"),
        count(lit(1)).cast("int").as("inlinks"),
        min(col("distance")).as("distance"),
        min(col("anchor")).as("anchor"))
      .as[Discovered]

    // The batch side is bounded by topN (generate's contract), so the
    // merge is a BROADCAST join against the frontier scan — the 10^10-row
    // frontier is never shuffled for the merge (reference needed a full
    // partition/sort/group pass per updatedb, UrlWithScore.java:124-195).
    val outcomes = parsed.map(r => Outcome(r.urlHash, r.outcome,
      Option(r.signature).getOrElse(Array.emptyByteArray), r.batchId,
      Option(r.redirectTo).getOrElse(""), r.refreshTime))

    // A4 for existing rows (DbUpdateReducer.java:235-250): a rediscovery
    // through a shorter path lowers the stored distance. The discovered
    // aggregate is topN*fanout-bounded, so it broadcasts like the
    // outcomes side — the frontier still never shuffles.
    val discDist = discAgg
      .map(d => (d.urlHash, d.distance))
      .toDF("urlHash", "newDist")
      .as[(Long, Int)]

    // MoR: the merge only ever REWRITES touched rows (rows with a fetch
    // outcome this batch, or rediscovered rows whose distance may
    // refine) — both key sets are topN-bounded, so `touched` is a
    // broadcast semi-join against the frontier scan and the merge output
    // is delta-sized, not frontier-sized.
    // no distinct(): a LEFT SEMI join is set-semantic on the build side
    // already — the dedup was one pure-overhead exchange per batch
    val touchedKeys = outcomes.select(col("urlHash"))
      .union(discDist.select(col("urlHash")))
    val touched = frontier
      .join(broadcast(touchedKeys), Seq("urlHash"), "left_semi")
      .as[CrawlRow]
    // Per-site interval re-applied on RE-CRAWL (reference
    // DbConfigFetchSchedule.shouldFetch -> NutchConstant.checkInterval
    // :975-989: a stored interval below HALF the config's customInterval
    // is reset to the config value at schedule time) — a site whose trie
    // config changes after discovery picks the new interval up at its
    // next merge instead of keeping the discovery-time schedule forever.
    // The probe is bounded: touched is topN-bounded, and only rows under
    // a customIntervalSec > 0 config survive; with no per-site config the
    // merge plan is byte-identical to before (None => no join planned).
    val cfgIntervals: Option[org.apache.spark.sql.DataFrame] =
      if (!hasPerSiteCaps) None
      else Some(touched
        .map(r =>
          (r.urlHash, trie.value.configOrDefault(r.url).customIntervalSec))
        .filter(_._2 > 0).toDF("urlHash", "cfgInterval"))
    val merged: Dataset[CrawlRow] =
      if (sched.adaptive)
        mergeTyped(touched, outcomes, discDist, now, sched,
          refreshCfgInterval = hasPerSiteCaps)
      else mergeColumnar(touched, outcomes, discDist, now, sched,
        cfgIntervals)
    // ScoringFilter updateDbScore hook for EXISTING rows, as a columnar
    // step shared by both merge forms; skipped entirely (no join in the
    // plan) for filters that keep stored scores, like Default
    val changed: Dataset[CrawlRow] =
      if (!scoring.updatesExistingScores) merged
      else merged.toDF
        .join(broadcast(discAgg.select(col("urlHash"), col("contrib"))),
          Seq("urlHash"), "left_outer")
        .withColumn("score",
          scoring.updateExistingScore(col("score"), col("contrib"))
            .cast("float"))
        .drop("contrib")
        .as[CrawlRow]

    // new rows from discoveries. D1 URL-seen set (north rule): bloom
    // filters over frontier keys prune definitely-new URLs; only the
    // maybe-seen remainder pays the anti-join shuffle. The bloom is an
    // optimization gate, never the source of truth — exactness comes from
    // the anti-join on the (much smaller) mightContain subset.
    //
    // Scale shape: the filters are PER-BUCKET, built distributed, and
    // maintained INCREMENTALLY as persisted sidecars — inject writes the
    // first generation, each batch appends a delta-sized generation for
    // its new rows, compaction rebuilds one fresh generation. updatedb
    // therefore never re-scans the frontier to build filters (the
    // round-2 shape paid a full frontier pass per batch — the dominant
    // updatedb cost at 10^10 rows). A key lives in >=1 generation, so
    // might-contain = exists over the chain's filters for the bucket;
    // chain length is bounded by compactEvery, and the unioned fpp
    // (~0.03 * chain) only widens the exact anti-join's input.
    discAgg.persist() // consumed by both bloom branches
    val prev = lastState()
    val bloomChain = prev.map(_.blooms).getOrElse(Nil)
    var checkedCache: Option[Dataset[(Discovered, Boolean)]] = None
    val newDiscoveries =
      if (!additions) spark.emptyDataset[Discovered]
      else if (useBloomSeenFilter && bloomChain.nonEmpty) {
        import org.apache.spark.util.sketch.BloomFilter
        val blooms = bloomChain
          .map(p => spark.read.parquet(p))
          .reduce(_ unionByName _)
          .select(col("bucket"), col("bytes")).as[(Int, Array[Byte])]
        // persisted: consumed by definitelyNew AND (twice) by the
        // flipped exact check — without it the bloom cogroup recomputes
        // per consumer
        val checked = discAgg
          .groupByKey(_.bucket)
          .cogroup(blooms.groupByKey(_._1)) { (_, discs, bs) =>
            val filters = bs.map { case (_, bytes) =>
              BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
            }.toArray
            if (filters.isEmpty) discs.map(d => (d, false))
            else discs.map(d => (d, filters.exists(_.mightContain(d.urlHash))))
          }
          .persist()
        checkedCache = Some(checked)
        val definitelyNew = checked.filter(c => !c._2).map(_._1)
        val maybeSeen = checked.filter(c => c._2).map(_._1)
        definitelyNew.union(notInFrontier(frontier, maybeSeen))
      } else
        notInFrontier(frontier, discAgg)

    val newRows = newDiscoveries
      .filter(_.distance <= depthCap)
      .map { d =>
        // F4: per-site custom score/interval for newly discovered rows
        val cfg = trie.value.configOrDefault(d.url)
        Keys.rowOf(d.url, nb, now,
          score = sc.newRowScore(d.url, d.contrib, cfg.customScore),
          distance = d.distance,
          intervalSec =
            if (cfg.customIntervalSec > 0) cfg.customIntervalSec
            else sched.defaultIntervalSec,
          anchor = d.anchor)
      }

    // Snapshot strategy (Iceberg merge-on-read, emulated): each batch
    // writes a DELTA of changed+new rows (topN-bounded — never the
    // frontier), and every `compactEvery`-th batch compacts the chain
    // into a full bucket-partitioned snapshot. Round 1's full rewrite per
    // batch made the snapshot exchange the merge stage's scaling
    // bottleneck (0.60 efficiency); here the per-batch merge cost is
    // O(delta) and the full-width exchange is amortized over the chain.
    val chainLen = prev.map(_.deltas.size).getOrElse(0)
    val seq = log.nextSeq()
    val t0 = System.nanoTime()
    val delta = changed.union(newRows)
    val result =
      if (chainLen >= compactEvery - 1) {
        // compacting merge: fold the chain + this batch into a full
        // snapshot. Minor (default): untouched base rows stream
        // scan->writer bucket-aligned with NO exchange; only the folded
        // chain (topN-bounded) shuffles. Every majorEvery-th compaction
        // bin-packs through the full exchange instead.
        val path = snapshotDir(seq)
        val chainFrames = prev.map(_.deltas).getOrElse(Nil)
          .map(p => spark.read.parquet(p))
        // persisted: the folded chain feeds TWO jobs (base anti-join keys
        // + its own append) — without it the whole merge lineage would
        // recompute per job
        val latest = latestOf(chainFrames :+ delta.toDF()).persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val basePath = prev.map(_.frontierPath).getOrElse("")
        val baseUntouched = readFrontier(basePath)
          .join(broadcast(latest.select(col("urlHash"))), Seq("urlHash"),
            "left_anti")
        val major = nextCompactionIsMajor()
        val counts =
          if (major || !useNoExchangeCompaction(basePath))
            writeFrontier(
              baseUntouched.unionByName(latest.toDF()).as[CrawlRow], path)
          else
            writeSnapshotNoExchange(baseUntouched.as[CrawlRow], latest, path,
              basePath)
        latest.unpersist()
        val mergeMs = (System.nanoTime() - t0) / 1e6
        // compaction resets the bloom chain: one fresh generation over
        // the new snapshot (the only full bloom build after inject).
        // Timed separately from the merge so the artifact attributes
        // sidecar cost vs merge cost directly.
        val tB = System.nanoTime()
        val bloomPaths =
          if (useBloomSeenFilter)
            Seq(writeBlooms(readFrontier(path), s"$root/blooms/$seq",
              counts.values.sum))
          else Nil
        commitStage(seq, batchId, "updatedb", path, counts, now,
          Map("mergeWallMs" -> mergeMs,
            "bloomWallMs" -> (System.nanoTime() - tB) / 1e6,
            "compacted" -> (if (major) 2.0 else 1.0)),
          bloomPaths = bloomPaths)
      } else {
        val deltaPath = s"$root/frontier/delta-$seq"
        // lineage counts for a delta commit describe the DELTA files — no
        // extra full-view pass per batch, and the counts ride on the
        // write itself (observe). rowCount upper-bounds the logical state
        // (prev total + delta rows; touched rows double in the bound) —
        // its only consumer is bloom sizing, where an over-estimate just
        // lowers the fpp.
        val (obsDelta, oD) = observeBucketCounts(delta)
        obsDelta.repartition(math.max(1, numBuckets / 8), col("bucket"))
          .write.mode(SaveMode.Overwrite).parquet(deltaPath)
        val basePath = prev.map(_.frontierPath).getOrElse("")
        val deltas = prev.map(_.deltas).getOrElse(Nil) :+ deltaPath
        val mergeMs = (System.nanoTime() - t0) / 1e6
        // fallback re-scan is DELTA-sized (topN-bounded), never the view
        val deltaCounts = observedCounts(oD).getOrElse(
          spark.read.parquet(deltaPath).groupBy(col("bucket")).count()
            .as[(Int, Long)].collect()
            .map { case (b, c) => b.toString -> c }.toMap)
        val total = prev.map(_.rowCount).getOrElse(0L) + deltaCounts.values.sum
        // incremental seen-set: a delta-sized bloom generation over this
        // batch's delta rows (changed rows re-add already-seen keys —
        // a harmless superset) appended to the chain
        val tB = System.nanoTime()
        val blooms =
          if (!useBloomSeenFilter) Nil
          else prev.map(_.blooms).getOrElse(Nil) :+
            writeBlooms(spark.read.parquet(deltaPath).as[CrawlRow],
              s"$root/blooms/$seq", deltaCounts.values.sum)
        log.append(Commit(seq, batchId, "updatedb", "complete", basePath,
          total, deltaCounts,
          Map("mergeWallMs" -> mergeMs,
            "bloomWallMs" -> (System.nanoTime() - tB) / 1e6),
          now, deltas, blooms))
      }
    discAgg.unpersist()
    checkedCache.foreach(_.unpersist())
    viewOf(result)
  }

  /** D1 exact seen-check: candidates absent from the frontier, with BOTH
    * joins oriented so the frontier NEVER shuffles. A naive
    * `cands LEFT ANTI frontier` cannot broadcast (the build side of an
    * anti-join is its RIGHT side, and the right side here would be the
    * 10^10-row frontier), so Spark would sort-merge it — a full
    * frontier-key shuffle (~80 GB at design scale) per batch. Instead:
    * (1) probe the frontier with the topN-bounded candidate keys via a
    * broadcast-right LEFT SEMI — the frontier is scanned in place, never
    * exchanged, and the output (the candidate keys actually present) is
    * candidate-bounded; (2) anti-join the candidates against that small
    * present-set, also broadcast. Mirrors the `touched` semi-join above;
    * the reference needed a full partition/sort pass of the webtable per
    * updatedb instead (crawl/UrlWithScore.java:124-195). Plan shape is
    * spec-pinned: no Exchange may appear above the frontier scan.
    */
  private[crawl] def notInFrontier(frontier: Dataset[CrawlRow],
      cands: Dataset[Discovered]): Dataset[Discovered] = {
    val seenKeys = frontier
      .join(broadcast(cands.select(col("urlHash"))), Seq("urlHash"),
        "left_semi")
      .select(col("urlHash"))
    cands.join(broadcast(seenKeys), Seq("urlHash"), "left_anti")
      .as[Discovered]
  }

  // --------------------------------------------------------------- hostdb

  /** Materialize the hostdb from the merged frontier (A3/J2 — reference
    * host/HostDbUpdateJob.java:62-71 + HostDbUpdateReducer.java:39-80:
    * per-host page/fetched counts; storage/Host.java per-host politeness
    * keys q_cd/q_mt read by the fetcher at FetcherReducer.java:363-387).
    * Stats aggregate map-side (hash partial agg) so the exchange carries
    * |hosts| rows, not |frontier|; the effective politeness settings are
    * materialized from the config trie so the NEXT batch's fetch reads
    * them as a bounded table lookup.
    */
  /** Top-K host->host link histograms kept per hostdb row (reference
    * HostDbUpdateReducer.java:46-72). K bounds the row width — the
    * reference's own `TODO: limit number of links`.
    */
  private val hostLinkTopK = 50

  def hostdb(frontier: Dataset[CrawlRow], batchId: String, now: Long,
      parsed: Dataset[ParsedPage] = null): Dataset[HostRow] = {
    val trie = trieBc
    val defaultDelay = webCfg.crawlDelayMs
    val defaultLanes = math.max(1, webCfg.maxConcurrent)
    val agg = frontier.groupBy(col("host")).agg(
      count(lit(1)).as("pages"),
      count_if(col("status") === CrawlStatus.Fetched ||
        col("status") === CrawlStatus.NotModified).as("fetched"),
      count_if(col("status") === CrawlStatus.Gone).as("gone"),
      count_if(col("status") === CrawlStatus.Unfetched).as("unfetched"),
      avg(col("score")).as("avgScore"),
      max(col("distance")).as("maxDistance"))
      .as[(String, Long, Long, Long, Long, Double, Int)]
    val stats = agg.map { case (host, pages, fetched, gone, unf, avgS, maxD) =>
      val cfg = trie.value.configOrDefault(s"http://$host/")
      HostRow(host, pages, fetched, gone, unf, avgS, maxD,
        if (cfg.crawlDelayMs > 0) cfg.crawlDelayMs else defaultDelay,
        if (cfg.maxConcurrent > 1) cfg.maxConcurrent else defaultLanes,
        Map.empty, Map.empty, batchId)
    }
    // A3 link-host histograms (HostDbUpdateReducer.java:46-72): explode
    // this batch's parsed outlinks into (srcHost, dstHost) pairs,
    // count-aggregate (map-side partial — the explosion collapses before
    // its one shuffle), then top-K per host in each direction. Input is
    // the BATCH's parse output (topN-bounded), never the frontier.
    var pairsCache: Option[org.apache.spark.sql.DataFrame] = None
    val out: Dataset[HostRow] =
      if (parsed == null) stats
      else {
        val hostOf = udf((u: String) => Urls.host(u))
        val pairs = parsed
          .select(col("host").as("srcHost"),
            explode(map_keys(col("outlinks"))).as("dst"))
          .select(col("srcHost"), hostOf(col("dst")).as("dstHost"))
          .groupBy(col("srcHost"), col("dstHost"))
          .agg(count(lit(1)).as("links"))
          .persist() // feeds both histogram directions
        pairsCache = Some(pairs)
        // Round-7: one direction-tagged pass instead of two windows + two
        // joins — the per-direction top-K runs in a single (dir, host)
        // window, both histogram maps aggregate in one groupBy (the
        // paired collect_lists see rows in the same order and null out
        // the same rows, so key/value alignment is preserved exactly as
        // in the per-direction form), and stats joins the histograms
        // once. A host with links in only one direction gets an empty
        // map either way (map_from_arrays of empty lists == the coalesce
        // default).
        val tagged = pairs
          .select(col("srcHost").as("host"), col("dstHost").as("other"),
            lit("out").as("dir"), col("links"))
          .unionByName(pairs
            .select(col("dstHost").as("host"), col("srcHost").as("other"),
              lit("in").as("dir"), col("links")))
        val wDir = org.apache.spark.sql.expressions.Window
          .partitionBy(col("dir"), col("host"))
          .orderBy(col("links").desc, col("other").asc)
        val hists = tagged
          .withColumn("rn", row_number().over(wDir))
          .filter(col("rn") <= hostLinkTopK)
          .groupBy(col("host"))
          .agg(
            map_from_arrays(
              collect_list(when(col("dir") === "out", col("other"))),
              collect_list(when(col("dir") === "out", col("links"))))
              .as("outHist"),
            map_from_arrays(
              collect_list(when(col("dir") === "in", col("other"))),
              collect_list(when(col("dir") === "in", col("links"))))
              .as("inHist"))
        val emptyHist = map().cast("map<string,bigint>")
        val joined = stats.toDF()
          .join(hists, Seq("host"), "left_outer")
          .withColumn("outLinkHosts",
            coalesce(col("outHist"), emptyHist))
          .withColumn("inLinkHosts", coalesce(col("inHist"), emptyHist))
          .drop("outHist", "inHist")
        val res = joined
          .select(stats.toDF().columns.map(col).toIndexedSeq: _*)
          .as[HostRow]
        res
      }
    val path = s"$root/hostdb/$batchId"
    val obsH = org.apache.spark.sql.Observation()
    out.observe(obsH, count(lit(1)).as("n"))
      .write.mode(SaveMode.Overwrite).parquet(path)
    pairsCache.foreach(_.unpersist())
    val res = spark.read.parquet(path).as[HostRow]
    val n = observedRow(obsH).map(_.getAs[Long]("n")).getOrElse(res.count())
    commitStage(log.nextSeq(), batchId, "hostdb", path,
      Map("all" -> n), now)
    res
  }

  // ----------------------------------------------------------------- loop

  /** Drive `depth` generate->fetch->updatedb batches (reference:
    * Crawler.java:168-224 depth loop; T1 micro-batch trigger). Resumes
    * from the commit log: completed stages of a crashed batch are reused,
    * not re-run (T2 — the ZK step gate as commit-log reads).
    */
  def runBatches(depth: Int, topN: Int, maxPerHost: Int,
      startTime: Long = 1700000000000L): Dataset[CrawlRow] = {
    var frontier = lastState() match {
      case Some(c) => viewOf(c)
      case None =>
        inject(SyntheticWeb.seeds(webCfg), startTime)
    }
    val committed = log.commits().map(c => (c.batchId, c.stage)).toSet
    for (i <- 1 to depth) {
      val batchId = s"b$i"
      if (!committed((batchId, "updatedb"))) {
        val now = startTime + i * 3600000L // 1h virtual tick per batch
        // the frontier VIEW is consumed by generate, the seen-set bloom,
        // the anti-join, the touched semi-join, and hostdb — cache it for
        // the batch instead of re-resolving base ∖ deltas per consumer
        frontier.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // T2 step gate: a committed stage is never re-run — resume picks
        // up the staged parquet exactly where the crash left off
        val list =
          if (committed((batchId, "generate")))
            spark.read.parquet(s"$root/batches/$batchId/fetchlist")
              .as[CrawlRow]
          else generate(frontier, batchId, now, topN, maxPerHost)
        if (list.isEmpty) {
          // T2: empty step => skip remaining stages (exitValue=2 analog)
        } else {
          val fetched =
            if (committed((batchId, "fetch")))
              spark.read.parquet(s"$root/batches/$batchId/fetched")
                .as[FetchResult]
            else fetch(list, batchId, now)
          val parsedRows =
            if (committed((batchId, "parse")))
              spark.read.parquet(s"$root/batches/$batchId/parsed")
                .as[ParsedPage]
            else parse(fetched, batchId, now)
          if (!committed((batchId, "payload"))) payloads(fetched, batchId, now)
          val next = updatedb(frontier, parsedRows, batchId, now)
          next.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          frontier.unpersist()
          frontier = next
          hostdb(frontier, batchId, now, parsedRows)
        }
      }
    }
    frontier
  }
}

/** Default URL filter chain instance shared by pipeline stages. */
object UrlFilters {
  private val chain = graft.core.UrlFilterChain.default
  def accepts(url: String): Boolean = chain.accepts(url)
}

/** Politeness queue grouping (reference `fetcher.queue.mode`,
  * crawl/URLPartitioner.java:79-114: byHost / byDomain / byIP). The queue
  * key is what the fetch stage groups (and serializes politeness) on.
  */
object QueueMode {
  val ByHost = "byHost"
  val ByDomain = "byDomain"
  val ByIP = "byIP"

  def keyOf(mode: String, host: String): String = mode match {
    case ByHost => host
    case ByDomain => graft.core.Urls.domain(host)
    case ByIP => SyntheticWeb.resolveIp(host)
    case m => throw new IllegalArgumentException(s"queue mode $m")
  }
}

/** Per-bucket row-count aggregate for `observe()` on frontier writes: a
  * primitive long array buffer (one slot per bucket — ~32 KB at the
  * 4096-bucket design point), merged per task, finished into the sparse
  * `bucket -> count` map the commit log stores. Lets the write job emit
  * its own lineage counts instead of a post-write re-scan.
  */
private[crawl] final class BucketCountsAgg(nb: Int)
    extends org.apache.spark.sql.expressions.Aggregator[
      Int, Array[Long], Map[String, Long]] {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  import org.apache.spark.sql.Encoder

  def zero: Array[Long] = new Array[Long](nb)
  def reduce(buf: Array[Long], bucket: Int): Array[Long] = {
    buf(bucket) += 1L; buf
  }
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }
  def finish(r: Array[Long]): Map[String, Long] =
    r.iterator.zipWithIndex
      .collect { case (c, b) if c > 0 => b.toString -> c }.toMap
  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
