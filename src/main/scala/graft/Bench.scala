package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.crawl.{CrawlPipeline, WebConfig}

/** Round benchmark: one JSON line with per-query timings at
  * SPARK_GRAFT_SF_DIR plus the BASELINE.json crawl metrics — fetched
  * URLs/sec, updatedb merge wall-time, and N->4N scaling efficiency
  * measured as the same crawl at two local parallelism levels
  * (no real cluster in this sandbox; see BASELINE.md).
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One timed crawl: returns (fetchedUrls, fetchWallSec, updatedbWallSec).
    * The job is IDENTICAL at every parallelism level (fixed bucket count,
    * fixed batch plan) — only master threads + shuffle partitions vary, so
    * the N vs 4N comparison measures scaling, not a different workload.
    */
  private def crawlRun(spark: SparkSession, warmup: Boolean = false)
      : (Long, Double, Double) = {
    val root = Files.createTempDirectory(s"graft-bench-crawl").toString
    val webCfg =
      if (warmup) WebConfig(numHosts = 100, pagesPerHost = 50, fanout = 6,
        imagesPerPage = 2, maxDelayMs = 200, crawlDelayMs = 10L,
        maxConcurrent = 2)
      else WebConfig(numHosts = 3000, pagesPerHost = 300, fanout = 6,
        imagesPerPage = 2, maxDelayMs = 200, crawlDelayMs = 10L,
        maxConcurrent = 2)
    val p = new CrawlPipeline(spark, root, webCfg, numBuckets = 64,
      maxDepth = 4)
    if (warmup) p.runBatches(depth = 2, topN = 2000, maxPerHost = 40)
    else p.runBatches(depth = 3, topN = 50000, maxPerHost = 40)
    val commits = p.log.commits()
    val fetched = commits.filter(_.stage == "fetch").map(_.rowCount).sum
    val fetchWall = commits.filter(_.stage == "fetch")
      .flatMap(_.metrics.get("fetchWallMs")).sum / 1000.0
    val mergeWall = commits.filter(_.stage == "updatedb")
      .flatMap(_.metrics.get("mergeWallMs")).sum / 1000.0
    (fetched, fetchWall, mergeWall)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // --- headline queries at full parallelism ---
    var spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }

    // JIT/parquet warmup so neither timed run pays first-run costs
    crawlRun(spark, warmup = true)
    spark.stop()

    // --- crawl at N = cpus/4 ---
    val nCpus = math.max(1, cpus / 4)
    spark = session(nCpus)
    val tn = crawlRun(spark)
    spark.stop()

    // --- crawl at 4N = cpus (identical job, more threads) ---
    spark = session(cpus)
    val t4n = crawlRun(spark)
    spark.stop()

    val thr4n = if (t4n._2 > 0) t4n._1 / t4n._2 else 0.0
    val thrN = if (tn._2 > 0) tn._1 / tn._2 else 0.0
    val eff = if (thrN > 0) (thr4n / thrN) / 4.0 else 0.0

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","crawl":{""" +
        s""""fetched_urls":${t4n._1},""" +
        s""""fetched_urls_per_sec_4N":$thr4n,""" +
        s""""fetched_urls_per_sec_N":$thrN,""" +
        s""""updatedb_merge_sec_4N":${t4n._3},""" +
        s""""updatedb_merge_sec_N":${tn._3},""" +
        s""""cores_N":$nCpus,"cores_4N":$cpus,""" +
        s""""scaling_efficiency":$eff}}""")
  }
}
