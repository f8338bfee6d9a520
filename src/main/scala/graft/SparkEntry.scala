package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, ExtractOps, MultimodalOps, PackingOps, RelationalOps, SamplingOps, SimilarityOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory surface: every implemented operator
  * from SURVEY.md §2 (or the training-data-pipeline extensions) appears
  * here; SQL-expressible ones carry a DuckDB oracle in `oracleSql`
  * (column names aliased identically on both sides — the driver sorts
  * columns by name and hashes values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.hostAgg(spark, "/root/testdata/sf0.001")

  /** The crawl loop end-to-end (generate/fetch/updatedb over the
    * deterministic synthetic web, SURVEY.md §3) surfaced as a query:
    * returns the final frontier's status histogram + score stats — the
    * WebTableReader stats readout of a 2-batch crawl. Deterministic
    * (virtual clock, seeded web); verified in depth by CrawlParitySpec.
    */
  def crawlLoop(spark: SparkSession, dir: String, depth: Int = 2,
      topN: Int = 60): DataFrame = {
    import org.apache.spark.sql.functions._
    // RAM-backed temp root when present (ScalingRun's rationale: the
    // crawl tree is many small commit/parquet files and this VM's single
    // disk adds 2x run-to-run variance to an otherwise compute-bound
    // query); always deleted in the finally below
    val shm = new java.io.File("/dev/shm")
    val rootPath =
      if (shm.isDirectory && shm.canWrite)
        java.nio.file.Files.createTempDirectory(shm.toPath, "graft-crawl-q")
      else java.nio.file.Files.createTempDirectory("graft-crawl-q")
    val root = rootPath.toString
    try {
      val cfg = graft.crawl.WebConfig(numHosts = 8, pagesPerHost = 20,
        fanout = 4, imagesPerPage = 2, maxDelayMs = 100, crawlDelayMs = 25L)
      // compactEvery=1: at this toy scale the MoR delta path is pure
      // per-job overhead (the query is a smoke surface, not the bench)
      val p = new graft.crawl.CrawlPipeline(spark, root, cfg, numBuckets = 8,
        compactEvery = 1)
      val frontier = p.runBatches(depth = depth, topN = topN, maxPerHost = 10)
      val agg = frontier.groupBy(col("status"))
        .agg(count(lit(1)).as("cnt"),
          round(avg(col("score")), 4).as("avg_score"),
          max(col("distance")).as("max_distance"))
      // materialize the (tiny) result before the crawl tree is deleted —
      // the returned frame must not depend on the temp parquet
      val rows = agg.collect().toSeq
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), agg.schema)
    } finally {
      // leftover run dirs once filled this box's root disk to 90% and
      // silently depressed benchmarks — never leak the crawl tree
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(rootPath).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalOps.queries ++ TextOps.queries ++ SimilarityOps.queries ++
      Dedup.queries ++ MultimodalOps.queries ++ ExtractOps.queries ++
      SamplingOps.queries ++ PackingOps.queries +
      ("q_crawl_loop" -> ((s: SparkSession, d: String) => crawlLoop(s, d)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for the non-SQL-expressible ops
    * (LSH/IVF/IVF-PQ top-k, the LSH near-dup variant, the crawl loop —
    * each verified by scalatest specs against brute-force or simulator
    * oracles instead); everything else — minhash/simhash/langid, exact
    * embedding near-dup, and even the 64-bit rolling-hash fingerprint
    * (HUGEINT wrap emulation) — is oracle-gated.
    */
  def oracleSql: Map[String, String] =
    RelationalOps.oracles ++ TextOps.oracles ++ SimilarityOps.oracles ++
      ExtractOps.oracles ++ Dedup.oracles ++ MultimodalOps.oracles ++
      SamplingOps.oracles ++ PackingOps.oracles
}
