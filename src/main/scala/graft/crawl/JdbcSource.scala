package graft.crawl

import org.apache.spark.sql.SparkSession

import graft.core.{ConfigTrie, SiteConfig}

/** JDBC seed + per-site-config source (S3 — reference
  * crawl/InjectorDbJob.java:127-148 reads seed URLs from an RDBMS;
  * crawl/NutchConstant.java:221-320 `setUrlConfig` loads the per-site
  * config table into the UrlPathMatch trie driver-side and serializes it
  * to every task).
  *
  * Spark-native: `spark.read.jdbc` scans the tables; seeds stay a
  * DataFrame (injected distributed), the config table — small by contract,
  * like the reference's — collects on the driver into the immutable
  * ConfigTrie that every stage receives as ONE broadcast.
  */
object JdbcSource {

  /** Seed lines (`url \t nutch.score=F \t nutch.fetchInterval=I`) from a
    * table (url VARCHAR, score DOUBLE, interval_sec INT), as a DISTRIBUTED
    * Dataset in the inject() seed-line format — the JDBC and text seed
    * sources are interchangeable, and a production-scale seed table never
    * lands on the driver (feed this to `inject(Dataset[String], now)`).
    * Partitioned reads come free via the usual `spark.read.jdbc`
    * partitioning options in `props`.
    */
  def seeds(spark: SparkSession, jdbcUrl: String, table: String,
      props: java.util.Properties = new java.util.Properties)
      : org.apache.spark.sql.Dataset[String] = {
    import spark.implicits._
    spark.read.jdbc(jdbcUrl, table, props)
      // integer widths vary by backend (DuckDB surfaces INT as BIGINT
      // through JDBC metadata) — normalize explicitly
      .selectExpr("url", "CAST(score AS DOUBLE) AS score",
        "CAST(interval_sec AS INT) AS interval_sec")
      .as[(String, Double, Int)]
      .map { case (u, s, i) =>
        s"$u\tnutch.score=${s.toFloat}\tnutch.fetchInterval=$i"
      }
  }

  /** Driver-side convenience form of [[seeds]] — small lists/tests only. */
  def seedLines(spark: SparkSession, jdbcUrl: String, table: String,
      props: java.util.Properties = new java.util.Properties): Seq[String] =
    seeds(spark, jdbcUrl, table, props).collect().toSeq

  /** Per-site config trie from a table (prefix VARCHAR, cfg_id INT,
    * crawl_delay_ms BIGINT, max_concurrent INT, max_per_host INT,
    * custom_score DOUBLE, custom_interval_sec INT, fetch_depth INT,
    * sub_filters VARCHAR — `+regex` / `-regex` / `datecalc:` / `datespec:`
    * lines separated by '\n', the reference's SubURLFilters.buildExp
    * grammar — see graft.core.SubFilters). `nowMs` anchors `datecalc:`
    * cutoffs (the crawl's virtual clock, so rules are deterministic).
    */
  def configTrie(spark: SparkSession, jdbcUrl: String, table: String,
      props: java.util.Properties = new java.util.Properties,
      nowMs: Long = System.currentTimeMillis()): ConfigTrie = {
    import spark.implicits._
    val rows = spark.read.jdbc(jdbcUrl, table, props)
      .selectExpr("prefix", "CAST(cfg_id AS INT) AS cfg_id",
        "CAST(crawl_delay_ms AS BIGINT) AS crawl_delay_ms",
        "CAST(max_concurrent AS INT) AS max_concurrent",
        "CAST(max_per_host AS INT) AS max_per_host",
        "CAST(custom_score AS DOUBLE) AS custom_score",
        "CAST(custom_interval_sec AS INT) AS custom_interval_sec",
        "CAST(fetch_depth AS INT) AS fetch_depth", "sub_filters")
      .as[(String, Int, Long, Int, Int, Double, Int, Int, String)]
      .collect()
    ConfigTrie.build(rows.toSeq.map {
      case (prefix, id, delay, conc, perHost, score, interval, depth, subs) =>
        val (subFilters, dateFilters) = graft.core.SubFilters.parse(subs, nowMs)
        prefix -> SiteConfig(
          cfgId = id,
          customScore = score.toFloat,
          customIntervalSec = interval,
          fetchDepth = if (depth > 0) depth else Int.MaxValue,
          maxPerHost = perHost,
          crawlDelayMs = delay,
          maxConcurrent = conc,
          subFilters = subFilters,
          dateFilters = dateFilters)
    })
  }
}
