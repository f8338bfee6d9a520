package graft.crawl

import java.nio.file.Files
import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.spark

/** Real JDBC source/sink round-trips against an embedded DuckDB database
  * over its JDBC driver (S3 — reference InjectorDbJob seeds-from-RDBMS +
  * NutchConstant.setUrlConfig config trie; S8 — DbExporter auto-ALTER
  * export). Exercises actual `spark.read.jdbc` / `df.write.jdbc` paths.
  */
class JdbcSpec extends AnyFunSuite {
  import spark.implicits._

  private def freshDb(name: String): String =
    "jdbc:duckdb:" + Files.createTempDirectory(name).toString + "/db.duckdb"

  test("S3: seeds + site config load through spark.read.jdbc and drive inject") {
    val url = freshDb("jdbc-src")
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE seeds(url VARCHAR, score DOUBLE, interval_sec INT)")
    st.execute("INSERT INTO seeds VALUES " +
      "('http://www.test-0.example/page0.html', 2.5, 7200), " +
      "('http://www.test-1.example/page0.html', 1.0, 3600), " +
      "('not a url', 9.9, 60)") // filtered by canonicalize
    st.execute("CREATE TABLE site_config(prefix VARCHAR, cfg_id INT, " +
      "crawl_delay_ms BIGINT, max_concurrent INT, max_per_host INT, " +
      "custom_score DOUBLE, custom_interval_sec INT, fetch_depth INT, " +
      "sub_filters VARCHAR)")
    st.execute("INSERT INTO site_config VALUES " +
      "('http://www.test-1.example/', 5, 200, 3, 4, 7.5, 1800, 2, " +
      "'-.*/private/.*')")
    st.close(); conn.close()

    // distributed path: seeds stay a Dataset end-to-end (no driver collect)
    val seeds = JdbcSource.seeds(spark, url, "seeds")
    assert(seeds.count() === 3)
    assert(JdbcSource.seedLines(spark, url, "seeds").size === 3) // wrapper
    val trie = JdbcSource.configTrie(spark, url, "site_config")
    val cfg = trie.configOrDefault("http://www.test-1.example/page3.html")
    assert(cfg.cfgId === 5 && cfg.crawlDelayMs === 200L &&
      cfg.maxConcurrent === 3 && cfg.maxPerHost === 4 &&
      cfg.customScore === 7.5f && cfg.customIntervalSec === 1800 &&
      cfg.fetchDepth === 2)
    assert(!cfg.acceptsSub("http://www.test-1.example/private/page1.html"))
    assert(trie.configOrDefault("http://www.test-0.example/").cfgId === 0)

    // the JDBC seeds drive a real inject: bad row dropped, metadata applied
    val dir = Files.createTempDirectory("jdbc-inject").toString
    val p = new CrawlPipeline(spark, dir,
      WebConfig(numHosts = 2, pagesPerHost = 5), numBuckets = 2,
      configs = trie)
    val frontier = p.inject(seeds, 1700000000000L).collect()
    assert(frontier.length === 2)
    val r0 = frontier.find(_.url.contains("test-0")).get
    assert(r0.score === 2.5f && r0.fetchInterval === 7200)
  }

  test("S8: exportJdbc writes via df.write.jdbc and auto-ALTERs new columns") {
    val url = freshDb("jdbc-sink")
    // batch 1: two fields
    val b1 = Seq((1L, Map("title" -> "a", "price" -> "9")),
      (2L, Map("title" -> "b", "price" -> "3")))
      .toDF("id", "fields").coalesce(1)
    Exporter.exportJdbc(Exporter.widen(b1, "id", "fields"), url, "seg")
    // batch 2: a NEW field appears -> ALTER TABLE ADD COLUMN path
    val b2 = Seq((3L, Map("title" -> "c", "author" -> "x")))
      .toDF("id", "fields").coalesce(1)
    Exporter.exportJdbc(Exporter.widen(b2, "id", "fields"), url, "seg")

    val back = spark.read.jdbc(url, "seg", new java.util.Properties)
    assert(back.columns.sorted.toSeq === Seq("author", "id", "price", "title"))
    val rows = back.orderBy("id").collect()
    assert(rows.length === 3)
    assert(rows(0).getAs[String]("title") === "a")
    assert(rows(0).getAs[String]("author") === null) // pre-ALTER row
    assert(rows(2).getAs[String]("author") === "x")
    assert(rows(2).getAs[String]("price") === null) // absent field
  }
}
