package graft.crawl

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.spark

class IndexSinkSpec extends AnyFunSuite {
  import spark.implicits._

  test("index sink dedups by signature (newest wins) and writes jsonl batches") {
    val docs = Seq(
      (1L, "sigA", 100L, "http://a/1"),
      (2L, "sigA", 200L, "http://a/2"), // newer duplicate of sigA -> kept
      (3L, "sigB", 50L, "http://b/3"))
      .toDF("urlHash", "sig", "fetchEnd", "url")
    val dir = Files.createTempDirectory("graft-index").toString
    val n = IndexSink.index(docs, "urlHash", "sig", "fetchEnd",
      () => new JsonlIndexWriter(dir))
    assert(n === 2)
    val lines = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".jsonl"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toList)
    assert(lines.length === 2)
    assert(lines.exists(_.contains("\"urlHash\":2")))
    assert(lines.exists(_.contains("\"urlHash\":3")))
    assert(!lines.exists(_.contains("\"urlHash\":1"))) // older dup dropped
  }

  test("S6/S7: HTTP Solr + Elastic writers batch adds and commit on close") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val posts =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: HttpExchange) => {
      val body = new String(x.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      posts.add((x.getRequestURI.toString, body))
      val resp = "{}".getBytes
      x.sendResponseHeaders(200, resp.length.toLong)
      x.getResponseBody.write(resp)
      x.close()
    })
    server.start()
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    try {
      // Solr: 5 docs at batchSize 2 -> 3 update posts + 1 commit
      val solr = new SolrHttpWriter(base, "col1", batchSize = 2)
      solr.open(0L)
      (1 to 5).foreach(i => solr.add(s"""{"id":$i}"""))
      solr.commit()
      val solrPosts = posts.toArray(Array.empty[(String, String)]).toSeq
      val updates = solrPosts.filter(_._1 == "/solr/col1/update/json/docs")
      assert(updates.map(_._2) === Seq(
        """[{"id":1},{"id":2}]""", """[{"id":3},{"id":4}]""",
        """[{"id":5}]"""))
      assert(solrPosts.last._1 === "/solr/col1/update?commit=true")

      // Elastic: ndjson action/source pairs to _bulk, then _refresh
      posts.clear()
      val es = new ElasticHttpWriter(base, "idx1", batchSize = 2)
      es.open(0L)
      (1 to 3).foreach(i => es.add(s"""{"id":$i}"""))
      es.commit()
      val esPosts = posts.toArray(Array.empty[(String, String)]).toSeq
      val bulks = esPosts.filter(_._1 == "/_bulk")
      assert(bulks.length === 2)
      assert(bulks.head._2 ===
        "{\"index\":{\"_index\":\"idx1\"}}\n{\"id\":1}\n" +
          "{\"index\":{\"_index\":\"idx1\"}}\n{\"id\":2}\n")
      assert(esPosts.last._1 === "/idx1/_refresh")

      // end-to-end: IndexSink.index drives the HTTP writer per partition
      posts.clear()
      val docs = Seq(
        (1L, "sigA", 100L, "http://a/1"),
        (2L, "sigA", 200L, "http://a/2"),
        (3L, "sigB", 50L, "http://b/3"))
        .toDF("urlHash", "sig", "fetchEnd", "url")
      val n = IndexSink.index(docs, "urlHash", "sig", "fetchEnd",
        () => new SolrHttpWriter(base, "col2", batchSize = 10))
      assert(n === 2)
      val indexed = posts.toArray(Array.empty[(String, String)])
        .filter(_._1.startsWith("/solr/col2/update/json/docs"))
        .flatMap(_._2.split(","))
      assert(indexed.exists(_.contains("\"urlHash\":2")))
      assert(!indexed.exists(_.contains("\"urlHash\":1"))) // dedup upstream
      // a failing backend fails the writer (task retry semantics)
      server.removeContext("/")
      server.createContext("/", (x: HttpExchange) => {
        x.sendResponseHeaders(503, -1); x.close()
      })
      val bad = new SolrHttpWriter(base, "col3", batchSize = 1)
      bad.open(0L)
      intercept[java.io.IOException] { bad.add("""{"id":9}""") }
    } finally server.stop(0)
  }

  test("indexBatch runs over a real crawl batch layout") {
    val dir = Files.createTempDirectory("graft-index-crawl").toString
    val cfg = WebConfig(numHosts = 4, pagesPerHost = 10)
    val p = new CrawlPipeline(spark, dir, cfg, numBuckets = 4)
    p.runBatches(1, 20, 5)
    val out = Files.createTempDirectory("graft-index-out").toString
    val n = IndexSink.indexBatch(spark, dir, "b1", out)
    assert(n > 0)
  }
}
