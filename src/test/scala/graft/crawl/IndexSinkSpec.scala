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
