package graft.crawl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Index sink (S6/S7 — reference indexer/solr/SolrWriter.java batched
  * adds + commit-on-close, indexer/elastic/ElasticWriter.java same
  * pattern; dedup indexer/solr/SolrDeleteDuplicates.java:54-120).
  *
  * Spark-native shape: documents flow `foreachPartition` into a pluggable
  * `IndexWriter` (one writer per partition, batched add(), commit() on
  * close — exactly the reference's writer lifecycle). No Solr/ES server
  * exists in this sandbox, so the shipped writer targets the local
  * filesystem as JSON lines; an HTTP Solr/ES writer implements the same
  * 3-method trait in production.
  */
trait IndexWriter extends Serializable {
  def open(partitionId: Long): Unit
  def add(docJson: String): Unit
  def commit(): Unit
}

final class JsonlIndexWriter(dir: String) extends IndexWriter {
  @transient private var out: java.io.PrintWriter = _
  @transient private var buffer: scala.collection.mutable.ArrayBuffer[String] = _

  def open(partitionId: Long): Unit = {
    new java.io.File(dir).mkdirs()
    out = new java.io.PrintWriter(s"$dir/part-$partitionId.jsonl")
    buffer = scala.collection.mutable.ArrayBuffer.empty
  }
  def add(docJson: String): Unit = {
    buffer += docJson
    if (buffer.length >= 1000) flush() // SolrWriter batch size analog
  }
  private def flush(): Unit = { buffer.foreach(out.println); buffer.clear() }
  def commit(): Unit = { flush(); out.close() }
}

object IndexSink {

  /** Dedup-then-index: keep one doc per signature (newest batch wins —
    * SolrDeleteDuplicates semantics), serialize to JSON, write through
    * the IndexWriter lifecycle.
    */
  def index(docs: DataFrame, keyCol: String, sigCol: String, tsCol: String,
      makeWriter: () => IndexWriter): Long = {
    val w = Window.partitionBy(col(sigCol))
      .orderBy(col(tsCol).desc, col(keyCol).asc)
    val deduped = docs
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
    val json = deduped.select(to_json(struct(deduped.columns.map(col): _*))
      .as("doc"))
    val count = json.sparkSession.sparkContext.longAccumulator("indexed")
    json.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val writer = makeWriter()
      writer.open(org.apache.spark.TaskContext.getPartitionId().toLong)
      rows.foreach { r => writer.add(r.getString(0)); count.add(1) }
      writer.commit()
    }
    count.value
  }

  /** Index a crawl batch's PARSED rows from the table layout — indexing
    * follows parse in the reference lifecycle (SegParserReducer writes to
    * Solr after parse), so the doc carries parse-derived text + signature.
    */
  def indexBatch(spark: SparkSession, root: String, batchId: String,
      outDir: String): Long = {
    val parsed = spark.read.parquet(s"$root/batches/$batchId/parsed")
      .filter(col("signature").isNotNull)
      .select(col("urlHash"), col("url"), col("host"), col("contentType"),
        col("text"), hex(col("signature")).as("sig"), col("fetchEnd"),
        col("batchId"))
    index(parsed, "urlHash", "sig", "fetchEnd",
      () => new JsonlIndexWriter(outDir))
  }
}
