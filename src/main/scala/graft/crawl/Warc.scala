package graft.crawl

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.{FetchOutcome, Urls, XxHash64}

/** WARC web-archive source + sink (S9 — the reference reads the older ARC
  * format, tools/arc/ArcInputFormat.java + ArcRecordReader.java; WARC is
  * its ISO-28500 successor and what real corpus users start from). One
  * `response` record per fetched page: WARC headers, then an HTTP/1.1
  * response (status line + headers + body bytes).
  *
  * Spark-first ingestion: `binaryFile` reads each .warc whole and a
  * narrow flatMap splits records — WARC files are record-concatenated and
  * not byte-splittable without per-record gzip, so the parallel unit is
  * the file (archives ship as many ~1 GB files; at corpus scale a
  * custom splittable FileFormat over record-gzip members is the upgrade
  * path). Parsed records surface as FetchResult rows, so the SAME parse
  * stage that serves the crawl loop serves archive ingestion.
  */
object Warc {

  final case class WarcRecord(url: String, contentType: String,
      httpHeaders: Map[String, String], body: Array[Byte])

  private val CRLF = "\r\n"

  /** Render one WARC response record (WARC/1.0 headers + HTTP response). */
  def renderRecord(url: String, contentType: String,
      httpHeaders: Map[String, String], body: Array[Byte],
      dateIso: String): Array[Byte] = {
    val http = new StringBuilder()
      .append("HTTP/1.1 200 OK").append(CRLF)
      .append("Content-Type: ").append(contentType).append(CRLF)
    httpHeaders.toSeq.sortBy(_._1).foreach { case (k, v) =>
      if (k.toLowerCase != "content-type")
        http.append(k).append(": ").append(v).append(CRLF)
    }
    http.append(CRLF)
    val httpBytes = http.toString.getBytes(StandardCharsets.US_ASCII)
    val blockLen = httpBytes.length + body.length
    val warc = new StringBuilder()
      .append("WARC/1.0").append(CRLF)
      .append("WARC-Type: response").append(CRLF)
      .append("WARC-Target-URI: ").append(url).append(CRLF)
      .append("WARC-Date: ").append(dateIso).append(CRLF)
      .append("Content-Type: application/http;msgtype=response").append(CRLF)
      .append("Content-Length: ").append(blockLen).append(CRLF)
      .append(CRLF)
    val out = new ByteArrayOutputStream(256 + blockLen)
    out.write(warc.toString.getBytes(StandardCharsets.US_ASCII))
    out.write(httpBytes)
    out.write(body)
    out.write(CRLF.getBytes); out.write(CRLF.getBytes)
    out.toByteArray
  }

  private def indexOfSeq(hay: Array[Byte], needle: Array[Byte], from: Int)
      : Int = {
    var i = from
    while (i <= hay.length - needle.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Parse all response records of one WARC file's bytes.
    *
    * Robust on archives we didn't write: a malformed WARC Content-Length
    * aborts the scan (record boundaries are unknowable past it); a
    * response whose HTTP head has no CRLFCRLF terminator inside the block,
    * or a block that overruns the file, is SKIPPED and the scan continues
    * at the declared boundary. Gzipped archives (.warc.gz) fail loudly —
    * the read path decompresses by extension before this runs.
    */
  def parseRecords(bytes: Array[Byte]): Seq[WarcRecord] = {
    require(bytes.length < 2 || bytes(0) != 0x1f.toByte ||
      bytes(1) != 0x8b.toByte,
      "gzipped WARC bytes — decompress (.warc.gz) before parseRecords")
    val sep = (CRLF + CRLF).getBytes(StandardCharsets.US_ASCII)
    val out = scala.collection.mutable.ArrayBuffer[WarcRecord]()
    var pos = 0
    while (pos < bytes.length) {
      val headEnd = indexOfSeq(bytes, sep, pos)
      if (headEnd == -1) return out.toSeq
      val head = new String(bytes, pos, headEnd - pos,
        StandardCharsets.US_ASCII)
      if (!head.startsWith("WARC/")) return out.toSeq
      val fields = head.split(CRLF).drop(1).flatMap { line =>
        line.split(": ", 2) match {
          case Array(k, v) => Some(k -> v)
          case _ => None
        }
      }.toMap
      val blockLen = fields.get("Content-Length")
        .flatMap(_.trim.toIntOption).getOrElse(-1)
      if (blockLen < 0) return out.toSeq // boundary unknowable
      val blockStart = headEnd + sep.length
      val blockEnd = blockStart + blockLen
      if (fields.get("WARC-Type").contains("response") &&
          blockEnd <= bytes.length) {
        val url = fields.getOrElse("WARC-Target-URI", "")
        // split the HTTP response: headers end at the first CRLFCRLF
        // WITHIN the record block (a terminator-less head skips the record)
        val httpEnd = indexOfSeq(bytes, sep, blockStart)
        if (httpEnd >= 0 && httpEnd + sep.length <= blockEnd) {
          val httpHead = new String(bytes, blockStart, httpEnd - blockStart,
            StandardCharsets.US_ASCII)
          val httpHeaders = httpHead.split(CRLF).drop(1).flatMap { line =>
            line.split(": ", 2) match {
              case Array(k, v) => Some(k.toLowerCase -> v)
              case _ => None
            }
          }.toMap
          val bodyStart = httpEnd + sep.length
          val body = java.util.Arrays.copyOfRange(bytes, bodyStart, blockEnd)
          out += WarcRecord(url,
            httpHeaders.getOrElse("content-type", "application/octet-stream"),
            httpHeaders, body)
        }
      }
      pos = blockEnd + sep.length
    }
    out.toSeq
  }

  /** Read a directory/glob of .warc files as FetchResult rows — the same
    * shape the fetch stage emits, so `CrawlPipeline.parse` (and payloads)
    * run unchanged over archived content.
    */
  def read(spark: SparkSession, path: String, batchId: String)
      : Dataset[FetchResult] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (filePath, raw) =>
        // whole-file gzip members (.warc.gz) decompress by extension; a
        // gzip magic without the extension fails loudly in parseRecords
        // instead of silently parsing zero records
        val fileBytes =
          if (filePath.endsWith(".gz")) Parse.gunzip(raw) else raw
        parseRecords(fileBytes).flatMap { r =>
          Urls.canonicalize(r.url).map { u =>
            val host = Urls.host(u)
            FetchResult(XxHash64.hashUtf8(u, 42L), u, host,
              FetchOutcome.Success, r.contentType, null, r.body,
              r.httpHeaders.get("content-length")
                .flatMap(_.trim.toLongOption)
                .getOrElse(r.body.length.toLong),
              r.httpHeaders, "", 1.0f, 0, 0L, 0L, batchId)
          }
        }
      }
  }

  /** Write fetched rows as .warc files, one per partition (the archive
    * export sink; only Success rows with content are archivable).
    *
    * NOTE: writes through executor-local java.io — on a cluster the files
    * land on each executor's local disk, so this sink is for LOCAL-mode
    * export (tests, single-node tooling); a cluster export goes through a
    * distributed filesystem writer instead.
    */
  def write(fetched: Dataset[FetchResult], outDir: String,
      dateIso: String = "2024-01-01T00:00:00Z"): Unit = {
    new java.io.File(outDir).mkdirs()
    fetched
      .filter(r => r.outcome == FetchOutcome.Success && r.content != null)
      .foreachPartition { (rows: Iterator[FetchResult]) =>
        val part = org.apache.spark.TaskContext.getPartitionId()
        val f = new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(s"$outDir/part-$part.warc"))
        try rows.foreach { r =>
          f.write(renderRecord(r.url, r.contentType, r.headers, r.content,
            dateIso))
        } finally f.close()
      }
  }
}
