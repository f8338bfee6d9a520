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
  * Spark-first ingestion, two granularities:
  *  - `read`: `binaryFile` reads each .warc whole, a narrow flatMap
  *    splits records — parallel unit = file; fine for many small files;
  *  - `readSplittable`: record-gzip `.warc.gz` archives (the Common
  *    Crawl convention) are byte-splittable at gzip member boundaries —
  *    an index stage finds validated member offsets, then ranges of
  *    ~16 MB decompress in parallel, so ONE multi-GB archive spreads
  *    over many tasks with O(range) memory.
  * Parsed records surface as FetchResult rows, so the SAME parse
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
        parseRecords(fileBytes).flatMap(toFetchResult(_, batchId))
      }
  }

  // ------------------------------------------- splittable .warc.gz read

  /** Hadoop `Configuration` is not Serializable; ship it to executors via
    * its own write/readFields (what Spark's internal wrapper does) so the
    * splittable read resolves the SAME filesystems — S3/HDFS credentials
    * included — as the driver session.
    */
  private final class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** One contiguous run of gzip members inside an archive file —
    * the task-sized unit of the splittable read.
    */
  final case class MemberRange(path: String, start: Long, end: Long)

  /** Scan raw `.warc.gz` bytes for gzip MEMBER boundaries. Archives in the
    * Common Crawl convention are one gzip member per WARC record, so the
    * file is byte-splittable at member offsets. A candidate is the gzip
    * magic (1f 8b 08); it is VALIDATED by walking the RFC 1952 header
    * (FEXTRA/FNAME/FCOMMENT tolerated) and inflating the first bytes of
    * the deflate stream — a boundary must decompress to `WARC/`. False
    * positives inside compressed payload bytes fail validation.
    */
  private[crawl] def memberOffsets(bytes: Array[Byte]): Seq[Long] =
    memberOffsets(new java.io.ByteArrayInputStream(bytes))

  /** Streaming boundary scan: fixed 4 MB window with a 1 KB validation
    * overlap — index memory is O(window) whatever the archive size.
    */
  private[crawl] def memberOffsets(in: java.io.InputStream): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    val overlap = 1024
    val chunkSize = 4 << 20
    var baseOff = 0L // file offset of buf(0)
    var absNext = 0L // next absolute offset to scan
    var carry = Array.emptyByteArray
    var eof = false
    while (!eof) {
      val fresh = new Array[Byte](chunkSize)
      var n = 0
      var r = 0
      while (n < chunkSize && r != -1) {
        r = in.read(fresh, n, chunkSize - n)
        if (r > 0) n += r
      }
      eof = r == -1
      val buf =
        if (carry.isEmpty && n == fresh.length) fresh
        else carry ++ java.util.Arrays.copyOf(fresh, n)
      // without EOF, stop STRICTLY short of the overlap boundary: a
      // candidate at exactly buf.length - overlap would validate with
      // only the 1 KB lookahead (a long FNAME/FEXTRA header could fail
      // there and the range silently coarsen) — leaving it to the next
      // round's carry re-validates it with a full window
      val limit = if (eof) buf.length - 16 else buf.length - overlap - 1
      var i = math.max(0, (absNext - baseOff).toInt)
      while (i <= limit) {
        if (buf(i) == 0x1f.toByte && buf(i + 1) == 0x8b.toByte &&
          buf(i + 2) == 0x08.toByte && validMemberAt(buf, i))
          out += baseOff + i
        i += 1
      }
      absNext = baseOff + math.max(limit + 1, 0)
      val keep = math.min(overlap, buf.length)
      baseOff += buf.length - keep
      carry = buf.takeRight(keep)
    }
    out.toSeq
  }

  private def validMemberAt(bytes: Array[Byte], off: Int): Boolean = {
    // RFC 1952 fixed header is 10 bytes; skip optional fields per FLG
    var p = off + 10
    if (p > bytes.length) return false
    val flg = bytes(off + 3) & 0xff
    if ((flg & 0x04) != 0) { // FEXTRA
      if (p + 2 > bytes.length) return false
      p += 2 + ((bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8))
    }
    if ((flg & 0x08) != 0) { // FNAME, zero-terminated
      while (p < bytes.length && bytes(p) != 0) p += 1
      p += 1
    }
    if ((flg & 0x10) != 0) { // FCOMMENT
      while (p < bytes.length && bytes(p) != 0) p += 1
      p += 1
    }
    if ((flg & 0x02) != 0) p += 2 // FHCRC
    if (p >= bytes.length) return false
    val inf = new java.util.zip.Inflater(true) // raw deflate
    try {
      inf.setInput(bytes, p, math.min(512, bytes.length - p))
      val head = new Array[Byte](5)
      var got = 0
      while (got < 5 && !inf.finished() && !inf.needsInput() &&
        !inf.needsDictionary()) {
        val n = inf.inflate(head, got, 5 - got)
        if (n == 0) return false
        got += n
      }
      got == 5 && new String(head, StandardCharsets.US_ASCII) == "WARC/"
    } catch {
      case _: java.util.zip.DataFormatException => false
    } finally inf.end()
  }

  /** Group member offsets into ~`targetChunkBytes` compressed ranges —
    * one task decompresses one range, so peak memory is O(chunk), not
    * O(archive).
    */
  private[crawl] def rangesOf(path: String, offsets: Seq[Long],
      fileLen: Long, targetChunkBytes: Long): Seq[MemberRange] = {
    if (offsets.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer[MemberRange]()
    var start = offsets.head
    var idx = 1
    while (idx <= offsets.length) {
      val end = if (idx == offsets.length) fileLen else offsets(idx)
      if (end - start >= targetChunkBytes || idx == offsets.length) {
        out += MemberRange(path, start, end)
        start = end
      }
      idx += 1
    }
    out.toSeq
  }

  /** Splittable read of record-gzip `.warc.gz` archives: a multi-GB
    * archive spreads over MANY tasks instead of one (the in-file
    * parallelism the whole-file `read` lacks).
    *
    * Two Spark stages, both narrow:
    *  1. index — one task per FILE scans raw bytes for validated gzip
    *     member boundaries (byte scan + 5-byte trial inflations; no full
    *     decompression) and emits ~`targetChunkBytes` member ranges;
    *  2. parse — ranges repartition round-robin; each task seeks to its
    *     range (Hadoop FileSystem API — local/HDFS/S3 alike), reads the
    *     compressed span, and `GZIPInputStream` walks the concatenated
    *     members natively. Peak memory per task is one range + its
    *     decompressed records, never the archive.
    *
    * Whole-file gzip archives (one giant member) yield a single range —
    * same behavior as `read`, no worse. Plain `.warc` files should use
    * `read`.
    */
  def readSplittable(spark: SparkSession, path: String, batchId: String,
      targetChunkBytes: Long = 16L << 20): Dataset[FetchResult] = {
    import spark.implicits._
    val confBc = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    // plain (non-.gz) .warc files matched by the glob are NOT dropped:
    // they get one whole-file range each and skip gunzip in the parse
    // stage (no silent cap — a directory mixing .warc and .warc.gz reads
    // completely; a plain WARC has no member boundaries to split on)
    val files = spark.read.format("binaryFile").load(path)
      .select("path").as[String]
    val ranges = files.flatMap { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(confBc.value.value)
      val len = fs.getFileStatus(hp).getLen
      if (!p.endsWith(".gz")) Seq(MemberRange(p, 0L, len))
      else {
        val in = fs.open(hp)
        val offsets = try memberOffsets(in) finally in.close()
        rangesOf(p, offsets, len, targetChunkBytes)
      }
    }.collect() // ~1 row per 16 MB of archive: tiny on the driver
    spark.createDataset(ranges.toSeq)
      .repartition(math.max(1, ranges.length))
      .flatMap { r =>
        val span = readRange(r.path, r.start, r.end, confBc.value.value)
        val records =
          if (r.path.endsWith(".gz")) Parse.gunzip(span) else span
        parseRecords(records).flatMap(toFetchResult(_, batchId))
      }
  }

  private def readRange(path: String, start: Long, end: Long,
      conf: org.apache.hadoop.conf.Configuration): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte]((end - start).toInt)
      in.readFully(start, bytes)
      bytes
    } finally in.close()
  }

  private def toFetchResult(r: WarcRecord, batchId: String)
      : Option[FetchResult] =
    Urls.canonicalize(r.url).map { u =>
      val host = Urls.host(u)
      FetchResult(XxHash64.hashUtf8(u, 42L), u, host,
        FetchOutcome.Success, r.contentType, null, r.body,
        r.httpHeaders.get("content-length")
          .flatMap(_.trim.toLongOption)
          .getOrElse(r.body.length.toLong),
        r.httpHeaders, "", 1.0f, 0, 0L, 0L, batchId)
    }

  // --------------------------------------------------- streaming source

  /** Continuous archive ingestion as a Structured Streaming source:
    * `.warc`/`.warc.gz` files LANDING in a directory stream through the
    * SAME record parse as the batch paths — drop an archive in, its
    * records flow out, exactly once per file (the file-source commit
    * log). Compose with `dropDuplicates("urlHash")` (+ a watermark on
    * `fetchStart` in production) for a streaming URL-seen gate, or
    * `writeStream.foreachBatch` into the frontier/index sinks.
    *
    * Whole files are the streaming unit (one task per file per
    * micro-batch); backfill of a huge single archive belongs to
    * [[readSplittable]].
    */
  def readStream(spark: SparkSession, dir: String, batchId: String)
      : Dataset[FetchResult] = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .load(dir)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (filePath, raw) =>
        val fileBytes =
          if (filePath.endsWith(".gz")) Parse.gunzip(raw) else raw
        parseRecords(fileBytes).flatMap(toFetchResult(_, batchId))
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
