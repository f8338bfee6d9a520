package graft.functions

import org.apache.spark.sql.SparkSession

import graft.core.{Urls, XxHash64}
import graft.crawl.Parse
import graft.operators.{Dedup, TextOps}

/** SQL-facing registration of the engine's row-level functions, so every
  * operator a `spark.sql` user needs is callable without the Scala API —
  * the library equivalent of the reference's plugin-exposed field
  * functions. Column-expressible functions (langid, quality, token
  * counts) should keep using the codegen'd forms in TextOps; these
  * registrations cover the genuinely scalar/complex kernels.
  *
  * Usage: `GraftFunctions.register(spark)` once per session, then e.g.
  * `SELECT graft_simhash(text), graft_domain(graft_host(url)) FROM docs`.
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val u = spark.udf
    u.register("graft_canonicalize",
      (url: String) => Urls.canonicalize(url).orNull)
    u.register("graft_host", (url: String) => Urls.host(url))
    u.register("graft_domain", (host: String) => Urls.domain(host))
    u.register("graft_reverse_url", (url: String) => Urls.reverseUrl(url))
    u.register("graft_url_hash", (url: String) => Urls.urlHash(url))
    u.register("graft_xxh64",
      (s: String, seed: Long) => XxHash64.hashUtf8(s, seed))
    u.register("graft_simhash", (text: String) => Dedup.simHash(text))
    u.register("graft_minhash",
      (text: String, numHashes: Int, shingleLen: Int) =>
        Dedup.minHashSignature(text, numHashes, shingleLen))
    u.register("graft_fingerprint",
      (text: String) => TextOps.fingerprint(text))
    u.register("graft_langid", (text: String) => TextOps.detectLang(text))
    u.register("graft_extract_text", (html: String) => Parse.extractText(html))
    u.register("graft_extract_links",
      (html: String, baseUrl: String) =>
        Parse.extractLinks(html, baseUrl).map { case (l, a) => Array(l, a) })
    // multi-format parse dispatch (PayloadParsers): text of an HTML /
    // JSON / XML / plain / PDF / ZIP body, NULL for undispatchable or
    // unparseable content — SQL users parse archives without Scala
    u.register("graft_parse_text",
      (url: String, contentType: String, body: Array[Byte]) => {
        val po = Parse.page(url, contentType, Map.empty, body,
          if (body == null) -1L else body.length.toLong)
        if (po.status == Parse.StatusOk) po.text else null
      })
    u.register("graft_parse_links",
      (url: String, contentType: String, body: Array[Byte]) => {
        val po = Parse.page(url, contentType, Map.empty, body,
          if (body == null) -1L else body.length.toLong)
        if (po.status == Parse.StatusOk)
          po.outlinks.toSeq.map { case (l, a) => Array(l, a) }
        else null
      })
  }
}
