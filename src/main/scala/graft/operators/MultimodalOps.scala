package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.crawl.ImageCodec

/** Multimodal columns for a training-data pipeline: media payloads as
  * opaque `binary` columns with typed metadata, processed per-partition
  * (the Scala analog of `mapInPandas` batch processing — one decoder
  * instance per partition, streaming iterator, no per-row setup cost).
  *
  * Image decode/resize are REAL (javax.imageio). Audio feature extraction
  * and video frame sampling are STUBBED — the codec libraries are not in
  * this container — behind deterministic fakes clearly marked below; the
  * Spark-side plumbing (schema, partitioning, batch iteration) is real and
  * tested in MultimodalSpec.
  */
object MultimodalOps {

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      fmt: String)
  final case class ImageMeta(media_id: Long, w: Int, h: Int, fmt: String,
      phash: Long, n_bytes: Int)

  /** Media spec derived from md5 hex nibbles of the id — arithmetic BOTH
    * engines can express (Spark md5() == DuckDB md5()), which is what lets
    * the driver's DuckDB oracle gate q_media_stats: the oracle computes
    * the EXPECTED dimensions from this formula while the Spark side must
    * recover them by actually decoding the encoded bytes.
    */
  private[operators] def specOf(i: Long): (String, Int, Int, String) = {
    val hex = graft.core.Signature.md5Hex(
      i.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8), "")
    def hv(k: Int): Int = "0123456789abcdef".indexOf(hex.charAt(k - 1))
    val kind = hv(1) % 4 match {
      case 0 | 1 => "image"
      case 2 => "audio"
      case _ => "video"
    }
    val w = 16 + (hv(2) * 16 + hv(3)) % 33
    val h = 16 + (hv(4) * 16 + hv(5)) % 33
    val fmt = if (hv(6) % 2 == 0) "png" else "jpeg"
    (kind, w, h, fmt)
  }

  /** Deterministic synthetic media table: real encoded images, opaque
    * audio/video byte blobs (seeded).
    */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val seed = graft.core.XxHash64.hashLong(i, 11L)
      specOf(i) match {
        case ("image", w, h, fmt) =>
          MediaRow(i, "image",
            ImageCodec.encode(ImageCodec.pixels(seed, w, h), w, h, fmt), fmt)
        case ("audio", _, _, _) =>
          val bytes = Array.tabulate(2048)(j =>
            (graft.core.XxHash64.hashLong(seed + j, 13L) & 0xFF).toByte)
          MediaRow(i, "audio", bytes, "pcm16")
        case (_, _, _, _) =>
          val bytes = Array.tabulate(4096)(j =>
            (graft.core.XxHash64.hashLong(seed + j, 17L) & 0xFF).toByte)
          MediaRow(i, "video", bytes, "raw")
      }
    }
  }

  /** REAL image decode + metadata/fingerprint extraction, one partition at
    * a time (mapPartitions = the mapInPandas batch shape).
    */
  def imageMeta(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      rows.map { r =>
        val (px, w, h) = ImageCodec.decodePixels(r.bytes)
        ImageMeta(r.media_id, w, h, r.fmt, ImageCodec.phash(px, w, h),
          r.bytes.length)
      }
    }
  }

  /** REAL image resize: box-downsample decoded pixels to (tw, th), re-encode
    * lossless. Returns (media_id, bytes) with the new payload.
    */
  def resizeImages(media: Dataset[MediaRow], tw: Int, th: Int)
      : Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      rows.map { r =>
        val (px, w, h) = ImageCodec.decodePixels(r.bytes)
        val out = new Array[Int](tw * th)
        var y = 0
        while (y < th) {
          var x = 0
          while (x < tw) {
            // nearest-pixel box sample (sufficient for thumbnails)
            val sx = math.min(w - 1, x * w / tw)
            val sy = math.min(h - 1, y * h / th)
            out(y * tw + x) = px(sy * w + sx)
            x += 1
          }
          y += 1
        }
        r.copy(bytes = ImageCodec.encode(out, tw, th, "png"), fmt = "png")
      }
    }
  }

  /** STUB — audio feature extraction. A real implementation would decode
    * PCM/OGG and compute MFCC frames; no audio codec ships in this
    * container, so features are a deterministic fake derived from the
    * payload bytes. Schema and batching are the real contract.
    */
  def audioFeatures(media: Dataset[MediaRow], nMfcc: Int = 13)
      : DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions { rows =>
      rows.map { r =>
        // ??? real decoder goes here; fake = seeded projection of bytes
        val feats = Array.tabulate(nMfcc) { k =>
          val h = graft.core.XxHash64.hashBytes(r.bytes, k.toLong)
          (h.toDouble / Long.MaxValue) * 10.0
        }
        (r.media_id, feats)
      }
    }.toDF("media_id", "mfcc_mean")
  }

  /** STUB — video frame sampling. A real implementation would demux and
    * decode k evenly-spaced frames; here each "frame" is a deterministic
    * slice fingerprint of the payload. Output shape (one row per sampled
    * frame, frame index + fingerprint) is the real contract.
    */
  def videoFrameSample(media: Dataset[MediaRow], k: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val step = math.max(1, r.bytes.length / k)
      (0 until k).map { f =>
        val slice = r.bytes.slice(f * step, math.min(r.bytes.length,
          (f + 1) * step))
        // ??? real frame decode goes here
        (r.media_id, f, graft.core.XxHash64.hashBytes(slice, 23L))
      }
    }.toDF("media_id", "frame_idx", "frame_fp")
  }

  /** Driver-facing query: media inventory stats over a synthetic media
    * table. Image dimensions are recovered by DECODING the real encoded
    * bytes (the full binary-column plumbing), while the DuckDB oracle
    * computes the same dimensions from the md5 spec formula — a decode
    * that dropped or distorted a single image fails the hash gate.
    */
  def mediaStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = syntheticMedia(spark, 400)
    val img = imageMeta(media)
      .select(lit("image").as("kind"), col("w"), col("h"))
    val rest = media.filter(r => r.kind != "image")
      .map(r => (r.kind, 0, 0)).toDF("kind", "w", "h")
    img.union(rest)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("cnt"),
        round(avg(col("w")), 4).as("avg_w"),
        round(avg(col("h")), 4).as("avg_h"))
  }

  /** The md5-nibble spec formula, expressed in DuckDB SQL (hv(k) =
    * instr('0123456789abcdef', substr(md5(i), k, 1)) - 1).
    */
  val oracles: Map[String, String] = Map(
    "q_media_stats" ->
      ("WITH m AS (SELECT i, md5(CAST(i AS VARCHAR)) AS x FROM range(400) t(i)), " +
        "spec AS (SELECT i, " +
        "CASE WHEN (instr('0123456789abcdef', substr(x, 1, 1)) - 1) % 4 <= 1 THEN 'image' " +
        "WHEN (instr('0123456789abcdef', substr(x, 1, 1)) - 1) % 4 = 2 THEN 'audio' ELSE 'video' END AS kind, " +
        "16 + ((instr('0123456789abcdef', substr(x, 2, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(x, 3, 1)) - 1)) % 33 AS w, " +
        "16 + ((instr('0123456789abcdef', substr(x, 4, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(x, 5, 1)) - 1)) % 33 AS h " +
        "FROM m) " +
        "SELECT kind, count(*) AS cnt, " +
        "round(avg(CASE WHEN kind = 'image' THEN w ELSE 0 END), 4) AS avg_w, " +
        "round(avg(CASE WHEN kind = 'image' THEN h ELSE 0 END), 4) AS avg_h " +
        "FROM spec GROUP BY kind"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_stats" -> (mediaStats _))
}
