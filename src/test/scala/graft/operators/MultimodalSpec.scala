package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.spark
import graft.crawl.ImageCodec

class MultimodalSpec extends AnyFunSuite {
  import spark.implicits._

  private lazy val media = MultimodalOps.syntheticMedia(spark, 200).cache()

  test("image metadata extraction decodes real payloads") {
    val metas = MultimodalOps.imageMeta(media).collect()
    assert(metas.nonEmpty)
    metas.foreach { m =>
      assert(m.w >= 16 && m.w <= 48 && m.h >= 16 && m.h <= 48)
      assert(m.fmt == "png" || m.fmt == "jpeg")
      assert(m.n_bytes > 0)
    }
    // deterministic: same ids -> same phash on re-run
    val again = MultimodalOps.imageMeta(media).collect()
    assert(metas.sortBy(_.media_id).map(_.phash).toSeq ===
      again.sortBy(_.media_id).map(_.phash).toSeq)
  }

  test("resize produces decodable images at the target size, phash-similar") {
    val resized = MultimodalOps.resizeImages(media, 16, 16).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      val (px, w, h) = ImageCodec.decodePixels(r.bytes)
      assert(w === 16 && h === 16)
      assert(px.length === 256)
    }
  }

  test("audio/video stubs keep the batch contract (schema + determinism)") {
    val audio = MultimodalOps.audioFeatures(media).collect()
    assert(audio.nonEmpty)
    audio.foreach { row =>
      assert(row.getSeq[Double](1).length === 13)
    }
    val frames = MultimodalOps.videoFrameSample(media, k = 4)
    val counts = frames.groupBy("media_id").count()
      .select("count").as[Long].collect()
    assert(counts.nonEmpty && counts.forall(_ === 4L))
  }

  test("exporter widens map fields and merges schemas across batches") {
    val seg = Seq(
      (1L, Map("title" -> "a", "price" -> "9")),
      (2L, Map("title" -> "b", "author" -> "x")))
      .toDF("id", "fields")
    val wide = graft.crawl.Exporter.widen(seg, "id", "fields")
    assert(wide.columns.toSeq === Seq("id", "author", "price", "title"))
    val rows = wide.orderBy("id").collect()
    assert(rows(0).getString(3) === "a" && rows(0).getString(2) === "9")
    assert(rows(1).getAs[String]("author") === "x")
    assert(rows(1).isNullAt(2)) // price absent -> null (auto-ALTER analog)
  }
}
