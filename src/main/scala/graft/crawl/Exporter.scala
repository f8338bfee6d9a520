package graft.crawl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Export sink (S8 — reference exporter/DbExporter.java:21-165,
  * SegmentExporterJob.java:58-128: WebPageSegment rows -> RDBMS with
  * auto-ALTERed columns per extracted field).
  *
  * Spark-native form: the "extracted fields" map pivots into real columns
  * (the auto-ALTER analog is parquet schema merge across batch exports);
  * the same DataFrame writes to any JDBC target via `df.write.jdbc` in
  * production (no database ships in this sandbox — the JDBC path is the
  * one-liner below, the tested path is parquet).
  */
object Exporter {

  /** Pivot a (id, map<string,string>) segment table into a wide table with
    * one column per field key — dynamic schema like the reference's
    * TableMeta ALTER flow.
    */
  def widen(segments: DataFrame, idCol: String, mapCol: String): DataFrame = {
    val keys = segments
      .select(explode(map_keys(col(mapCol))).as("k"))
      .distinct().collect().map(_.getString(0)).sorted
    segments.select(
      col(idCol) +: keys.map(k => col(mapCol).getItem(k).as(k)): _*)
  }

  /** Export a crawl batch: frontier rows joined with their payload rows,
    * written as one wide parquet table per batch (mergeSchema on read
    * gives the accumulated auto-ALTERed view).
    */
  def exportBatch(spark: SparkSession, root: String, batchId: String,
      outDir: String): DataFrame = {
    val fetched = spark.read.parquet(s"$root/batches/$batchId/fetched")
    val payloadPath = new java.io.File(s"$root/batches/$batchId/payload")
    val base = fetched.select(col("urlHash"), col("url"), col("host"),
      col("outcome"), col("contentType"), col("fetchStart"), col("fetchEnd"),
      col("batchId"))
    val wide =
      if (payloadPath.exists()) {
        val payload = spark.read.parquet(payloadPath.getPath)
          .select(col("urlHash"), col("w"), col("h"), col("fmt"),
            col("caption"), col("phash"))
        base.join(payload, Seq("urlHash"), "left")
      } else base
    wide.write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/batch_id=$batchId")
    spark.read.option("mergeSchema", "true").parquet(outDir)
  }
}
