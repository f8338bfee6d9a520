package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.{sfDir, spark}

/** Structured Streaming coverage (SURVEY.md §2.9): the batch-incremental
  * reference semantics expressed as true streams — file-source windowed
  * aggregation with watermark, and stateful per-key sessions via
  * mapGroupsWithState. Each streaming result is cross-checked against the
  * equivalent batch computation on the same data.
  */
class StreamingSpec extends AnyFunSuite {
  import spark.implicits._

  private val eventsPath = s"$sfDir/events.parquet"
  private lazy val batchEvents = spark.read.parquet(eventsPath)

  test("file-source streaming windowed agg with watermark == batch result") {
    val schema = batchEvents.schema
    // the file stream source requires a directory
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(eventsPath),
      dir.resolve("events.parquet"))
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ -> LTZ (UTC)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"),
        col("total"))
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName("win_agg")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("win_agg")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val batch = batchEvents
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"),
        col("total"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(streamed === batch)
  }

  test("stateful mapGroupsWithState per-user counts == batch groupBy") {
    // politeness-budget-shaped state op: per-key running totals kept in
    // state across micro-batches (T3's state model in streaming form)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val counts = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Double)]) =>
          val (c0, v0) = state.getOption.getOrElse((0L, 0.0))
          val batch = rows.toSeq
          val next = (c0 + batch.size, v0 + batch.map(_._2).sum)
          state.update(next)
          (user, next._1, next._2)
      }
    val q = counts.toDF("user_id", "cnt", "total").writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName("user_state")
      .start()
    val data = batchEvents.select(col("user_id"), col("value"))
      .as[(Long, Double)].collect().toSeq
    try {
      // two micro-batches: state must carry across them
      input.addData(data.take(data.size / 2))
      q.processAllAvailable()
      input.addData(data.drop(data.size / 2))
      q.processAllAvailable()
    } finally q.stop()

    // counts are monotone across updates: max = final state
    val streamed = spark.table("user_state")
      .groupBy(col("user_id"))
      .agg(max(col("cnt")).as("cnt"))
      .as[(Long, Long)].collect().toMap
    val batch = batchEvents.groupBy(col("user_id")).count()
      .as[(Long, Long)].collect().toMap
    assert(streamed === batch)
  }
}
