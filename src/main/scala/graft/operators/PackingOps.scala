package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Token-budget sequence packing: assign documents, in a deterministic
  * global order, to fixed-token-budget shards — the concatenate-then-chunk
  * step that turns a curated corpus into pretraining shards. A doc's shard
  * is `floor(exclusive-prefix-sum(tokens) / budget)`: docs are laid end to
  * end and the stream is cut every `budget` tokens, so a shard overshoots
  * only by its straddling doc (which training pipelines truncate — the
  * assignment, not the split, is the engine's job).
  *
  * Scale shape: a global running total LOOKS sequential, but is the
  * textbook two-pass distributed prefix sum — (1) range-partition by the
  * sort key and locally sum each partition (one narrow pass), (2) collect
  * the P per-partition sums (P longs — bounded driver data, NOT rows),
  * prefix them into per-partition start offsets, broadcast, (3) second
  * narrow pass streams each partition with its offset. No global sort on
  * one task, no window-over-everything (Spark executes an unpartitioned
  * `sum() over (order by ...)` in a SINGLE partition — the one-liner that
  * does not survive scale-up and the reason this is mapPartitions).
  */
object PackingOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** (doc_id, n_toks, shard) for every document: whitespace token count
    * (the q_token_count semantics) and the doc's fixed-budget shard in
    * doc_id order. `parts` bounds partition count for the range pass.
    */
  def packSequences(s: SparkSession, dir: String, budget: Long = 4096L,
      parts: Int = 0): DataFrame = {
    import s.implicits._
    val nParts = if (parts > 0) parts
      else s.sparkContext.defaultParallelism
    // both passes run over the SAME RDD object: partition index i then
    // provably holds the same doc range in both (re-deriving `.rdd` or
    // using Dataset.mapPartitions for pass 2 gave no such guarantee —
    // the replanned stage renumbered partitions and offsets landed on
    // the wrong ranges)
    val rdd = docs(s, dir)
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= lit("")))
          .cast("long").as("n_toks"))
      .repartitionByRange(nParts, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .as[(Long, Long)]
      .rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-partition token sums; P longs to the driver, prefixed
    // into exclusive start offsets
    val partSums = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var sum = 0L
        it.foreach(sum += _._2)
        Iterator((pid, sum))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val offsetsBc = s.sparkContext.broadcast(offsets)
    // pass 2: stream each partition with its global start offset
    val packed = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var running = offsetsBc.value(pid)
        it.map { case (id, n) =>
          val shard = running / budget
          running += n
          (id, n, shard)
        }
      }
    s.createDataset(packed).toDF("doc_id", "n_toks", "shard")
  }

  val oracles: Map[String, String] = Map(
    // DuckDB can afford the window-over-everything form at oracle scale;
    // the exclusive prefix sum reproduces the two-pass result exactly
    "q_pack_sequences" ->
      ("SELECT doc_id, n_toks, (cum - n_toks) // 4096 AS shard FROM (" +
        "SELECT doc_id, n_toks, sum(n_toks) OVER (ORDER BY doc_id " +
        "ROWS UNBOUNDED PRECEDING) AS cum FROM (" +
        "SELECT doc_id, len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_toks " +
        "FROM documents))"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pack_sequences" -> ((s, d) => packSequences(s, d)))
}
