package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]` vectors).
  *
  * Brute-force cosine top-k is the exactness baseline (SQL-oracle-checked);
  * the LSH-bucketed variant is the 100 TB path: random-hyperplane signatures
  * prune candidates so the pair join is per-bucket, not |Q|x|N|. All vector
  * math is codegen'd `zip_with`/`aggregate` over doubles — no UDF.
  */
object SimilarityOps {

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Cosine similarity of two double-array columns, left-to-right
    * accumulation (bit-compatible with DuckDB's list_cosine_similarity on
    * DOUBLE[]).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), _ + _)
    val na = sqrt(aggregate(zip_with(a, a, (x, y) => x * y), lit(0.0), _ + _))
    val nb = sqrt(aggregate(zip_with(b, b, (x, y) => x * y), lit(0.0), _ + _))
    dot / (na * nb)
  }

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Brute-force cosine top-k: the first `nQueries` vectors against the
    * whole table. The query side broadcasts (it is tiny); the candidate
    * scan is embarrassingly parallel; ranking is one window shuffle over
    * |Q|x|N| scored rows. Ranked on ROUNDED similarity + id tie-break so
    * the ranking is reproducible across engines.
    */
  def cosineTopK(s: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5)
      : DataFrame = {
    val e = emb(s, dir).select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("v"), col("qv")), 4).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"), col("rn"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * a fixed hash mapped to [-1, 1). Seeded — no RNG state anywhere.
    */
  private def hyperplane(p: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { i =>
      val h = graft.core.XxHash64.hashLong(p.toLong << 32 | i.toLong, 99L)
      (h.toDouble / Long.MaxValue.toDouble)
    }

  /** Explode a vector table into one row per (LSH table, bucket).
    * Multi-table random-hyperplane LSH: `nTables` independent tables of
    * `planesPerTable` sign bits each. A pair of similar vectors collides in
    * at least one table with probability 1-(1-p^b)^L where p = 1 - theta/pi.
    * Everything is codegen'd column math; the (table, bucket) pair is a
    * plain shuffle key.
    */
  private def withBuckets(e: DataFrame, nTables: Int, planesPerTable: Int,
      dim: Int): DataFrame = {
    val tables = (0 until nTables).map { t =>
      val planes = (0 until planesPerTable)
        .map(p => hyperplane(t * planesPerTable + p, dim))
      val planesLit = array(planes.map(p => array(p.map(lit): _*)): _*)
      struct(lit(t).as("tbl"),
        aggregate(
          transform(planesLit, pl =>
            when(aggregate(zip_with(col("v"), pl, (x, y) => x * y),
              lit(0.0), _ + _) >= 0, lit(1L)).otherwise(lit(0L))),
          lit(0L), (acc, bit) => acc * 2 + bit).as("bucket"))
    }
    e.withColumn("tb", explode(array(tables: _*)))
      .select(col("*"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      .drop("tb")
  }

  /** LSH-bucketed ANN: candidates = vectors sharing (table, bucket) with
    * the query in ANY of the tables, deduped, then exactly scored and
    * ranked. Scale path: candidate generation is a co-partitioned equi-join
    * on the bucket key — no |Q|x|N| scan. Recall vs the brute-force
    * baseline is asserted in OperatorsSpec.
    */
  def cosineTopKLsh(s: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 5, nTables: Int = 8, planesPerTable: Int = 4, dim: Int = 64)
      : DataFrame = {
    val e = emb(s, dir).select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val bucketed = withBuckets(e, nTables, planesPerTable, dim)
    val q = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("tbl"), col("bucket"))
    val candidates = bucketed.join(q, Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("v"), col("qv"))
      .dropDuplicates("query_id", "vec_id")
    val scored = candidates.select(col("query_id"), col("vec_id"),
      round(cosine(col("v"), col("qv")), 4).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"), col("rn"))
  }

  /** Embedding near-duplicate detection: pairs with cosine >= threshold,
    * LSH-blocked (multi-table), exactly verified within bucket.
    */
  def embeddingNearDup(s: SparkSession, dir: String, threshold: Double = 0.95,
      nTables: Int = 8, planesPerTable: Int = 4, dim: Int = 64): DataFrame = {
    val e = emb(s, dir).select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val bucketed = withBuckets(e, nTables, planesPerTable, dim)
    val a = bucketed.select(col("tbl"), col("bucket"),
      col("vec_id").as("id_a"), col("v").as("va"))
    val b = bucketed.select(col("tbl"), col("bucket"),
      col("vec_id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va"), col("vb")), 4).as("sim"))
      .filter(col("sim") >= threshold)
  }

  val oracles: Map[String, String] = Map(
    "q_cosine_topk" ->
      ("SELECT query_id, vec_id, sim, rn FROM (" +
        "SELECT q.vec_id AS query_id, e.vec_id AS vec_id, " +
        "round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS sim, " +
        "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
        "round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) DESC, e.vec_id ASC) AS rn " +
        "FROM embeddings e CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 10) q " +
        "WHERE e.vec_id <> q.vec_id) WHERE rn <= 5"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cosine_topk" -> ((s, d) => cosineTopK(s, d)),
    "q_cosine_topk_lsh" -> ((s, d) => cosineTopKLsh(s, d)),
    "q_embedding_near_dup" -> ((s, d) => embeddingNearDup(s, d)))
}
