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

  /** One (LSH table, bucket) membership row; primitive vector for the
    * JVM-speed pair loop.
    */
  final case class VecBucket(tbl: Int, bucket: Long, vecId: Long,
      v: Array[Double], nrm: Double)

  private def dotArr(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def round4(x: Double): Double = math.rint(x * 1e4) / 1e4

  /** Catalyst `round(col, 4)` semantics for doubles (Round expression:
    * shortest-decimal BigDecimal, HALF_UP, NaN/Inf passthrough) — lets a
    * JVM-loop scoring path emit values bit-identical to the Column form
    * it replaces.
    */
  private def roundHalfUp4(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x).setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** Bounded per-query top-k buffer ordered by (sim DESC, id ASC) — the
    * window ordering every top-k query ranks with. Insertion keeps the k
    * best; ties use the id. Used by the mapPartitions scoring paths so
    * the final window ranks a few hundred pre-pruned rows instead of the
    * full |Q|x|candidates| score matrix (the global top-k is always a
    * subset of the per-partition top-k under the same ordering).
    */
  private final class TopK(k: Int) {
    private val sims = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0
    private def beats(s: Double, id: Long, i: Int): Boolean = {
      // Spark sorts doubles with NaN greatest (descending => first)
      val c = java.lang.Double.compare(s, sims(i))
      c > 0 || (c == 0 && id < ids(i))
    }
    def add(sim: Double, id: Long): Unit = {
      if (n < k) {
        var j = n
        while (j > 0 && beats(sim, id, j - 1)) {
          sims(j) = sims(j - 1); ids(j) = ids(j - 1); j -= 1
        }
        sims(j) = sim; ids(j) = id
        n += 1
      } else if (beats(sim, id, k - 1)) {
        var j = k - 1
        while (j > 0 && beats(sim, id, j - 1)) {
          sims(j) = sims(j - 1); ids(j) = ids(j - 1); j -= 1
        }
        sims(j) = sim; ids(j) = id
      }
    }
    def result: Iterator[(Long, Double)] =
      (0 until n).iterator.map(i => (ids(i), sims(i)))
  }

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Dot product of two fixed-dim double-array columns, unrolled into a
    * straight-line codegen'd expression tree (element_at + multiply-add).
    * Left-to-right addition keeps bit-parity with DuckDB's sequential
    * list_cosine_similarity on DOUBLE[]. The higher-order
    * aggregate(zip_with(...)) form evaluates lambdas per element — 8x
    * slower on the candidate-pair hot path (measured 74s -> seconds at
    * 2000x2000 candidates).
    */
  def dot(a: Column, b: Column, dim: Int): Column =
    (0 until dim).map(i => a.getItem(i) * b.getItem(i)).reduce(_ + _)

  /** Cosine from a precomputed-norm pair: dot / (nrmA * nrmB). */
  def cosine(a: Column, b: Column, nrmA: Column, nrmB: Column, dim: Int)
      : Column = dot(a, b, dim) / (nrmA * nrmB)

  /** Cosine with inline norms (oracle-parity path). */
  def cosine(a: Column, b: Column, dim: Int): Column =
    dot(a, b, dim) / (sqrt(dot(a, a, dim)) * sqrt(dot(b, b, dim)))

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Brute-force cosine top-k: the first `nQueries` vectors against the
    * whole table. The query side broadcasts (it is tiny); the candidate
    * scan is embarrassingly parallel; ranking is one window shuffle over
    * the per-partition top-k survivors. Ranked on ROUNDED similarity +
    * id tie-break so the ranking is reproducible across engines.
    *
    * Round-7: the |Q|x|N| score matrix is computed in a partition-local
    * JVM loop instead of a Catalyst Project — the unrolled 3x64-term
    * expression tree (dot + both norms) exceeded the codegen method
    * limits and fell back to interpreted eval, measuring 15-18 s at
    * sf0.1 vs <1 s for this loop producing bit-identical output (same
    * left-to-right summation, same Catalyst round semantics via
    * roundHalfUp4). Each partition keeps only its k best rows per query
    * (TopK, same (sim DESC, id ASC) order as the window), so the window
    * input shrinks from |Q|x|N| to |Q|x k x #partitions.
    */
  def cosineTopK(s: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5,
      dim: Int = 64): DataFrame = {
    import s.implicits._
    val e = emb(s, dir).select(col("vec_id"), col("embedding"))
    val qs = e.filter(col("vec_id") < nQueries)
      .as[(Long, Array[Float])].collect()
      .sortBy(_._1)
      .map { case (id, vf) =>
        val v = vf.map(_.toDouble)
        (id, v, math.sqrt(dotArr(v, v)))
      }
    val bc = s.sparkContext.broadcast(qs)
    val partial = e.as[(Long, Array[Float])].mapPartitions { it =>
      val queries = bc.value
      val heaps = queries.map(_ => new TopK(k))
      it.foreach { case (id, vf) =>
        val v = vf.map(_.toDouble)
        val nrm = math.sqrt(dotArr(v, v))
        var qi = 0
        while (qi < queries.length) {
          val (qid, qv, qn) = queries(qi)
          if (id != qid)
            heaps(qi).add(roundHalfUp4(dotArr(v, qv) / (nrm * qn)), id)
          qi += 1
        }
      }
      queries.iterator.zip(heaps.iterator).flatMap { case ((qid, _, _), h) =>
        h.result.map { case (id, sim) => (qid, id, sim) }
      }
    }.toDF("query_id", "vec_id", "sim")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    partial.withColumn("rn", row_number().over(w))
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

  /** Hot-bucket cap: a popular LSH bucket does O(|bucket|^2) pair work in
    * one task — at corpus scale one dense bucket becomes a multi-hour
    * straggler. Buckets above `cap` are recursively re-split with EXTRA
    * hyperplanes (escalated banding: similar vectors keep landing
    * together, so top-k recall degrades gracefully, not arbitrarily).
    * Degenerate masses that no hyperplane separates (near-identical
    * vectors) fall back to overlapping id-sorted windows (stride cap/2):
    * task time stays O(cap^2) and transitive near-dup connectivity is
    * preserved through the window overlap.
    */
  private[operators] def capBuckets(members: Array[VecBucket], cap: Int,
      dim: Int): Iterator[Array[VecBucket]] = {
    def windows(ms: Array[VecBucket]): Iterator[Array[VecBucket]] = {
      val sorted = ms.sortBy(_.vecId)
      val stride = math.max(1, cap / 2)
      (0 until sorted.length by stride).iterator
        .map(i => sorted.slice(i, math.min(sorted.length, i + cap)))
        .filter(_.length > 1)
    }
    def split(ms: Array[VecBucket], depth: Int): Iterator[Array[VecBucket]] =
      if (ms.length <= cap) Iterator.single(ms)
      else if (depth >= 24) windows(ms)
      else {
        val plane = hyperplane(1 << 20 | ms.head.tbl << 8 | depth, dim)
        val (pos, neg) = ms.partition(m => dotArr(m.v, plane) >= 0)
        if (pos.isEmpty || neg.isEmpty) windows(ms)
        else split(pos, depth + 1) ++ split(neg, depth + 1)
      }
    split(members, 0)
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
    e.withColumn("nrm", sqrt(dot(col("v"), col("v"), dim)))
      .withColumn("tb", explode(array(tables: _*)))
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
      k: Int = 5, nTables: Int = 8, planesPerTable: Int = 4, dim: Int = 64,
      bucketCap: Int = 512): DataFrame = {
    import s.implicits._
    val e = emb(s, dir).select(col("vec_id"), asDouble(col("embedding")).as("v"))
    // Round-7 pre-filter: only buckets CONTAINING a query can emit rows
    // (flatMapGroups yields nothing when `queries` is empty), so compute
    // the |Q| x nTables query bucket keys driver-side — the same planes
    // and fold order as toVecBuckets — and drop every other bucket
    // BEFORE the shuffle. The 8-table explode shipped the full vector
    // payload of all 8|N| membership rows; now only rows colliding with
    // a query bucket shuffle. Output unchanged: the filter keeps or
    // drops whole (tbl, bucket) groups, never individual members.
    val planesQ = Array.tabulate(nTables * planesPerTable)(p =>
      hyperplane(p, dim))
    val queryBuckets: Set[Long] = emb(s, dir)
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .as[(Long, Array[Double])].collect()
      .flatMap { case (_, v) =>
        (0 until nTables).map { t =>
          var bucket = 0L
          var p = 0
          while (p < planesPerTable) {
            bucket = bucket * 2 +
              (if (dotArr(v, planesQ(t * planesPerTable + p)) >= 0) 1L else 0L)
            p += 1
          }
          (t.toLong << 32) | bucket
        }
      }.toSet
    val qbBc = s.sparkContext.broadcast(queryBuckets)
    val bucketed = toVecBuckets(e, nTables, planesPerTable, dim)
      .filter(r => qbBc.value.contains((r.tbl.toLong << 32) | r.bucket))
    // pair scoring inside the bucket group at JVM speed: clustered data
    // makes LSH buckets genuinely dense, so the candidate volume is
    // millions of pairs — Catalyst array element access was an ~80x
    // penalty on this hot loop (measured 40s -> ~2s at 2000 vectors).
    // capBuckets bounds each group's pair loop at O(cap^2).
    val scored = bucketed
      .groupByKey(r => (r.tbl, r.bucket))
      .flatMapGroups { (_: (Int, Long), it: Iterator[VecBucket]) =>
        capBuckets(it.toArray, bucketCap, dim).flatMap { members =>
          val queries = members.filter(_.vecId < nQueries)
          for {
            q <- queries.iterator
            c <- members.iterator if c.vecId != q.vecId
          } yield (q.vecId, c.vecId,
            round4(dotArr(q.v, c.v) / (q.nrm * c.nrm)))
        }
      }
      .toDF("query_id", "vec_id", "sim")
      .dropDuplicates("query_id", "vec_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"), col("rn"))
  }

  /** Bucketed membership as a typed Dataset (hyperplane signs computed
    * row-wise in JVM code — same deterministic planes as withBuckets).
    */
  private def toVecBuckets(e: DataFrame, nTables: Int, planesPerTable: Int,
      dim: Int): org.apache.spark.sql.Dataset[VecBucket] = {
    import e.sparkSession.implicits._
    val planes = Array.tabulate(nTables * planesPerTable)(p =>
      hyperplane(p, dim))
    e.select(col("vec_id"), col("v")).as[(Long, Array[Double])]
      .flatMap { case (id, v) =>
        val nrm = math.sqrt(dotArr(v, v))
        (0 until nTables).map { t =>
          var bucket = 0L
          var p = 0
          while (p < planesPerTable) {
            val d = dotArr(v, planes(t * planesPerTable + p))
            bucket = bucket * 2 + (if (d >= 0) 1L else 0L)
            p += 1
          }
          VecBucket(t, bucket, id, v, nrm)
        }
      }
  }

  /** Deterministic spherical k-means over a bounded sample — the IVF
    * coarse quantizer. Driver-side on purpose: IVF trains on a SAMPLE at
    * any corpus scale (a 2048x64 double matrix here), so the training
    * cost is constant while assignment/probing stay fully distributed.
    * Seeds = the first `nCells` sample rows (the sample itself is
    * hash-ordered, so seeding is deterministic); `iters` Lloyd rounds
    * with dot-product assignment over unit vectors.
    */
  private[operators] def trainCentroids(sample: Array[Array[Double]],
      nCells: Int, iters: Int = 8): Array[Array[Double]] = {
    val dim = sample.head.length
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(dotArr(v, v))
      if (n == 0) v else v.map(_ / n)
    }
    val pts = sample.map(unit)
    var centroids = pts.take(nCells).map(_.clone)
    for (_ <- 0 until iters) {
      val sums = Array.fill(nCells)(new Array[Double](dim))
      val counts = new Array[Int](nCells)
      pts.foreach { p =>
        var best = 0
        var bestD = Double.NegativeInfinity
        var c = 0
        while (c < centroids.length) {
          val d = dotArr(p, centroids(c))
          if (d > bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
        counts(best) += 1
      }
      centroids = Array.tabulate(nCells)(c =>
        if (counts(c) == 0) centroids(c) else unit(sums(c)))
    }
    centroids
  }

  /** IVF (inverted-file) ANN — the second classic ANN family next to
    * LSH: a coarse quantizer of `nCells` spherical-k-means centroids,
    * every vector assigned to its nearest cell (one narrow map), queries
    * probing their `nProbe` nearest cells, exact rerank of the cell
    * members. Candidate generation is an equi-join on the cell id — the
    * same single-shuffle scale shape as the LSH variant — but the cells
    * ADAPT to the data distribution, so recall at an equal candidate
    * budget is typically higher on clustered corpora (asserted vs the
    * brute-force baseline in OperatorsSpec).
    */
  def cosineTopKIvf(s: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 5, nCells: Int = 16, nProbe: Int = 4, dim: Int = 64,
      sampleN: Int = 2048): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    // deterministic bounded training sample: lowest-hash rows
    val sample = e.withColumn("h", xxhash64(col("vec_id")))
      .orderBy(col("h")).limit(sampleN)
      .select(col("v")).as[Array[Double]].collect()
    val centroids = trainCentroids(sample, nCells)
    // centroids are tiny (nCells x dim doubles): captured by value in the
    // task closures — no broadcast bookkeeping needed
    val nearestCells: (Array[Double], Int) => Seq[Int] = (v, n) => {
      val nrm = math.sqrt(dotArr(v, v))
      val u = if (nrm == 0) v else v.map(_ / nrm)
      centroids.indices.map(c => (dotArr(u, centroids(c)), c))
        .sortBy { case (d, c) => (-d, c) }.take(n).map(_._2)
    }

    // Round-7: the probe side is |Q| rows — collect it driver-side, key
    // the probes by cell in a broadcast map, and score candidates in a
    // partition-local JVM loop with per-partition top-k (TopK). The
    // previous broadcast JOIN carried the 64-double query vector per
    // candidate row and scored through an unrolled Catalyst dot (the
    // interpreted-eval hot spot q_cosine_topk had); this computes the
    // identical rounded sims (same summation order, Catalyst round
    // semantics) with one narrow scan and a tiny window input.
    val probesByCell: Map[Int, Array[(Long, Array[Double], Double)]] =
      e.filter(col("vec_id") < nQueries)
        .as[(Long, Array[Double])].collect()
        .sortBy(_._1)
        .flatMap { case (id, v) =>
          val nrm = math.sqrt(dotArr(v, v))
          nearestCells(v, nProbe).map(c => (c, (id, v, nrm)))
        }
        .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2) }
    val pBc = s.sparkContext.broadcast(probesByCell)
    val scoredPartial = e.as[(Long, Array[Double])].mapPartitions { it =>
      val byCell = pBc.value
      val heaps = scala.collection.mutable.LongMap[TopK]()
      it.foreach { case (id, v) =>
        val cell = nearestCells(v, 1).head
        byCell.get(cell).foreach { probes =>
          val nrm = math.sqrt(dotArr(v, v))
          var i = 0
          while (i < probes.length) {
            val (qid, qv, qnrm) = probes(i)
            if (id != qid)
              heaps.getOrElseUpdate(qid, new TopK(k))
                .add(roundHalfUp4(dotArr(v, qv) / (nrm * qnrm)), id)
            i += 1
          }
        }
      }
      heaps.iterator.flatMap { case (qid, h) =>
        h.result.map { case (id, sim) => (qid, id, sim) }
      }
    }.toDF("query_id", "vec_id", "sim")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scoredPartial.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"), col("rn"))
  }

  /** Plain (L2) k-means over sub-vectors — the PQ codebook trainer.
    * Driver-side on the same bounded sample as IVF: training cost is
    * constant at any corpus size. Deterministic: first-k seeding over
    * the hash-ordered sample, fixed Lloyd rounds, mean update.
    */
  private[operators] def trainCodebook(sub: Array[Array[Double]],
      kCodes: Int, iters: Int = 8): Array[Array[Double]] = {
    val dim = sub.head.length
    var cb = sub.take(kCodes).map(_.clone)
    def nearest(p: Array[Double]): Int = {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        var d = 0.0
        var i = 0
        while (i < dim) { val t = p(i) - cb(c)(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    for (_ <- 0 until iters) {
      val sums = Array.fill(kCodes)(new Array[Double](dim))
      val counts = new Array[Int](kCodes)
      sub.foreach { p =>
        val c = nearest(p)
        var i = 0
        while (i < dim) { sums(c)(i) += p(i); i += 1 }
        counts(c) += 1
      }
      cb = Array.tabulate(kCodes)(c =>
        if (counts(c) == 0) cb(c)
        else sums(c).map(_ / counts(c)))
    }
    cb
  }

  /** IVF-PQ ANN — the MEMORY-scale path: vectors compress to `m` byte
    * codes (64-dim float = 256 B → 8 B, 32×), so a 10^10-vector index
    * fits where raw vectors cannot. Classic two-level design
    * (Jégou et al., "Product Quantization for Nearest Neighbor
    * Search", TPAMI 2011):
    *
    *  - coarse quantizer: the SAME spherical-k-means cells as
    *    [[cosineTopKIvf]] (bounded driver-side sample);
    *  - product quantizer: the unit vector splits into `m` subspaces,
    *    each L2-k-means-coded to one of `kCodes` centroids → the corpus
    *    row is (cell, vec_id, m bytes);
    *  - query: ADC (asymmetric distance computation) — per query, an
    *    m×kCodes table of partial dots; a candidate's approximate
    *    cosine = m table lookups summed, NO vector math per pair;
    *  - exact rerank: the top `rerank·k` ADC candidates join their raw
    *    vectors back (a k·rerank-bounded broadcast per query) for the
    *    exact final ordering — ADC error affects which candidates are
    *    CONSIDERED, not the reported similarity.
    *
    * Scale shape: candidate generation is the nProbe cell equi-join on
    * byte codes only; raw vectors are touched for |Q|·rerank·k rows.
    */
  def cosineTopKPq(s: SparkSession, dir: String, nQueries: Int = 10,
      k: Int = 5, nCells: Int = 16, nProbe: Int = 4, m: Int = 8,
      kCodes: Int = 64, dim: Int = 64, sampleN: Int = 2048,
      rerank: Int = 4): DataFrame = {
    import s.implicits._
    require(dim % m == 0, "dim must divide into m subspaces")
    val subDim = dim / m
    val e = emb(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val sample = e.withColumn("h", xxhash64(col("vec_id")))
      .orderBy(col("h")).limit(sampleN)
      .select(col("v")).as[Array[Double]].collect()
    // function VALS, not local defs: a lambda calling a local def drags
    // the whole (non-serializable) enclosing module into the closure;
    // vals capture only the arrays they use
    val unit: Array[Double] => Array[Double] = v => {
      val n = math.sqrt(dotArr(v, v))
      if (n == 0) v else v.map(_ / n)
    }
    val centroids = trainCentroids(sample, nCells)
    val unitSample = sample.map(unit)
    // a corpus smaller than kCodes still trains (fewer codes), instead of
    // indexing past trainCodebook's take(kCodes) seeding
    val kEff = math.min(kCodes, unitSample.length)
    val codebooks = Array.tabulate(m)(j =>
      trainCodebook(unitSample.map(_.slice(j * subDim, (j + 1) * subDim)),
        kEff))

    val cellOf: Array[Double] => Int = u => {
      var best = 0
      var bestD = Double.NegativeInfinity
      var c = 0
      while (c < centroids.length) {
        val d = dotArr(u, centroids(c))
        if (d > bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    val encode: Array[Double] => Array[Byte] = u =>
      Array.tabulate(m) { j =>
        val sub = u.slice(j * subDim, (j + 1) * subDim)
        val cb = codebooks(j)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cb.length) {
          var d = 0.0
          var i = 0
          while (i < subDim) { val t = sub(i) - cb(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best.toByte
      }

    // Round-7: the probe side is |Q| rows — collect the queries driver-
    // side, build the per-query ADC tables there, and broadcast them
    // keyed by probe cell. The previous broadcast JOIN shipped the m x
    // kCodes ADC table (4 KB) PER CANDIDATE ROW through the join and the
    // Dataset encoder — candidate-count x 4 KB of pure serialization.
    // Scoring fuses cell assignment + encoding + ADC into one narrow
    // mapPartitions with per-partition top-(k*rerank) pruning; identical
    // arithmetic, no per-row table payload.
    val queriesArr = e.filter(col("vec_id") < nQueries)
      .as[(Long, Array[Double])].collect()
      .sortBy(_._1)
    val probesByCell: Map[Int, Array[(Long, Array[Array[Double]])]] =
      queriesArr
        .flatMap { case (id, v) =>
          val u = unit(v)
          val table = Array.tabulate(m, kEff)((j, c) =>
            dotArr(u.slice(j * subDim, (j + 1) * subDim), codebooks(j)(c)))
          centroids.indices.map(c => (dotArr(u, centroids(c)), c))
            .sortBy { case (d, c) => (-d, c) }.take(nProbe)
            .map { case (_, c) => (c, (id, table)) }
        }
        .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2) }
    val pBc = s.sparkContext.broadcast(probesByCell)
    val candidatesPartial = e.as[(Long, Array[Double])].mapPartitions { it =>
      val byCell = pBc.value
      val heaps = scala.collection.mutable.LongMap[TopK]()
      it.foreach { case (id, v) =>
        val u = unit(v)
        byCell.get(cellOf(u)).foreach { probes =>
          val cs = encode(u)
          var i = 0
          while (i < probes.length) {
            val (qid, table) = probes(i)
            if (id != qid) {
              var adc = 0.0
              var j = 0
              while (j < m) { adc += table(j)(cs(j) & 0xff); j += 1 }
              heaps.getOrElseUpdate(qid, new TopK(k * rerank)).add(adc, id)
            }
            i += 1
          }
        }
      }
      heaps.iterator.flatMap { case (qid, h) =>
        h.result.map { case (id, adc) => (qid, id, adc) }
      }
    }.toDF("query_id", "vec_id", "adc")
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("vec_id").asc)
    val shortlist = candidatesPartial.withColumn("rn", row_number().over(wAdc))
      .filter(col("rn") <= k * rerank)
      .select(col("query_id"), col("vec_id"))

    // exact rerank of the |Q|·rerank·k shortlist only: the pair list is
    // tiny (collected + broadcast), so the raw vectors are touched in one
    // narrow scan instead of a Catalyst norm Project over the whole table
    // feeding two broadcast joins
    val shortlistPairs: Map[Long, Array[Long]] = shortlist
      .as[(Long, Long)].collect()
      .groupBy(_._2).map { case (vid, xs) => vid -> xs.map(_._1) }
    val slBc = s.sparkContext.broadcast(shortlistPairs)
    val queriesByIdArr = queriesArr.map { case (id, v) =>
      (id, (v, math.sqrt(dotArr(v, v))))
    }.toMap
    val qBc = s.sparkContext.broadcast(queriesByIdArr)
    val exact = e.as[(Long, Array[Double])].mapPartitions { it =>
      val sl = slBc.value
      val qs = qBc.value
      it.flatMap { case (id, v) =>
        sl.get(id) match {
          case Some(qids) =>
            val nrm = math.sqrt(dotArr(v, v))
            qids.iterator.map { qid =>
              val (qv, qnrm) = qs(qid)
              (qid, id, roundHalfUp4(dotArr(v, qv) / (nrm * qnrm)))
            }
          case None => Iterator.empty
        }
      }
    }.toDF("query_id", "vec_id", "sim")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    exact.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"), col("rn"))
  }

  /** Exact embedding near-duplicate pairs: ALL pairs with rounded cosine
    * >= threshold, over the first `capVecs` vec_ids. This is the
    * EXACTNESS BASELINE for near-dup (same role and same corpus-cap
    * pattern as q_minhash_pairs / q_cosine_topk): the cap bounds the
    * O(n^2) pair mass so it cannot ride corpus growth, the broadcast
    * keeps the big side shuffle-free, and the SQL oracle can reproduce
    * the result bit-for-bit. The LSH-blocked [[embeddingNearDup]] is the
    * 100 TB path — on this corpus the thresholded pairs are all
    * borderline-similarity (0.35-0.6 cosine), exactly the regime where
    * any LSH family has recall < 1 by construction, so the approximate
    * form is verified by a recall spec, not an equality oracle.
    */
  def embeddingNearDupExact(s: SparkSession, dir: String,
      threshold: Double = 0.35, dim: Int = 64, capVecs: Int = 2000)
      : DataFrame = {
    import s.implicits._
    // The capped side is bounded by construction (capVecs × dim doubles,
    // ~1 MB at the defaults) — the same bounded-driver-sample pattern the
    // IVF/PQ trainers use — so broadcast it once and run the O(cap²)
    // pair scan as partition-local JVM loops. The Catalyst alternative
    // (broadcast self-join + a 64-term dot Project over the ~2M candidate
    // rows) measured 15-117 s at sf0.1: per-candidate UnsafeRow
    // materialization and array accessors dominate, not arithmetic; the
    // loop form is <1 s for identical output. Summation order (k =
    // 0..dim-1), sqrt-of-each-norm, and HALF_UP rounding all match the
    // DuckDB oracle's sequential list_cosine_similarity bit-for-bit.
    val capped = emb(s, dir)
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(capVecs)
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) =>
        val d = v.map(_.toDouble)
        var nrm = 0.0
        var k = 0
        while (k < dim) { nrm += d(k) * d(k); k += 1 }
        (id, d, math.sqrt(nrm))
      }
    val bc = s.sparkContext.broadcast(capped)
    s.range(0, capped.length, 1, 64).mapPartitions { it =>
      val arr = bc.value
      it.flatMap { ii =>
        val i = ii.toInt
        val (ida, va, na) = arr(i)
        Iterator.range(i + 1, arr.length).flatMap { j =>
          val (idb, vb, nb) = arr(j)
          var dp = 0.0
          var k = 0
          while (k < dim) { dp += va(k) * vb(k); k += 1 }
          val raw = dp / (na * nb)
          // cheap reject before the BigDecimal rounding: HALF_UP at 4
          // decimals can only lift a value to >= threshold from raw >=
          // threshold - 5e-5, so anything below threshold - 1e-4 cannot
          // survive the post-round filter. The 2M rejected pairs were
          // paying a BigDecimal alloc each (the measured hot spot); only
          // the ~300 near-threshold survivors round now.
          if (raw < threshold - 1e-4) None
          else {
            val sim = BigDecimal(raw)
              .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP)
              .toDouble
            if (sim >= threshold) Some((ida, idb, sim)) else None
          }
        }
      }
    }.toDF("id_a", "id_b", "sim")
  }

  /** Embedding near-duplicate detection: pairs with cosine >= threshold,
    * LSH-blocked (multi-table), exactly verified within bucket.
    */
  def embeddingNearDup(s: SparkSession, dir: String, threshold: Double = 0.35,
      nTables: Int = 8, planesPerTable: Int = 4, dim: Int = 64,
      bucketCap: Int = 512): DataFrame = {
    import s.implicits._
    val e = emb(s, dir).select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val pairs = toVecBuckets(e, nTables, planesPerTable, dim)
      .groupByKey(r => (r.tbl, r.bucket))
      .flatMapGroups { (_: (Int, Long), it: Iterator[VecBucket]) =>
        capBuckets(it.toArray, bucketCap, dim).flatMap { grp =>
          val m = grp.sortBy(_.vecId)
          val out =
            scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
          var i = 0
          while (i < m.length) {
            var j = i + 1
            while (j < m.length) {
              val sim = round4(dotArr(m(i).v, m(j).v) / (m(i).nrm * m(j).nrm))
              if (sim >= threshold) out += ((m(i).vecId, m(j).vecId, sim))
              j += 1
            }
            i += 1
          }
          out.iterator
        }
      }
      .toDF("id_a", "id_b", "sim")
    pairs.dropDuplicates("id_a", "id_b")
  }

  val oracles: Map[String, String] = Map(
    "q_cosine_topk" ->
      ("SELECT query_id, vec_id, sim, rn FROM (" +
        "SELECT q.vec_id AS query_id, e.vec_id AS vec_id, " +
        "round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS sim, " +
        "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
        "round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) DESC, e.vec_id ASC) AS rn " +
        "FROM embeddings e CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 10) q " +
        "WHERE e.vec_id <> q.vec_id) WHERE rn <= 5"),
    // exact thresholded pairs over the capped corpus (same cap pattern as
    // q_minhash_pairs); round-then-threshold on both sides
    "q_embedding_near_dup" ->
      ("WITH e AS (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 2000) " +
        "SELECT id_a, id_b, sim FROM (" +
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        "round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS sim " +
        "FROM e a JOIN e b ON a.vec_id < b.vec_id) WHERE sim >= 0.35"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cosine_topk" -> ((s, d) => cosineTopK(s, d)),
    "q_cosine_topk_lsh" -> ((s, d) => cosineTopKLsh(s, d)),
    "q_cosine_topk_ivf" -> ((s, d) => cosineTopKIvf(s, d)),
    "q_cosine_topk_pq" -> ((s, d) => cosineTopKPq(s, d)),
    "q_embedding_near_dup" -> ((s, d) => embeddingNearDupExact(s, d)),
    "q_embedding_near_dup_lsh" -> ((s, d) => embeddingNearDup(s, d)))
}
