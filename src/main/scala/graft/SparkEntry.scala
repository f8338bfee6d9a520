package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, RelationalOps, SimilarityOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory surface: every implemented operator
  * from SURVEY.md §2 (or the training-data-pipeline extensions) appears
  * here; SQL-expressible ones carry a DuckDB oracle in `oracleSql`
  * (column names aliased identically on both sides — the driver sorts
  * columns by name and hashes values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.hostAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalOps.queries ++ TextOps.queries ++ SimilarityOps.queries ++
      Dedup.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (LSH/MinHash/SimHash/langid/fingerprint — those are verified by
    * scalatest specs against brute-force/simulator oracles instead).
    */
  def oracleSql: Map[String, String] =
    RelationalOps.oracles ++ TextOps.oracles ++ SimilarityOps.oracles
}
