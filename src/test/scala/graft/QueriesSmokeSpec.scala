package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase.{sfDir, spark}

/** Every SparkEntry query must produce rows at sf0.001 — a 0-row result
  * passes the driver's weaker rows-only check vacuously and proves
  * nothing (q_embedding_near_dup shipped empty once: its threshold could
  * never fire on this data). Also pins queries/oracleSql key consistency.
  */
class QueriesSmokeSpec extends AnyFunSuite {

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name returns rows at sf0.001") {
      assert(fn(spark, sfDir).count() > 0, s"$name is vacuous")
    }
  }
}
