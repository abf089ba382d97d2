package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Pins the physical-plan properties that matter at 100 TB so they
  * cannot silently regress: column pruning reaching the parquet
  * footer, predicate pushdown, broadcast choice for small dims, and
  * top-k compiling to TakeOrderedAndProject instead of a global sort. */
class PlanHygieneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString

  test("q03: column pruning reaches the scan (3 of 16 lineitem columns)") {
    val p = plan("q03_scan_project")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"), p.take(1500))
  }

  test("q04: predicates push down to the parquet scan") {
    val p = plan("q04_filter")
    // the toString truncates the PushedFilters list at ~100 chars, so
    // assert on the prefix that always survives
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_quantity), LessThan(l_shipdate"), p.take(1500))
  }

  test("q10: small dim broadcasts (no shuffle of the big side)") {
    val p = plan("q10_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q07: ORDER BY + LIMIT is TakeOrderedAndProject, not a global sort") {
    val p = plan("q07_limit_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("q01: aggregation is two-phase (partial before the shuffle)") {
    val p = plan("q01_wordcount")
    // partial_count marks the map-side combine the reference left dormant
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p.take(1500))
  }
}
