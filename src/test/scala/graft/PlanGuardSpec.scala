package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the expensive properties we hand-audited
  * with .explain (single scan, shared exchange, no cartesian product)
  * asserted against the ACTUAL physical plan, so a refactor that silently
  * doubles a scan or forks a window exchange fails CI instead of only
  * showing up as a bench regression rounds later.
  */
class PlanGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def physical(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def scans(p: String): Int =
    "Scan parquet".r.findAllIn(p).size
  private def shuffles(p: String): Int =
    "(?<!Broadcast)Exchange (hash|range|Single)".r.findAllIn(p).size

  test("q_skipgrams reads documents exactly once (lead-array explode)") {
    assert(scans(physical("q_skipgrams")) == 1)
  }

  test("q_cdf computes every probe from one scan") {
    assert(scans(physical("q_cdf")) == 1)
  }

  test("q_unpivot melts from one scan") {
    assert(scans(physical("q_unpivot")) == 1)
  }

  test("q_cube expands the grouping lattice from one scan") {
    assert(scans(physical("q_cube")) == 1)
  }

  test("q_scd2 shares one data exchange across both windows (+ output sort)") {
    val p = physical("q_scd2")
    assert(scans(p) == 1)
    assert(shuffles(p) <= 2, s"expected <= 2 shuffles, plan:\n$p")
  }

  test("q_tpch_q3 has no cartesian product and scans each table once") {
    val p = physical("q_tpch_q3")
    assert(!p.contains("CartesianProduct"))
    assert(scans(p) == 3)
  }

  test("q_dq_rules audits every per-row rule from one lineitem pass") {
    // one scan for the rule sums + one each side of the orphan anti-join
    val p = physical("q_dq_rules")
    assert(scans(p) == 3)
    assert(!p.contains("CartesianProduct"))
  }
}
