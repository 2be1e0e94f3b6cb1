package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.PlanWalk

/** Repo-wide no-unpartitioned-window sweep (VERDICT r8 item 1): EVERY
  * driver query's physical plan — including plans of intermediate jobs an
  * iterative operator executes while the query is being constructed — is
  * checked for `WindowExec`/`WindowGroupLimitExec` with an empty
  * partitionSpec, the single-task global-sort shape that cannot survive a
  * 100× scale-up. The walk is AQE-aware ([[graft.tools.PlanWalk]]): a
  * plain `plan.collect` sees only the `AdaptiveSparkPlanExec` leaf and
  * would vacuously pass.
  *
  * Intermediate executions are captured with a `QueryExecutionListener`
  * registered for the duration of the sweep; its callbacks are async, so
  * the listener verdict is asserted in a final test after a drain pause.
  */
class WindowSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // (query name at registration time, offending node) pairs from every
  // execution the listener observes while the sweep runs
  private val captured =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]
  @volatile private var current: String = "<init>"

  private object Listener extends QueryExecutionListener {
    override def onSuccess(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        durationNs: Long): Unit = record(qe.executedPlan)
    override def onFailure(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        exception: Exception): Unit = record(qe.executedPlan)
    private def record(plan: SparkPlan): Unit =
      try (PlanWalk.unpartitionedWindows(plan) ++ PlanWalk.cartesians(plan))
        .foreach { w =>
          captured.add((current, w.nodeName + ": " + w.simpleStringWithNodeId()))
        } catch { case scala.util.control.NonFatal(_) => () }
  }

  test("register sweep listener") {
    spark.listenerManager.register(Listener)
    assert(true)
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name plans no unpartitioned window and no cartesian product") {
      current = name
      val df = SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution.executedPlan
      val bad = PlanWalk.unpartitionedWindows(plan)
      val carts = PlanWalk.cartesians(plan)
      // free per-query persisted/checkpointed state so 285 constructions
      // don't accumulate in the shared test JVM
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      assert(bad.isEmpty,
        s"$name: unpartitioned window(s) in final plan:\n" +
          bad.map(_.simpleStringWithNodeId()).mkString("\n"))
      assert(carts.isEmpty,
        s"$name: CartesianProduct in final plan — every cross join must " +
          s"be against a broadcast side:\n" +
          carts.map(_.simpleStringWithNodeId()).mkString("\n"))
    }
  }

  test("no intermediate execution planned an unpartitioned window") {
    current = "<drain>"
    // listener bus is async: give in-flight callbacks a moment to land
    Thread.sleep(2000)
    spark.listenerManager.unregister(Listener)
    val bad = captured.toArray.toSeq
    assert(bad.isEmpty,
      s"intermediate unpartitioned windows:\n${bad.mkString("\n")}")
  }
}
