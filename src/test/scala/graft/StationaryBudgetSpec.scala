package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StationaryBudgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: Seq[(String, Long, String, Long)]) =
    rows.toDF("user_id", "ts_us", "event_type", "event_id")

  private def stationary(rows: Seq[(String, Long, String, Long)],
      localCap: Long = 1000000L) =
    graft.ops.Transitions.stationaryDistribution(ev(rows), "user_id",
        "ts_us", "event_type", "event_id", rounds = 6,
        maxLocalMatrix = localCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))

  test("a symmetric 2-cycle stays uniform at 500000 ppm each") {
    val rows = Seq("A", "B", "A", "B", "A").zipWithIndex.map {
      case (t, i) => ("u1", i.toLong, t, i.toLong)
    }
    assert(stationary(rows).toSeq == Seq(("A", 500000L), ("B", 500000L)))
  }

  test("edges into sink types are dropped when closing the chain") {
    // A->A, A->A, A->B; B never emits, so the closed chain is just the
    // A self-loop and all mass stays on A
    val rows = Seq("A", "A", "A", "B").zipWithIndex.map {
      case (t, i) => ("u1", i.toLong, t, i.toLong)
    }
    assert(stationary(rows).toSeq == Seq(("A", 1000000L)))
  }

  test("local fixed-point replay equals the distributed join rounds") {
    val rnd = new scala.util.Random(11)
    val types = Array("a", "b", "c", "d")
    val rows = Seq.tabulate(120) { i =>
      (s"u${i % 7}", i.toLong, types(rnd.nextInt(types.length)), i.toLong)
    }
    assert(stationary(rows).toSeq == stationary(rows, localCap = 0L).toSeq)
  }

  private def cover(pairs: Seq[(String, String)],
      costs: Seq[(String, Long)], budget: Long) =
    graft.ops.SetCover.greedyBudgetedCoverage(pairs.toDF("s", "el"),
        "s", "el", costs.toDF("s", "cost"), "s", "cost", budget)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))

  private val sets = Seq(
    "big" -> Seq("a", "b", "c", "d"),
    "cheap" -> Seq("a", "b"),
    "other" -> Seq("e"))
  private val pairs = sets.flatMap { case (s, els) => els.map(s -> _) }
  private val costs = Seq("big" -> 200L, "cheap" -> 50L, "other" -> 25L)

  test("budgeted greedy picks by gain-per-cost, not raw gain") {
    val rows = cover(pairs, costs, budget = 300L)
    // ratios: cheap 2e6/50=40000 and other 1e6/25=40000 tie -> 'cheap'
    // (lexicographically smaller); then other 40000 beats big's
    // 2 remaining / 200 = 10000; big last under the 300 budget
    assert(rows.toSeq == Seq(
      (1L, "cheap", 2L, 50L, 40000L, 50L, 2L),
      (2L, "other", 1L, 25L, 40000L, 75L, 3L),
      (3L, "big", 2L, 200L, 10000L, 275L, 5L)))
  }

  test("an exhausted budget stops the rounds") {
    val rows = cover(pairs, costs, budget = 80L)
    assert(rows.map(_._2).toSeq == Seq("cheap", "other"))
    assert(rows.last._6 == 75L) // spent_total within budget
  }

  test("sets with zero marginal gain are never picked") {
    // equal costs: 'big' wins round 1 outright; 'cheap' then covers
    // nothing new and must never be picked, 'other' is the only pick
    val rows = cover(pairs, Seq("big" -> 1L, "cheap" -> 1L, "other" -> 1L),
      budget = 1000L)
    assert(rows.map(_._2).toSeq == Seq("big", "other"))
  }
}
