package graft

import graft.ops.TemporalReach
import org.scalatest.funsuite.AnyFunSuite

class TemporalReachSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(String, String, Long)], sources: Seq[String],
      rounds: Int) =
    TemporalReach.earliestArrival(
        edges.toDF("src", "dst", "t"), "src", "dst", "t",
        sources.toDF("node"), rounds)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("time must increase along the path") {
    // a->b at 10, b->c at 5: c is statically reachable from a but NOT
    // time-respecting (5 < 10); from b it is
    val got = run(Seq(("a", "b", 10L), ("b", "c", 5L)), Seq("a", "b"), 4)
    assert(got == Map(("a", "b") -> 10L, ("b", "c") -> 5L))
  }

  test("a longer path found later can improve the arrival (min-merge)") {
    // direct a->b at 5; two-hop a->c(1)->b(2) arrives earlier
    val got = run(Seq(("a", "b", 5L), ("a", "c", 1L), ("c", "b", 2L)), Seq("a"), 4)
    assert(got == Map(("a", "c") -> 1L, ("a", "b") -> 2L))
  }

  test("equal times do not chain (strict increase)") {
    val got = run(Seq(("a", "b", 5L), ("b", "c", 5L)), Seq("a"), 4)
    assert(got == Map(("a", "b") -> 5L))
  }

  test("rounds truncate path length") {
    val chain = Seq(("a", "b", 1L), ("b", "c", 2L), ("c", "d", 3L))
    assert(run(chain, Seq("a"), 2) ==
      Map(("a", "b") -> 1L, ("a", "c") -> 2L))
    assert(run(chain, Seq("a"), 3) ==
      Map(("a", "b") -> 1L, ("a", "c") -> 2L, ("a", "d") -> 3L))
  }

  test("a cycle back to the source is not re-emitted (first-touch semantics)") {
    val got = run(Seq(("a", "b", 1L), ("b", "a", 2L)), Seq("a"), 4)
    assert(got == Map(("a", "b") -> 1L))
  }
}
