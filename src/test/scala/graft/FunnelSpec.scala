package graft

import graft.ops.Funnel
import org.scalatest.funsuite.AnyFunSuite

/** Ordered-funnel semantics: strictly-after step times, stall propagation,
  * depth, and the stacked step-count form (ADVICE r5: operator was unwired).
  */
class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (user, ts, type) fixture exercising each semantic corner:
  //  a: clean view@1 -> click@2 -> purchase@3          => depth 3
  //  b: clicks only before/AT the view time (tie @2)   => depth 1 (strict >)
  //  c: purchase only, never viewed                    => absent
  //  d: view then purchase but no click                => depth 1, t3 null
  //     (stall propagates: purchase can't count without a click time)
  //  e: view@1, purchase@2, click@3 (purchase too early) => depth 2
  private def fixture = Seq(
    ("a", 1L, "view"), ("a", 2L, "click"), ("a", 3L, "purchase"),
    ("b", 1L, "click"), ("b", 2L, "view"), ("b", 2L, "click"),
    ("c", 1L, "purchase"),
    ("d", 5L, "view"), ("d", 6L, "purchase"),
    ("e", 1L, "view"), ("e", 2L, "purchase"), ("e", 3L, "click"))
    .toDF("user", "ts", "etype")

  test("userFunnel: strict ordering, stalls, and depth") {
    val got = Funnel.userFunnel(fixture, "user", "ts", "etype",
        Seq("view", "click", "purchase"))
      .as[(String, Long, Option[Long], Option[Long], Int)]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("a", 1L, Some(2L), Some(3L), 3),
      ("b", 2L, None, None, 1),
      ("d", 5L, None, None, 1),
      ("e", 1L, Some(3L), None, 2)))
  }

  test("stepCounts matches the per-user depths") {
    val got = Funnel.stepCounts(fixture, "user", "ts", "etype",
        Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1, "view", 4L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("single-step funnel degenerates to min-time per user") {
    val got = Funnel.userFunnel(fixture, "user", "ts", "etype", Seq("click"))
      .as[(String, Long, Int)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("a", 2L, 1), ("b", 1L, 1), ("e", 3L, 1)))
  }

  test("stepTiming: hand-computed mean/max time-to-convert") {
    // from the fixture: a reaches t2 at 2 (t1=1, Δ=1), e at 3 (t1=1, Δ=2);
    // only a reaches t3 at 3 (Δ=2). Step 1 deltas are all 0.
    val got = Funnel.stepTiming(fixture, "user", "ts", "etype",
        Seq("view", "click", "purchase"))
      .as[(Int, String, Long, Option[Long], Option[Long])].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1, "view", 4L, Some(0L), Some(0L)),
      (2, "click", 2L, Some(1L), Some(2L)), // (1+2) div 2 = 1, max 2
      (3, "purchase", 1L, Some(2L), Some(2L))))
  }
}
