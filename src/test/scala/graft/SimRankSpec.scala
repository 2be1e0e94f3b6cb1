package graft

import org.scalatest.funsuite.AnyFunSuite

class SimRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(String, String)], iters: Int) =
    graft.ops.SimRank.simRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(String, String, Long)].collect().toSet

  test("single shared in-neighbor converges to C exactly") {
    // I(c) = I(d) = {a}: s(c,d) = C·s(a,a)/1 = 800000 from round 1 on
    val edges = Seq(("a", "c"), ("a", "d"))
    assert(run(edges, 1) == Set(("c", "d", 800000L)))
    assert(run(edges, 3) == Set(("c", "d", 800000L)))
  }

  test("hand-unrolled two-source example (floored averages)") {
    // I(c) = {a}, I(d) = {a, b}; I(a) = I(b) = {} so s(a,b) stays 0:
    // s(c,d) = C·(s(a,a) + s(a,b)) / (1·2) = 0.8·1e6/2 = 400000 forever
    val edges = Seq(("a", "c"), ("a", "d"), ("b", "d"))
    assert(run(edges, 1) == Set(("c", "d", 400000L)))
    assert(run(edges, 2) == Set(("c", "d", 400000L)))
  }

  test("recursive propagation scores nodes with NO shared neighbor") {
    // a→c, b→d and I(a), I(b) share a parent r (r→a, r→b): c and d have
    // disjoint in-sets {a} vs {b}, but s(a,b) > 0 after round 1, so
    // s(c,d) = C·s(a,b) > 0 appears at round 2 — the multi-hop signal
    // Jaccard-style overlap cannot produce
    val edges = Seq(("r", "a"), ("r", "b"), ("a", "c"), ("b", "d"))
    val r1 = run(edges, 1)
    assert(r1.collect { case ("a", "b", s) => s } == Set(800000L))
    assert(!r1.exists(p => p._1 == "c" && p._2 == "d"))
    val r2 = run(edges, 2)
    // s2(c,d) = C·s1(a,b)/1 = 0.8·800000 = 640000
    assert(r2.collect { case ("c", "d", s) => s } == Set(640000L))
  }

  test("partition-invariant and deterministic") {
    val edges = (1 to 40).map(i => (s"n${i % 7}", s"n${(i * 3) % 11}"))
      .filter(e => e._1 != e._2).distinct
    val one = graft.ops.SimRank.simRank(
      edges.toDF("src", "dst").repartition(1), "src", "dst", 3)
      .as[(String, String, Long)].collect().toSet
    val many = graft.ops.SimRank.simRank(
      edges.toDF("src", "dst").repartition(13), "src", "dst", 3)
      .as[(String, String, Long)].collect().toSet
    assert(one == many && one.nonEmpty)
  }

  test("pair-state gate trips loudly") {
    val ex = intercept[IllegalArgumentException] {
      graft.ops.SimRank.simRank(
        Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst"),
        "src", "dst", iters = 2, maxNodes = 2)
    }
    assert(ex.getMessage.contains("pair-state gate"))
  }
}
