package graft

import graft.ops.PageRank
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference PageRank golden (reference:
  * tests/test_graph_solver.py:14-40): 9-edge/12-node fixture, row-aligned
  * scores, base score (1-0.85)/12 = 0.0125. Distributed float summation
  * differs from the reference's sequential loop only below 1e-12, so the
  * golden uses 1e-9 tolerance (SURVEY.md §7.4).
  */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("page_rank golden: 9-edge fixture, row-aligned (py:14-40)") {
    val df = Seq(
      "A" -> "B", "B" -> "C", "C" -> "D", "E" -> "F", "F" -> "G",
      "G" -> "J", "I" -> "K", "I" -> "J", "AA" -> "Z").toDF("from", "to")
    val got = PageRank.pageRankColumn(df, "from", "to")
      .select("page_rank").as[Double].collect().toSeq
    val expected = Seq(
      0.012500000000000002, 0.023125000000000007, 0.032156250000000004,
      0.012500000000000002, 0.023125000000000007, 0.032156250000000004,
      0.012500000000000002, 0.012500000000000002, 0.012500000000000002)
    assert(got.size == expected.size)
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-9, s"got $g expected $e")
    }
  }

  test("null/unseen from-node gets score 0.0 (rs:118-126)") {
    val df = Seq(
      (Some("A"), Some("B")),
      (None, Some("B")),
      (Some("Q"), None)).toDF("from", "to")
    val got = PageRank.pageRankColumn(df, "from", "to")
      .select("page_rank").as[Double].collect().toSeq
    // valid edge set: only A->B; N=2, base=0.075; A=0.075
    assert(math.abs(got(0) - 0.075) < 1e-12)
    assert(got(1) == 0.0) // null from
    assert(got(2) == 0.0) // Q never part of a valid edge
  }

  test("ranks sum below 1 with sinks (no dangling redistribution)") {
    val df = Seq("A" -> "B", "B" -> "C").toDF("from", "to")
    val total = PageRank.scores(graft.core.Ingest.edges(df, "from", "to"))
      .agg(org.apache.spark.sql.functions.sum("score")).first().getDouble(0)
    assert(total < 1.0)
  }

  test("weighted fixed-point: hand-computed one-iteration grid") {
    // a->b w3, a->c w1, b->a w1; scale 1e12, n=3
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 1L))
      .toDF("src", "dst", "w")
    val got = PageRank.weightedScoresFixedPoint(edges, "w", iters = 1)
      .as[(String, Long)].collect().toMap
    // init r = 1e12/3; base = 3e12 div 60 = 5e10
    // a <- b: (17*1*r) div 20; b <- a: (17*3*r) div 80; c <- a: (17*1*r) div 80
    assert(got == Map(
      "a" -> 333333333333L,   // 5e10 + 283333333333
      "b" -> 262499999999L,   // 5e10 + 212499999999
      "c" -> 120833333333L))  // 5e10 + 70833333333
  }

  test("weighted with unit weights equals the unweighted fixed point") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"), ("a", "b"))
      .toDF("src", "dst")
    val unw = PageRank.scoresFixedPoint(edges, iters = 5)
      .as[(String, Long)].collect().toMap
    val w = PageRank.weightedScoresFixedPoint(
        edges.withColumn("w", org.apache.spark.sql.functions.lit(1L)), "w", iters = 5)
      .as[(String, Long)].collect().toMap
    assert(unw == w)
  }

  test("convergent fixed point: stops at the first L1 < tolQ step, local replay exact") {
    val edgeSeq = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a"))
    val got = PageRank.scoresFixedPointConvergent(
        edgeSeq.toDF("src", "dst"), tolQ = 1_000_000L, maxIter = 60)
      .as[(String, Long)].collect().toMap
    // local integer replay of the identical recurrence + stopping rule
    val S = 1000000000000L
    val em = edgeSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val od = edgeSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = edgeSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    var r = nodes.map(_ -> S / n).toMap
    val base = (3 * S) / (20 * n)
    var it = 0
    var l1 = Long.MaxValue
    while (it < 60 && l1 >= 1_000_000L) {
      var next = nodes.map(_ -> base).toMap
      em.foreach { case ((s, d), m) =>
        next = next.updated(d, next(d) + (17L * m * r(s)) / (20L * od(s)))
      }
      l1 = nodes.map(v => math.abs(next(v) - r(v))).sum
      r = next
      it += 1
    }
    assert(it < 60, "fixture must converge before the cap")
    assert(got == r)
  }

  test("convergent ≡ fixed-iteration at the convergence step; distributed path agrees") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a"))
      .toDF("src", "dst")
    val conv = PageRank.scoresFixedPointConvergent(edges, tolQ = 1L,
        maxIter = 5).as[(String, Long)].collect().toMap
    // tolQ=1 can only stop at an exact integer fixpoint or the cap; with
    // maxIter=5 the cap fires, so conv ≡ 5 fixed iterations
    val fp5 = PageRank.scoresFixedPoint(edges, iters = 5)
      .as[(String, Long)].collect().toMap
    assert(conv == fp5)
    // distributed fall-through (gate forced to 0) runs the same stop rule
    val dist = PageRank.scoresFixedPointConvergent(edges,
        tolQ = 1_000_000L, maxIter = 60, maxLocalEdges = 0L)
      .as[(String, Long)].collect().toMap
    val local = PageRank.scoresFixedPointConvergent(edges,
        tolQ = 1_000_000L, maxIter = 60)
      .as[(String, Long)].collect().toMap
    assert(dist == local)
  }

  test("weighted drops non-positive edges and floors fractional weights") {
    val edges = Seq(("a", "b", 2.9), ("a", "c", 0.0), ("b", "a", 1.0))
      .toDF("src", "dst", "w")
    val got = PageRank.weightedScoresFixedPoint(edges, "w", iters = 1)
      .as[(String, Long)].collect().toMap
    // c is not a node at all (its only edge has weight 0): n=2
    // init r = 5e11; base = 3e12 div 40 = 75e9
    // a out W=2 (floor 2.9): b <- (17*2*r) div 40; a <- (17*1*r) div 20
    assert(got.keySet == Set("a", "b"))
    assert(got("a") == 75000000000L + (17L * 500000000000L) / 20L)
    assert(got("b") == 75000000000L + (17L * 2L * 500000000000L) / 40L)
  }
}
