package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DensestCoverSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def peel(edges: Seq[(String, String)], localCap: Long = 2_000_000L) =
    graft.ops.DensestSubgraph.peelProfile(edges.toDF("src", "dst"),
        "src", "dst", maxLocalEdges = localCap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))

  test("a clique plus a pendant tail: the clique round wins") {
    // K5 (density 2.0) with a long tail dragging round 0 down
    val k5 = for (i <- 0 until 5; j <- i + 1 until 5) yield (s"k$i", s"k$j")
    val tail = (0 until 6).map(i => (s"t$i", s"t${i + 1}")) :+ ("k0", "t0")
    val rows = peel(k5 ++ tail)
    val bestRow = rows.find(_._5).get
    // the surviving dense core is exactly K5: 5 nodes, 10 edges
    assert(bestRow._2 == 5L && bestRow._3 == 10L)
    assert(bestRow._4 == 2000L)
    assert(rows.count(_._5) == 1)
  }

  test("round 0 of a regular graph is already the densest") {
    val c6 = (0 until 6).map(i => (s"c$i", s"c${(i + 1) % 6}"))
    val rows = peel(c6)
    // a cycle is 1-regular-average: everyone peels in round 1
    assert(rows.head._5, "round 0 must be flagged best")
    assert(rows.length == 1, "every node is at-average and peels at once")
  }

  test("profile is monotone in rounds and local == distributed") {
    val g = (0 until 40).map(i => (s"n${i % 13}", s"n${(i * 7 + 3) % 13}"))
      .filter { case (a, b) => a != b }
    val loc = peel(g)
    val dist = peel(g, localCap = 0L)
    assert(loc.toSeq == dist.toSeq)
    // node count strictly decreases per round
    val ns = loc.map(_._2)
    assert(ns.zip(ns.tail).forall { case (a, b) => b < a })
  }

  private def cover(pairs: Seq[(String, String)], k: Int) =
    graft.ops.SetCover.greedyMaxCoverage(pairs.toDF("s", "el"), "s", "el", k)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("greedy picks the biggest set first, then marginal gains") {
    val sets = Seq(
      "big" -> Seq("a", "b", "c", "d"),
      "mid" -> Seq("c", "d", "e"),
      "small" -> Seq("e", "f"))
    val pairs = sets.flatMap { case (s, els) => els.map(s -> _) }
    val rows = cover(pairs, 3)
    assert(rows(0) == (1L, "big", 4L, 4L))
    // mid's marginal gain is {e}: 1; small's is {e,f}: 2 -> small wins
    assert(rows(1) == (2L, "small", 2L, 6L))
    // after big+small everything is covered: mid has zero marginal
    // gain, so the third pick never happens
    assert(rows.length == 2)
  }

  test("rounds stop when everything is covered") {
    val rows = cover(Seq("s1" -> "a", "s1" -> "b", "s2" -> "a")
      .map { case (s, e) => (s, e) }, 5)
    // s1 covers everything; s2 has no positive marginal gain
    assert(rows.length == 1)
    assert(rows(0)._2 == "s1" && rows(0)._4 == 2L)
  }

  test("ties break to the lexicographically smaller set") {
    val rows = cover(Seq(("zz", "a"), ("aa", "b")), 2)
    assert(rows(0)._2 == "aa")
    assert(rows(1)._2 == "zz")
  }
}
