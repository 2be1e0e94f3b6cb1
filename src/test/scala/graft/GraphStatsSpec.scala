package graft

import graft.ops.GraphStats
import org.scalatest.funsuite.AnyFunSuite

class GraphStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("degree histogram on triangle plus pendant") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("a", "b"))
      .toDF("src", "dst") // duplicate edge deduplicates
    val got = GraphStats.degreeHistogram(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("star graph is perfectly disassortative (r = -1)") {
    val star = Seq(("a", "b"), ("a", "c"), ("a", "d")).toDF("src", "dst")
    val got = GraphStats.degreeAssortativity(star, "src", "dst")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(got == ((6L, 18L, 12L, 30L, -1.0)))
  }

  test("regular graph assortativity is degenerate (zero variance -> null)") {
    val cycle = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val got = GraphStats.degreeAssortativity(cycle, "src", "dst")
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    assert(got._1 == 6L && got._5.isEmpty) // all degrees equal: zero variance
  }

  test("modularity of two triangles with a bridge is 5/14") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("d", "e"), ("e", "f"), ("f", "d"), ("c", "d")).toDF("src", "dst")
    val labels = Seq(("a", "A"), ("b", "A"), ("c", "A"),
      ("d", "D"), ("e", "D"), ("f", "D")).toDF("node", "community")
    val got = GraphStats.modularity(edges, "src", "dst", labels)
      .as[(Long, Long, Long, Double)].collect().head
    assert(got == ((7L, 70L, 196L, 70.0 / 196.0)))
  }

  test("everything in one community scores (4m*m - (2m)^2) / 4m^2 = 0") {
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val labels = Seq(("a", "X"), ("b", "X"), ("c", "X")).toDF("node", "community")
    val got = GraphStats.modularity(edges, "src", "dst", labels)
      .as[(Long, Long, Long, Double)].collect().head
    assert(got == ((2L, 0L, 16L, 0.0)))
  }

  test("assortativity: local tally ≡ distributed aggregate (gate forced off)") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("a", "c"), ("e", "a"), ("e", "f")).toDF("src", "dst")
    val local = GraphStats.degreeAssortativity(edges, "src", "dst")
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    val dist = GraphStats.degreeAssortativity(edges, "src", "dst",
        maxLocalEdges = 0L)
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    assert(local == dist)
  }

  test("modularity: local tally ≡ distributed aggregate (gate forced off)") {
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "x"),
      ("x", "y"), ("y", "z"), ("x", "z")).toDF("src", "dst")
    // partial labels: z unlabeled — pins the inner-join semantics
    val labels = Seq(("a", "A"), ("b", "A"), ("c", "A"),
      ("x", "X"), ("y", "X")).toDF("node", "community")
    val local = GraphStats.modularity(edges, "src", "dst", labels)
      .as[(Long, Long, Long, Option[Double])].collect().head
    val dist = GraphStats.modularity(edges, "src", "dst", labels,
        maxLocalEdges = 0L)
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(local == dist)
  }

  test("bipartite projection: weights, dedup, and the group-size cap") {
    val rows = Seq(
      (1L, "x"), (1L, "y"), (1L, "x"),          // dup membership: one vote
      (2L, "x"), (2L, "y"), (2L, "z"),
      (3L, "big1"), (3L, "big2"), (3L, "big3"), // at cap 3, over cap 2
      (4L, "y"), (4L, "z")).toDF("g", "i")
    val got = GraphStats.bipartiteProjection(rows, "g", "i", maxGroupSize = 3)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("x", "y", 2L), ("x", "z", 1L), ("y", "z", 2L),
      ("big1", "big2", 1L), ("big1", "big3", 1L), ("big2", "big3", 1L)))
    val capped = GraphStats.bipartiteProjection(rows, "g", "i", maxGroupSize = 2)
      .as[(String, String, Long)].collect().toSet
    assert(capped == Set(("x", "y", 1L), ("y", "z", 1L))) // only groups 1 & 4
  }

  test("reciprocity of an empty graph is (0, 0, 0), not NULL (ADVICE r7)") {
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    val got = GraphStats.reciprocity(empty, "src", "dst")
      .as[(Long, Long, Long)].collect().head
    assert(got == ((0L, 0L, 0L)))
  }
}
