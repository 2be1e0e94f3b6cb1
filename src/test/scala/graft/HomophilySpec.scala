package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GraphStats

class HomophilySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def homophily(edges: Seq[(String, String)],
      labels: Seq[(String, String)]) =
    GraphStats.labelHomophily(edges.toDF("src", "dst"), "src", "dst",
      labels.toDF("n", "l"), "n", "l").collect().head

  test("perfectly assortative graph -> r = 1e6") {
    // two same-label cliques, no cross edges
    val edges = Seq(("a1", "a2"), ("a2", "a3"), ("b1", "b2"))
    val labels = Seq("a1" -> "A", "a2" -> "A", "a3" -> "A",
      "b1" -> "B", "b2" -> "B")
    val r = homophily(edges, labels)
    assert(r.getLong(1) == r.getLong(0)) // e_same = m
    assert(r.getLong(3) == 1000000L)
  }

  test("bipartite cross-label graph -> r < 0; single label -> NULL") {
    val edges = Seq(("a1", "b1"), ("a2", "b2"))
    val labels = Seq("a1" -> "A", "a2" -> "A", "b1" -> "B", "b2" -> "B")
    val r = homophily(edges, labels)
    assert(r.getLong(1) == 0L)
    assert(r.getLong(3) == -1000000L) // e_same=0, sum_dl2=8, m=2: -8/8
    val single = homophily(Seq(("a", "b")), Seq("a" -> "X", "b" -> "X"))
    assert(single.isNullAt(3)) // denominator 0
  }

  test("unlabeled endpoints drop their edges; matches hand TVD") {
    val edges = Seq(("a1", "a2"), ("a1", "zz"))
    val labels = Seq("a1" -> "A", "a2" -> "A")
    val r = homophily(edges, labels)
    assert(r.getLong(0) == 1L) // zz edge dropped
  }
}
