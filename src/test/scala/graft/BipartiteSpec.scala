package graft

import graft.ops.Bipartite
import org.scalatest.funsuite.AnyFunSuite

class BipartiteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(String, String)]) =
    Bipartite.bipartiteComponents(edges.toDF("src", "dst"), "src", "dst")
      .as[(String, Long, Boolean)].collect().sortBy(_._1).toSeq

  test("odd cycle is not bipartite, even cycle and tree are") {
    val got = run(Seq(
      ("a", "b"), ("b", "c"), ("c", "a"),                  // triangle
      ("p", "q"), ("q", "r"), ("r", "s"), ("s", "p"),      // square
      ("x", "y"), ("y", "z")))                             // path
    assert(got == Seq(("a", 3L, false), ("p", 4L, true), ("x", 3L, true)))
  }

  test("self-loop makes its component non-bipartite") {
    val got = run(Seq(("m", "m"), ("u", "v")))
    assert(got == Seq(("m", 1L, false), ("u", 2L, true)))
  }

  test("odd cycle reachable from a tree taints the whole component") {
    // pentagon with a pendant vertex: all 6 nodes share the verdict
    val got = run(Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
      ("e", "a"), ("a", "t")))
    assert(got == Seq(("a", 6L, false)))
  }
}
