package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WlRefinementSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def wl(edges: Seq[(String, String)], rounds: Int = 3) =
    graft.ops.WlRefinement.wlColors(edges.toDF("src", "dst"), "src", "dst",
        rounds)
      .collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap

  test("a cycle is vertex-transitive: every node shares one color") {
    val m = wl(Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")))
    assert(m.values.map(_._1).toSet.size == 1)
    assert(m.values.forall(_._2 == 4L))
  }

  test("a path distinguishes positions symmetric about the center") {
    // p0-p1-p2-p3-p4: {p0,p4}, {p1,p3}, {p2} — three orbits
    val m = wl((0 until 4).map(i => (s"p$i", s"p${i + 1}")))
    assert(m("p0")._1 == m("p4")._1)
    assert(m("p1")._1 == m("p3")._1)
    assert(Set(m("p0")._1, m("p1")._1, m("p2")._1).size == 3)
  }

  test("star leaves share a color distinct from the hub") {
    val m = wl(Seq(("h", "a"), ("h", "b"), ("h", "c")))
    assert(m("a")._1 == m("b")._1 && m("b")._1 == m("c")._1)
    assert(m("h")._1 != m("a")._1)
    assert(m("a")._2 == 3L && m("h")._2 == 1L)
  }

  test("degree alone does not fool refinement after round 1") {
    // two degree-2 nodes in different structures: triangle vs path center
    val m = wl(Seq(("a", "b"), ("b", "c"), ("c", "a"),   // triangle
      ("x", "y"), ("y", "z")))                            // path
    assert(m("a")._1 != m("y")._1,
      "triangle corner and path center both have degree 2 but differ")
  }

  test("isomorphic components land on identical color multisets") {
    val m = wl(Seq(("a", "b"), ("b", "c"),      // path 1
      ("x", "y"), ("y", "z")))                   // path 2 (isomorphic)
    assert(m("a")._1 == m("x")._1)
    assert(m("b")._1 == m("y")._1)
    // color classes merge across components: endpoints count 4
    assert(m("a")._2 == 4L && m("b")._2 == 2L)
  }
}
