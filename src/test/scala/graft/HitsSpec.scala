package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HitsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scores(edges: Seq[(String, String)], iters: Int = 2) =
    graft.ops.Hits.hubsAuthorities(edges.toDF("src", "dst"), "src", "dst",
        iters)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("star graph: the hub endorses, the center collects authority") {
    // a -> x, b -> x, c -> x
    val m = scores(Seq(("a", "x"), ("b", "x"), ("c", "x")))
    // a1(x)=3; h1(a)=h1(b)=h1(c)=3; a2(x)=9; h2(*)=9
    assert(m("x") == (9L, 0L))
    assert(m("a") == (0L, 9L))
    assert(m("b") == (0L, 9L))
  }

  test("two-hop chain walk counts match the hand unroll") {
    // a -> b -> c
    val m = scores(Seq(("a", "b"), ("b", "c")))
    // a1: b=1, c=1 ; h1: a=1, b=1
    // a2: b=h1(a)=1, c=h1(b)=1 ; h2: a=a2(b)=1, b=a2(c)=1
    assert(m("a") == (0L, 1L))
    assert(m("b") == (1L, 1L))
    assert(m("c") == (1L, 0L))
  }

  test("every node appears exactly once, sinks carry hub 0") {
    val m = scores(Seq(("a", "b"), ("c", "b"), ("b", "d")))
    assert(m.size == 4)
    assert(m("d")._2 == 0L) // pure sink: no out-edges
    assert(m("a")._1 == 0L) // pure source: no in-edges
  }

  test("one iteration of a cycle gives uniform degree scores") {
    val m = scores(Seq(("a", "b"), ("b", "c"), ("c", "a")), iters = 1)
    assert(m.values.toSet == Set((1L, 1L)))
  }

  test("iteration bound is a loud contract") {
    intercept[IllegalArgumentException] {
      graft.ops.Hits.hubsAuthorities(
        Seq(("a", "b")).toDF("src", "dst"), "src", "dst", 7)
    }
  }
}
