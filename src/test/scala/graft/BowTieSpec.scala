package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BowTie

class BowTieSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bow-tie: core cycle, IN feeder, OUT drain, disconnected other") {
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "a"), // core SCC {a,b,c}
      ("i", "a"),                         // IN
      ("c", "o"),                         // OUT
      ("x", "y")                          // other (disconnected)
    ).toDF("src", "dst")
    val r = BowTie.decompose(edges, "src", "dst").collect().head
    assert(r.getLong(0) == 7L) // n_nodes
    assert(r.getLong(1) == 3L) // core
    assert(r.getLong(2) == 1L) // in
    assert(r.getLong(3) == 1L) // out
    assert(r.getLong(4) == 2L) // other
  }

  test("a chain through the core is split between IN and OUT") {
    // i2 -> i1 -> core(a<->b) -> o1 -> o2; o1 also loops to itself? no:
    // plain chain; core = {a, b} (2-cycle)
    val edges = Seq(("a", "b"), ("b", "a"), ("i2", "i1"), ("i1", "a"),
      ("b", "o1"), ("o1", "o2")).toDF("src", "dst")
    val r = BowTie.decompose(edges, "src", "dst").collect().head
    assert(r.getLong(1) == 2L)
    assert(r.getLong(2) == 2L) // i1, i2
    assert(r.getLong(3) == 2L) // o1, o2
    assert(r.getLong(4) == 0L)
  }
}
