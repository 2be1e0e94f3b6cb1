package graft

import graft.ops.KCore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KCoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("triangle with a tail: 2-core strips the tail, keeps the triangle") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("c", "d"), ("d", "e")).toDF("src", "dst")
    val core = KCore.kCoreFixpoint(edges, "src", "dst", k = 2)
      .as[(String, Long)].collect().toMap
    assert(core == Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
  }

  test("K4 survives k=3 intact; a chain has an empty 2-core") {
    val nodes = Seq("1", "2", "3", "4")
    val k4 = (for { i <- nodes.indices; j <- nodes.indices if i < j }
      yield (nodes(i), nodes(j))).toDF("src", "dst")
    assert(KCore.kCoreFixpoint(k4, "src", "dst", 3)
      .as[(String, Long)].collect().toMap == nodes.map(_ -> 3L).toMap)
    val chain = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    assert(KCore.kCoreFixpoint(chain, "src", "dst", 2).count() == 0L)
  }

  test("cascading peel: removing one layer drops the next below k") {
    // star of triangles: center c in a triangle with (a1,a2); a2-a3 pendant
    // triangle chain — peeling is iterative, not a single degree filter
    val edges = Seq(("c", "a1"), ("c", "a2"), ("a1", "a2"),
      ("a2", "a3"), ("a3", "a4"), ("a4", "a2")).toDF("src", "dst")
    val once = KCore.kCore(edges, "src", "dst", k = 3, iters = 1)
    val fix = KCore.kCoreFixpoint(edges, "src", "dst", k = 3)
    // after ONE round some nodes can still linger; the fixpoint is empty
    assert(fix.count() == 0L)
    assert(once.count() >= fix.count())
  }

  test("fixed-iteration core equals fixpoint once iters covers the depth") {
    val edges = spark.range(0, 300).select(
      concat(lit("n"), pmod(xxhash64($"id"), lit(50))).as("src"),
      concat(lit("n"), pmod(xxhash64($"id" + 999), lit(50))).as("dst"))
    val fix = KCore.kCoreFixpoint(edges, "src", "dst", 3)
      .as[(String, Long)].collect().toSet
    val fixed = KCore.kCore(edges, "src", "dst", 3, iters = 20)
      .as[(String, Long)].collect().toSet
    assert(fixed == fix)
  }

  test("local replay ≡ distributed peeling (gate forced off), partial too") {
    // chain into a triangle: partial (iters=1,2) fixpoints differ from the
    // converged core, so this pins the ROUND-for-round replay, not just
    // the limit
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
      ("e", "f"), ("f", "d")).toDF("src", "dst")
    for (iters <- 1 to 4; k <- Seq(1, 2, 3)) {
      val local = KCore.kCore(edges, "src", "dst", k, iters)
        .as[(String, Long)].collect().toSet
      val dist = KCore.kCore(edges, "src", "dst", k, iters, maxLocalEdges = 0L)
        .as[(String, Long)].collect().toSet
      assert(local == dist, s"k=$k iters=$iters")
    }
  }
}
