package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ColoringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def color(edges: Seq[(String, String)], rounds: Int = 12,
      localCap: Long = 2_000_000L) =
    graft.ops.Coloring.greedyColoring(edges.toDF("src", "dst"),
        "src", "dst", rounds = rounds, maxLocalEdges = localCap)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def assertProper(edges: Seq[(String, String)],
      m: Map[String, (Long, Long)]): Unit =
    edges.foreach { case (a, b) =>
      if (a != b)
        assert(m(a)._1 != m(b)._1, s"edge ($a,$b) shares color ${m(a)._1}")
    }

  test("a triangle is properly 3-colored with colors {0,1,2}") {
    val g = Seq(("a", "b"), ("b", "c"), ("c", "a"))
    val m = color(g)
    assertProper(g, m)
    assert(m.values.map(_._1).toSet == Set(0L, 1L, 2L))
  }

  test("a star needs exactly 2 colors") {
    val g = Seq(("m", "a"), ("m", "b"), ("m", "c"), ("m", "d"))
    val m = color(g)
    assertProper(g, m)
    assert(m.values.map(_._1).toSet == Set(0L, 1L))
  }

  test("a bipartite path uses at most 3 colors (greedy bound)") {
    val g = (0 until 10).map(i => (f"p$i%02d", f"p${i + 1}%02d"))
    val m = color(g)
    assertProper(g, m)
    assert(m.values.map(_._1).max <= 2L)
    assert(m.values.forall(_._1 >= 0L), "a 10-path colors within 12 rounds")
  }

  test("local replay and distributed rounds agree exactly") {
    val g = (0 until 40).map(i => (s"n${i % 11}", s"n${(i * 5 + 2) % 11}"))
      .filter { case (a, b) => a != b }
    assert(color(g) == color(g, localCap = 0L))
  }

  test("truncation marks uncolored nodes -1 identically on both paths") {
    // rounds=1 colors only the priority maxima; the rest truncate to -1
    val g = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
    val loc = color(g, rounds = 1)
    val dist = color(g, rounds = 1, localCap = 0L)
    assert(loc == dist)
    assert(loc.values.exists(_._1 == -1L))
    assert(loc.values.exists(_._1 >= 0L))
  }

  test("colors never exceed max degree") {
    val g = (0 until 30).map(i => (s"h${i % 7}", s"h${(i * 3 + 1) % 7}"))
      .filter { case (a, b) => a != b }
    val m = color(g)
    assertProper(g, m)
    val degrees = g.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map(_._2.size)
    assert(m.values.map(_._1).max <= degrees.max.toLong)
  }
}
