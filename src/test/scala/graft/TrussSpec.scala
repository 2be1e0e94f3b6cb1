package graft

import graft.ops.Truss
import org.scalatest.funsuite.AnyFunSuite

class TrussSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(String, String)], k: Int,
      rounds: Int = 8): Set[(String, String)] =
    Truss.kTruss(edges.toDF("src", "dst"), "src", "dst", k, rounds)
      .as[(String, String)].collect().toSet

  private def k4(nodes: Seq[String]): Seq[(String, String)] =
    for (a <- nodes; b <- nodes if a < b) yield (a, b)

  test("K4 is a 4-truss: every edge closes 2 triangles") {
    val es = k4(Seq("a", "b", "c", "d"))
    assert(run(es, 4) == es.toSet)
  }

  test("a lone triangle survives k=3 but not k=4") {
    val tri = Seq(("a", "b"), ("b", "c"), ("a", "c"))
    assert(run(tri, 3) == tri.toSet)
    assert(run(tri, 4) == Set.empty)
  }

  test("pendant edge and bridge peel away, the clique core remains") {
    // K4 plus a tail d-e and a triangle hanging off the bridge e
    val core = k4(Seq("a", "b", "c", "d"))
    val extra = Seq(("d", "e"), ("e", "f"), ("e", "g"), ("f", "g"))
    assert(run(core ++ extra, 4) == core.toSet)
  }

  test("peeling cascades: removing weak edges kills dependent triangles") {
    // two triangles sharing edge (b,c): each non-shared edge has support
    // 1, so k=4 peels them, then (b,c) has support 0 and dies too
    val es = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d"))
    assert(run(es, 4) == Set.empty)
  }

  test("truncated rounds return the partial peel (engine-parity contract)") {
    // same cascade as above: round 1 keeps only (b,c) [wait: support of
    // (b,c) is 2 in round 1, others are 1] -> round 1 -> {(b,c)};
    // round 2 -> {}. maxRounds=1 must stop at the partial set.
    val es = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d"))
    assert(run(es, 4, rounds = 1) == Set(("b", "c")))
  }

  test("disjoint cliques are independent 4-trusses") {
    val es = k4(Seq("a", "b", "c", "d")) ++ k4(Seq("p", "q", "r", "s"))
    assert(run(es, 4) == es.toSet)
  }

  test("gated local peel equals the distributed peel (incl. truncation)") {
    val rnd = new scala.util.Random(7)
    val es = for (i <- 0 until 25; j <- i + 1 until 25
      if rnd.nextInt(4) == 0) yield (s"n$i", s"n$j")
    for (rounds <- Seq(1, 8)) {
      val local = Truss.kTruss(es.toDF("src", "dst"), "src", "dst", 4, rounds)
        .as[(String, String)].collect().toSet
      val dist = Truss.kTruss(es.toDF("src", "dst"), "src", "dst", 4, rounds,
          maxLocalEdges = 0L)
        .as[(String, String)].collect().toSet
      assert(local == dist, s"rounds=$rounds")
    }
  }
}
