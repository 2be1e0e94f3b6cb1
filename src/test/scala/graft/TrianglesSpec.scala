package graft

import graft.ops.Triangles
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrianglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("K4 has 4 triangles, every node in 3") {
    val nodes = Seq("a", "b", "c", "d")
    val edges = (for {
      i <- nodes.indices; j <- nodes.indices if i < j
    } yield (nodes(i), nodes(j))).toDF("src", "dst")
    val tri = Triangles.triangleList(edges, "src", "dst")
      .as[(String, String, String)].collect().toSet
    assert(tri == Set(("a", "b", "c"), ("a", "b", "d"), ("a", "c", "d"), ("b", "c", "d")))
    val per = Triangles.perNodeCounts(edges, "src", "dst")
      .as[(String, Long)].collect().toMap
    assert(per == nodes.map(_ -> 3L).toMap)
  }

  test("C5 cycle has none; disjoint triangles count separately") {
    val c5 = Seq(("1", "2"), ("2", "3"), ("3", "4"), ("4", "5"), ("5", "1"))
      .toDF("src", "dst")
    assert(Triangles.globalCount(c5, "src", "dst").as[Long].head() == 0L)
    val two = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("x", "y"), ("y", "z"), ("z", "x")).toDF("src", "dst")
    assert(Triangles.globalCount(two, "src", "dst").as[Long].head() == 2L)
  }

  test("self-loops, duplicate and reversed edges do not distort the count") {
    val messy = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"), ("c", "a"),
      ("a", "a"), ("c", "c")).toDF("src", "dst")
    assert(Triangles.globalCount(messy, "src", "dst").as[Long].head() == 1L)
  }

  test("degree-oriented enumeration equals the naive id-ordered 3-way join") {
    // deterministic pseudo-random graph with hubs (degree skew)
    val edges = spark.range(0, 400).select(
      concat(lit("n"), pmod(xxhash64($"id"), lit(60))).as("src"),
      concat(lit("n"), pmod(xxhash64($"id" + 1000), lit(60))).as("dst"))
    val e = edges.select(
        least($"src", $"dst").as("x"), greatest($"src", $"dst").as("y"))
      .where($"x" =!= $"y").distinct()
    val naive = e.as("e1")
      .join(e.select($"x".as("x2"), $"y".as("y2")), $"y" === $"x2")
      .join(e.select($"x".as("x3"), $"y".as("y3")),
        $"x" === $"x3" && $"y2" === $"y3")
      .select($"x".as("a"), $"y".as("b"), $"y2".as("c"))
    val got = Triangles.triangleList(edges, "src", "dst")
      .as[(String, String, String)].collect().toSet
    val want = naive.as[(String, String, String)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("local enumeration ≡ distributed joins (gate forced off)") {
    // overlapping cliques + bridges: triangles sharing edges, mixed degrees
    val k4a = for (a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d")
      if a < b) yield (a, b)
    val k4b = for (a <- Seq("c", "d", "e", "f"); b <- Seq("c", "d", "e", "f")
      if a < b) yield (a, b)
    val edges = (k4a ++ k4b ++ Seq(("f", "g"), ("g", "a"))).toDF("src", "dst")
    val local = Triangles.triangleList(edges, "src", "dst")
      .as[(String, String, String)].collect().toSet
    val dist = Triangles.triangleList(edges, "src", "dst", maxLocalEdges = 0L)
      .as[(String, String, String)].collect().toSet
    assert(local == dist && local.nonEmpty)
    val ccL = Triangles.clusteringCoefficients(edges, "src", "dst")
      .as[(String, Long, Long, Long)].collect().toSet
    val ccD = Triangles.clusteringCoefficients(edges, "src", "dst",
        maxLocalEdges = 0L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(ccL == ccD && ccL.nonEmpty)
  }
}
