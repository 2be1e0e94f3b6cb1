package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BridgesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(String, String)], localCap: Long = 2_000_000L) =
    graft.ops.Bridges.bridges(edges.toDF("src", "dst"), "src", "dst",
        maxLocalEdges = localCap)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  private val cases: Seq[(String, Seq[(String, String)], Set[(String, String)])] =
    Seq(
      ("path: every edge is a bridge",
        Seq(("a", "b"), ("b", "c"), ("c", "d")),
        Set(("a", "b"), ("b", "c"), ("c", "d"))),
      ("triangle: no bridges",
        Seq(("a", "b"), ("b", "c"), ("c", "a")),
        Set.empty),
      ("triangle with a tail: only the tail",
        Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "t")),
        Set(("c", "t"))),
      ("two cycles joined by one edge: only the connector",
        Seq(("a", "b"), ("b", "c"), ("c", "a"),
          ("x", "y"), ("y", "z"), ("z", "x"), ("c", "x")),
        Set(("c", "x"))),
      ("two components, one cyclic one tree",
        Seq(("a", "b"), ("b", "c"), ("c", "a"), ("p", "q"), ("q", "r")),
        Set(("p", "q"), ("q", "r"))),
      ("reverse duplicates collapse to one undirected edge",
        Seq(("a", "b"), ("b", "a"), ("b", "c")),
        Set(("a", "b"), ("b", "c"))))

  for ((name, edges, want) <- cases) {
    test(s"local Tarjan — $name") {
      assert(run(edges) == want)
    }
    test(s"distributed XOR-labeling — $name") {
      assert(run(edges, localCap = 0L) == want)
    }
  }

  test("distributed path matches local on a random-ish composite graph") {
    // deterministic pseudo-random graph: hash-linked nodes + chords
    val edges = (0 until 40).map(i =>
      (s"n${i % 13}", s"n${(i * 7 + 3) % 13}")) ++
      Seq(("n0", "hang1"), ("hang1", "hang2"))
    val local = run(edges)
    val dist = run(edges, localCap = 0L)
    assert(local == dist)
    assert(local.contains(("hang1", "hang2")))
  }

  test("depth budget is a loud contract on the distributed path") {
    val chain = (0 until 10).map(i => (f"c$i%02d", f"c${i + 1}%02d"))
    intercept[IllegalArgumentException] {
      graft.ops.Bridges.bridges(chain.toDF("src", "dst"), "src", "dst",
        maxLocalEdges = 0L, maxBfsRounds = 3).collect()
    }
  }

  test("empty input yields an empty bridge set on both paths") {
    assert(run(Seq.empty) == Set.empty)
    assert(run(Seq.empty, localCap = 0L) == Set.empty)
  }

  private def arts(edges: Seq[(String, String)]) =
    graft.ops.Bridges.articulationPoints(edges.toDF("src", "dst"),
        "src", "dst")
      .collect().map(_.getString(0)).toSet

  test("articulation: path interior nodes cut, endpoints don't") {
    assert(arts(Seq(("a", "b"), ("b", "c"), ("c", "d"))) == Set("b", "c"))
  }

  test("articulation: a cycle has none") {
    assert(arts(Seq(("a", "b"), ("b", "c"), ("c", "a"))) == Set.empty)
  }

  test("articulation: two cycles sharing one vertex cut at the shared one") {
    // bowtie: a-b-c-a and c-x-y-c share c, NO bridge exists but c cuts
    val bowtie = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("c", "x"), ("x", "y"), ("y", "c"))
    assert(arts(bowtie) == Set("c"))
    assert(run(bowtie) == Set.empty, "a bowtie has no bridge edges")
  }

  test("articulation: bridge endpoints with further neighbors cut") {
    // two triangles joined by edge c-x: both c and x are articulation
    assert(arts(Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("x", "y"), ("y", "z"), ("z", "x"), ("c", "x"))) == Set("c", "x"))
  }

  test("articulation: DFS root with two children is detected") {
    // star center is the root of its own DFS tree
    assert(arts(Seq(("m", "a"), ("m", "b"), ("m", "c"))) == Set("m"))
  }

  private def tecc(edges: Seq[(String, String)], localCap: Long = 2_000_000L) =
    graft.ops.Bridges.twoEdgeConnectedComponents(edges.toDF("src", "dst"),
        "src", "dst", maxLocalEdges = localCap)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("2ecc: two triangles joined by a bridge split into two blocks") {
    val g = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("x", "y"), ("y", "z"), ("z", "x"), ("c", "x"))
    val m = tecc(g)
    assert(m("a") == "a" && m("b") == "a" && m("c") == "a")
    assert(m("x") == "x" && m("y") == "x" && m("z") == "x")
  }

  test("2ecc: a pure path is all singletons") {
    val m = tecc(Seq(("a", "b"), ("b", "c")))
    assert(m == Map("a" -> "a", "b" -> "b", "c" -> "c"))
  }

  test("2ecc: a cycle is one block, local and distributed agree") {
    val g = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
    assert(tecc(g).values.toSet == Set("a"))
    assert(tecc(g) == tecc(g, localCap = 0L))
  }

  test("articulation cap is a loud contract") {
    intercept[IllegalArgumentException] {
      graft.ops.Bridges.articulationPoints(
        Seq(("a", "b"), ("b", "c")).toDF("src", "dst"), "src", "dst",
        maxLocalEdges = 1L)
    }
  }
}
