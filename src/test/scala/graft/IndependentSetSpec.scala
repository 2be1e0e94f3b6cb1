package graft

import graft.ops.IndependentSet
import org.scalatest.funsuite.AnyFunSuite

class IndependentSetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(String, String)],
      rounds: Int = 8): Map[String, Long] =
    IndependentSet.maximalIndependentSet(edges.toDF("src", "dst"),
        "src", "dst", rounds)
      .as[(String, Long)].collect().toMap

  test("single edge picks exactly one endpoint") {
    val got = run(Seq(("a", "b")))
    assert(got.size == 1)
    assert(Set("a", "b").contains(got.keys.head))
  }

  test("star graph: either the hub alone or all leaves") {
    val leaves = (1 to 6).map(i => s"l$i")
    val got = run(leaves.map(l => ("hub", l)))
    assert(got.keySet == Set("hub") || got.keySet == leaves.toSet)
  }

  test("independence and maximality on a pseudo-random graph") {
    val es = for (i <- 0 until 40; j <- i + 1 until 40
      if (i * 11 + j * 3) % 7 == 0) yield (s"n$i", s"n$j")
    val mis = run(es, rounds = 16).keySet
    es.foreach { case (a, b) =>
      assert(!(mis(a) && mis(b)), s"adjacent pair ($a,$b) both in MIS")
    }
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSet
    val nbrs = nodes.map(v => v ->
      es.collect { case (a, b) if a == v => b; case (a, b) if b == v => a }
        .toSet).toMap
    (nodes -- mis).foreach { v =>
      assert(nbrs(v).exists(mis),
        s"$v is not in the MIS and has no MIS neighbor: not maximal")
    }
  }

  test("deterministic across runs") {
    val es = for (i <- 0 until 20; j <- i + 1 until 20
      if (i + j) % 3 == 0) yield (s"n$i", s"n$j")
    assert(run(es) == run(es))
  }

  test("truncated rounds yield a valid independent (maybe not maximal) set") {
    val es = for (i <- 0 until 30; j <- i + 1 until 30
      if (i * 5 + j) % 4 == 0) yield (s"n$i", s"n$j")
    val mis = run(es, rounds = 1).keySet
    es.foreach { case (a, b) => assert(!(mis(a) && mis(b))) }
  }

  test("gated local Luby equals the distributed rounds (incl. truncation)") {
    val es = for (i <- 0 until 30; j <- i + 1 until 30
      if (i * 7 + j * 5) % 6 == 0) yield (s"n$i", s"n$j")
    for (rounds <- Seq(1, 8)) {
      val local = IndependentSet.maximalIndependentSet(
          es.toDF("src", "dst"), "src", "dst", rounds)
        .as[(String, Long)].collect().toMap
      val dist = IndependentSet.maximalIndependentSet(
          es.toDF("src", "dst"), "src", "dst", rounds, maxLocalEdges = 0L)
        .as[(String, Long)].collect().toMap
      assert(local == dist, s"rounds=$rounds")
    }
  }
}
