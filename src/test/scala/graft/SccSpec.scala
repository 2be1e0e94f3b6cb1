package graft

import graft.ops.Scc
import org.scalatest.funsuite.AnyFunSuite

/** SCC operator vs hand fixtures and a pure-Scala closure reference. */
class SccSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refScc(edges: Seq[(String, String)]): Map[String, String] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val fwd = edges.groupBy(_._1).map { case (k, v) => (k, v.map(_._2).toSet) }
    val bwd = edges.groupBy(_._2).map { case (k, v) => (k, v.map(_._1).toSet) }
    def closure(s: String, adj: Map[String, Set[String]]): Set[String] = {
      var seen = Set(s); var frontier = Set(s)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
        seen ++= next; frontier = next
      }
      seen
    }
    nodes.map(v => v -> (closure(v, fwd) & closure(v, bwd)).min).toMap
  }

  test("two cycles joined by a one-way bridge stay separate SCCs") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), // cycle 1
      ("d", "e"), ("e", "d"),                           // cycle 2
      ("c", "d"),                                       // one-way bridge
      ("e", "z"))                                       // dead-end singleton
    val got = Scc.components(edges.toDF("src", "dst"))
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "d" -> "d", "e" -> "d", "z" -> "z"))
    assert(got == refScc(edges))
  }

  test("a DAG yields all-singleton SCCs") {
    val edges = Seq(("1", "2"), ("2", "3"), ("1", "3"), ("3", "4"))
    val got = Scc.components(edges.toDF("src", "dst"))
      .as[(String, String)].collect().toMap
    assert(got == Map("1" -> "1", "2" -> "2", "3" -> "3", "4" -> "4"))
  }

  test("matches the closure reference on the testdata user-journey graph") {
    val edf = graft.queries.Tables.userSequenceEdges(
      spark, "/root/testdata/sf0.001")
    val edges = edf.as[(String, String)].collect().toSeq
    assert(edges.nonEmpty)
    val got = Scc.components(edf).as[(String, String)].collect().toMap
    assert(got == refScc(edges))
    // the fixture must be interesting: at least one non-singleton SCC
    assert(got.groupBy(_._2).exists(_._2.size > 1))
  }

  test("distributed peeling path (maxLocalEdges=0) equals the local Tarjan path") {
    val edf = graft.queries.Tables.userSequenceEdges(
      spark, "/root/testdata/sf0.001")
    val local = Scc.components(edf).as[(String, String)].collect().toMap
    val dist = Scc.components(edf, maxLocalEdges = 0L)
      .as[(String, String)].collect().toMap
    assert(dist == local)
  }

  test("distributed path on hand fixtures (cycles, bridge, DAG)") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("d", "e"), ("e", "d"), ("c", "d"), ("e", "z"),
      ("z", "y"), ("y", "x"))
    val got = Scc.components(edges.toDF("src", "dst"), maxLocalEdges = 0L)
      .as[(String, String)].collect().toMap
    assert(got == refScc(edges))
  }
}
