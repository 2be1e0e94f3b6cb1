package graft

import graft.ops.Communities
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LeidenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refine(edges: Seq[(String, String)], refineRounds: Int = 2)
      : Array[(String, String, String)] =
    Communities.leidenRefine(edges.toDF("src", "dst"), "src", "dst",
        lpaRounds = 4, moveRounds = 2, refineRounds = refineRounds)
      .as[(String, String, String)].collect()

  private def k(prefix: String, n: Int): Seq[(String, String)] =
    for { i <- 0 until n; j <- i + 1 until n }
      yield (s"$prefix$i", s"$prefix$j")

  test("round bounds are validated on the LOCAL path too (ADVICE r10)") {
    // pre-fix, moveRounds=0 silently succeeded below maxLocalEdges and
    // threw only once the edge count crossed the cap — argument validity
    // must not depend on input size
    val edges = k("a", 3).toDF("src", "dst")
    for ((lpa, mv, ref) <- Seq((0, 2, 2), (2, 0, 2), (2, 2, 0),
                               (65, 2, 2), (2, 33, 2), (2, 2, 33)))
      intercept[IllegalArgumentException] {
        Communities.leidenRefine(edges, "src", "dst",
          lpaRounds = lpa, moveRounds = mv, refineRounds = ref)
      }
  }

  test("well-connected communities stay whole: two disjoint cliques") {
    val out = refine(k("a", 4) ++ k("b", 4))
    assert(out.length == 8)
    // refined labels refine the coarse partition and each clique stays one part
    out.groupBy(_._2).foreach { case (_, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"clique split: ${members.mkString(",")}")
    }
    assert(out.groupBy(_._2).size == 2)
  }

  test("a bridge-thin community splits into >1 refined part") {
    // two 4-cliques joined by ONE bridge edge; if the coarse pass merges
    // them, the refinement must expose the two well-connected parts —
    // and if the coarse pass already separates them, each stays whole.
    val out = refine(k("a", 4) ++ k("b", 4) :+ (("a0", "b0")))
    val byCoarse = out.groupBy(_._2)
    val aSide = out.filter(_._1.startsWith("a")).map(_._3).distinct
    val bSide = out.filter(_._1.startsWith("b")).map(_._3).distinct
    // each clique is internally one refined part...
    assert(aSide.length == 1 && bSide.length == 1, out.mkString(","))
    // ...and the cliques never share a refined label (the bridge edge is
    // not enough to hold them together under subgraph modularity)
    assert(aSide.head != bSide.head)
    // refinement property: a refined label lives inside ONE coarse community
    out.groupBy(_._3).foreach { case (_, members) =>
      assert(members.map(_._2).distinct.length == 1)
    }
    assert(byCoarse.nonEmpty)
  }

  test("forced-distributed path is row-identical to the local replay") {
    val edges = graft.queries.Tables.coOrderPairEdges(spark,
      "/root/testdata/sf0.001")
    val local = Communities.leidenRefine(edges, "src", "dst",
        lpaRounds = 4, moveRounds = 2, refineRounds = 2)
      .as[(String, String, String)].collect().toSet
    val dist = Communities.leidenRefine(edges, "src", "dst",
        lpaRounds = 4, moveRounds = 2, refineRounds = 2, maxLocalEdges = 0L)
      .as[(String, String, String)].collect().toSet
    assert(dist == local && local.nonEmpty)
  }

  test("refined labels never cross coarse communities on the testdata graph") {
    val edges = graft.queries.Tables.coOrderPairEdges(spark,
      "/root/testdata/sf0.001")
    val out = Communities.leidenRefine(edges, "src", "dst",
        lpaRounds = 4, moveRounds = 2, refineRounds = 2)
      .as[(String, String, String)].collect()
    assert(out.nonEmpty && out.map(_._1).distinct.length == out.length)
    out.groupBy(_._3).foreach { case (_, members) =>
      assert(members.map(_._2).distinct.length == 1)
    }
    // refinement can only split, never merge across the coarse partition
    assert(out.map(_._3).distinct.length >= out.map(_._2).distinct.length)
  }
}
