package graft

import graft.ops.PageRank
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference PageRank golden (reference:
  * tests/test_graph_solver.py:14-40): 9-edge/12-node fixture, row-aligned
  * scores, base score (1-0.85)/12 = 0.0125. Distributed float summation
  * differs from the reference's sequential loop only below 1e-12, so the
  * golden uses 1e-9 tolerance (SURVEY.md §7.4).
  */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("page_rank golden: 9-edge fixture, row-aligned (py:14-40)") {
    val df = Seq(
      "A" -> "B", "B" -> "C", "C" -> "D", "E" -> "F", "F" -> "G",
      "G" -> "J", "I" -> "K", "I" -> "J", "AA" -> "Z").toDF("from", "to")
    val got = PageRank.pageRankColumn(df, "from", "to")
      .select("page_rank").as[Double].collect().toSeq
    val expected = Seq(
      0.012500000000000002, 0.023125000000000007, 0.032156250000000004,
      0.012500000000000002, 0.023125000000000007, 0.032156250000000004,
      0.012500000000000002, 0.012500000000000002, 0.012500000000000002)
    assert(got.size == expected.size)
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-9, s"got $g expected $e")
    }
  }

  test("null/unseen from-node gets score 0.0 (rs:118-126)") {
    val df = Seq(
      (Some("A"), Some("B")),
      (None, Some("B")),
      (Some("Q"), None)).toDF("from", "to")
    val got = PageRank.pageRankColumn(df, "from", "to")
      .select("page_rank").as[Double].collect().toSeq
    // valid edge set: only A->B; N=2, base=0.075; A=0.075
    assert(math.abs(got(0) - 0.075) < 1e-12)
    assert(got(1) == 0.0) // null from
    assert(got(2) == 0.0) // Q never part of a valid edge
  }

  test("ranks sum below 1 with sinks (no dangling redistribution)") {
    val df = Seq("A" -> "B", "B" -> "C").toDF("from", "to")
    val total = PageRank.scores(graft.core.Ingest.edges(df, "from", "to"))
      .agg(org.apache.spark.sql.functions.sum("score")).first().getDouble(0)
    assert(total < 1.0)
  }
}
