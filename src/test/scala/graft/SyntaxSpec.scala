package graft

import graft.syntax._
import org.scalatest.funsuite.AnyFunSuite

/** The fluent surface must be pure delegation — every method equals the
  * graft.ops entry point it wraps on the same input. */
class SyntaxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val edges =
    Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("from", "to")

  test("superMerger sugar equals the ops call") {
    val viaSugar = edges.superMerger().collect().map(_.toSeq).toSeq
    val viaOps = graft.ops.ConnectedComponents
      .superMerger(edges, "from", "to").collect().map(_.toSeq).toSeq
    assert(viaSugar == viaOps)
    assert(viaSugar.map(_.last) == Seq(1, 1, 2)) // reference numbering
  }

  test("pageRank sugar equals the ops call") {
    val a = edges.pageRank().collect().map(_.toSeq).toSeq
    val b = graft.ops.PageRank.pageRankColumn(edges, "from", "to")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("shortestPaths and associationRules sugar run end-to-end") {
    val w = Seq(("a", "b", 1.0), ("b", "c", 2.0)).toDF("from", "to", "weight")
    assert(w.shortestPaths().count() > 0)
    val tx = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"))
      .toDF("tid", "item")
    assert(tx.associationRules("tid", "item").count() > 0)
    assert(edges.superMergerCanonical().count() == edges.count()) // row-aligned
  }
}
