package graft

import graft.ops.{Communities, GraphStats}
import org.scalatest.funsuite.AnyFunSuite

class LouvainMoveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val twoTriangles = Seq(
    ("a", "b"), ("b", "c"), ("a", "c"),
    ("x", "y"), ("y", "z"), ("x", "z")).toDF("src", "dst")

  test("a misassigned node moves home and modularity increases") {
    // c wrongly labeled into the {x,y,z} community
    val bad = Seq(("a", "A"), ("b", "A"), ("c", "X"),
      ("x", "X"), ("y", "X"), ("z", "X")).toDF("node", "community")
    val moved = Communities.modularityMoveStep(twoTriangles, "src", "dst", bad)
    val got = moved.as[(String, String)].collect().toMap
    assert(got("c") == "A")
    assert(Seq("x", "y", "z").forall(got(_) == "X"))
    def q(lbl: org.apache.spark.sql.DataFrame): Double =
      GraphStats.modularity(twoTriangles, "src", "dst", lbl)
        .select("modularity").as[Double].collect().head
    assert(q(moved) > q(bad))
  }

  test("a correct partition is a fixpoint of the move step") {
    val good = Seq(("a", "A"), ("b", "A"), ("c", "A"),
      ("x", "X"), ("y", "X"), ("z", "X")).toDF("node", "community")
    val got = Communities.modularityMoveStep(twoTriangles, "src", "dst", good)
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "A", "b" -> "A", "c" -> "A",
      "x" -> "X", "y" -> "X", "z" -> "X"))
  }

  test("score ties break to the smaller community label") {
    // path b - v - y: both neighbor communities offer identical gain
    val e = Seq(("b", "v"), ("v", "y")).toDF("src", "dst")
    val lbl = Seq(("b", "B"), ("v", "V"), ("y", "Y")).toDF("node", "community")
    val got = Communities.modularityMoveStep(e, "src", "dst", lbl)
      .as[(String, String)].collect().toMap
    assert(got("v") == "B") // B < Y lexicographically
  }
}
