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

  test("local fast path ≡ distributed step (gate forced off)") {
    // irregular graph + a partition that forces moves, label gaps (node w
    // unlabeled, label for a node absent from the graph) to pin the
    // inner-join semantics on both paths
    val e = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"),
      ("e", "f"), ("d", "f"), ("f", "a"), ("w", "a")).toDF("src", "dst")
    val lbl = Seq(("a", "P"), ("b", "Q"), ("c", "P"), ("d", "Q"),
      ("e", "P"), ("f", "Q"), ("ghost", "Z")).toDF("node", "community")
    val local = Communities.modularityMoveStep(e, "src", "dst", lbl)
      .as[(String, String)].collect().toMap
    val dist = Communities.modularityMoveStep(e, "src", "dst", lbl,
        maxLocalEdges = 0L)
      .as[(String, String)].collect().toMap
    assert(local == dist)
    assert(!local.contains("w") && !local.contains("ghost"))
  }

  test("louvain(rounds=k) ≡ k chained move steps, local ≡ distributed") {
    val e = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"),
      ("e", "f"), ("d", "f"), ("f", "a")).toDF("src", "dst")
    val init = Seq(("a", "A"), ("b", "B"), ("c", "C"), ("d", "D"),
      ("e", "E"), ("f", "F")).toDF("node", "community")
    for (k <- 1 to 3) {
      var chained = init
      for (_ <- 1 to k)
        chained = Communities.modularityMoveStep(e, "src", "dst", chained)
      val want = chained.as[(String, String)].collect().toMap
      val local = Communities.louvain(e, "src", "dst", init, rounds = k)
        .as[(String, String)].collect().toMap
      val dist = Communities.louvain(e, "src", "dst", init, rounds = k,
          maxLocalEdges = 0L)
        .as[(String, String)].collect().toMap
      assert(local == want, s"k=$k local")
      assert(dist == want, s"k=$k distributed")
    }
  }

  test("weighted move step: weights flip the argmax; local ≡ distributed") {
    // v touches community B via ONE heavy edge and community Y via two
    // light ones: unweighted counting would pull v to Y, the weighted
    // gain pulls it to B
    val e = Seq(("b", "v", 10L), ("v", "y1", 1L), ("v", "y2", 1L),
      ("y1", "y2", 1L), ("b", "b2", 3L)).toDF("src", "dst", "w")
    val lbl = Seq(("b", "B"), ("b2", "B"), ("v", "V"),
      ("y1", "Y"), ("y2", "Y")).toDF("node", "community")
    val got = Communities.modularityMoveStepWeighted(e, "src", "dst", "w", lbl)
      .as[(String, String)].collect().toMap
    assert(got("v") == "B")
    val dist = Communities.modularityMoveStepWeighted(e, "src", "dst", "w",
        lbl, maxLocalEdges = 0L)
      .as[(String, String)].collect().toMap
    assert(got == dist)
    // all-equal weights degenerate to the unweighted step
    val e1 = e.withColumn("w", org.apache.spark.sql.functions.lit(1L))
    val wq = Communities.modularityMoveStepWeighted(e1, "src", "dst", "w", lbl)
      .as[(String, String)].collect().toMap
    val uq = Communities.modularityMoveStep(e1, "src", "dst", lbl)
      .as[(String, String)].collect().toMap
    assert(wq == uq)
  }

  test("lpaLouvain fused ≡ LPA then louvain, local ≡ distributed") {
    val e = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"),
      ("e", "f"), ("d", "f"), ("f", "a"), ("g", "a"), ("b", "a")).toDF("src", "dst")
    for (lpa <- Seq(2, 4); mv <- Seq(1, 2)) {
      val want = Communities.louvain(e, "src", "dst",
          Communities.labelPropagation(e, "src", "dst", lpa), mv)
        .as[(String, String)].collect().toMap
      val fusedLocal = Communities.lpaLouvain(e, "src", "dst", lpa, mv)
        .as[(String, String)].collect().toMap
      val fusedDist = Communities.lpaLouvain(e, "src", "dst", lpa, mv,
          maxLocalEdges = 0L)
        .as[(String, String)].collect().toMap
      assert(fusedLocal == want, s"lpa=$lpa mv=$mv local")
      assert(fusedDist == want, s"lpa=$lpa mv=$mv distributed")
    }
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
