package graft

import graft.ops.{Communities, JoinProfile}
import org.scalatest.funsuite.AnyFunSuite

class LabelSpreadJoinProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("label spreading fills each clique from its seed and clamps seeds") {
    // two triangles joined by a bridge b-x; seeds: a->L1, x->L2
    val e = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("x", "y"), ("y", "z"), ("x", "z"), ("b", "x")).toDF("src", "dst")
    val seeds = Seq(("a", "L1"), ("x", "L2")).toDF("node", "label")
    val got = Communities.labelSpreading(e, "src", "dst", seeds, rounds = 3)
      .as[(String, String)].collect().toMap
    assert(got("a") == "L1" && got("b") == "L1" && got("c") == "L1")
    assert(got("x") == "L2" && got("y") == "L2" && got("z") == "L2")
  }

  test("seeds stay clamped even when surrounded by the other label") {
    // star: seed s (label OWN) whose 3 neighbors all carry OTHER
    val e = Seq(("s", "n1"), ("s", "n2"), ("s", "n3")).toDF("src", "dst")
    val seeds = Seq(("s", "OWN"), ("n1", "OTHER"), ("n2", "OTHER"),
      ("n3", "OTHER")).toDF("node", "label")
    val got = Communities.labelSpreading(e, "src", "dst", seeds, rounds = 4)
      .as[(String, String)].collect().toMap
    assert(got("s") == "OWN")
    assert(Seq("n1", "n2", "n3").forall(got(_) == "OTHER"))
  }

  test("nodes beyond the round horizon stay unlabeled") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val seeds = Seq(("a", "L")).toDF("node", "label")
    val got = Communities.labelSpreading(e, "src", "dst", seeds, rounds = 2)
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "L", "b" -> "L", "c" -> "L")) // d is 3 hops out
  }

  test("join profile computes the exact cardinality algebra") {
    val l = Seq(1L, 1L, 2L, 3L).toDF("k")
    val r = Seq(1L, 2L, 2L, 4L).toDF("k2")
    val got = JoinProfile.profile(l, "k", r, "k2")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    //      l_rows r_rows l_dis r_dis l_orp r_orp l_max r_max join
    assert(got == ((4L, 4L, 3L, 3L, 1L, 1L, 2L, 2L, 4L)))
  }
}
