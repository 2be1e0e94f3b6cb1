package graft

import graft.ops.Scc
import org.scalatest.funsuite.AnyFunSuite

class SccCondenseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("condensation of two cycles joined by a bridge is one DAG edge") {
    // cycle {a,b,c} -> bridge c->x -> cycle {x,y}
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("c", "x"), ("x", "y"), ("y", "x")).toDF("src", "dst")
    val got = Scc.condensationEdges(e)
      .as[(String, String)].collect().toSet
    assert(got == Set(("a", "x"))) // min-label SCC ids: {a,b,c}->a, {x,y}->x
  }

  test("a DAG condenses to itself (singleton SCCs)") {
    val e = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("src", "dst")
    val got = Scc.condensationEdges(e).as[(String, String)].collect().toSet
    assert(got == Set(("a", "b"), ("b", "c"), ("a", "c")))
  }

  test("intra-SCC edges vanish; parallel inter-SCC edges dedupe") {
    val e = Seq(("a", "b"), ("b", "a"),           // SCC {a,b}
      ("a", "z"), ("b", "z")).toDF("src", "dst")  // both collapse to a->z
    val got = Scc.condensationEdges(e).as[(String, String)].collect().toSet
    assert(got == Set(("a", "z")))
  }

  test("condensation agrees with the distributed path when gating is off") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "x"),
      ("x", "y"), ("y", "x"), ("y", "q")).toDF("src", "dst")
    val local = Scc.condensationEdges(e).as[(String, String)].collect().toSet
    val dist = Scc.condensationEdges(e, maxLocalEdges = 0L)
      .as[(String, String)].collect().toSet
    assert(local == dist && local == Set(("a", "x"), ("x", "q")))
  }
}
