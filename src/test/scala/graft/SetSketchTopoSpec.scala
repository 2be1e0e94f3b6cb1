package graft

import graft.ops.{SetSketch, TopoSort}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SetSketchTopoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("KMV sketch keeps the k smallest DISTINCT hashes, sorted") {
    val rows = Seq(("s", 5L), ("s", 3L), ("s", 5L), ("s", 9L), ("s", 1L),
      ("s", 7L), ("s", 3L)).toDF("k", "h")
    val got = SetSketch.kmvSketches(rows, "k", "h", k = 3)
      .select("sketch").as[Seq[Long]].collect().head
    assert(got == Seq(1L, 3L, 5L)) // dups collapsed, largest evicted
  }

  test("sketch state is partition-order invariant") {
    val rows = (1L to 1000L).map(h => ("s", h * 2654435761L % 100003L))
    val df = rows.toDF("k", "h")
    val a = SetSketch.kmvSketches(df.repartition(1), "k", "h", 64)
      .select("sketch").as[Seq[Long]].collect().head
    val b = SetSketch.kmvSketches(df.repartition(13), "k", "h", 64)
      .select("sketch").as[Seq[Long]].collect().head
    assert(a == b)
  }

  test("pairwise Jaccard matches the exact value when sketches hold everything") {
    // A = {1..8}, B = {5..12}: |A∩B| = 4, |A∪B| = 12 -> 333 permille
    val rows = (1L to 8L).map(("A", _)) ++ (5L to 12L).map(("B", _))
    val sk = SetSketch.kmvSketches(rows.toDF("k", "h"), "k", "h", k = 64)
    val got = SetSketch.pairwiseJaccard(sk, "k", k = 64)
      .as[(String, String, Long, Long, Long, Long)].collect().head
    assert(got == (("A", "B", 12L, 12L, 4L, 333L)))
  }

  test("pairs with an empty union are dropped, others unaffected (ADVICE r7)") {
    // an empty-empty pair has no union hash to threshold on: under ANSI
    // element_at(u, 0) would error — the pair must be absent, not a crash
    val sk = Seq(("A", Seq(1L, 2L)), ("B", Seq.empty[Long]),
      ("C", Seq.empty[Long])).toDF("k", "sketch")
    val got = SetSketch.pairwiseJaccard(sk, "k", k = 4)
      .select("src_a", "src_b").as[(String, String)].collect().toSet
    assert(got == Set(("A", "B"), ("A", "C")))
  }

  test("Jaccard estimate uses only the bottom-k union threshold") {
    // k = 4: union bottom-4 = {1,2,3,4}, threshold 4; shared ≤ 4 = {3,4}
    val rows = Seq(("A", 1L), ("A", 3L), ("A", 4L), ("A", 9L),
      ("B", 2L), ("B", 3L), ("B", 4L), ("B", 9L)).toDF("k", "h")
    val sk = SetSketch.kmvSketches(rows, "k", "h", k = 4)
    val got = SetSketch.pairwiseJaccard(sk, "k", k = 4)
      .as[(String, String, Long, Long, Long, Long)].collect().head
    assert(got == (("A", "B", 4L, 4L, 2L, 500L)))
  }

  test("topological layers are longest-path depths (local == distributed)") {
    // diamond with a tail: a->b->d, a->c->d, d->e; plus long arm a->x->y->d
    val e = Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
      ("d", "e"), ("a", "x"), ("x", "y"), ("y", "d")).toDF("src", "dst")
    val expected = Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "x" -> 1L,
      "y" -> 2L, "d" -> 3L, "e" -> 4L)
    val local = TopoSort.longestPathLayers(e)
      .as[(String, Long)].collect().toMap
    val dist = TopoSort.longestPathLayers(e, maxLocalEdges = 0L)
      .as[(String, Long)].collect().toMap
    assert(local == expected && dist == expected)
  }

  test("cycle input aborts loudly on BOTH paths instead of looping") {
    val e = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val exL = intercept[IllegalArgumentException] {
      TopoSort.longestPathLayers(e, maxRounds = 8)
    }
    assert(exL.getMessage.contains("cycle"))
    val exD = intercept[IllegalArgumentException] {
      TopoSort.longestPathLayers(e, maxRounds = 8, maxLocalEdges = 0L)
    }
    assert(exD.getMessage.contains("cycle"))
  }

  test("condensation feeds layering: cyclic graph schedules via its DAG") {
    val e = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "d"), ("d", "c"))
      .toDF("src", "dst")
    val dag = graft.ops.Scc.condensationEdges(e)
    val got = TopoSort.longestPathLayers(dag, "scc_src", "scc_dst")
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 0L, "c" -> 1L))
  }
}
