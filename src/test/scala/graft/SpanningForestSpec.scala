package graft

import graft.ops.SpanningForest
import org.scalatest.funsuite.AnyFunSuite

class SpanningForestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def boruvka(edges: Seq[(String, String, Long)]): Set[(String, String, Long)] =
    SpanningForest.minimumSpanningForest(
        edges.toDF("src", "dst", "w"), "src", "dst", "w")
      .select("x", "y", "w").as[(String, String, Long)].collect().toSet

  /** Kruskal reference on canonicalized (x<y) distinct-weight edges. */
  private def kruskal(edges: Seq[(String, String, Long)]): Set[(String, String, Long)] = {
    val canon = edges.map { case (a, b, w) =>
      (if (a < b) a else b, if (a < b) b else a, w)
    }.groupBy(e => (e._1, e._2)).map(_._2.minBy(_._3)).toSeq
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(a: String): String = {
      val p = parent.getOrElse(a, a)
      if (p == a) a else { val r = find(p); parent(a) = r; r }
    }
    canon.sortBy(e => (e._3, e._1, e._2)).flatMap { case (x, y, w) =>
      val (rx, ry) = (find(x), find(y))
      if (rx == ry) None else { parent(rx) = ry; Some((x, y, w)) }
    }.toSet
  }

  test("path graph: every edge is in the tree") {
    val es = Seq(("a", "b", 5L), ("b", "c", 1L), ("c", "d", 9L))
    assert(boruvka(es) == es.toSet)
  }

  test("triangle drops exactly the heaviest edge") {
    val es = Seq(("a", "b", 1L), ("b", "c", 2L), ("a", "c", 3L))
    assert(boruvka(es) == Set(("a", "b", 1L), ("b", "c", 2L)))
  }

  test("disconnected graph yields one tree per component") {
    val es = Seq(("a", "b", 1L), ("b", "c", 7L), ("a", "c", 4L),
      ("x", "y", 2L), ("y", "z", 3L), ("x", "z", 1L))
    val got = boruvka(es)
    assert(got == kruskal(es))
    assert(got.size == 4) // (3-1) + (3-1)
  }

  test("parallel edges collapse to the lightest before the MSF") {
    val es = Seq(("a", "b", 9L), ("b", "a", 2L), ("b", "c", 5L))
    assert(boruvka(es) == Set(("a", "b", 2L), ("b", "c", 5L)))
  }

  test("matches Kruskal on a pseudo-random 60-node multi-component graph") {
    // deterministic LCG weights, all distinct -> unique MSF
    val rnd = new scala.util.Random(42)
    val perm = rnd.shuffle((0 until 4000).toList).iterator
    val es = for {
      i <- 0 until 60; j <- i + 1 until 60
      if (i * 13 + j * 7) % 11 == 0 && i / 20 == j / 20 // 3 islands
    } yield (f"n$i%02d", f"n$j%02d", perm.next().toLong)
    val got = boruvka(es)
    val want = kruskal(es)
    assert(got == want)
    // forest: |edges| = |nodes| - |components|
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    assert(got.size < nodes.size)
  }

  test("gated local Boruvka equals the distributed rounds, round-for-round") {
    val rnd = new scala.util.Random(11)
    val perm = rnd.shuffle((0 until 2000).toList).iterator
    val es = for (i <- 0 until 30; j <- i + 1 until 30
      if rnd.nextInt(5) == 0) yield (s"n$i", s"n$j", perm.next().toLong)
    val local = SpanningForest.minimumSpanningForest(
        es.toDF("src", "dst", "w"), "src", "dst", "w")
      .as[(String, String, Long, Long)].collect().toSet
    val dist = SpanningForest.minimumSpanningForest(
        es.toDF("src", "dst", "w"), "src", "dst", "w", maxLocalEdges = 0L)
      .as[(String, String, Long, Long)].collect().toSet
    assert(local == dist)
  }
}
