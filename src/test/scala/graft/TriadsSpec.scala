package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Triads

class TriadsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def census(edges: Seq[(String, String)]) =
    Triads.directedCensus(edges.toDF("src", "dst"), "src", "dst")
      .collect().head

  test("feed-forward triangle: 1 transitive, 0 cyclic, wedges counted") {
    // a->b, b->c, a->c: wedges = a->b->c only (din*dout: b has 1*1)
    val r = census(Seq(("a", "b"), ("b", "c"), ("a", "c")))
    assert(r.getLong(0) == 3L) // m_edges
    assert(r.getLong(1) == 0L) // no reciprocal
    assert(r.getLong(2) == 1L) // wedges
    assert(r.getLong(3) == 1L) // transitive
    assert(r.getLong(4) == 0L) // cyclic
  }

  test("3-cycle counts exactly once; round-trips excluded from wedges") {
    // cycle a->b->c->a plus a reciprocal pair x<->y
    val r = census(Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("x", "y"), ("y", "x")))
    assert(r.getLong(0) == 5L)
    assert(r.getLong(1) == 2L) // both directions of x-y
    // cycle contributes 3 wedges; x<->y round-trips excluded
    assert(r.getLong(2) == 3L)
    assert(r.getLong(3) == 0L)
    assert(r.getLong(4) == 1L) // the cycle, rotation-deduped
  }

  test("census matches brute force on a random digraph") {
    val rnd = new scala.util.Random(23)
    val edges = Seq.fill(120)((s"n${rnd.nextInt(12)}", s"n${rnd.nextInt(12)}"))
      .filter(e => e._1 != e._2).distinct
    val es = edges.toSet
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var wedges = 0L; var trans = 0L; var cyc = 0L
    for (a <- nodes; b <- nodes if a != b && es((a, b));
         c <- nodes if c != b && c != a && es((b, c))) {
      wedges += 1
      if (es((a, c))) trans += 1
      if (es((c, a)) && a < b && a < c) cyc += 1
    }
    val recip = edges.count(e => es((e._2, e._1))).toLong
    val r = census(edges)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (edges.size.toLong, recip, wedges, trans, cyc))
  }
}
