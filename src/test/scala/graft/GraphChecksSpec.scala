package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphChecksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def euler(edges: Seq[(String, String)]) =
    graft.ops.GraphChecks.eulerian(edges.toDF("src", "dst"), "src", "dst")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5))).toMap

  test("a cycle has an Euler circuit, a path only an Euler path") {
    val m = euler(Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("p", "q"), ("q", "r")))
    assert(m("a") == (3L, 3L, 0L, true, true))
    assert(m("p") == (3L, 2L, 2L, false, true))
  }

  test("four odd-degree nodes rule out even an Euler path") {
    // two triangles sharing nothing, joined by TWO parallel-ish links:
    // K4 minus an edge has exactly... simpler: star with 3 leaves has
    // 3 odd degrees (leaves) + 1 odd (hub) = 4 odd
    val m = euler(Seq(("h", "a"), ("h", "b"), ("h", "c")))
    assert(m("a")._3 == 4L)
    assert(!m("a")._4 && !m("a")._5)
  }

  test("m_edges is the true undirected edge count") {
    val m = euler(Seq(("a", "b"), ("b", "a"), ("b", "c")))
    assert(m("a")._2 == 2L, "reverse duplicate collapses")
  }

  private def rich(edges: Seq[(String, String)], maxK: Int = 16) =
    graft.ops.GraphChecks.richClub(edges.toDF("src", "dst"), "src", "dst",
        maxK)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("rich club of a clique is complete at every threshold") {
    // K4: all degrees 3 -> k in {1,2}: N_k=4, E_k=6, phi=1000
    val k4 = for (i <- 0 until 4; j <- i + 1 until 4)
      yield (s"v$i", s"v$j")
    val m = rich(k4)
    assert(m.keySet == Set(1L, 2L))
    assert(m(1L) == (4L, 6L, 1000L))
    assert(m(2L) == (4L, 6L, 1000L))
  }

  test("a star has no rich club: the hub stands alone above k=1") {
    // star S4: hub degree 4, leaves 1 -> k=1..3 keeps only the hub
    // (N_k=1 < 2: omitted) -> no rows at all
    val m = rich(Seq(("h", "a"), ("h", "b"), ("h", "c"), ("h", "d")))
    assert(m.isEmpty)
  }

  test("hub core denser than the whole: phi rises with k") {
    // two hubs in a triangle plus pendant leaves on each hub
    val g = Seq(("h1", "h2"), ("h1", "h3"), ("h2", "h3"),
      ("h1", "l1"), ("h1", "l2"), ("h2", "l3"), ("h2", "l4"))
    val m = rich(g)
    // k=1: degree>1 = {h1(d4), h2(d4), h3(d2)}: E=3 among them, phi=1000
    assert(m(1L) == (3L, 3L, 1000L))
    // k=2,3: only h1,h2 qualify: one edge between them, phi=1000
    assert(m(2L) == (2L, 1L, 1000L))
  }

  private def kappa(rows: Seq[(Boolean, Boolean)]) = {
    val r = graft.ops.Agreement.cohensKappa(rows.toDF("a", "b"), "a", "b")
      .collect()(0)
    (r.getAs[Long]("n"), r.getAs[Long]("agree"), r.getAs[Long]("num"),
      r.getAs[Long]("den"), r.getAs[Long]("kappa_permille"))
  }

  test("perfect agreement has kappa 1000") {
    val (_, _, num, den, k) =
      kappa(Seq((true, true), (false, false), (true, true)))
    assert(num == den && k == 1000L)
  }

  test("independent raters at 50/50 land at kappa 0") {
    val (_, _, num, _, k) = kappa(Seq(
      (true, true), (true, false), (false, true), (false, false)))
    assert(num == 0L && k == 0L)
  }

  test("systematic disagreement goes negative") {
    val (_, agree, num, _, k) =
      kappa(Seq((true, false), (false, true), (true, false), (false, true)))
    assert(agree == 0L && num < 0L && k == -1000L)
  }

  test("hand-computed mixed case matches the integer formula") {
    // n=5, agree=3, a1=3, b1=3: chance=3*3+2*2=13
    // num=5*3-13=2, den=25-13=12, kappa=2/12 -> 166 permille
    val (n, agree, num, den, k) = kappa(Seq(
      (true, true), (true, true), (true, false), (false, true),
      (false, false)))
    assert((n, agree, num, den) == (5L, 3L, 2L, 12L))
    assert(k == 166L)
  }

  test("degenerate constant raters emit kappa 0 with den 0 visible") {
    val (_, _, _, den, k) = kappa(Seq((true, true), (true, true)))
    assert(den == 0L && k == 0L)
  }
}
