package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Density

class DensitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // helper: n points at grid cell (cx, cy) — dims beyond the first two
  // are ignored by the operator
  private def at(cx: Int, cy: Int, n: Int, idFrom: Long) =
    (0 until n).map(i => (idFrom + i,
      Array((cx * 0.125 + 0.01).toFloat, (cy * 0.125 + 0.01).toFloat)))

  test("core cells merge across 8-adjacency; border takes min cluster; noise NULL") {
    // two core cells touching diagonally (one cluster), one isolated
    // core cell far away (second cluster), one sparse cell adjacent to
    // the first cluster (border), one sparse cell alone (noise)
    val pts = at(0, 0, 3, 0) ++ at(1, 1, 3, 100) ++ at(10, 10, 3, 200) ++
      at(0, 1, 1, 300) ++ at(20, 20, 1, 400)
    val out = Density.gridDbscan(pts.toDF("vec_id", "embedding"),
      "vec_id", "embedding", eps = 0.125, minPts = 3L)
      .collect().map(r => r.getLong(0) -> r).toMap

    // cluster of the diagonal pair: min of "0:0" and "1:1"
    assert(out(0L).getString(4) == "core")
    assert(out(0L).getString(3) == "0:0")
    assert(out(100L).getString(3) == "0:0") // merged across the diagonal
    assert(out(200L).getString(3) == "10:10") // its own cluster
    assert(out(300L).getString(4) == "border")
    assert(out(300L).getString(3) == "0:0")
    assert(out(400L).getString(4) == "noise")
    assert(out(400L).isNullAt(3))
  }

  test("negative coordinates floor toward -inf (not toward zero)") {
    // x = -0.01 -> cell -1, not 0
    val pts = Seq((1L, Array(-0.01f, 0.01f)))
    val out = Density.gridDbscan(pts.toDF("vec_id", "embedding"),
      "vec_id", "embedding", eps = 0.125, minPts = 1L).collect().head
    assert(out.getLong(1) == -1L && out.getLong(2) == 0L)
  }

  test("non-power-of-two eps is rejected") {
    val pts = Seq((1L, Array(0.1f, 0.1f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Density.gridDbscan(pts, "vec_id", "embedding", eps = 0.1, minPts = 1L)
    }
  }

  test("radiusPairs emits each qualifying pair exactly once, no distinct") {
    // worst case for double-emission: coincident points (dist 0) plus
    // cross-cell pairs exactly at the radius, both directions present
    val pts = Seq(
      (1L, Array(0.01f, 0.01f)), (2L, Array(0.01f, 0.01f)), // coincident
      (3L, Array(0.02f, 0.01f)),                            // same cell
      (4L, Array(0.135f, 0.01f)),  // next cell over, within radius of 3
      (5L, Array(0.9f, 0.9f)))     // far away
    val out = Density.radiusPairs(pts.toDF("vec_id", "embedding"),
        "vec_id", "embedding", epsQ = 1250L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == out.distinct.length,
      s"duplicate pairs emitted: ${out.groupBy(identity).filter(_._2.length > 1).keys}")
    val set = out.toSet
    assert(set.contains((1L, 2L)) && set.contains((1L, 3L)) &&
      set.contains((2L, 3L)) && set.contains((3L, 4L)))
    assert(out.forall { case (a, b) => a < b })
    assert(!set.exists { case (a, b) => a == 5L || b == 5L })
  }
}
