package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SeriesShape

class SeriesShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("drawdown: peak-to-trough with earliest-argmax tie-break") {
    // series 5, 10, 4, 8, 2: runmax 5,10,10,10,10; dd 0,0,6,2,8
    val s = Seq(("g", 1L, 5L), ("g", 2L, 10L), ("g", 3L, 4L),
      ("g", 4L, 8L), ("g", 5L, 2L),
      // monotone rising group: drawdown 0 at the FIRST bucket
      ("h", 1L, 1L), ("h", 2L, 2L), ("h", 3L, 3L))
    val out = SeriesShape.maxDrawdown(s.toDF("g", "b", "c"), "g", "b", "c")
      .collect().map(r => r.getString(0) -> r).toMap
    val g = out("g")
    assert(g.getLong(1) == 5L && g.getLong(2) == 10L && g.getLong(3) == 2L)
    assert(g.getLong(4) == 8L && g.getLong(5) == 5L)
    val h = out("h")
    assert(h.getLong(4) == 0L && h.getLong(5) == 1L) // earliest zero
  }

  test("motif: exact repeat wins with exclusion zone respected") {
    // positions 1..9: pattern (1,2,3) at i=1 and i=7, noise between
    val cs = Seq(1L, 2L, 3L, 9L, 9L, 0L, 1L, 2L, 3L)
    val s = cs.zipWithIndex.map { case (c, i) => ("g", (i + 1).toLong, c) }
    val out = SeriesShape.bestMotif(s.toDF("g", "b", "c"), "g", "b", "c",
      motifLen = 3).collect().head
    assert(out.getLong(1) == 7L) // 9 - 3 + 1 positions
    assert(out.getLong(2) == 1L && out.getLong(3) == 7L) // the repeat
    assert(out.getLong(4) == 0L)
  }

  test("motif: short groups emit nothing; adjacent overlap excluded") {
    val s = Seq(("s", 1L, 1L), ("s", 2L, 2L), ("s", 3L, 3L),
      ("s", 4L, 1L), ("s", 5L, 2L)) // 3 positions but pairs need j>=i+3
    val out = SeriesShape.bestMotif(s.toDF("g", "b", "c"), "g", "b", "c",
      motifLen = 3).collect()
    // 3 subsequence positions (1..3) but the exclusion zone needs
    // j >= i + 3, so no non-overlapping pair exists -> no output row
    assert(out.isEmpty)
  }
}
