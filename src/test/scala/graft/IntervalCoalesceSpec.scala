package graft

import graft.ops.Intervals
import org.scalatest.funsuite.AnyFunSuite

class IntervalCoalesceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], dur: Long) =
    Intervals.coalesceIntervals(
        rows.toDF("key", "ts_us", "event_id"), "key", "ts_us", "event_id", dur)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("overlap merges, gap splits, touching intervals merge (half-open)") {
    // [0,10) [5,15) | [20,30) [30,40): 5 overlaps, 20 > 15 splits,
    // 30 == island-2 max end -> touching, merges
    val got = run(Seq(("u", 0L, 1L), ("u", 5L, 2L), ("u", 20L, 3L), ("u", 30L, 4L)), 10L)
    assert(got == Seq(("u", 1L, 0L, 15L, 2L), ("u", 2L, 20L, 40L, 2L)))
  }

  test("contained interval does not extend the island") {
    val got = run(Seq(("u", 0L, 1L), ("u", 2L, 2L)), 10L)
    assert(got == Seq(("u", 1L, 0L, 12L, 2L)))
  }

  test("keys are independent") {
    val got = run(Seq(("a", 0L, 1L), ("b", 5L, 2L)), 10L)
    assert(got == Seq(("a", 1L, 0L, 10L, 1L), ("b", 1L, 5L, 15L, 1L)))
  }
}
