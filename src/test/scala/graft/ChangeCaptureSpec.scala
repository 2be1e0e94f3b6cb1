package graft

import graft.ops.ChangeCapture
import org.scalatest.funsuite.AnyFunSuite

class ChangeCaptureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("runs compress to SCD2 intervals; A->B->A yields three versions") {
    val log = Seq(
      ("k1", 0L, 1L, "A"), ("k1", 5L, 2L, "A"),
      ("k1", 10L, 3L, "B"), ("k1", 15L, 4L, "A"))
      .toDF("key", "ts_us", "event_id", "state")
    val got = ChangeCapture.stateIntervals(log, "key", "ts_us", "state", "event_id")
      .as[(String, String, Long, Option[Long], Long, Boolean)]
      .collect().sortBy(_._5).toSeq
    assert(got == Seq(
      ("k1", "A", 0L, Some(10L), 1L, false),
      ("k1", "B", 10L, Some(15L), 2L, false),
      ("k1", "A", 15L, None, 3L, true)))
  }

  test("equal timestamps order by the tie column") {
    val log = Seq(("k2", 0L, 1L, "X"), ("k2", 0L, 2L, "Y"))
      .toDF("key", "ts_us", "event_id", "state")
    val got = ChangeCapture.stateIntervals(log, "key", "ts_us", "state", "event_id")
      .as[(String, String, Long, Option[Long], Long, Boolean)]
      .collect().sortBy(_._5).toSeq
    assert(got == Seq(
      ("k2", "X", 0L, Some(0L), 1L, false),
      ("k2", "Y", 0L, None, 2L, true)))
  }

  test("an unchanging key is one current interval") {
    val log = Seq(("k3", 0L, 1L, "S"), ("k3", 9L, 2L, "S"), ("k3", 99L, 3L, "S"))
      .toDF("key", "ts_us", "event_id", "state")
    val got = ChangeCapture.stateIntervals(log, "key", "ts_us", "state", "event_id")
      .as[(String, String, Long, Option[Long], Long, Boolean)].collect().toSeq
    assert(got == Seq(("k3", "S", 0L, None, 1L, true)))
  }
}
