package graft

import graft.ops.Paths
import org.scalatest.funsuite.AnyFunSuite

class PathsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("paths truncate at maxLen and count entities per distinct path") {
    val events = Seq(
      ("A", 0L, 1L, "view"), ("A", 10L, 2L, "click"), ("A", 20L, 3L, "view"),
      ("B", 0L, 4L, "view"), ("B", 5L, 5L, "click"), ("B", 9L, 6L, "view"),
      ("C", 0L, 7L, "view"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val got = Paths.userPaths(events, "user_id", "ts_us", "event_id",
        "event_type", maxLen = 2)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("view", 1L, 1L), ("view>click", 2L, 2L)))
  }

  test("equal timestamps order by the tie column") {
    val events = Seq(("D", 0L, 2L, "b"), ("D", 0L, 1L, "a"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val got = Paths.userPaths(events, "user_id", "ts_us", "event_id",
        "event_type", maxLen = 5)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a>b", 2L, 1L)))
  }
}
