package graft

import graft.ops.Transitions
import org.scalatest.funsuite.AnyFunSuite

class TransitionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed transition counts and per-mille probabilities") {
    val events = Seq(
      ("A", 0L, 1L, "view"), ("A", 10L, 2L, "click"), ("A", 20L, 3L, "view"),
      ("B", 0L, 4L, "click"), ("B", 5L, 5L, "click"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val t = Transitions.eventTransitions(events, "user_id", "ts_us",
        "event_type", "event_id")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(t == Map(
      ("view", "click") -> ((1L, 1L, 1000L)),
      ("click", "view") -> ((1L, 2L, 500L)),
      ("click", "click") -> ((1L, 2L, 500L))))
  }

  test("equal timestamps resolve by the tie column") {
    val events = Seq(
      ("C", 0L, 1L, "a"), ("C", 0L, 2L, "b"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val t = Transitions.eventTransitions(events, "user_id", "ts_us",
        "event_type", "event_id")
      .select("from_type", "to_type").as[(String, String)].collect()
    assert(t.toSeq == Seq(("a", "b")))
  }

  test("sequences never cross entity boundaries") {
    val events = Seq(
      ("D", 0L, 1L, "x"), ("E", 1L, 2L, "y"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    assert(Transitions.eventTransitions(events, "user_id", "ts_us",
      "event_type", "event_id").count() == 0L)
  }

  test("event 3-grams slide over each entity stream") {
    val events = Seq(
      ("A", 0L, 1L, "v"), ("A", 1L, 2L, "v"), ("A", 2L, 3L, "c"),
      ("A", 3L, 4L, "p"),
      ("B", 0L, 5L, "v"), ("B", 1L, 6L, "v"), ("B", 2L, 7L, "c"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val got = Transitions.eventNgrams(events, "user_id", "ts_us",
        "event_type", "event_id", n = 3)
      .as[(String, Long)].collect().toMap
    assert(got == Map("v>v>c" -> 2L, "v>c>p" -> 1L))
  }

  test("streams shorter than n yield no n-gram") {
    val events = Seq(("C", 0L, 1L, "a"), ("C", 1L, 2L, "b"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    assert(Transitions.eventNgrams(events, "user_id", "ts_us",
      "event_type", "event_id", n = 3).count() == 0L)
  }
}
