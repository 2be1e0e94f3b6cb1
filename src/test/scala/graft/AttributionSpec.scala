package graft

import graft.ops.Attribution
import org.scalatest.funsuite.AnyFunSuite

class AttributionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, String, Double)], lookback: Long) =
    Attribution.lastTouch(
        rows.toDF("event_id", "user_id", "ts_us", "event_type", "value"),
        "user_id", "ts_us", "event_type", "purchase", "value", lookback)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("latest strict-prior touch inside the window wins; outside -> (none)") {
    val got = run(Seq(
      (1L, 7L, 10L, "view", 0.0), (2L, 7L, 20L, "click", 0.0),
      (3L, 7L, 30L, "purchase", 1.5),    // click@20 within 50
      (4L, 7L, 100L, "purchase", 2.0),   // nearest touch@20 is 80 away
      (5L, 8L, 5L, "signup", 0.0),
      (6L, 8L, 5L, "purchase", 1.0)),    // strict: same-ts touch not prior
      lookback = 50L)
    assert(got == Map(
      "click" -> ((1L, 150L)),
      "(none)" -> ((2L, 300L))))
  }

  test("same-microsecond touches deduplicate by smallest tie id") {
    val got = run(Seq(
      (8L, 9L, 10L, "bbb", 0.0), (7L, 9L, 10L, "aaa", 0.0),
      (9L, 9L, 15L, "purchase", 1.0)), lookback = 50L)
    assert(got == Map("aaa" -> ((1L, 100L))))
  }
}
