package graft

import graft.ops.Retention
import org.scalatest.funsuite.AnyFunSuite

class RetentionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val day = 86400000000L

  test("hand-computed daily retention matrix") {
    val events = Seq(
      (1L, 0L), (1L, 1000L), (1L, 2 * day + 5), // cohort d0, back on d2
      (2L, day - 1),                            // cohort d0, never back
      (3L, day + 1), (3L, day + 2), (3L, 2 * day)) // cohort d1, back on d2
      .toDF("user_id", "ts_us")
    val m = Retention.cohortRetention(events, "user_id", "ts_us", day)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(m == Map(
      (0L, 0L) -> 2L,        // users 1 and 2 on their cohort day
      (0L, 2L) -> 1L,        // user 1 back two days later
      (day, 0L) -> 1L,       // user 3 cohort day
      (day, 1L) -> 1L))      // user 3 back next day
  }

  test("multiple same-period events count a user once") {
    val events = Seq((7L, 0L), (7L, 5L), (7L, day + 1), (7L, day + 2))
      .toDF("user_id", "ts_us")
    val m = Retention.cohortRetention(events, "user_id", "ts_us", day)
      .as[(Long, Long, Long)].collect().map(r => (r._2, r._3)).sorted
    assert(m.toSeq == Seq((0L, 1L), (1L, 1L)))
  }
}
