package graft

import graft.ops.Decay
import org.scalatest.funsuite.AnyFunSuite

class DecaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed dyadic decay, global reference window") {
    // windows of 10us; type x: w0 x1, w10 x2, w20 x1 -> ref = w20
    val events = Seq(
      ("x", 0L), ("x", 11L), ("x", 12L), ("x", 25L),
      ("y", 3L)) // y only in w0: age 2 relative to the GLOBAL ref w20
      .toDF("event_type", "ts_us")
    val got = Decay.decayedCounts(events, "ts_us", "event_type",
        windowUs = 10L, maxAge = 2)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // scale 2^2 = 4: age0 -> 4, age1 -> 2, age2 -> 1
    assert(got("x") == ((4L, 1L * 4 + 2L * 2 + 1L * 1, 9L * 1000000 / 4)))
    assert(got("y") == ((1L, 1L, 1L * 1000000 / 4)))
  }

  test("windows beyond maxAge are cut off (count and weight)") {
    val events = Seq(("x", 0L), ("x", 11L), ("x", 12L), ("x", 25L))
      .toDF("event_type", "ts_us")
    val got = Decay.decayedCounts(events, "ts_us", "event_type",
        windowUs = 10L, maxAge = 1)
      .as[(String, Long, Long, Long)].collect().head
    // w0 (age 2) dropped entirely: n_recent=3, num = 1*2 + 2*1 = 4
    assert(got == (("x", 3L, 4L, 4L * 1000000 / 2)))
  }
}
