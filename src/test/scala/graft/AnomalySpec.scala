package graft

import graft.ops.Anomaly
import org.scalatest.funsuite.AnyFunSuite

class AnomalySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val hr = 3600000000L

  private def mkEvents(countsByHour: Seq[(Int, Int)], etype: String = "a") =
    countsByHour.flatMap { case (h, n) =>
      (0 until n).map(i => (h * hr + i, etype))
    }.toDF("ts_us", "event_type")

  test("hand-computed spike: 10 events after three 1-event hours") {
    val ev = mkEvents(Seq(0 -> 1, 1 -> 1, 2 -> 1, 3 -> 10, 4 -> 1))
    val got = Anomaly.rateSpikes(ev, "ts_us", "event_type", hr, lookback = 3)
      .orderBy("window_start_us")
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
    // (type, ws, n, base_sum, n_prior, is_spike)
    assert(got.map(r => (r._3, r._4, r._5, r._6)).toSeq == Seq(
      (1L, 0L, 0L, false),  // cold start: no history
      (1L, 1L, 1L, false),
      (1L, 2L, 2L, false),  // baseline = hours 0+1
      (10L, 3L, 3L, true),  // 10*3 > 3*2
      (1L, 12L, 3L, false)))
  }

  test("zero-event hours are absent: the baseline skips gaps by design") {
    val ev = mkEvents(Seq(0 -> 2, 1 -> 2, 2 -> 2, 5 -> 8)) // hours 3,4 empty
    val got = Anomaly.rateSpikes(ev, "ts_us", "event_type", hr, lookback = 3)
      .where($"window_start_us" === 5 * hr)
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
    assert(got.length == 1)
    // prior observed windows are hours 0,1,2 (6 events): 8*3 > 6*2 -> spike
    assert(got.head._4 == 6L && got.head._5 == 3L && got.head._6)
  }

  test("types are independent; a quiet type never flags") {
    val ev = mkEvents(Seq(0 -> 1, 1 -> 1, 2 -> 1, 3 -> 9), "a")
      .union(mkEvents(Seq(0 -> 1, 1 -> 1, 2 -> 1, 3 -> 1), "b"))
    val flags = Anomaly.rateSpikes(ev, "ts_us", "event_type", hr)
      .where($"is_spike").as[(String, Long, Long, Long, Long, Boolean)]
      .collect()
    assert(flags.map(_._1).toSeq == Seq("a"))
  }
}
