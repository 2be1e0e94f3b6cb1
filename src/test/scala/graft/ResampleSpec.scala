package graft

import graft.ops.{EmbedStats, Resample}
import org.scalatest.funsuite.AnyFunSuite

class ResampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("OHLC picks open/close by (ts, id) order, high/low by value") {
    // one bucket: events at t=1,2,3 with values 50, 90, 20
    val rows = Seq(("a", 1L, 10L, 50L), ("a", 2L, 11L, 90L),
      ("a", 3L, 12L, 20L),
      // second bucket, single event
      ("a", 1000L + 86400000000L, 13L, 7L))
      .toDF("t", "ts_us", "id", "v")
    val got = Resample.ohlc(rows, "t", "ts_us", "id", "v", 86400000000L)
      .orderBy("bucket_start_us")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(got(0) == (("a", 0L, 3L, 50L, 90L, 20L, 20L)))
    assert(got(1) == (("a", 86400000000L, 1L, 7L, 7L, 7L, 7L)))
  }

  test("same-timestamp ties resolve by id, deterministically") {
    val rows = Seq(("a", 5L, 2L, 100L), ("a", 5L, 1L, 200L))
      .toDF("t", "ts_us", "id", "v")
    val got = Resample.ohlc(rows, "t", "ts_us", "id", "v", 86400000000L)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    assert(got._4 == 200L && got._7 == 100L) // open = id 1, close = id 2
  }

  test("hourly profile shares sum to ~1000 per group") {
    val hourUs = 3600000000L
    val rows = (0 until 24).flatMap(h =>
      Seq.fill(h + 1)(("a", h * hourUs + 17L)))
    val got = Resample.hourlyProfile(rows.toDF("t", "ts_us"), "t", "ts_us")
      .as[(String, Long, Long, Long)].collect()
    assert(got.length == 24)
    val total = got.map(_._4).sum
    assert(total > 975L && total <= 1000L) // truncating shares
    assert(got.find(_._2 == 23L).get._3 == 24L)
  }

  test("projection equals hand-computed centered dot products") {
    val df = Seq(Array(1.0, 2.0), Array(3.0, 6.0)).toDF("v")
    val comps = Seq(Array(1.0, 0.0), Array(0.0, 1.0))
    val means = Array(2.0, 4.0)
    val got = EmbedStats.project(df, "v", comps, means)
      .select("projected").as[Seq[Double]].collect().toSet
    assert(got == Set(Seq(-1.0, -2.0), Seq(1.0, 2.0)))
  }
}
