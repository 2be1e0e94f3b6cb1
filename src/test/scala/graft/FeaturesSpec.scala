package graft

import graft.ops.Features
import org.scalatest.funsuite.AnyFunSuite

class FeaturesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val day = 86400000000L

  test("activity features count trailing windows against the data max") {
    // ref = day 40; u1 active days 0,35,39; u2 active day 40 only
    val events = Seq(("u1", 0L), ("u1", 35L * day), ("u1", 39L * day),
      ("u2", 40L * day)).toDF("uid", "ts_us")
    val got = Features.activityFeatures(events, "uid", "ts_us")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // 7d window opens at day 33: days 35 AND 39 qualify -> n_7d = 2
    assert(got("u1") == (("u1", 3L, 2L, 2L, 1L, 39L)))
    assert(got("u2") == (("u2", 1L, 1L, 1L, 0L, 0L)))
  }

  test("rfm quartile arithmetic: 8 customers split 2 per quartile") {
    // one order each, distinct amounts 1..8 on day 0..7
    val orders = (1 to 8).map(i =>
      (i.toLong, i.toLong * day, i.toDouble)).toDF("cid", "ts_us", "amt")
    val got = Features.rfm(orders, "cid", "ts_us", "amt")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // customer 8: most recent (recency 0 -> r=4), highest amount (m=4)
    assert(got(8L)._5 == 4L && got(8L)._7 == 4L)
    // customer 1: oldest, smallest -> r=1, m=1
    assert(got(1L)._5 == 1L && got(1L)._7 == 1L)
    // all frequencies tie at 1: f_score falls back to id order quartiles
    assert(got.values.map(_._6).toSeq.sorted == Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L))
  }

  test("epoch batches: each epoch is a full permutation in fixed batches") {
    val docs = (1L to 100L).toDF("doc_id")
    val got = Features.epochBatches(docs, "doc_id", epochs = 2,
        batchSize = 16)
      .as[(Long, Int, Long, Long)].collect()
    assert(got.length == 200)
    val byEpoch = got.groupBy(_._2)
    byEpoch.values.foreach { rows =>
      assert(rows.map(_._1).toSet == (1L to 100L).toSet) // full permutation
      // positions within an epoch are 0..99 exactly once
      assert(rows.map(r => r._3 * 16 + r._4).toSet == (0L until 100L).toSet)
      assert(rows.map(_._3).max == 6L) // ceil(100/16) - 1
    }
    // the two epochs shuffle differently
    val order0 = byEpoch(0).sortBy(r => (r._3, r._4)).map(_._1).toSeq
    val order1 = byEpoch(1).sortBy(r => (r._3, r._4)).map(_._1).toSeq
    assert(order0 != order1)
  }
}
