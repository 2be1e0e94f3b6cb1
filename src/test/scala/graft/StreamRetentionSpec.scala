package graft

import graft.streaming.StreamRetention
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamRetentionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val day = 86400000000L

  test("streamed retention increments equal the batch cohort matrix") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id").cast("long"), col("ts_us").cast("long"))
      .as[(Long, Long)].collect()
    val span = (ev.map(_._2).max - ev.map(_._2).min) / day
    assert(span <= 62, s"fixture must fit the 62-period horizon, spans $span")

    val input = MemoryStream[(Long, Long)]
    val q = StreamRetention.retention(
        input.toDS().toDF("user_id", "ts_us")
          .as[StreamRetention.RetEvent],
        periodUs = day, horizonPeriods = 62, delayThreshold = "70 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("sret_out").start()
    val shuffled = new scala.util.Random(41).shuffle(ev.toVector)
    shuffled.grouped(math.max(1, shuffled.length / 4)).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    // sentinel advances the watermark (lagging 70 days) past every
    // cohort + horizon: min + 63d needed, so push 70d beyond that
    val sentinel = ev.map(_._2).min + (62L + 70L + 2L) * day
    input.addData((-1L, sentinel)); q.processAllAvailable()
    input.addData((-1L, sentinel + 1)); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sret_out")
      .where(col("user_id") =!= -1L)
      .groupBy("cohort_start_us", "k")
      .agg(count(lit(1)).as("n_users"))
      .as[(Long, Int, Long)].collect()
      .map { case (c, k, n) => (c, k.toLong, n) }.toSet

    val batch = graft.ops.Retention.cohortRetention(
        ev.toSeq.toDF("user_id", "ts_us"), "user_id", "ts_us", day)
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("a late earlier event renumbers the bitmask (cohort shift)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val q = StreamRetention.retention(
        input.toDS().toDF("user_id", "ts_us")
          .as[StreamRetention.RetEvent],
        periodUs = day, horizonPeriods = 10, delayThreshold = "5 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("sret_shift").start()
    // user 7: activity on days 3 and 5 arrive first; THEN the true first
    // event on day 2 arrives late -> cohort day 2, k = {0, 1, 3}
    input.addData((7L, 3 * day), (7L, 5 * day)); q.processAllAvailable()
    input.addData((7L, 2 * day)); q.processAllAvailable()
    input.addData((-1L, 40 * day)); q.processAllAvailable()
    input.addData((-1L, 40 * day + 1)); q.processAllAvailable()
    q.stop()
    val got = spark.table("sret_shift")
      .where(col("user_id") === 7L)
      .select("cohort_start_us", "k")
      .as[(Long, Int)].collect().toSet
    assert(got == Set((2 * day, 0), (2 * day, 1), (2 * day, 3)))
  }
}
