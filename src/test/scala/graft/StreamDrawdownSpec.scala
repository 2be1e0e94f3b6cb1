package graft

import graft.streaming.StreamDrawdown
import graft.streaming.StreamDrawdown.{DdRow, KeyedEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamDrawdownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val day = 86400000000L

  test("streamed running drawdown equals batch rows on shuffled sf0.001 arrival") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("ts_us")).as[(String, Long)].collect()

    val input = MemoryStream[KeyedEvent]
    val q = StreamDrawdown.runningDrawdown(input.toDS(), windowUs = day,
        delayThreshold = "40 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("sdd_out").start()
    val shuffled = new scala.util.Random(29)
      .shuffle(ev.map { case (k, u) => KeyedEvent(k, u) }.toVector)
    shuffled.grouped(math.max(1, shuffled.length / 3)).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    val sentinel = ev.map(_._2).max + day + 41L * day
    input.addData(KeyedEvent("__s", sentinel)); q.processAllAvailable()
    input.addData(KeyedEvent("__s", sentinel + 1)); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sdd_out").as[DdRow].collect()
      .filter(_.key != "__s")
      .map(r => (r.key, r.bucket, r.c, r.runmax, r.dd)).toSet

    val daily = ev.toSeq.toDF("key", "ts_us")
      .groupBy(col("key"), expr(s"ts_us - pmod(ts_us, $day)").as("ws"))
      .agg(count(lit(1)).as("c"))
    val batch = graft.ops.SeriesShape.runningDrawdown(daily, "key", "ws", "c")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("running max only ratchets up; drawdown zero at new peaks") {
    implicit val sqlCtx = spark.sqlContext
    val w = 1000000L
    val events =
      Seq.fill(3)(KeyedEvent("x", 0 * w + 1)) ++
        Seq.fill(5)(KeyedEvent("x", 1 * w + 1)) ++
        Seq.fill(2)(KeyedEvent("x", 2 * w + 1)) ++
        Seq.fill(5)(KeyedEvent("x", 3 * w + 1))
    val input = MemoryStream[KeyedEvent]
    val q = StreamDrawdown.runningDrawdown(input.toDS(), windowUs = w,
        delayThreshold = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("sdd_small").start()
    input.addData(events: _*); q.processAllAvailable()
    input.addData(KeyedEvent("__s", 100 * w)); q.processAllAvailable()
    input.addData(KeyedEvent("__s", 100 * w + 1)); q.processAllAvailable()
    q.stop()
    val got = spark.table("sdd_small").as[DdRow].collect()
      .filter(_.key == "x").sortBy(_.bucket)
    assert(got.map(_.c).toSeq == Seq(3L, 5L, 2L, 5L))
    assert(got.map(_.runmax).toSeq == Seq(3L, 5L, 5L, 5L))
    assert(got.map(_.dd).toSeq == Seq(0L, 0L, 3L, 0L))
  }
}
