package graft

import graft.streaming.StreamTransitions
import graft.streaming.StreamTransitions.{TransEvent, TransPair}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamTransitionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed pairs equal batch transitions on sf0.001 under shuffled arrival") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
      .map { case (u, t, i, y) => TransEvent(u, t, i, y) }
    val input = MemoryStream[TransEvent]
    val q = StreamTransitions.pairs(input.toDS(), "40 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("trans_out").start()
    val shuffled = new scala.util.Random(13).shuffle(ev.toVector)
    shuffled.grouped(math.max(1, shuffled.length / 3)).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    // far-future sentinels advance the watermark past every real event
    val sentinelTs = ev.map(_.ts_us).max + 41L * 86400000000L
    input.addData(TransEvent(-1L, sentinelTs, 0L, "x")); q.processAllAvailable()
    input.addData(TransEvent(-1L, sentinelTs + 1, 1L, "x")); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("trans_out").as[TransPair].collect()
      .filter(_.user_id >= 0)
      .groupBy(p => (p.from_type, p.to_type)).map { case (k, v) => k -> v.length.toLong }
    val batch = graft.ops.Transitions.eventTransitions(
        graft.queries.Tables.events(spark, "/root/testdata/sf0.001"),
        "user_id", "ts_us", "event_type", "event_id")
      .select("from_type", "to_type", "n")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(streamed == batch)
  }

  test("a late event lands between already-buffered neighbors") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TransEvent]
    val q = StreamTransitions.pairs(input.toDS(), "10 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("trans_late").start()
    // a and c arrive first; b (between them in event time) arrives late
    input.addData(TransEvent(1L, 1000000L, 1L, "a"),
      TransEvent(1L, 3000000L, 3L, "c"))
    q.processAllAvailable()
    input.addData(TransEvent(1L, 2000000L, 2L, "b")); q.processAllAvailable()
    input.addData(TransEvent(-1L, 60000000L, 9L, "x")); q.processAllAvailable()
    input.addData(TransEvent(-1L, 60000001L, 10L, "x")); q.processAllAvailable()
    q.stop()
    val got = spark.table("trans_late").as[TransPair].collect()
      .filter(_.user_id == 1L).map(p => (p.from_type, p.to_type)).sorted.toSeq
    assert(got == Seq(("a", "b"), ("b", "c")))
  }

  test("carry survives watermark gaps: pair spans micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TransEvent]
    val q = StreamTransitions.pairs(input.toDS(), "1 second")
      .writeStream.outputMode("append")
      .format("memory").queryName("trans_carry").start()
    input.addData(TransEvent(1L, 1000000L, 1L, "a")); q.processAllAvailable()
    // watermark moves far past "a" (it becomes the closed carry)
    input.addData(TransEvent(-1L, 50000000L, 2L, "x")); q.processAllAvailable()
    // a much later event still pairs with the carried "a"
    input.addData(TransEvent(1L, 60000000L, 3L, "b")); q.processAllAvailable()
    input.addData(TransEvent(-1L, 99000000L, 4L, "x")); q.processAllAvailable()
    input.addData(TransEvent(-1L, 99000001L, 5L, "x")); q.processAllAvailable()
    q.stop()
    val got = spark.table("trans_carry").as[TransPair].collect()
      .filter(_.user_id == 1L).map(p => (p.from_type, p.to_type)).toSeq
    assert(got == Seq(("a", "b")))
  }
}
