package graft

import graft.streaming.StreamFunnel
import graft.streaming.StreamFunnel.{FunnelEvent, FunnelOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  test("streaming funnel equals batch funnel on sf0.001 events") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts_us"), col("event_type"))
      .as[(Long, Long, String)].collect()
      .map { case (u, t, y) => FunnelEvent(u, t, y) }
    // window wider than the data span -> equals the unwindowed batch op;
    // watermark delay wider than the span -> fully shuffled arrival order
    // admits every event (the point: order must not matter)
    val windowUs = 10L * 365 * 86400000000L
    val delay = "40 days"
    val input = MemoryStream[FunnelEvent]
    val out = StreamFunnel.funnels(input.toDS(), steps, windowUs, delay)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("funnel_out").start()
    // three shuffled chunks, then a far-future sentinel to push the
    // watermark past every t1 + window (+ the 40-day delay)
    val shuffled = new scala.util.Random(7).shuffle(ev.toVector)
    shuffled.grouped(math.max(1, shuffled.length / 3)).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    val sentinelTs = ev.map(_.ts_us).max + windowUs + 41L * 86400000000L
    input.addData(FunnelEvent(-1L, sentinelTs, "view")); q.processAllAvailable()
    input.addData(FunnelEvent(-1L, sentinelTs + 1, "view")); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("funnel_out").as[FunnelOut].collect()
      .filter(_.user_id >= 0).map(f => f.user_id -> f).toMap
    val batch = graft.ops.Funnel.userFunnel(
        graft.queries.Tables.events(spark, "/root/testdata/sf0.001"),
        "user_id", "ts_us", "event_type", steps)
      .select(col("user_id"), col("t1"), col("t2"), col("t3"), col("depth"))
      .collect()
      .map { r =>
        val ts = (1 to 3).map(i => if (r.isNullAt(i)) -1L else r.getLong(i))
        r.getLong(0) -> ((ts, r.getInt(4)))
      }.toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (u, f) =>
      val (ts, depth) = batch(u)
      assert(f.step_times == ts, s"user $u times")
      assert(f.depth == depth, s"user $u depth")
    }
  }

  test("late step-1 event retroactively admits an earlier step-2 event") {
    implicit val sqlCtx = spark.sqlContext
    val w = 1000000L // 1s window
    val input = MemoryStream[FunnelEvent]
    val q = StreamFunnel.funnels(input.toDS(), Seq("view", "click"), w, "10 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_late").start()
    // click first; its admitting view arrives LATER (but within watermark)
    input.addData(FunnelEvent(1L, 500000L, "click")); q.processAllAvailable()
    input.addData(FunnelEvent(1L, 100000L, "view")); q.processAllAvailable()
    // sentinel pushes the watermark past t1 + w
    input.addData(FunnelEvent(-1L, 20000000L, "view")); q.processAllAvailable()
    input.addData(FunnelEvent(-1L, 20000001L, "view")); q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel_late").as[FunnelOut].collect()
      .filter(_.user_id == 1L)
    assert(got.length == 1)
    assert(got.head.depth == 2 && got.head.step_times == Seq(100000L, 500000L))
  }

  test("conversion window truncates steps beyond t1 + window") {
    implicit val sqlCtx = spark.sqlContext
    val w = 1000000L
    val input = MemoryStream[FunnelEvent]
    val q = StreamFunnel.funnels(input.toDS(), Seq("view", "click"), w, "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_win").start()
    input.addData(
      FunnelEvent(1L, 1000000L, "view"),
      FunnelEvent(1L, 3000000L, "click")) // outside the 1s window
    q.processAllAvailable()
    input.addData(FunnelEvent(-1L, 50000000L, "view")); q.processAllAvailable()
    input.addData(FunnelEvent(-1L, 50000001L, "view")); q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel_win").as[FunnelOut].collect()
      .filter(_.user_id == 1L)
    assert(got.length == 1)
    assert(got.head.depth == 1 && got.head.step_times == Seq(1000000L, -1L))
  }
}
