package graft

import graft.streaming.StreamChangeCapture
import graft.streaming.StreamChangeCapture.{ChangeEvent, ClosedInterval}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamChangeCaptureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed closed intervals equal batch SCD2 on sf0.001 under shuffled arrival") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
      .map { case (k, t, i, s) => ChangeEvent(k, t, i, s) }
    val input = MemoryStream[ChangeEvent]
    val q = StreamChangeCapture.closedIntervals(input.toDS(), "40 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("scd_out").start()
    val shuffled = new scala.util.Random(23).shuffle(ev.toVector)
    shuffled.grouped(math.max(1, shuffled.length / 3)).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    val sentinelTs = ev.map(_.ts_us).max + 41L * 86400000000L
    input.addData(ChangeEvent(-1L, sentinelTs, 0L, "x")); q.processAllAvailable()
    input.addData(ChangeEvent(-1L, sentinelTs + 1, 1L, "x")); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("scd_out").as[ClosedInterval].collect()
      .filter(_.key >= 0)
      .map(r => (r.key, r.state, r.valid_from_us, r.valid_to_us, r.version)).toSet
    val batch = graft.ops.ChangeCapture.stateIntervals(
        graft.queries.Tables.events(spark, "/root/testdata/sf0.001"),
        "user_id", "ts_us", "event_type", "event_id")
      .where(col("valid_to_us").isNotNull)
      .select(col("user_id"), col("event_type"), col("valid_from_us"),
        col("valid_to_us"), col("version"))
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("a late out-of-order event splits a run retroactively") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeEvent]
    val q = StreamChangeCapture.closedIntervals(input.toDS(), "10 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("scd_late").start()
    // A@1s and A@3s arrive; then B@2s arrives late -> runs A[1,2) B[2,3) A[3,-)
    input.addData(ChangeEvent(1L, 1000000L, 1L, "A"),
      ChangeEvent(1L, 3000000L, 3L, "A"))
    q.processAllAvailable()
    input.addData(ChangeEvent(1L, 2000000L, 2L, "B")); q.processAllAvailable()
    input.addData(ChangeEvent(-1L, 60000000L, 9L, "x")); q.processAllAvailable()
    input.addData(ChangeEvent(-1L, 60000001L, 10L, "x")); q.processAllAvailable()
    q.stop()
    val got = spark.table("scd_late").as[ClosedInterval].collect()
      .filter(_.key == 1L).sortBy(_.version)
      .map(r => (r.state, r.valid_from_us, r.valid_to_us, r.version)).toSeq
    assert(got == Seq(("A", 1000000L, 2000000L, 1L), ("B", 2000000L, 3000000L, 2L)))
    // the open tail A[3s,-) correctly stays in state, not in the stream
  }
}
