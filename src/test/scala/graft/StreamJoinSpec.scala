package graft

import graft.streaming.StreamJoin
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

case class Imp(ad: Long, it: Long, impId: Int)
case class Clk(ad: Long, ct: Long, clickId: Int)

class StreamJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def runStream(impBatches: Seq[Seq[Imp]], clkBatches: Seq[Seq[Clk]],
      maxDelayMicros: Long, watermark: String): Seq[Row] = {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Imp]
    val clks = MemoryStream[Clk]
    val joined = StreamJoin.intervalJoin(imps.toDF(), clks.toDF(),
      keys = Seq("ad"), leftTime = "it", rightTime = "ct",
      maxDelayMicros = maxDelayMicros,
      leftWatermark = watermark, rightWatermark = watermark)
    val got = mutable.ArrayBuffer.empty[Row]
    val q = joined.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= df.collect() }
        ()
      }.start()
    for ((ib, cb) <- impBatches.zipAll(clkBatches, Seq.empty[Imp], Seq.empty[Clk])) {
      if (ib.nonEmpty) imps.addData(ib: _*)
      if (cb.nonEmpty) clks.addData(cb: _*)
      q.processAllAvailable()
    }
    q.stop()
    got.toSeq
  }

  private def rowKey(r: Row) = r.toSeq.map(String.valueOf).mkString("|")

  test("stream-stream interval join ≡ batch join across micro-batches") {
    // clicks arrive in LATER micro-batches than their impressions (state
    // must buffer across batches), plus out-of-window and wrong-key noise
    val impBatches = Seq(
      Seq(Imp(1L, 1000000L, 1), Imp(2L, 2000000L, 2)),
      Seq(Imp(1L, 5000000L, 3)),
      Seq.empty)
    val clkBatches = Seq(
      Seq.empty,
      Seq(Clk(1L, 1500000L, 10),  // joins imp 1 (delay 0.5s)
        Clk(2L, 9000000L, 11)),   // 7s after imp 2 -> outside 2s window
      Seq(Clk(1L, 6900000L, 12),  // joins imp 3
        Clk(3L, 1200000L, 13)))   // no impression for ad 3
    val got = runStream(impBatches, clkBatches,
      maxDelayMicros = 2000000L, watermark = "10 minutes")

    // batch want: same wrapper on static frames (withWatermark is a no-op)
    val want = StreamJoin.intervalJoin(
      impBatches.flatten.toDF(), clkBatches.flatten.toDF(),
      Seq("ad"), "it", "ct", maxDelayMicros = 2000000L).collect()
    assert(want.length == 2) // the fixture really exercises both matches
    assert(got.map(rowKey).sorted == want.map(rowKey).sorted.toSeq)
  }

  test("watermark evicts impression state: a too-late click finds nothing") {
    val impBatches = Seq(
      Seq(Imp(1L, 1000000L, 1)),
      // far-future events on BOTH streams: the global watermark is the
      // MIN across inputs (multipleWatermarkPolicy=min), so both must
      // advance to ~100s to evict imp 1 (horizon 1s + 2s delay + 1s wm)
      Seq(Imp(8L, 100000000L, 2)),
      Seq.empty)
    val clkBatches = Seq(
      Seq.empty,
      Seq(Clk(9L, 100000000L, 98)),
      // in-window for imp 1 but arrives after eviction -> dropped
      Seq(Clk(1L, 1500000L, 99)))
    val got = runStream(impBatches, clkBatches,
      maxDelayMicros = 2000000L, watermark = "1 second")
    assert(got.isEmpty)
    // the same data joined in batch DOES match — the difference is
    // exactly the watermark contract, not the join predicate
    val batch = StreamJoin.intervalJoin(
      impBatches.flatten.toDF(), clkBatches.flatten.toDF(),
      Seq("ad"), "it", "ct", maxDelayMicros = 2000000L).collect()
    assert(batch.length == 1)
  }
}
