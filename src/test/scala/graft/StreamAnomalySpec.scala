package graft

import graft.streaming.StreamAnomaly
import graft.streaming.StreamAnomaly.{RateEvent, SpikeRow}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamAnomalySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val hour = 3600000000L

  test("streamed spike rows equal batch rateSpikes on sf0.001 under shuffled arrival") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("ts_us"))
      .as[(String, Long)].collect()
      .map { case (t, u) => RateEvent(t, u) }
    val input = MemoryStream[RateEvent]
    val q = StreamAnomaly.rateSpikes(input.toDS(), windowUs = hour,
        lookback = 3, delayThreshold = "40 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("spikes_out").start()
    val shuffled = new scala.util.Random(5).shuffle(ev.toVector)
    shuffled.grouped(math.max(1, shuffled.length / 3)).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    val sentinelTs = ev.map(_.ts_us).max + hour + 41L * 86400000000L
    input.addData(RateEvent("__s", sentinelTs)); q.processAllAvailable()
    input.addData(RateEvent("__s", sentinelTs + 1)); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("spikes_out").as[SpikeRow].collect()
      .filter(_.event_type != "__s")
      .map(r => (r.event_type, r.window_start_us, r.n, r.base_sum, r.n_prior,
        r.is_spike)).toSet
    val batch = graft.ops.Anomaly.rateSpikes(
        graft.queries.Tables.events(spark, "/root/testdata/sf0.001"),
        "ts_us", "event_type", windowUs = hour, lookback = 3)
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSet
    assert(streamed == batch)
  }

  test("cold start never flags; a genuine spike does") {
    implicit val sqlCtx = spark.sqlContext
    val w = 1000000L
    val input = MemoryStream[RateEvent]
    val q = StreamAnomaly.rateSpikes(input.toDS(), windowUs = w,
        lookback = 3, delayThreshold = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("spikes_small").start()
    // windows 0..2: one event each; window 3: eight events (spike)
    val events =
      (0 until 3).map(i => RateEvent("x", i * w + 1)) ++
        (0 until 8).map(j => RateEvent("x", 3 * w + j * 1000L))
    input.addData(events: _*); q.processAllAvailable()
    input.addData(RateEvent("__s", 100 * w)); q.processAllAvailable()
    input.addData(RateEvent("__s", 100 * w + 1)); q.processAllAvailable()
    q.stop()
    val got = spark.table("spikes_small").as[SpikeRow].collect()
      .filter(_.event_type == "x").sortBy(_.window_start_us)
    assert(got.map(_.is_spike).toSeq == Seq(false, false, false, true))
    assert(got.last.n == 8L && got.last.base_sum == 3L && got.last.n_prior == 3L)
  }
}
