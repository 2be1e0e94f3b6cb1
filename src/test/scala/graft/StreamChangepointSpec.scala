package graft

import graft.streaming.StreamChangepoint
import graft.streaming.StreamChangepoint.{DriftRow, KeyedEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamChangepointSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val day = 86400000000L

  test("streamed PH rows equal batch pageHinkley on sf0.001 under shuffled arrival") {
    implicit val sqlCtx = spark.sqlContext
    val evAll = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("ts_us")).as[(String, Long)].collect()
    val minDay = evAll.map(_._2 / day).min
    val (train, score) = evAll.partition(_._2 / day < minDay + 3)

    // trained baseline: mean events per OBSERVED day, ppm
    val baseline = train.groupBy(_._1).map { case (k, rs) =>
      k -> 1000000L * rs.length / rs.map(_._2 / day).distinct.length
    }

    val input = MemoryStream[KeyedEvent]
    val q = StreamChangepoint.pageHinkley(input.toDS(), windowUs = day,
        baseline = baseline, lambdaWindowTenths = 15L,
        delayThreshold = "40 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("ph_out").start()
    val shuffled = new scala.util.Random(3)
      .shuffle(score.map { case (k, u) => KeyedEvent(k, u) }.toVector)
    shuffled.grouped(math.max(1, shuffled.length / 3)).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    val sentinelTs = score.map(_._2).max + day + 41L * day
    input.addData(KeyedEvent("__s", sentinelTs)); q.processAllAvailable()
    input.addData(KeyedEvent("__s", sentinelTs + 1)); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("ph_out").as[DriftRow].collect()
      .filter(_.key != "__s")
      .map(r => (r.key, r.window_start_us, r.n, r.s_ppm, r.drift_up_ppm,
        r.drift_down_ppm, r.alarm)).toSet

    val baseDf = baseline.toSeq.toDF("key", "mu_ppm")
    val batch = graft.ops.Changepoint.pageHinkley(
        score.toSeq.toDF("key", "ts_us"), "key", "ts_us", day,
        baseDf, lambdaWindowTenths = 15L)
      .as[(String, Long, Long, Long, Long, Long, Boolean)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("drift envelopes: up after a rate jump, down after a drop; untrained keys silent") {
    implicit val sqlCtx = spark.sqlContext
    val w = 1000000L
    // trained at 2/window; 3 quiet windows, then 6, 6 (jump), then 0-skip
    val events =
      (0 until 3).flatMap(i => Seq.fill(2)(KeyedEvent("x", i * w + 1))) ++
        Seq.fill(6)(KeyedEvent("x", 3 * w + 1)) ++
        Seq.fill(6)(KeyedEvent("x", 4 * w + 1)) ++
        Seq(KeyedEvent("unknown", 2 * w + 1))
    val input = MemoryStream[KeyedEvent]
    val q = StreamChangepoint.pageHinkley(input.toDS(), windowUs = w,
        baseline = Map("x" -> 2000000L), lambdaWindowTenths = 30L,
        delayThreshold = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("ph_small").start()
    input.addData(events: _*); q.processAllAvailable()
    input.addData(KeyedEvent("__s2", 100 * w)); q.processAllAvailable()
    input.addData(KeyedEvent("__s2", 100 * w + 1)); q.processAllAvailable()
    q.stop()
    val got = spark.table("ph_small").as[DriftRow].collect()
      .filter(_.key == "x").sortBy(_.window_start_us)
    assert(got.length == 5)
    // quiet windows: dev 0, no drift, no alarm
    assert(got.take(3).forall(r => r.drift_up_ppm == 0L && !r.alarm))
    // 6/window vs mu 2: dev +4e6 per window -> up-drift 4e6 then 8e6
    assert(got(3).drift_up_ppm == 4000000L && !got(3).alarm) // 4e6*10 <= 30*2e6
    assert(got(4).drift_up_ppm == 8000000L && got(4).alarm)  // 8e7 > 6e7
    // untrained key emitted nothing
    assert(!spark.table("ph_small").as[DriftRow].collect()
      .exists(_.key == "unknown"))
  }
}
