package graft

import graft.streaming.StreamDrift
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val hour = 3600000000L

  case class Ev(ts_us: Long, in_a: Boolean, bucket: Long)

  test("streamed windowed KS equals the batch KS on sf0.001 events") {
    implicit val sqlCtx = spark.sqlContext
    // drift question: do purchase events see different value buckets?
    val ev = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts_us"), (col("event_type") === "purchase").as("in_a"),
        least(greatest(floor(col("value")), lit(0L)), lit(15L)).as("bucket"))
      .as[(Long, Boolean, Long)].collect()
      .map { case (t, a, b) => Ev(t, a, b) }
    val input = MemoryStream[Ev]
    val q = StreamDrift.windowedKs(
        input.toDF().withColumn("ts", timestamp_micros(col("ts_us"))),
        "ts", "in_a", "bucket", nBuckets = 16, "1 hour", "40 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("drift_out").start()
    val shuffled = new scala.util.Random(43).shuffle(ev.toVector)
    shuffled.grouped(math.max(1, shuffled.length / 3)).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    val sentinel = ev.map(_.ts_us).max + hour + 41L * 86400000000L
    input.addData(Ev(sentinel, true, 1L)); q.processAllAvailable()
    input.addData(Ev(sentinel + 1, true, 1L)); q.processAllAvailable()
    q.stop()

    val sentinelWs = sentinel - java.lang.Math.floorMod(sentinel, hour)
    val streamed = spark.table("drift_out")
      .select(col("window_start_us"), col("n_a"), col("n_b"), col("d_num"),
        coalesce(col("ks_permille"), lit(-1L)))
      .as[(Long, Long, Long, Long, Long)].collect()
      .filter(_._1 < sentinelWs).toSet

    // batch twin: KsTest.twoSample per window over the same buckets
    val windows = ev.map(e => e.ts_us - java.lang.Math.floorMod(e.ts_us,
      hour)).distinct
    val batch = windows.map { ws =>
      val rows = ev.filter(e => e.ts_us >= ws && e.ts_us < ws + hour)
        .map(e => (e.in_a, e.bucket))
      val r = graft.ops.KsTest.twoSample(rows.toSeq.toDF("in_a", "value"),
        "in_a", "value").collect()(0)
      val ks = if (r.isNullAt(4)) -1L else r.getLong(4)
      (ws, r.getLong(0), r.getLong(1), r.getLong(2), ks)
    }.toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("disjoint slices in a window hit the full gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamDrift.windowedKs(
        input.toDF().withColumn("ts", timestamp_micros(col("ts_us"))),
        "ts", "in_a", "bucket", nBuckets = 8, "1 hour", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("drift_edge").start()
    input.addData(Ev(10L, true, 0L), Ev(20L, true, 1L),
      Ev(30L, false, 6L), Ev(40L, false, 7L))
    q.processAllAvailable()
    input.addData(Ev(10L * hour, true, 1L)); q.processAllAvailable()
    input.addData(Ev(10L * hour + 1L, true, 1L)); q.processAllAvailable()
    q.stop()
    val r = spark.table("drift_edge").orderBy("window_start_us")
      .collect().head
    assert(r.getLong(3) == 4L) // cumA=2 * nB=2 at the crossing
    assert(r.getLong(4) == 1000L)
  }
}
