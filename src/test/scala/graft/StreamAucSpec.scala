package graft

import graft.streaming.StreamAuc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamAucSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val hour = 3600000000L

  case class Ev(ts_us: Long, bucket: Long, lab: Long)

  test("streamed windowed AUC equals the batch AUC on sf0.001 events") {
    implicit val sqlCtx = spark.sqlContext
    // bucketed score: clamp(floor(value), 0, 15); label: purchase events
    val ev = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts_us"),
        least(greatest(floor(col("value")), lit(0L)), lit(15L)).as("bucket"),
        (col("event_type") === "purchase").cast("long").as("lab"))
      .as[(Long, Long, Long)].collect()
      .map { case (t, b, l) => Ev(t, b, l) }
    val input = MemoryStream[Ev]
    val q = StreamAuc.windowedAuc(
        input.toDF().withColumn("ts", timestamp_micros(col("ts_us"))),
        "ts", "bucket", "lab", nBuckets = 16, "1 hour", "40 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("auc_out").start()
    val shuffled = new scala.util.Random(29).shuffle(ev.toVector)
    shuffled.grouped(math.max(1, shuffled.length / 3)).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    val sentinel = ev.map(_.ts_us).max + hour + 41L * 86400000000L
    input.addData(Ev(sentinel, 1L, 1L)); q.processAllAvailable()
    input.addData(Ev(sentinel + 1, 1L, 1L)); q.processAllAvailable()
    q.stop()

    val sentinelWs = sentinel - java.lang.Math.floorMod(sentinel, hour)
    val streamed = spark.table("auc_out")
      .select(col("window_start_us"), col("n_pos"), col("n_neg"), col("u2"),
        coalesce(col("auc_permille"), lit(-1L)))
      .as[(Long, Long, Long, Long, Long)].collect()
      .filter(_._1 < sentinelWs).toSet
    val batch = graft.ops.Auc.aucByGroup(
        ev.toSeq.map(e => (e.ts_us, e.bucket, e.lab))
          .toDF("ts_us", "bucket", "lab")
          .withColumn("ws", col("ts_us") - pmod(col("ts_us"), lit(hour))),
        "ws", "bucket", "lab")
      .select(col("grp").cast("long"), col("n_pos"), col("n_neg"), col("u2"),
        coalesce(col("auc_permille"), lit(-1L)))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("one-class windows report NULL auc; mixed windows an exact value") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamAuc.windowedAuc(
        input.toDF().withColumn("ts", timestamp_micros(col("ts_us"))),
        "ts", "bucket", "lab", nBuckets = 4, "1 hour", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("auc_edge").start()
    // window 0: only positives; window 1: pos at 3, neg at 0 -> AUC 1000
    input.addData(Ev(10L, 2L, 1L), Ev(20L, 1L, 1L),
      Ev(hour + 10L, 3L, 1L), Ev(hour + 20L, 0L, 0L))
    q.processAllAvailable()
    input.addData(Ev(10L * hour, 1L, 1L)); q.processAllAvailable()
    input.addData(Ev(10L * hour + 1L, 1L, 1L)); q.processAllAvailable()
    q.stop()
    val rows = spark.table("auc_edge")
      .orderBy("window_start_us")
      .collect()
      .filter(_.getLong(0) < 9L * hour)
    assert(rows.length == 2)
    assert(rows(0).isNullAt(4))
    assert(rows(1).getLong(3) == 2L && rows(1).getLong(4) == 1000L)
  }
}
