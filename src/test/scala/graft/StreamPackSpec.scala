package graft

import graft.streaming.StreamPack
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamPackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val minute = 60000000L

  test("streamed per-window bins equal batch packContiguous under shuffled arrival") {
    implicit val sqlCtx = spark.sqlContext
    // two shards × two windows, ragged chunk sizes
    val rows = for {
      w <- 0 until 2
      sh <- 0L until 2L
      i <- 0 until 25
    } yield StreamPack.PackEvent(sh, i.toLong, (i * 7 % 40) + 3L,
      w * 10L * minute + minute + i * minute / 8)

    val input = MemoryStream[(Long, Long, Long, Long)]
    val q = StreamPack.windowedPack(
        input.toDS().toDF("shard", "order_key", "n_tok", "ts_us")
          .as[StreamPack.PackEvent],
        capacity = 64L, windowUs = 10L * minute, delayThreshold = "25 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("spack_out").start()
    val shuffled = new scala.util.Random(17)
      .shuffle(rows.map(e => (e.shard, e.order_key, e.n_tok, e.ts_us)).toVector)
    shuffled.grouped(math.max(1, shuffled.length / 4)).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    input.addData((9L, 0L, 1L, 60L * minute)); q.processAllAvailable()
    input.addData((9L, 1L, 1L, 61L * minute)); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("spack_out")
      .where(col("shard") < 9L)
      .select("window_start_us", "shard", "order_key", "n_tok", "bin")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

    val batch = graft.ops.Chunker.packContiguous(
        rows.toDF().withColumn("window_start_us",
          col("ts_us") - pmod(col("ts_us"), lit(10L * minute))),
        "n_tok", capacity = 64,
        keyCols = Seq("window_start_us", "shard"), orderCols = Seq("order_key"))
      .select("window_start_us", "shard", "order_key", "n_tok", "bin")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
    // sanity: multiple bins actually formed
    assert(streamed.map(_._5).max >= 2L)
  }

  test("duplicate order_key within a (shard, window) raises loudly") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, Long)]
    val q = StreamPack.windowedPack(
        input.toDS().toDF("shard", "order_key", "n_tok", "ts_us")
          .as[StreamPack.PackEvent],
        capacity = 10L, windowUs = 10L * minute, delayThreshold = "1 minute")
      .writeStream.outputMode("append")
      .format("memory").queryName("spack_boom").start()
    val boom = intercept[Exception] {
      input.addData((1L, 5L, 2L, 5L * minute), (1L, 5L, 3L, 6L * minute))
      q.processAllAvailable()
      // advance the watermark so the window closes and the emit-time
      // duplicate check actually runs
      input.addData((2L, 0L, 1L, 60L * minute)); q.processAllAvailable()
      input.addData((2L, 1L, 1L, 61L * minute)); q.processAllAvailable()
    }
    val msgs = Iterator.iterate[Throwable](boom)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("duplicate order_key")), msgs.mkString(" | "))
    q.stop()
  }

  test("buffer cap raises loudly") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, Long)]
    val q = StreamPack.windowedPack(
        input.toDS().toDF("shard", "order_key", "n_tok", "ts_us")
          .as[StreamPack.PackEvent],
        capacity = 10L, windowUs = 10L * minute, delayThreshold = "1 minute",
        maxBuffered = 4)
      .writeStream.outputMode("append")
      .format("memory").queryName("spack_cap").start()
    val boom = intercept[Exception] {
      input.addData((1 to 6).map(i => (1L, i.toLong, 1L, 5L * minute)))
      q.processAllAvailable()
    }
    val msgs = Iterator.iterate[Throwable](boom)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("buffered rows")), msgs.mkString(" | "))
    q.stop()
  }
}
