package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OHLC resampling must hold incrementally: the min/max struct state is
  * two structs + two longs per (group, bucket), so a live tick stream
  * compacts to bounded per-bucket summaries. Mirrors Resample.ohlc's
  * aggregate inside a streaming aggregation and proves stream == batch
  * under shuffled, out-of-order arrival.
  */
class StreamResampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val hourUs = 3600000000L

  private def ohlcAgg(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("bucket_start_us",
      col("ts_us") - pmod(col("ts_us"), lit(hourUs)))
    .groupBy("grp", "bucket_start_us")
    .agg(count(lit(1)).as("n"),
      min(struct(col("ts_us"), col("id"), col("v"))).as("__o"),
      max(col("v")).as("high"), min(col("v")).as("low"),
      max(struct(col("ts_us"), col("id"), col("v"))).as("__c"))
    .select(col("grp"), col("bucket_start_us"), col("n"),
      col("__o.v").as("open"), col("high"), col("low"),
      col("__c.v").as("close"))

  test("streamed OHLC equals batch under out-of-order arrival") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long, Long)]
    val q = ohlcAgg(input.toDF().toDF("grp", "ts_us", "id", "v"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("ohlc_stream").start()
    val all = for {
      g <- Seq("a", "b")
      h <- 0 until 3
      i <- 0 until 10
    } yield (g, h * hourUs + i * 60000000L,
      (g.hashCode.toLong & 0xff) * 1000 + h * 100 + i,
      ((i * 37 + h * 11) % 100).toLong)
    val shuffled = new scala.util.Random(11).shuffle(all)
    val (b1, b2) = shuffled.splitAt(25)
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ohlc_stream")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    val batch = ohlcAgg(all.toDF("grp", "ts_us", "id", "v"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.size == 6) // 2 groups x 3 hourly buckets
    streamed.foreach { r => assert(r._3 == 10L) }
  }
}
