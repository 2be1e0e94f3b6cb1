package graft

import graft.streaming.StreamQuantiles
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamQuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val hour = 3600000000L

  test("streamed windowed quantiles equal batch sampleQuantiles per window slice") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"),
        floor(col("value") * lit(1000000.0)).cast("long").as("v_us"),
        col("ts_us"))
      .as[(String, Long, Long)].collect()

    val input = MemoryStream[(String, Long, Long)]
    val q = StreamQuantiles.windowedQuantiles(
        input.toDS().toDF("event_type", "v_us", "ts_us")
          .withColumn("ts", timestamp_micros(col("ts_us"))),
        "ts", "event_type", "v_us", k = 64, qsPerMille = Seq(500, 950),
        windowDuration = "1 hour", delayThreshold = "40 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("squant_out").start()
    val shuffled = new scala.util.Random(17).shuffle(ev.toVector)
    shuffled.grouped(math.max(1, shuffled.length / 3)).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    val sentinel = ev.map(_._3).max + hour + 41L * 86400000000L
    input.addData(("__s", 0L, sentinel)); q.processAllAvailable()
    input.addData(("__s", 0L, sentinel + 1)); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("squant_out")
      .as[(String, Long, Int, Long)].collect()
      .filter(_._1 != "__s").toSet

    val batch = graft.ops.Quantiles.sampleQuantiles(
        ev.toSeq.toDF("event_type", "v_us", "ts_us")
          .withColumn("window_start_us",
            expr(s"ts_us - pmod(ts_us, $hour)")),
        "v_us", k = 64, qsPerMille = Seq(500, 950),
        keyCols = Seq("event_type", "window_start_us"))
      .select(col("event_type"), col("window_start_us"),
        col("q_permille"), col("quantile_v"))
      .as[(String, Long, Int, Long)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }
}
