package graft

import graft.streaming.StreamValidation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamValidationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val hour = 3600000000L

  case class Ev(ts_us: Long, event_type: String, value: Double)

  private def rules = Seq(
    "value_negative" -> (col("value") < 0.0),
    "value_over_5" -> (col("value") > 5.0),
    "type_unknown" -> !col("event_type").isin("click", "view", "purchase",
      "signup", "error"))

  test("streamed window audits equal the batch audit on sf0.001 events") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts_us"), col("event_type"), col("value"))
      .as[(Long, String, Double)].collect()
      .map { case (u, t, v) => Ev(u, t, v) }
    val input = MemoryStream[Ev]
    val q = StreamValidation.windowedRuleViolations(
        input.toDF().withColumn("ts", timestamp_micros(col("ts_us"))),
        "ts", "1 hour", "40 days", rules)
      .writeStream.outputMode("append")
      .format("memory").queryName("dq_out").start()
    val shuffled = new scala.util.Random(17).shuffle(ev.toVector)
    shuffled.grouped(math.max(1, shuffled.length / 3)).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    // sentinel far past the watermark horizon closes every real window
    val sentinel = ev.map(_.ts_us).max + hour + 41L * 86400000000L
    input.addData(Ev(sentinel, "click", 1.0)); q.processAllAvailable()
    input.addData(Ev(sentinel + 1, "click", 1.0)); q.processAllAvailable()
    q.stop()

    val sentinelWs = sentinel - java.lang.Math.floorMod(sentinel, hour)
    val streamed = spark.table("dq_out")
      .as[(Long, String, Long)].collect()
      .filter(_._1 < sentinelWs).toSet
    val batch = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ws", col("ts_us") - pmod(col("ts_us"), lit(hour)))
      .groupBy("ws")
      .agg(
        sum(when(col("value") < 0.0, 1L).otherwise(0L)).as("value_negative"),
        sum(when(col("value") > 5.0, 1L).otherwise(0L)).as("value_over_5"),
        sum(when(!col("event_type").isin("click", "view", "purchase",
          "signup", "error"), 1L).otherwise(0L)).as("type_unknown"))
      .unpivot(Array(col("ws")),
        Array(col("value_negative"), col("value_over_5"), col("type_unknown")),
        "rule", "n_violations")
      .as[(Long, String, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("late rows beyond the watermark are dropped from closed windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamValidation.windowedRuleViolations(
        input.toDF().withColumn("ts", timestamp_micros(col("ts_us"))),
        "ts", "1 hour", "0 seconds", Seq("neg" -> (col("value") < 0.0)))
      .writeStream.outputMode("append")
      .format("memory").queryName("dq_late").start()
    input.addData(Ev(hour + 1L, "click", -1.0)); q.processAllAvailable()
    // advance the watermark far past window 1 -> it closes with n=1
    input.addData(Ev(10L * hour, "click", 1.0)); q.processAllAvailable()
    // this straggler for window 1 is older than the watermark: dropped
    input.addData(Ev(hour + 2L, "click", -1.0)); q.processAllAvailable()
    input.addData(Ev(20L * hour, "click", 1.0)); q.processAllAvailable()
    q.stop()
    val w1 = spark.table("dq_late").as[(Long, String, Long)].collect()
      .filter(_._1 == hour)
    assert(w1.length == 1 && w1.head._3 == 1L)
  }
}
