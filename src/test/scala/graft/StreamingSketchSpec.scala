package graft

import graft.functions.Hll
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sketch aggregates must work INSIDE Structured Streaming state —
  * that is the point of mergeable sketches at scale: per-micro-batch
  * partials update the stored aggregation buffer, so a distinct-count
  * over an unbounded stream holds 2^p ints per group instead of the set
  * of values ever seen. */
class StreamingSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming windowed HLL registers equal the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)] // (ts_us, token)
    val hourUs = 3600000000L
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("window_start_us", col("ts_us") - pmod(col("ts_us"), lit(hourUs)))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
      .groupBy(col("window_start_us"))
      .agg(Hll.hll_registers(col("h"), p = 8).as("regs"))
    val q = agg(input.toDF().toDF("ts_us", "tok"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hll_stream").start()

    // three micro-batches, overlapping token sets, two windows
    val b1 = (0 until 40).map(i => (1000000L * i, s"t$i"))
    val b2 = (20 until 60).map(i => (1000000L * i, s"t$i")) // dup first 20
    val b3 = (0 until 30).map(i => (hourUs + 1000000L * i, s"t${i % 7}"))
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()
    input.addData(b3); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("hll_stream").as[(Long, Seq[Int])]
      .collect().toMap
    val batch = agg((b1 ++ b2 ++ b3).toDF("ts_us", "tok"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(streamed == batch)
    assert(streamed.keySet == Set(0L, hourUs))
    // and the estimates land near the true distincts (60 and 7)
    val est0 = Hll.estimate(streamed(0L))
    val est1 = Hll.estimate(streamed(hourUs))
    assert(math.abs(est0 - 60) / 60.0 < 0.3, s"window0 est $est0")
    assert(math.abs(est1 - 7) / 7.0 < 0.3, s"window1 est $est1")
  }
}
