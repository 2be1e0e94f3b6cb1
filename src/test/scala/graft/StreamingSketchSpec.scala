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

  test("streaming windowed KMV set sketch equals the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)] // (ts_us, token)
    val hourUs = 3600000000L
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("window_start_us", col("ts_us") - pmod(col("ts_us"), lit(hourUs)))
      .withColumn("h", graft.functions.functions.hex_to_long(
        substring(md5(col("tok")), 1, 15)))
      .groupBy(col("window_start_us"))
      .agg(graft.functions.KmvSketch.kmv_sketch(col("h"), 16).as("sk"))
    val q = agg(input.toDF().toDF("ts_us", "tok"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("kmv_stream").start()
    val b1 = (0 until 40).map(i => (1000000L * i, s"t$i"))
    val b2 = (20 until 60).map(i => (1000000L * i, s"t$i")) // dup first 20
    val b3 = (0 until 30).map(i => (hourUs + 1000000L * i, s"t${i % 7}"))
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()
    input.addData(b3); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("kmv_stream").as[(Long, Seq[Long])]
      .collect().toMap
    val batch = agg((b1 ++ b2 ++ b3).toDF("ts_us", "tok"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(streamed == batch)
    assert(streamed(0L).size == 16)      // 60 distinct -> full sketch
    assert(streamed(hourUs).size == 7)   // 7 distinct -> whole set
  }

  test("streaming Count-Min counters equal the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    // the CMS grid cell is just a COUNT per (j, idx) — the streaming
    // aggregation state is the counter itself, one long per touched cell
    def grid(df: org.apache.spark.sql.DataFrame) = df
      .select(md5(col("item")).as("__md5"))
      .select(explode(array((0 until 4).map(j => lit(j)): _*)).as("j"), col("__md5"))
      .select(col("j"),
        (graft.functions.functions.hex_to_long(
          expr("substring(__md5, j * 8 + 1, 8)")) % 64).as("idx"))
      .groupBy("j", "idx").agg(count(lit(1)).as("cnt"))
    val q = grid(input.toDF().toDF("item"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_stream").start()
    val b1 = (0 until 50).map(i => s"x${i % 13}")
    val b2 = (0 until 70).map(i => s"x${i % 29}")
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cms_stream").as[(Int, Long, Long)]
      .collect().toSet
    val batch = graft.ops.FrequencySketch
      .cmsTable((b1 ++ b2).toDF("item"), "item", depth = 4, width = 64)
      .as[(Int, Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming bottom-k quantile sample equals the batch sketch state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)] // (key, value)
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("h", graft.functions.functions.hex_to_long(
        substring(md5(col("v").cast("string")), 1, 15)))
      .groupBy(col("k"))
      .agg(graft.functions.QuantileSample.quantile_sample(
        col("h"), col("v"), 16).as("s"))
      .select(col("k"), expr("transform(s, x -> x.v)").as("vs"))
    val q = agg(input.toDF().toDF("k", "v"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("qs_stream").start()
    val b1 = (1 to 60).map(i => ("a", i.toLong)) ++ (1 to 30).map(i => ("b", i * 10L))
    val b2 = (61 to 120).map(i => ("a", i.toLong))
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("qs_stream").as[(String, Seq[Long])].collect().toMap
    val batch = agg((b1 ++ b2).toDF("k", "v")).as[(String, Seq[Long])].collect().toMap
    // the state is a pure function of the input multiset — micro-batch
    // splits must not perturb it at all
    assert(streamed == batch)
    assert(streamed("a").size == 16 && streamed("b").size == 16)
  }
}
