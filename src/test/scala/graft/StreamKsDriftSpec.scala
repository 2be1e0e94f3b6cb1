package graft

import graft.streaming.StreamKsDrift
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamKsDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val hour = 3600000000L

  test("streamed windowed KS equals batch twoSampleSketch per window slice") {
    implicit val sqlCtx = spark.sqlContext
    // slice = purchase vs not, value = floored micro-value: a real drift
    // question over the events table
    val ev = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id").cast("string").as("key"),
        (col("event_type") === "purchase").as("in_a"),
        floor(col("value") * lit(1000.0)).cast("long").as("v"),
        col("ts_us"))
      .where(col("v").isNotNull)
      .as[(String, Boolean, Long, Long)].collect()

    val input = MemoryStream[(String, Boolean, Long, Long)]
    val q = StreamKsDrift.windowedKs(
        input.toDS().toDF("key", "in_a", "v", "ts_us")
          .withColumn("ts", timestamp_micros(col("ts_us"))),
        "ts", "key", "in_a", "v", k = 32,
        windowDuration = "6 hours", delayThreshold = "40 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("sks_out").start()
    // shuffled arrival in 3 uneven chunks: the sketch state must be a
    // pure function of each window's input multiset
    val shuffled = new scala.util.Random(23).shuffle(ev.toVector)
    shuffled.grouped(math.max(1, shuffled.length / 3)).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    val sentinel = ev.map(_._4).max + 6 * hour + 41L * 86400000000L
    input.addData(("__s", true, 0L, sentinel)); q.processAllAvailable()
    input.addData(("__s", true, 0L, sentinel + 1)); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sks_out")
      .select(col("key"), col("window_start_us"), col("n_a"), col("n_b"),
        col("sn_a"), col("sn_b"), col("d_num"), col("at_value"),
        col("ks_permille"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Option[Long])]
      .collect().filter(_._1 != "__s").toSet

    val win = 6 * hour
    val batch = graft.ops.KsTest.twoSampleSketch(
        ev.toSeq.toDF("key", "in_a", "v", "ts_us")
          .withColumn("window_start_us",
            expr(s"ts_us - pmod(ts_us, $win)")),
        "in_a", "v", k = 32, keyCols = Seq("key", "window_start_us"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Option[Long])]
      .collect().toSet
    assert(streamed == batch && batch.nonEmpty)
    // at least one window must have both slices observed (a real KS row)
    assert(batch.exists(r => r._5 > 0 && r._6 > 0 && r._9.isDefined))
  }

  test("twoSampleSketch on empty input emits zero rows like twoSample") {
    val empty = Seq.empty[(Boolean, Long)].toDF("in_a", "value")
    assert(graft.ops.KsTest.twoSampleSketch(empty, "in_a", "value").count()
      == 0L)
    assert(graft.ops.KsTest.twoSample(empty, "in_a", "value").count() == 0L)
  }

  test("sketch KS equals exact KS when k covers the whole value domain") {
    // small distinct-value domain + large k: the bottom-k sample IS the
    // full multiset, so the sketch statistic must equal twoSample exactly
    val rows = (1 to 300).map { i =>
      (i % 3 == 0, (i * i % 17).toLong)
    }.toDF("in_a", "value")
    val exact = graft.ops.KsTest.twoSample(rows, "in_a", "value")
      .select("n_a", "n_b", "d_num", "at_value", "ks_permille")
      .as[(Long, Long, Long, Long, Long)].head()
    val sk = graft.ops.KsTest.twoSampleSketch(rows, "in_a", "value", k = 512)
      .as[(Long, Long, Long, Long, Long, Long, Option[Long])].head()
    // sample sizes = true sizes; d_num/at_value/ks identical
    assert((sk._1, sk._2) == ((exact._1, exact._2)))
    assert((sk._3, sk._4) == ((exact._1, exact._2)), "full-coverage sample")
    assert((sk._5, sk._6, sk._7) ==
      ((exact._3, exact._4, Some(exact._5))))
  }
}
