package graft

import graft.ops.FrequencySketch
import graft.streaming.StreamHeavyHitters
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamHeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val day = 86400000000L

  test("streamed windowed CMS estimates equal the batch sketch per window") {
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type").as("item"), col("ts_us"))
      .where(col("item").isNotNull)
      .as[(String, Long)].collect()
    val probe = ev.map(_._1).distinct.sorted.toSeq

    val input = MemoryStream[(String, Long)]
    val q = StreamHeavyHitters.windowedHeavyHitters(
        input.toDS().toDF("item", "ts_us")
          .withColumn("ts", timestamp_micros(col("ts_us"))),
        "ts", "item", probe.toDF("p_item"), "p_item",
        depth = 4, width = 64, threshold = 50L,
        windowDuration = "1 day", delayThreshold = "40 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("shh_out").start()
    // shuffled arrival in uneven chunks: counters are pure sums, so the
    // result must be a function of each window's input multiset only
    val shuffled = new scala.util.Random(11).shuffle(ev.toVector)
    shuffled.grouped(math.max(1, shuffled.length / 3)).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    val sentinel = ev.map(_._2).max + day + 41L * day
    input.addData(("__s", sentinel)); q.processAllAvailable()
    input.addData(("__s", sentinel + 1)); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("shh_out")
      .as[(String, Long, Long, Boolean)].collect()
      .filter(r => r._1 != "__s" && r._3 > 0)
      .map(r => (r._1, r._2, r._3)).toSet

    // batch: per-window cmsTable + estimateCounts on the same slices
    val evDf = ev.toSeq.toDF("item", "ts_us")
      .withColumn("w_us", expr(s"ts_us - pmod(ts_us, $day)"))
    val windows = evDf.select(col("w_us")).distinct()
      .as[Long].collect().sorted
    val batch = windows.flatMap { w =>
      val slice = evDf.where(col("w_us") === w)
      FrequencySketch.estimateCounts(
          FrequencySketch.cmsTable(slice, "item", depth = 4, width = 64),
          probe.toDF("item"), "item", depth = 4, width = 64)
        .as[(String, Long)].collect()
        .filter(_._2 > 0).map { case (it, est) => (it, w, est) }
    }.toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("output items are bounded by the probe list; is_heavy honors the threshold") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val q = StreamHeavyHitters.windowedHeavyHitters(
        input.toDS().toDF("item", "ts_us")
          .withColumn("ts", timestamp_micros(col("ts_us"))),
        "ts", "item", Seq("hot", "cold").toDF("p"), "p",
        depth = 4, width = 1024, threshold = 5L,
        windowDuration = "1 day", delayThreshold = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("shh_bound").start()
    val rows = (1 to 8).map(i => ("hot", 1000L * i)) ++
      Seq(("cold", 9000L)) ++
      (1 to 500).map(i => (s"noise_$i", 1000L * i)) // untracked cardinality
    input.addData(rows); q.processAllAvailable()
    input.addData(("late", 3 * day)); q.processAllAvailable()
    input.addData(("late", 3 * day + 1)); q.processAllAvailable()
    q.stop()
    val got = spark.table("shh_bound")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got.keySet.subsetOf(Set("hot", "cold")))
    // width 1024 with ~502 distinct items: collisions possible but the
    // estimate never underestimates and the flags follow the estimate
    assert(got("hot")._1 >= 8L && got("hot")._2)
    assert(got("cold")._1 >= 1L && got("cold")._2 == (got("cold")._1 >= 5L))
  }
}
