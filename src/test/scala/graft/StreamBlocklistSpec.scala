package graft

import graft.ops.Blocklist
import graft.streaming.StreamBlocklist
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamBlocklistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val day = 86400000000L
  private val phrases = Seq("batch batch", "slow", "the fast key")

  test("streamed windowed phrase hits equal the batch operator per window") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"),
        // deterministic synthetic event time: docs spread over 10 days
        (col("doc_id") % 10 * lit(day)).as("ts_us"))
      .as[(Long, String, Long)].collect()

    val input = MemoryStream[(Long, String, Long)]
    val q = StreamBlocklist.windowedPhraseHits(
        input.toDS().toDF("doc_id", "text", "ts_us")
          .withColumn("ts", timestamp_micros(col("ts_us"))),
        "ts", "text", phrases,
        windowDuration = "1 day", delayThreshold = "40 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("sbl_out").start()
    val shuffled = new scala.util.Random(7).shuffle(docs.toVector)
    shuffled.grouped(math.max(1, shuffled.length / 3)).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    val sentinel = docs.map(_._3).max + 42L * day
    input.addData((-1L, "__sentinel__", sentinel)); q.processAllAvailable()
    input.addData((-1L, "__sentinel__", sentinel + 1)); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sbl_out")
      .as[(String, Long, Long)].collect().toSet

    // batch: per-doc matches from the batch operator, rolled up per
    // (phrase, day window)
    val docDf = docs.toSeq.toDF("doc_id", "text", "ts_us")
    val batch = Blocklist.phraseMatches(docDf, "doc_id", "text", phrases)
      .join(docDf.select(col("doc_id"), col("ts_us")), Seq("doc_id"))
      .groupBy(col("phrase"),
        expr(s"ts_us - pmod(ts_us, $day)").as("window_start_us"))
      .agg(sum(col("n_hits")).as("n_hits"))
      .as[(String, Long, Long)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("state is phrase-bounded: output phrases come from the blocklist") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val q = StreamBlocklist.windowedPhraseHits(
        input.toDS().toDF("text", "ts_us")
          .withColumn("ts", timestamp_micros(col("ts_us"))),
        "ts", "text", Seq("go go"),
        windowDuration = "1 day", delayThreshold = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("sbl_bound").start()
    input.addData(
      ("go go go", 1000L),        // overlapping: 2 hits
      ("stop go going gone", 2000L),
      ("go go", 3000L))           // 1 hit
    q.processAllAvailable()
    input.addData(("x", 3 * day)); q.processAllAvailable()
    input.addData(("x", 3 * day + 1)); q.processAllAvailable()
    q.stop()
    val got = spark.table("sbl_bound").as[(String, Long, Long)].collect()
      .filter(_._2 == 0L)
    assert(got.toSet == Set(("go go", 0L, 3L)))
  }
}
