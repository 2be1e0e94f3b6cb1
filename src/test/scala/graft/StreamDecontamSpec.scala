package graft

import graft.streaming.StreamDecontam
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamDecontamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val minute = 60000000L

  private val evalDocs = Seq(
    (100L, "the quick brown fox strikes again"),
    (101L, "filter window row join stream customer")).toDF("doc_id", "text")

  test("streamed per-window overlap equals batch flagContaminated on shuffled arrival") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    // spread the corpus over two windows, off the zero watermark
    val rows = docs.zipWithIndex.map { case ((id, tx), i) =>
      (id, tx, (i % 2) * 10L * minute + minute + (i % 50) * minute / 10)
    }
    val input = MemoryStream[(Long, String, Long)]
    val q = StreamDecontam.windowedOverlap(
        input.toDS().toDF("doc_id", "text", "ts_us")
          .withColumn("ts", timestamp_micros(col("ts_us"))),
        evalDocs, "doc_id", "text", "ts", n = 3, thresholdPermille = 30,
        windowDuration = "10 minutes", delayThreshold = "25 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sdecon_out").start()
    val shuffled = new scala.util.Random(29).shuffle(rows.toVector)
    shuffled.grouped(math.max(1, shuffled.length / 4)).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    input.addData((-1L, "sentinel", 80L * minute)); q.processAllAvailable()
    input.addData((-1L, "sentinel", 81L * minute)); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sdecon_out")
      .where(col("doc_id") =!= -1L)
      .select("doc_id", "n_ngrams", "n_contam", "contam_permille",
        "contaminated")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

    val batch = graft.ops.Decontaminate.flagContaminated(
        docs.toSeq.toDF("doc_id", "text"), evalDocs, "doc_id", "text",
        n = 3, thresholdPermille = 30)
      .select(col("id"), col("n_ngrams"), col("n_contam"),
        col("contam_permille"), col("contaminated"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
    // the fixture must actually exercise both branches
    assert(streamed.exists(_._5 == 1L) && streamed.exists(_._5 == 0L))
  }

  test("short docs take the whole-text single shingle (batch convention)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val q = StreamDecontam.windowedOverlap(
        input.toDS().toDF("doc_id", "text", "ts_us")
          .withColumn("ts", timestamp_micros(col("ts_us"))),
        Seq((1L, "hi")).toDF("doc_id", "text"),
        "doc_id", "text", "ts", n = 3, thresholdPermille = 500,
        windowDuration = "10 minutes", delayThreshold = "5 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sdecon_short").start()
    input.addData((7L, "hi", minute), (8L, "yo", minute))
    q.processAllAvailable()
    input.addData((-1L, "s", 60L * minute)); q.processAllAvailable()
    input.addData((-1L, "s", 61L * minute)); q.processAllAvailable()
    q.stop()
    val got = spark.table("sdecon_short")
      .where(col("doc_id") > 0L)
      .select("doc_id", "n_ngrams", "n_contam", "contaminated")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((7L, 1L, 1L, 1L), (8L, 1L, 0L, 0L)))
  }
}
