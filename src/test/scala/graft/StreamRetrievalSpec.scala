package graft

import graft.ops.{Bm25, SplitLeakage}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream≡batch contracts for the retrieval/hygiene wave (VERDICT r9
  * item 4): StreamBm25 (train-batch / score-stream against a frozen
  * Bm25Index) and StreamSplitLeakage (per-arrival contamination
  * monitoring against a frozen reference corpus), both under shuffled
  * arrival and multiple chop widths.
  */
class StreamRetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs =
    graft.queries.Tables.documents(spark, "/root/testdata/sf0.001").cache()

  test("StreamBm25: union of per-batch top-k equals batch scoring, any chop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val index = Bm25.buildIndex(docs, "doc_id", "text")
    val queryRows = Seq((1L, "hash"), (1L, "join"), (2L, "slow"),
      (2L, "scan"), (2L, "filter"), (3L, "vector"), (3L, "data"),
      (4L, "graph"), (5L, "index"), (5L, "cache"))
    val batch = Bm25.topKDocsWithIndex(index,
        queryRows.toDF("query_id", "term"), k = 5)
      .as[(Long, Int, Long, Long)].collect().toSet

    // contract: a query's terms arrive within ONE batch — chop BETWEEN
    // query ids, shuffled arrival order within each chunk
    val byQuery = new scala.util.Random(3).shuffle(
      queryRows.groupBy(_._1).toSeq.map(_._2))
    for (nChunks <- Seq(1, 2, 5)) {
      val input = MemoryStream[(Long, String)]
      val got = scala.collection.mutable.Set[(Long, Int, Long, Long)]()
      val q = graft.streaming.StreamBm25.start(
          input.toDS().toDF("query_id", "term"), index, k = 5) { (scored, _) =>
        got ++= scored.as[(Long, Int, Long, Long)].collect()
      }
      byQuery.grouped(math.max(1, byQuery.length / nChunks)).foreach { chunk =>
        input.addData(chunk.flatten.toIndexedSeq); q.processAllAvailable()
      }
      q.stop()
      assert(got.toSet == batch, s"nChunks=$nChunks")
    }
  }

  test("StreamSplitLeakage: union of per-batch leak pairs equals the batch audit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val arriving = docs.where(pmod(col("doc_id"), lit(7)) === 0)
    val reference = docs.where(pmod(col("doc_id"), lit(7)) =!= 0).cache()
    val batch = SplitLeakage.crossCorpusLeaks(arriving, reference,
        "doc_id", "text", n = 3, threshold = 0.5)
      .as[(Long, Long, Long, Double, String, String, Boolean)]
      .collect().toSet
    assert(batch.nonEmpty, "fixture must contain cross-corpus near-dups")

    val rows = new scala.util.Random(11).shuffle(
      arriving.select(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))
        .as[(Long, String, String, String, Long)].collect().toSeq)
    for (nChunks <- Seq(1, 3)) {
      val input = MemoryStream[(Long, String, String, String, Long)]
      val got = scala.collection.mutable.Set[(Long, Long, Long, Double, String, String, Boolean)]()
      // r13 (ADVICE r12): the wrapper must release the per-batch shingle
      // caches crossCorpusLeaks persists — a long-running stream would
      // otherwise grow two MEMORY_AND_DISK tables per micro-batch
      val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
      val q = graft.streaming.StreamSplitLeakage.start(
          input.toDS().toDF("doc_id", "text", "lang", "source", "n_chars"),
          reference, "doc_id", "text", n = 3, threshold = 0.5) { (leaks, _) =>
        got ++= leaks
          .as[(Long, Long, Long, Double, String, String, Boolean)].collect()
      }
      rows.grouped(math.max(1, rows.length / nChunks)).foreach { chunk =>
        input.addData(chunk.toIndexedSeq); q.processAllAvailable()
      }
      q.stop()
      assert(got.toSet == batch, s"nChunks=$nChunks")
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore
      assert(leaked.isEmpty,
        s"nChunks=$nChunks left ${leaked.size} persisted RDDs behind")
    }
  }

  test("crossCorpusLeaks: identical cross-corpus docs always pair; leak bit follows md5 splits") {
    val newDocs = Seq((7L, "a b c d e f g"), (14L, "x y z w v u t"))
      .toDF("doc_id", "text")
    val ref = Seq((1L, "a b c d e f g"), (2L, "totally different words here now"))
      .toDF("doc_id", "text")
    val got = SplitLeakage.crossCorpusLeaks(newDocs, ref, "doc_id", "text",
        n = 3, threshold = 0.5)
      .as[(Long, Long, Long, Double, String, String, Boolean)].collect()
    assert(got.length == 1)
    val p = got.head
    assert(p._1 == 7L && p._2 == 1L && p._4 == 1.0)
    // leak bit == (splitOf(7) != splitOf(1)) by the same md5 lane
    val splits = spark.range(1).select(
        SplitLeakage.splitOf(lit(7L), "split", 200).as("s7"),
        SplitLeakage.splitOf(lit(1L), "split", 200).as("s1"))
      .as[(String, String)].head()
    assert(p._7 == (splits._1 != splits._2))
  }
}
