package graft

import graft.ops.Dedup
import graft.streaming.StreamMinHashDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamMinHashDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // near-dup cluster + distinct docs; texts long enough for 3-shingles
  private val fixture = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "the quick brown fox jumps over the lazy dog tonight"),
    (3L, "the quick brown fox jumps over the lazy cat tonight"),
    (4L, "completely different content about spark streaming state"),
    (5L, "another unrelated document mentioning parquet row groups"),
    (6L, "the quick brown fox jumps over the lazy dog today"))

  private def runStream(rows: Seq[(Long, String)],
      chunks: Int): Set[(Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val name = s"smhd_${rows.hashCode.abs}_$chunks"
    val q = StreamMinHashDedup.nearDupPairs(
        input.toDS().toDF("doc_id", "text"), "doc_id", "text",
        n = 3, numHashes = 64, bands = 16, thresholdPermille = 500)
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    rows.grouped(math.max(1, rows.length / chunks)).foreach { c =>
      input.addData(c); q.processAllAvailable()
    }
    q.stop()
    // cross-band multiplicity is contract: dedupe to the pair set
    spark.table(name)
      .select("id_a", "id_b", "est_matches", "est_permille").distinct()
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  private def batchPairs(rows: Seq[(Long, String)])
      : Set[(Long, Long, Long, Long)] = {
    val empty = Dedup.minHashSignaturesPortable(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text",
      n = 3, numHashes = 64)
    Dedup.incrementalMinHashPairs(empty, rows.toDF("doc_id", "text"),
        "doc_id", "text", n = 3, numHashes = 64, bands = 16,
        thresholdPermille = 500)
      .select("id_a", "id_b", "est_matches", "est_permille")
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  test("stream pair set equals the batch ledger op under shuffled arrival") {
    val batch = batchPairs(fixture)
    assert(batch.nonEmpty) // fixture must exercise the near-dup path
    for (seed <- Seq(3, 17)) {
      val shuffled = new scala.util.Random(seed).shuffle(fixture.toVector)
      assert(runStream(shuffled, chunks = 3) == batch, s"seed=$seed")
    }
  }

  test("ledger semantics: pairs touching a late batch match incremental(ledger(A), B)") {
    val (a, b) = fixture.partition(_._1 <= 3)
    val prevSig = Dedup.minHashSignaturesPortable(
      a.toDF("doc_id", "text"), "doc_id", "text", n = 3, numHashes = 64)
    val inc = Dedup.incrementalMinHashPairs(prevSig,
        b.toDF("doc_id", "text"), "doc_id", "text",
        n = 3, numHashes = 64, bands = 16, thresholdPermille = 500)
      .select("id_a", "id_b", "est_matches", "est_permille")
      .as[(Long, Long, Long, Long)].collect().toSet
    val bIds = b.map(_._1).toSet
    val streamTouchingB = runStream(a ++ b, chunks = 2)
      .filter(p => bIds(p._1) || bIds(p._2))
    assert(streamTouchingB == inc)
  }

  test("local signature kernel is byte-identical to minHashSignaturesPortable") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().take(40)
    val coeffs = Dedup.portableMinHashCoeffs(64)
    val local = docs.map { case (id, tx) =>
      id -> StreamMinHashDedup.localSignature(tx, 3, coeffs).toSeq
    }.toMap
    val batch = Dedup.minHashSignaturesPortable(
        docs.toSeq.toDF("doc_id", "text"), "doc_id", "text",
        n = 3, numHashes = 64)
      .collect().map { r =>
        r.getLong(0) -> (1 to 64).map(i => r.getLong(i)).toSeq
      }.toMap
    assert(local == batch && local.size == 40)
  }

  test("hot bucket raises loudly instead of silently degrading recall") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamMinHashDedup.nearDupPairs(
        input.toDS().toDF("doc_id", "text"), "doc_id", "text",
        n = 3, numHashes = 64, bands = 16, thresholdPermille = 500,
        maxBucketSize = 2)
      .writeStream.outputMode("append")
      .format("memory").queryName("smhd_boom").start()
    val boom = intercept[Exception] {
      input.addData((1 to 4).map(i =>
        (i.toLong, "identical boilerplate text repeated everywhere always")))
      q.processAllAvailable()
    }
    val msgs = Iterator.iterate[Throwable](boom)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("maxBucketSize")), msgs.mkString(" | "))
    q.stop()
  }
}
