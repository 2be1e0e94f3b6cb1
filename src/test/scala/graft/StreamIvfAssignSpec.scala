package graft

import graft.ops.Similarity
import graft.streaming.StreamIvfAssign
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream ≡ batch pins for the 30th module: under a frozen codebook, the
  * stream's per-arrival candidate scoring replayed through the batch
  * top-k contract reproduces [[Similarity.incrementalIvfTopK]] exactly,
  * with prefix semantics (a query scores the corpus as of its arrival).
  */
class StreamIvfAssignSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 64
  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").persist()
  private lazy val n = emb.count()
  private lazy val cutA = n - 128
  private lazy val cutB = n - 64
  private lazy val nCells = Similarity.autoNCells(cutA)
  private lazy val sampleN = Similarity.autoSampleN(cutA, nCells)
  private lazy val codebook = Similarity.trainIvfCodebookPortable(
    emb.where(col("vec_id") < cutA)
      .select(col("vec_id").cast("long").as("id"),
        Similarity.quantize(col("embedding")).as("vec")),
    dim, nCells, kmeansIters = 3, sampleN = sampleN, seed = 0L,
    strideInit = true)

  private def vecRows(pred: org.apache.spark.sql.Column)
      : Seq[(Long, Array[Double])] =
    emb.where(pred)
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toSeq

  /** Run the stream over `chunks` arrival waves; return all candidates. */
  private def runStream(waves: Seq[Seq[(Long, Array[Double])]], name: String)
      : Seq[(Long, Long, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Double])]
    val q = StreamIvfAssign.candidates(
        input.toDS().toDF("vec_id", "embedding"), "vec_id", "embedding",
        codebook, nProbe = 4)
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    waves.foreach { w => input.addData(w); q.processAllAvailable() }
    q.stop()
    spark.table(name).select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect().toSeq
  }

  /** The batch top-k contract over a candidate set: cosine DESC,
    * neighbor ASC, k=5 — TopKByAgg's ordering. */
  private def topK(cands: Seq[(Long, Long, Double)], queries: Set[Long])
      : Set[(Long, Int, Long, Double)] =
    cands.filter(c => queries(c._1)).groupBy(_._1).toSeq.flatMap {
      case (qid, cs) =>
        cs.sortBy { case (_, nb, cos) => (-cos, nb) }.take(5).zipWithIndex
          .map { case ((_, nb, cos), i) => (qid, i + 1, nb, cos) }
    }.toSet

  private def batchTopK(ledgerPred: org.apache.spark.sql.Column,
      batchPred: org.apache.spark.sql.Column)
      : Set[(Long, Int, Long, Double)] = {
    val ledger = Similarity.ivfAssignLedger(
      emb.where(ledgerPred), "vec_id", "embedding", codebook)
    Similarity.incrementalIvfTopK(ledger, emb.where(batchPred),
        "vec_id", "embedding", dim, k = 5, nProbe = 4, codebook)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .as[(Long, Int, Long, Double)].collect().toSet
  }

  test("stream candidates + batch top-k contract ≡ incrementalIvfTopK") {
    val a = vecRows(col("vec_id") < cutA)
    val b = vecRows(col("vec_id") >= cutA)
    val cands = runStream(Seq(a, b), "sivf_ab")
    val got = topK(cands, b.map(_._1).toSet)
    val expect = batchTopK(col("vec_id") < cutA, col("vec_id") >= cutA)
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("prefix semantics: a later wave's queries see ledger ∪ earlier waves") {
    val a = vecRows(col("vec_id") < cutA)
    val b1 = vecRows(col("vec_id") >= cutA && col("vec_id") < cutB)
    val b2 = vecRows(col("vec_id") >= cutB)
    val cands = runStream(Seq(a, b1, b2), "sivf_ab1b2")
    val got = topK(cands, b2.map(_._1).toSet)
    val expect = batchTopK(col("vec_id") < cutB, col("vec_id") >= cutB)
    assert(got == expect)
  }

  test("a neighbor emits from exactly one cell (no cross-cell multiplicity)") {
    val a = vecRows(col("vec_id") < cutA)
    val b = vecRows(col("vec_id") >= cutA)
    val cands = runStream(Seq(a, b), "sivf_mult")
    val dup = cands.groupBy(c => (c._1, c._2)).filter(_._2.size > 1)
    assert(dup.isEmpty, s"duplicated candidate pairs: ${dup.keys.take(5)}")
  }

  test("fanOut's assign cell matches ivfAssignLedger for every vector") {
    val batch = Similarity.ivfAssignLedger(emb, "vec_id", "embedding", codebook)
      .select("id", "cell").as[(Long, Int)].collect().toMap
    vecRows(lit(true)).foreach { case (id, vec) =>
      // the stream quantizes before fanOut; replicate the ×10000 floor
      val qv = vec.map(x => math.floor(x * 10000.0))
      val own = StreamIvfAssign.fanOut(id, qv, codebook, nProbe = 4)
        .find(_._2).get._1
      assert(own == batch(id), s"vec $id")
    }
  }

  test("cell cap raises loudly instead of silently degrading") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Double])]
    val q = StreamIvfAssign.candidates(
        input.toDS().toDF("vec_id", "embedding"), "vec_id", "embedding",
        codebook, nProbe = 1, maxCellSize = 1)
      .writeStream.outputMode("append")
      .format("memory").queryName("sivf_cap").start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      input.addData(vecRows(lit(true)).take(64))
      q.processAllAvailable()
    }
    q.stop()
    assert(Option(ex.getMessage).exists(_.contains("maxCellSize")) ||
      Option(ex.getCause).exists(c =>
        Option(c.getMessage).exists(_.contains("maxCellSize"))))
  }
}
