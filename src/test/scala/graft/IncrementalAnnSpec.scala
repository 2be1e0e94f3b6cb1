package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the incremental-IVF contract (VERDICT r11 item 5), the
  * similarity twin of IncrementalDedupSpec: under a FROZEN epoch
  * codebook, querying an arriving batch against the persisted ledger is
  * EXACTLY the full-corpus run restricted to the batch's queries —
  * incremental arrival changes the work, never the answer.
  */
class IncrementalAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 64
  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .persist()

  private def resultSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("query_id"), col("rank"), col("neighbor_id"),
        // cosine is a deterministic double — exact equality expected
        col("cosine"))
      .as[(Long, Int, Long, Double)].collect().toSet

  test("ledger(A)+B ≡ full(A∪B, queries=B) under the frozen codebook") {
    val n = emb.count()
    val cut = n - 64
    val a = emb.where(col("vec_id") < cut)
    val b = emb.where(col("vec_id") >= cut)
    val inc = Similarity.incrementalIvfTopKAuto(a, b, "vec_id", "embedding",
      dim, k = 5, nProbe = 4, kmeansIters = 3)
    // the frozen-codebook full run: widths from the EPOCH count, sample =
    // the sampleN smallest ids (all < cut, so codebook(A) == codebook(A∪B)),
    // assignment over A∪B, queries restricted to B
    val nCells = Similarity.autoNCells(cut)
    val sampleN = Similarity.autoSampleN(cut, nCells)
    assert(sampleN <= cut, "fixture must keep the sample inside the epoch")
    val full = Similarity.ivfTopKPortable(emb, "vec_id", "embedding", dim,
      k = 5, nCells = nCells, nProbe = 4, kmeansIters = 3,
      sampleN = sampleN, seed = 0L, queryPred = col("id") >= cut,
      strideInit = true)
    assert(resultSet(inc) == resultSet(full))
    assert(inc.count() > 0)
  }

  test("two-batch replay: incremental(ledger(A)∪assign(B1), B2) ≡ full as of B2") {
    val n = emb.count()
    val cutA = n - 128
    val cutB = n - 64
    val a = emb.where(col("vec_id") < cutA)
    val b1 = emb.where(col("vec_id") >= cutA && col("vec_id") < cutB)
    val b2 = emb.where(col("vec_id") >= cutB)
    // epoch codebook frozen on A; the ledger then accumulates B1 before
    // B2 arrives — exactly how a pipeline folds batches between reindexes
    val nCells = Similarity.autoNCells(cutA)
    val sampleN = Similarity.autoSampleN(cutA, nCells)
    val vA = a.select(col("vec_id").cast("long").as("id"),
      Similarity.quantize(col("embedding")).as("vec"))
    val centroids = Similarity.trainIvfCodebookPortable(vA, dim, nCells,
      kmeansIters = 3, sampleN = sampleN, seed = 0L, strideInit = true)
    val ledgerA = Similarity.ivfAssignLedger(a, "vec_id", "embedding", centroids)
    val ledgerAB1 = ledgerA.union(
      Similarity.ivfAssignLedger(b1, "vec_id", "embedding", centroids))
    val inc = Similarity.incrementalIvfTopK(ledgerAB1, b2, "vec_id",
      "embedding", dim, k = 5, nProbe = 4, centroids)
    val full = Similarity.ivfTopKPortable(emb, "vec_id", "embedding", dim,
      k = 5, nCells = nCells, nProbe = 4, kmeansIters = 3,
      sampleN = sampleN, seed = 0L, queryPred = col("id") >= cutB,
      strideInit = true)
    assert(resultSet(inc) == resultSet(full))
  }

  test("ledger assignment is arrival-order- and partition-independent") {
    val n = emb.count()
    val cut = n - 64
    val a = emb.where(col("vec_id") < cut)
    val nCells = Similarity.autoNCells(cut)
    val sampleN = Similarity.autoSampleN(cut, nCells)
    val vA = a.select(col("vec_id").cast("long").as("id"),
      Similarity.quantize(col("embedding")).as("vec"))
    val centroids = Similarity.trainIvfCodebookPortable(vA, dim, nCells,
      kmeansIters = 3, sampleN = sampleN, seed = 0L, strideInit = true)
    val l1 = Similarity.ivfAssignLedger(a, "vec_id", "embedding", centroids)
      .select("id", "cell").as[(Long, Int)].collect().toSet
    val l2 = Similarity.ivfAssignLedger(
        a.repartition(17).orderBy(rand(7)), "vec_id", "embedding", centroids)
      .select("id", "cell").as[(Long, Int)].collect().toSet
    assert(l1 == l2)
  }

  test("cell stats: every cell reported, occupancies sum to N, hot algebra exact") {
    val nCells = Similarity.autoNCells(emb.count())
    val stats = Similarity.ivfCellStatsAuto(emb, "vec_id", "embedding", dim)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    // every cell 0..nCells-1 appears exactly once (dead cells included)
    assert(stats.map(_._1).toSeq == (0 until nCells))
    // occupancies partition the corpus
    assert(stats.map(_._2).sum == emb.count())
    // hot flag is exactly occupancy > 8·(n div nCells), and the ledger
    // assignment underlying the counts matches ivfAssignLedger
    val n = emb.count()
    val designOcc = n / nCells
    stats.foreach { case (c, nv, hot) =>
      assert(hot == (if (nv > 8 * designOcc) 1L else 0L), s"cell $c")
    }
    val sampleN = Similarity.autoSampleN(n, nCells)
    val vA = emb.select(col("vec_id").cast("long").as("id"),
      Similarity.quantize(col("embedding")).as("vec"))
    val centroids = Similarity.trainIvfCodebookPortable(vA, dim, nCells,
      kmeansIters = 3, sampleN = sampleN, seed = 0L, strideInit = true)
    val fromLedger = Similarity.ivfAssignLedger(emb, "vec_id", "embedding",
        centroids)
      .groupBy(col("cell")).count()
      .as[(Int, Long)].collect().toMap
    stats.foreach { case (c, nv, _) =>
      assert(fromLedger.getOrElse(c, 0L) == nv, s"cell $c")
    }
  }

  test("per-batch work scales with the batch: empty batch yields empty result") {
    val n = emb.count()
    val a = emb.where(col("vec_id") < n - 64)
    val nCells = Similarity.autoNCells(n - 64)
    val sampleN = Similarity.autoSampleN(n - 64, nCells)
    val vA = a.select(col("vec_id").cast("long").as("id"),
      Similarity.quantize(col("embedding")).as("vec"))
    val centroids = Similarity.trainIvfCodebookPortable(vA, dim, nCells,
      kmeansIters = 3, sampleN = sampleN, seed = 0L, strideInit = true)
    val ledger = Similarity.ivfAssignLedger(a, "vec_id", "embedding", centroids)
    val empty = emb.where(lit(false))
    assert(Similarity.incrementalIvfTopK(ledger, empty, "vec_id",
      "embedding", dim, k = 5, nProbe = 4, centroids).count() == 0L)
  }
}
