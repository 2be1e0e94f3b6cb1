package graft.streaming

import graft.ops.SplitLeakage
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming split-leakage monitor — contamination checking moved to
  * WHERE documents arrive instead of after the dataset ships: each
  * micro-batch of candidate documents is mined for near-duplicates
  * against the FROZEN reference corpus ([[SplitLeakage.crossCorpusLeaks]]
  * — shingle inverted index, uncapped-set Jaccard verify), and every
  * cross-split pair is emitted as a leak event the ingestion pipeline can
  * alert on or quarantine.
  *
  * Why foreachBatch: the leak set of a batch is a pure function of
  * (batch, reference) — no cross-batch state — so the union of per-batch
  * outputs is row-identical to running the batch operator on the union
  * of all arrivals, however the stream is chopped (spec-pinned under
  * shuffled arrival). The reference corpus is whatever already shipped;
  * refresh it when the next drop freezes.
  */
object StreamSplitLeakage {

  def start(docs: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, n: Int = 3, threshold: Double = 0.5,
      salt: String = "split", testPermille: Int = 200)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    require(docs.isStreaming, "docs must be a streaming DataFrame")
    require(!reference.isStreaming, "reference must be a batch DataFrame")
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // r13 (ADVICE r12): crossCorpusLeaks persists the two per-batch
        // shingle tables internally; on a long-running stream those
        // MEMORY_AND_DISK blocks would otherwise accumulate one pair per
        // micro-batch until the ContextCleaner happens to GC them (§5).
        // Snapshot the persisted-RDD set, run the batch, and release
        // exactly the RDDs this batch added once the sink has consumed
        // the frame (evaluation is eager within the batch; a sink that
        // defers evaluation merely recomputes — never wrong results).
        val sc = batch.sparkSession.sparkContext
        val before = sc.getPersistentRDDs.keySet
        sink(SplitLeakage.crossCorpusLeaks(batch, reference, idCol,
          textCol, n, threshold, salt, testPermille), batchId)
        sc.getPersistentRDDs
          .filter { case (id, _) => !before.contains(id) }
          .values.foreach(_.unpersist(blocking = false))
      }
      .start()
  }
}
