package graft.streaming

import graft.ops.Bm25
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Train-batch / score-stream BM25 retrieval — the [[StreamAffinity]]
  * topology applied to lexical ranking: the corpus-side statistics
  * ([[Bm25.Bm25Index]]: persisted (doc, term) postings, doc lengths,
  * 1-row totals) are built ONCE on the frozen corpus snapshot, then every
  * micro-batch of arriving (query_id, term) rows is scored against them
  * inside `foreachBatch` via [[Bm25.topKDocsWithIndex]].
  *
  * Why foreachBatch: scoring is a pure function of (index, query batch) —
  * per-term df is computed against the frozen postings for exactly the
  * batch's terms, so each bounded micro-batch runs the exact batch plan
  * with no state store or watermark, and the union of per-batch top-k
  * tables is row-identical to batch-scoring the union PROVIDED each
  * query's terms arrive within one batch (a query IS its term set; the
  * spec pins this contract). The index refreshes on whatever cadence the
  * corpus snapshot does; the query stream never stops — the standard
  * serving topology for a first-stage retriever.
  */
object StreamBm25 {

  def start(queries: DataFrame, index: Bm25.Bm25Index, k: Int = 10)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    require(queries.isStreaming, "queries must be a streaming DataFrame")
    require(!index.tf.isStreaming, "the index must be batch DataFrames")
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        sink(Bm25.topKDocsWithIndex(index, batch, k), batchId)
      }
      .start()
  }
}
