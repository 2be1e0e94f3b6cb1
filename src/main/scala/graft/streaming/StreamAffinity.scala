package graft.streaming

import graft.ops.DomainAffinity
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Train-batch / score-stream domain-affinity topology: the
  * (bucket, is_affine) model table is built ONCE on a reference corpus
  * ([[DomainAffinity.affineBuckets]] — `buckets` rows, broadcastable at
  * any scale), then every micro-batch of a document stream is scored
  * against it inside `foreachBatch`.
  *
  * Why foreachBatch: scoring is pure per-document work (array-expression
  * shingling + one broadcast join + a per-doc count), so each bounded
  * micro-batch runs the exact batch plan — no state store, no watermark,
  * and the union of per-batch scores is row-identical to batch-scoring
  * the union (asserted by DomainAffinitySpec), however the stream is
  * chopped. This is the standard continuous-curation topology: the model
  * refreshes on whatever cadence retraining runs, the stream never stops.
  */
object StreamAffinity {

  def start(docs: DataFrame, idCol: String, textCol: String,
      affine: DataFrame, buckets: Int = 4096)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    require(docs.isStreaming, "docs must be a streaming DataFrame")
    require(!affine.isStreaming, "the model table must be a batch DataFrame")
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        sink(DomainAffinity.scoreAgainst(batch, idCol, textCol, affine,
          buckets), batchId)
      }
      .start()
  }
}
