package graft.streaming

import graft.plans.AsOfJoin
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Stream-static as-of enrichment: each micro-batch of a streaming event
  * source is enriched against a STATIC dimension (a price table, a model
  * registry, a config history) through the custom sort-merge
  * [[graft.plans.AsOfJoin]] physical operator inside `foreachBatch`.
  *
  * Why foreachBatch rather than a stream-stream join: the dimension is
  * static, so each batch is an ordinary bounded DataFrame and the
  * co-partitioned O(1)-state merge join applies unchanged — no watermark
  * bookkeeping, no state store. Because the right side is static, the
  * union of per-batch results is row-for-row identical to one batch as-of
  * join over the union of all events (asserted by StreamingEnrichSpec),
  * regardless of how events split across micro-batches.
  *
  * Scale shape: the static side is loaded once per batch from its
  * (cachable) plan; each batch join is the same shuffle-or-broadcast
  * plan the batch operator produces. At 1000 executors this is the
  * standard continuous-enrichment topology for events at any rate.
  */
object StreamEnrich {

  /** Start the enrichment query. `sink` receives each enriched micro-batch
    * with its batch id — write to a table, a topic, or a test buffer.
    *
    * @param direction backward | forward | nearest (AsOfJoin semantics)
    * @param tolerance optional max |Δt| in the time unit (epoch-µs by
    *   graft convention); negative = unbounded
    */
  def start(events: DataFrame, static: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, direction: String = "backward",
      tolerance: Long = -1L)(sink: (DataFrame, Long) => Unit): StreamingQuery = {
    require(events.isStreaming, "events must be a streaming DataFrame")
    require(!static.isStreaming, "static side must be a batch DataFrame")
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        sink(AsOfJoin.asof(batch, static, keys, leftTime, rightTime,
          direction, strict = false, tolerance = tolerance), batchId)
      }
      .start()
  }
}
