package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication for continuous ingestion pipelines.
  *
  * Content-hash (sha256) dedup with a watermark bound on state:
  * `dropDuplicatesWithinWatermark` keeps one row per content hash and
  * evicts state once the watermark passes — bounded memory at any
  * throughput, the property that matters when the dedup state would
  * otherwise grow with the whole corpus.
  */
object StreamDedup {

  /** events/documents stream with an event-time column `tsCol` (timestamp)
    * and a content column; emits first-seen rows per content hash.
    */
  def dedupByContent(stream: DataFrame, textCol: String, tsCol: String,
      delayThreshold: String): DataFrame =
    stream
      .withColumn("__content_sha", sha2(col(textCol), 256))
      .withWatermark(tsCol, delayThreshold)
      .dropDuplicatesWithinWatermark("__content_sha")
      .drop("__content_sha")
}
