package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Online target-encoder state — the streaming half of
  * [[graft.ops.TargetEncode]]: per-category running (n, n_pos) over an
  * unbounded labeled stream, as a plain update-mode streaming
  * aggregation. Count and conditional sum are associative, so Spark's
  * incremental hash aggregate IS the operator: state is one row per
  * category, partials merge map-side every micro-batch, no
  * flatMapGroupsWithState where a built-in aggregation suffices (the
  * [[StreamValidation]] principle). The emitted rows are monotone in `n`,
  * so the latest snapshot per category is recoverable from any update
  * log by max-n.
  *
  * The ppm shrinkage derivation stays OUT of the stream:
  * [[graft.ops.TargetEncode.encoderFromCounts]] runs on whatever state
  * snapshot the consumer takes, so batch-fit and stream-fit encoders
  * share one derivation (stream ≡ batch spec'd in TargetEncodeSpec).
  */
object StreamTargetEncode {

  def runningCategoryCounts(stream: DataFrame, categoryCol: String,
      target: Column): DataFrame = {
    require(stream.isStreaming, "runningCategoryCounts expects a stream")
    stream.select(col(categoryCol).as("category"),
        when(target, 1L).otherwise(0L).as("__t"))
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n"), sum(col("__t")).as("n_pos"))
  }
}
