package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the impressions⋈clicks
  * pattern: match right-side events to the left-side event they follow
  * within `maxDelayMicros`, while both sides keep arriving out of order.
  *
  * Structured Streaming needs two things to bound the join state (and
  * they are exactly what this wrapper packages): an event-time watermark
  * on BOTH inputs, and a time-RANGE join condition on the watermarked
  * columns — from those Spark derives when a buffered row can never match
  * again and evicts it. State per key is then O(events within the
  * watermark + delay horizon), independent of stream length — the 100 TB
  * streaming shape.
  *
  * Times follow the repo's integer-µs convention; the wrapper converts to
  * TimestampType internally (watermarks require it) and drops the
  * internal columns on the way out. `withWatermark` is a no-op on batch
  * DataFrames, so the same call is the batch oracle for
  * streaming≡batch testing.
  *
  * `joinType` supports "inner" and the watermark-finalized outer joins
  * ("leftOuter"/"rightOuter"/"fullOuter"); outer null rows emit only once
  * the watermark passes the row's match horizon.
  */
object StreamJoin {

  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, maxDelayMicros: Long,
      leftWatermark: String = "0 microseconds",
      rightWatermark: String = "0 microseconds",
      joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "interval join needs at least one equality key")
    require(maxDelayMicros >= 0, s"maxDelayMicros must be >= 0, got $maxDelayMicros")
    val l = left.withColumn("__lt", timestamp_micros(col(leftTime)))
      .withWatermark("__lt", leftWatermark)
    val r = right.withColumn("__rt", timestamp_micros(col(rightTime)))
      .withWatermark("__rt", rightWatermark)
    val keyCond = keys.map(k => l(k) === r(k)).reduce(_ && _)
    val cond = keyCond &&
      r("__rt") >= l("__lt") &&
      r("__rt") <= l("__lt") + expr(s"INTERVAL $maxDelayMicros MICROSECOND")
    keys.foldLeft(l.join(r, cond, joinType))((df, k) => df.drop(r(k)))
      .drop("__lt", "__rt")
  }
}
