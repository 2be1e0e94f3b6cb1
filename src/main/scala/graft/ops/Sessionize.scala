package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Event-stream batch analytics: gap-based sessionization and tumbling
  * windows. Pure window/aggregation algebra — partitioned by user/window
  * key, so it scales horizontally (one shuffle per op). The streaming
  * incremental counterpart lives in [[graft.streaming.StreamSessionize]].
  *
  * Time arithmetic is integer microseconds (`unix_micros`) end-to-end for
  * cross-engine determinism.
  */
object Sessionize {

  /** The time column as integer microseconds: accepts either a timestamp
    * column or an already-integer microsecond long column. */
  private def usOf(df: DataFrame, tsCol: String): Column =
    df.schema(tsCol).dataType match {
      case TimestampType => unix_micros(col(tsCol))
      case _ => col(tsCol)
    }

  /** Assign 1-based per-user session numbers: a new session starts when the
    * gap since the user's previous event exceeds `gapUs` microseconds.
    * Ties are ordered by (ts, orderCol) — supply a unique orderCol.
    */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
      orderCol: String, gapUs: Long): DataFrame = {
    val us = usOf(df, tsCol)
    val w = Window.partitionBy(col(userCol)).orderBy(us, col(orderCol))
    val newSession = when(
      lag(us, 1).over(w).isNull || (us - lag(us, 1).over(w)) > gapUs, 1).otherwise(0)
    df.withColumn("__new_session", newSession)
      .withColumn("session_no",
        sum(col("__new_session")).over(
          Window.partitionBy(col(userCol)).orderBy(us, col(orderCol))
            .rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new_session")
  }

  /** Per-user session statistics. */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String,
      orderCol: String, gapUs: Long): DataFrame = {
    val s = sessionize(df, userCol, tsCol, orderCol, gapUs)
    val us = usOf(s, tsCol)
    s.groupBy(col(userCol))
      .agg(
        countDistinct(col("session_no")).as("n_sessions"),
        count(lit(1)).as("n_events"),
        (max(us) - min(us)).as("span_us"))
  }

  /** Tumbling fixed-size windows: `window_start_us` = ts floored to a
    * multiple of `windowUs` (equivalent to UTC date_trunc for hour/day).
    */
  def tumbling(df: DataFrame, tsCol: String, windowUs: Long): DataFrame = {
    val us = usOf(df, tsCol)
    // pmod, not %: plain % follows the dividend's sign, so pre-epoch
    // (negative) timestamps would round toward zero instead of flooring
    // and diverge from date_trunc semantics
    df.withColumn("window_start_us", us - pmod(us, lit(windowUs)))
  }

  /** Sliding (hopping) windows via Spark's native `window()` generator:
    * each event lands in the `windowUs / slideUs` epoch-aligned windows
    * [start, start + windowUs) that contain it — one output row per
    * (event, window), `window_start_us` in integer µs. `slideUs` must
    * divide `windowUs` (every event is then in exactly window/slide
    * windows, the invariant the oracle replays with a k-range join).
    * Works identically on a streaming DataFrame — window() is the
    * Structured Streaming windowing primitive. The `window` struct is
    * KEPT alongside `window_start_us`: append-mode streaming aggregation
    * must group on the struct (that is what carries the watermark
    * linkage); batch callers group on the integer column and never
    * select the struct.
    */
  def sliding(df: DataFrame, tsCol: String, windowUs: Long,
      slideUs: Long): DataFrame = {
    require(windowUs > 0 && slideUs > 0 && windowUs % slideUs == 0,
      s"slide must divide window (got window=$windowUs, slide=$slideUs)")
    // a timestamp column is used DIRECTLY (a µs round-trip would strip
    // the watermark metadata a streaming caller attached to it); integer
    // µs columns are converted
    val tsExpr = df.schema(tsCol).dataType match {
      case TimestampType => col(tsCol)
      case _ => timestamp_micros(col(tsCol))
    }
    df.withColumn("window", window(tsExpr,
        s"$windowUs microseconds", s"$slideUs microseconds"))
      .withColumn("window_start_us", unix_micros(col("window.start")))
  }
}
