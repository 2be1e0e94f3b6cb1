package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coalescing (gaps-and-islands) — merge each key's overlapping
  * or touching half-open intervals `[ts, ts + durUs)` into maximal
  * "islands", emitting one row per island with its span and event count.
  * The classic warehouse formulation of activity periods / uptime windows
  * / coverage merging; [[Sessionize]] is the gap-based cousin (new session
  * after `gap` of silence), this is the duration-based one (merge while
  * intervals actually touch).
  *
  * Island detection is the standard two-window algebra, all integer µs:
  *
  *   prev_max_end = max(ts + dur) over rows strictly before (key order)
  *   new_island   = prev_max_end is null OR ts > prev_max_end
  *   island_idx   = running sum of new_island   (1-based)
  *
  * `ts == prev_max_end` does NOT start a new island — half-open intervals
  * that touch merge. Order within a key is (`tsCol`, `tieCol`), total via
  * the unique tie column, so island assignment is engine-independent and
  * the driver query gets a hash-exact DuckDB oracle.
  *
  * Plan shape at 100 TB: one key-partitioned sort window (the cummax and
  * the running sum share it — single exchange), then a (key, island)
  * aggregation whose partials combine map-side. No joins, no driver state.
  */
object Intervals {

  def coalesceIntervals(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, durUs: Long): DataFrame = {
    require(durUs > 0, s"interval duration must be positive, got $durUs")
    val ordered = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val before = ordered.rowsBetween(Window.unboundedPreceding, -1)
    val upToHere = ordered.rowsBetween(Window.unboundedPreceding, 0)
    events
      .select(col(keyCol), col(tsCol), col(tieCol))
      .withColumn("__end", col(tsCol) + lit(durUs))
      .withColumn("__prev_max_end", max(col("__end")).over(before))
      .withColumn("__new",
        when(col("__prev_max_end").isNull ||
          col(tsCol) > col("__prev_max_end"), 1L).otherwise(0L))
      .withColumn("island_idx", sum(col("__new")).over(upToHere))
      .groupBy(col(keyCol), col("island_idx"))
      .agg(
        min(col(tsCol)).as("start_us"),
        max(col("__end")).as("end_us"),
        count(lit(1)).as("n_events"))
  }
}
