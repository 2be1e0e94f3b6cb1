package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming counterparts of the batch event operators
  * (reference has no streaming at all — SURVEY.md §2.3; this is part of
  * the 100 TB pipeline posture, §7.6).
  *
  * [[sessions]] is incremental gap-sessionization: custom per-user state
  * via flatMapGroupsWithState with event-time timeout — a session closes
  * (and is emitted, append-mode) when the watermark passes its last event
  * plus the gap. State is O(1) per active user; watermark bounds it.
  */
object StreamSessionize {

  case class SessionEvent(user_id: Long, ts_us: Long, event_id: Long)
  case class SessionState(startUs: Long, lastUs: Long, nEvents: Long)
  case class SessionOut(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long)

  /** events: a streaming Dataset[SessionEvent]. `delayThreshold` is the
    * watermark lateness bound (e.g. "10 minutes").
    *
    * State per user is the LIST of open sessions, not just the latest:
    * a late (but within-watermark) event may start a separate earlier
    * session, extend an existing one backwards, or bridge two open
    * sessions into one — all handled by interval-merge on insert. A
    * session is emitted only when the watermark passes its end + gap
    * (at that point no admissible event can change it), so results match
    * the batch sessionizer on the same data regardless of arrival order.
    */
  def sessions(events: Dataset[SessionEvent], gapUs: Long,
      delayThreshold: String): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", delayThreshold)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[List[SessionState]]) =>
          var sessions = state.getOption.getOrElse(Nil)
          batch.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            // merge with every open session whose [start-gap, last+gap]
            // window covers the event (bridging collapses several)
            val (mergeable, rest) = sessions.partition(s =>
              e.ts_us >= s.startUs - gapUs && e.ts_us <= s.lastUs + gapUs)
            val merged =
              if (mergeable.isEmpty) SessionState(e.ts_us, e.ts_us, 1)
              else SessionState(
                math.min(e.ts_us, mergeable.map(_.startUs).min),
                math.max(e.ts_us, mergeable.map(_.lastUs).max),
                mergeable.map(_.nEvents).sum + 1)
            sessions = merged :: rest
          }
          val wmMs = state.getCurrentWatermarkMs()
          // single division: lastUs/1000 + gapUs/1000 truncates each term
          // and could close ~1ms early, splitting a still-mergeable session
          val (closed, open) = sessions.partition(s =>
            (s.lastUs + gapUs) / 1000 < wmMs)
          if (open.isEmpty) state.remove()
          else {
            state.update(open)
            val nextClose = open.map(s => (s.lastUs + gapUs) / 1000).min
            state.setTimeoutTimestamp(math.max(nextClose, wmMs + 1))
          }
          closed.sortBy(_.startUs)
            .map(s => SessionOut(userId, s.startUs, s.lastUs, s.nEvents)).iterator
      }
  }

  /** Watermarked tumbling-window counts/sums per event type — the standard
    * streaming aggregation shape (readStream → window agg → writeStream).
    */
  def windowedStats(events: Dataset[_], tsUsCol: String, typeCol: String,
      valueCol: String, window: String, delayThreshold: String) = {
    events
      .withColumn("ts", timestamp_micros(col(tsUsCol)))
      .withWatermark("ts", delayThreshold)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col(typeCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
  }
}
