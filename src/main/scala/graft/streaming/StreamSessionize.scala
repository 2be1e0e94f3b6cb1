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
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.startUs, s.lastUs, s.nEvents))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts_us, e.event_id))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              cur = cur match {
                case Some(s) if e.ts_us - s.lastUs <= gapUs =>
                  Some(s.copy(lastUs = math.max(s.lastUs, e.ts_us), nEvents = s.nEvents + 1))
                case Some(s) =>
                  closed ::= SessionOut(userId, s.startUs, s.lastUs, s.nEvents)
                  Some(SessionState(e.ts_us, e.ts_us, 1))
                case None =>
                  Some(SessionState(e.ts_us, e.ts_us, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when watermark passes lastUs + gap
              state.setTimeoutTimestamp(s.lastUs / 1000 + gapUs / 1000)
            }
            closed.reverse.iterator
          }
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
