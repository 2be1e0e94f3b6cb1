package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental SCD2 change capture — the streaming counterpart of
  * [[graft.ops.ChangeCapture.stateIntervals]]: maintain each key's
  * current (state, valid_from, version) and emit a CLOSED validity
  * interval exactly when a state change becomes final. The
  * "continuously maintained dimension table" topology: the append
  * stream of closed intervals plus one open-interval state row per key
  * IS the SCD2 table.
  *
  * Finality is the [[StreamTransitions]] watermark argument: an event is
  * processed (in (ts, tie) order) once its time drops strictly below the
  * watermark — nothing can still sort before it. Out-of-order events
  * inside the lag buffer and re-sort; an event-time timeout drains the
  * buffer as the watermark advances. State per key = the open interval
  * (one row, kept forever — a key's next change may come days later)
  * plus the in-lag buffer.
  *
  * Emitted rows: (key, state, valid_from_us, valid_to_us, version) —
  * exactly the batch operator's CLOSED rows (is_current = false);
  * the open tail row lives in state, not the output stream (append mode
  * cannot retract it). StreamChangeCaptureSpec proves the closed-row
  * equality on sf0.001 under fully shuffled arrival.
  */
object StreamChangeCapture {

  case class ChangeEvent(key: Long, ts_us: Long, event_id: Long, state: String)
  case class ClosedInterval(key: Long, state: String, valid_from_us: Long,
      valid_to_us: Long, version: Long)
  /** open = (state, valid_from, version) of the current run;
    * pending = events at/above the watermark, not yet final. */
  case class CcState(open: Option[(String, Long, Long)],
      pending: List[(Long, Long, String)])

  def closedIntervals(events: Dataset[ChangeEvent],
      delayThreshold: String): Dataset[ClosedInterval] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", delayThreshold)
      .as[ChangeEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[CcState, ClosedInterval](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, batch: Iterator[ChangeEvent],
            state: GroupState[CcState]) =>
          val st = state.getOption.getOrElse(CcState(None, Nil))
          val incoming = batch.map(e => (e.ts_us, e.event_id, e.state)).toList
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var open = st.open
          var rest = (st.pending ++ incoming).sortBy(p => (p._1, p._2))
          val out = List.newBuilder[ClosedInterval]
          while (rest.nonEmpty && rest.head._1 < wmUs) {
            val (ts, _, s) = rest.head
            open match {
              case Some((curState, from, ver)) if curState != s =>
                out += ClosedInterval(key, curState, from, ts, ver)
                open = Some((s, ts, ver + 1))
              case Some(_) => // same state: run continues
              case None => open = Some((s, ts, 1L))
            }
            rest = rest.tail
          }
          state.update(CcState(open, rest))
          if (rest.nonEmpty)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
          out.result().iterator
      }
  }
}
