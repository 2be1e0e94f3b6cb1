package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental next-event transition pairs over an event stream — the
  * streaming counterpart of [[graft.ops.Transitions.eventTransitions]]:
  * emit one row per consecutive (from, to) event pair in each entity's
  * time-ordered sequence, exactly once, whatever the arrival order.
  *
  * Finality argument: a buffered event can be emitted as a pair endpoint
  * once its event time is strictly below the watermark — any event that
  * could still SORT BETWEEN the pair's endpoints would have to carry an
  * older event time and is dropped by the watermark before reaching the
  * stateful operator. Events at/above the watermark stay buffered; an
  * event-time timeout re-fires each group as the watermark advances so
  * buffered events drain without needing new per-key input.
  *
  * State per entity = the last closed event (ONE row, kept forever so a
  * much-later event still forms its pair — the same one-row-per-key
  * posture as StreamComponents' spanning forest) + the events inside the
  * watermark lag (bounded by the lateness window). Nothing driver-side;
  * downstream aggregation of the emitted pairs reproduces the batch
  * operator's count/per-mille table (spec-proven equal under fully
  * shuffled arrival).
  */
object StreamTransitions {

  case class TransEvent(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String)
  case class TransPair(user_id: Long, from_type: String, to_type: String,
      from_ts_us: Long, to_ts_us: Long)
  /** carry = last closed event, pending = not-yet-final events. */
  case class TransState(carry: Option[(Long, Long, String)],
      pending: List[(Long, Long, String)])

  def pairs(events: Dataset[TransEvent],
      delayThreshold: String): Dataset[TransPair] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", delayThreshold)
      .as[TransEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, TransPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[TransEvent],
            state: GroupState[TransState]) =>
          val st = state.getOption.getOrElse(TransState(None, Nil))
          val incoming = batch.map(e => (e.ts_us, e.event_id, e.event_type)).toList
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var carry = st.carry
          var rest = (st.pending ++ incoming).sortBy(p => (p._1, p._2))
          val out = List.newBuilder[TransPair]
          while (rest.nonEmpty && rest.head._1 < wmUs) {
            val nxt = rest.head
            carry.foreach(c =>
              out += TransPair(uid, c._3, nxt._3, c._1, nxt._1))
            carry = Some(nxt)
            rest = rest.tail
          }
          state.update(TransState(carry, rest))
          // re-fire on watermark movement while events are still pending;
          // with an empty buffer the one-row carry just waits for input
          if (rest.nonEmpty)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
          out.result().iterator
      }
  }
}
