package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental event-rate spike detection — the streaming counterpart of
  * [[graft.ops.Anomaly.rateSpikes]], same cross-multiplied integer
  * threshold, same gap-skipping baseline of the previous `lookback`
  * OBSERVED windows per type.
  *
  * Per event type the state is the open tumbling-window counts (bounded
  * by the watermark lag over the window size) plus the last `lookback`
  * closed counts — a handful of longs however large the stream. A window
  * [ws, ws+win) is FINAL once the watermark reaches ws+win (any event
  * that could still land in it would be older than the watermark and is
  * dropped before the stateful operator); closed windows are evaluated in
  * ascending ws order against the rolling baseline and emitted exactly
  * once. An event-time timeout drains open windows as the watermark
  * advances without new per-type input.
  *
  * Output rows match the batch operator column for column
  * (event_type, window_start_us, n, base_sum, n_prior, is_spike);
  * StreamAnomalySpec proves equality on sf0.001 under shuffled arrival.
  */
object StreamAnomaly {

  case class RateEvent(event_type: String, ts_us: Long)
  case class SpikeRow(event_type: String, window_start_us: Long, n: Long,
      base_sum: Long, n_prior: Long, is_spike: Boolean)
  /** open = count per open window start; closed = last `lookback` closed
    * counts, most recent FIRST. */
  case class RateState(open: Map[Long, Long], closed: List[Long])

  def rateSpikes(events: Dataset[RateEvent], windowUs: Long,
      lookback: Int = 3, ratioNum: Long = 2L, ratioDen: Long = 1L,
      delayThreshold: String = "10 minutes"): Dataset[SpikeRow] = {
    require(windowUs > 0 && lookback >= 1 && ratioNum > 0 && ratioDen > 0,
      s"bad params (window=$windowUs, lookback=$lookback, ratio=$ratioNum/$ratioDen)")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", delayThreshold)
      .as[RateEvent]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[RateState, SpikeRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (typ: String, batch: Iterator[RateEvent],
            state: GroupState[RateState]) =>
          val st = state.getOption.getOrElse(RateState(Map.empty, Nil))
          var open = st.open
          batch.foreach { e =>
            val ws = e.ts_us - java.lang.Math.floorMod(e.ts_us, windowUs)
            open = open.updated(ws, open.getOrElse(ws, 0L) + 1L)
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var closed = st.closed
          val out = List.newBuilder[SpikeRow]
          open.keys.toSeq.sorted.foreach { ws =>
            if (ws + windowUs <= wmUs) {
              val n = open(ws)
              val baseSum = closed.take(lookback).sum
              val nPrior = math.min(closed.length, lookback).toLong
              out += SpikeRow(typ, ws, n, baseSum, nPrior,
                nPrior == lookback && n * nPrior * ratioDen > baseSum * ratioNum)
              closed = (n :: closed).take(lookback)
              open = open - ws
            }
          }
          state.update(RateState(open, closed))
          if (open.nonEmpty)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
          out.result().iterator
      }
  }
}
