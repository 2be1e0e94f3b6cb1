package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental Page–Hinkley changepoint detection — the streaming twin
  * of [[graft.ops.Changepoint.pageHinkley]], emitting the IDENTICAL
  * rows: per key, cumulative ppm drift of windowed event counts against
  * a TRAINED reference rate, with running-min/max drift envelopes.
  *
  * The trained `baseline` (key → mu_ppm, mean events per window in ppm)
  * is a dimension-sized map captured in the closure — the
  * train-batch/score-stream split of [[StreamTargetEncode]] /
  * [[StreamAffinity]]. Keys without a baseline emit nothing (the batch
  * inner join drops them too).
  *
  * State per key: the open tumbling-window counts (bounded by watermark
  * lag over window size) plus three longs (S, minS, maxS) — constant
  * however long the stream runs. A window is FINAL once the watermark
  * passes its end ([[StreamAnomaly]]'s discipline); closed windows fold
  * into the drift statistics in ascending ws order and are emitted
  * exactly once. Zero-event windows are skipped on both sides
  * (gap-skipping series).
  */
object StreamChangepoint {

  case class KeyedEvent(key: String, ts_us: Long)
  case class DriftRow(key: String, window_start_us: Long, n: Long,
      s_ppm: Long, drift_up_ppm: Long, drift_down_ppm: Long, alarm: Boolean)
  /** open = count per open window start; sums absent until the first
    * window closes (running min/max start AT the first S, not at 0). */
  case class PhState(open: Map[Long, Long], started: Boolean,
      s: Long, minS: Long, maxS: Long)

  def pageHinkley(events: Dataset[KeyedEvent], windowUs: Long,
      baseline: Map[String, Long], lambdaWindowTenths: Long,
      delayThreshold: String = "10 minutes"): Dataset[DriftRow] = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    require(lambdaWindowTenths > 0,
      s"lambdaWindowTenths must be positive, got $lambdaWindowTenths")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", delayThreshold)
      .as[KeyedEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[PhState, DriftRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, batch: Iterator[KeyedEvent],
            state: GroupState[PhState]) =>
          baseline.get(key) match {
            case None =>
              batch.foreach(_ => ()) // consume; untrained keys emit nothing
              Iterator.empty
            case Some(muPpm) =>
              val st = state.getOption
                .getOrElse(PhState(Map.empty, started = false, 0L, 0L, 0L))
              var open = st.open
              batch.foreach { e =>
                val ws = e.ts_us - java.lang.Math.floorMod(e.ts_us, windowUs)
                open = open.updated(ws, open.getOrElse(ws, 0L) + 1L)
              }
              val wmUs = state.getCurrentWatermarkMs() * 1000L
              var (started, s, minS, maxS) =
                (st.started, st.s, st.minS, st.maxS)
              val out = List.newBuilder[DriftRow]
              open.keys.toSeq.sorted.foreach { ws =>
                if (ws + windowUs <= wmUs) {
                  val n = open(ws)
                  s += n * 1000000L - muPpm
                  if (!started) { minS = s; maxS = s; started = true }
                  else {
                    if (s < minS) minS = s
                    if (s > maxS) maxS = s
                  }
                  val up = s - minS
                  val down = maxS - s
                  out += DriftRow(key, ws, n, s, up, down,
                    math.max(up, down) * 10L > lambdaWindowTenths * muPpm)
                  open = open - ws
                }
              }
              state.update(PhState(open, started, s, minS, maxS))
              if (open.nonEmpty)
                state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
              out.result().iterator
          }
      }
  }
}
