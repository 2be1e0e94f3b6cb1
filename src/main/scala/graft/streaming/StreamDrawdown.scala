package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental running drawdown — the streaming twin of
  * [[graft.ops.SeriesShape.runningDrawdown]], emitting the IDENTICAL
  * per-window rows: per key, the tumbling-window event count, the
  * running maximum over all CLOSED windows so far, and the drawdown
  * runmax − count ("how far below its own peak is this rate right
  * now" — the live health number behind q_drawdown's retrospective
  * summary).
  *
  * State per key: the open window counts (watermark-bounded, the
  * [[StreamAnomaly]] discipline) plus ONE long (the running max) —
  * constant forever. Windows close in ascending ws order once the
  * watermark passes their end, fold into the running max, and are
  * emitted exactly once. Zero-event windows are skipped on both sides
  * (gap-skipping observed series).
  */
object StreamDrawdown {

  case class KeyedEvent(key: String, ts_us: Long)
  case class DdRow(key: String, bucket: Long, c: Long, runmax: Long,
      dd: Long)
  case class DdState(open: Map[Long, Long], started: Boolean, runmax: Long)

  def runningDrawdown(events: Dataset[KeyedEvent], windowUs: Long,
      delayThreshold: String = "10 minutes"): Dataset[DdRow] = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", delayThreshold)
      .as[KeyedEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[DdState, DdRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, batch: Iterator[KeyedEvent],
            state: GroupState[DdState]) =>
          val st = state.getOption
            .getOrElse(DdState(Map.empty, started = false, 0L))
          var open = st.open
          batch.foreach { e =>
            val ws = e.ts_us - java.lang.Math.floorMod(e.ts_us, windowUs)
            open = open.updated(ws, open.getOrElse(ws, 0L) + 1L)
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var (started, runmax) = (st.started, st.runmax)
          val out = List.newBuilder[DdRow]
          open.keys.toSeq.sorted.foreach { ws =>
            if (ws + windowUs <= wmUs) {
              val n = open(ws)
              if (!started || n > runmax) { runmax = n; started = true }
              out += DdRow(key, ws, n, runmax, runmax - n)
              open = open - ws
            }
          }
          state.update(DdState(open, started, runmax))
          if (open.nonEmpty)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
          out.result().iterator
      }
  }
}
