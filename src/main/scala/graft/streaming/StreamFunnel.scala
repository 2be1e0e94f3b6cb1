package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental ordered-funnel analysis over an event stream — the
  * streaming counterpart of [[graft.ops.Funnel.userFunnel]] (same strict
  * `>` step chaining), with the conversion-window bound every production
  * funnel carries: step events count only within `windowUs` of the
  * (final) step-1 time, and a user's funnel is EMITTED exactly when the
  * watermark passes t1 + window — at that point no admissible event can
  * still arrive, so the result is final whatever the arrival order.
  *
  * Out-of-order correctness is the subtle part: a late step-1 event can
  * LOWER t1, which can retroactively admit step-k events that were
  * inadmissible before (the funnel times are monotonically non-increasing
  * in new information). State therefore keeps, per step, the times that
  * could still matter — step 1 collapses to its running min (only the min
  * is ever used), later steps keep their times up to t1 + window (times
  * beyond it can never be admissible because t1 only decreases) — and the
  * funnel chain is evaluated once, at emission. State per user is bounded
  * by the user's funnel-type events inside one conversion window;
  * watermark + timeout GC removes it at emission (or quietly, for users
  * who never performed step 1).
  *
  * Output rows: (user_id, depth, step_times) with -1 for unreached steps
  * — equal to the batch funnel restricted to the same window (and, for a
  * window wider than the data span, equal to the unwindowed batch
  * operator; asserted by StreamFunnelSpec).
  */
object StreamFunnel {

  case class FunnelEvent(user_id: Long, ts_us: Long, event_type: String)
  case class FunnelOut(user_id: Long, depth: Int, step_times: Seq[Long])

  def funnels(events: Dataset[FunnelEvent], steps: Seq[String],
      windowUs: Long, delayThreshold: String): Dataset[FunnelOut] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowUs > 0, "conversion window must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx: Map[String, Int] = steps.zipWithIndex.toMap
    val nSteps = steps.length
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", delayThreshold)
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Map[Int, List[Long]], FunnelOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[FunnelEvent],
            state: GroupState[Map[Int, List[Long]]]) =>
          if (state.hasTimedOut) {
            val out = emit(uid, state.get, nSteps, windowUs)
            state.remove()
            out.iterator
          } else {
            var m = state.getOption.getOrElse(Map.empty[Int, List[Long]])
            batch.foreach { e =>
              stepIdx.get(e.event_type).foreach { k =>
                m = m.updated(k, e.ts_us :: m.getOrElse(k, Nil))
              }
            }
            m.get(0) match {
              case Some(t1s) =>
                val t1 = t1s.min
                // prune: step 1 to its min; later steps to the window
                // (t1 only decreases, so the window only moves earlier
                // and pruned times can never become admissible)
                m = m.map {
                  case (0, _) => 0 -> List(t1)
                  case (k, ts) => k -> ts.filter(_ <= t1 + windowUs)
                }.filter(_._2.nonEmpty)
                state.update(m)
                // fire just after the watermark passes t1 + window
                val closeMs = (t1 + windowUs) / 1000 + 1
                state.setTimeoutTimestamp(
                  math.max(closeMs, state.getCurrentWatermarkMs() + 1))
              case None if m.nonEmpty =>
                // funnel-type events but no step 1 yet: a late step 1 may
                // still admit them. GC one window past the watermark.
                state.update(m)
                state.setTimeoutTimestamp(state.getCurrentWatermarkMs() +
                  math.max(1L, windowUs / 1000))
              case None => // no relevant events at all
            }
            Iterator.empty
          }
      }
  }

  /** Evaluate the strict-`>` chain over the retained times — the batch
    * semantics, windowed. None when step 1 never happened. */
  private def emit(uid: Long, m: Map[Int, List[Long]], nSteps: Int,
      windowUs: Long): Option[FunnelOut] =
    m.get(0).map(_.min).map { t1 =>
      val times = Array.fill(nSteps)(-1L)
      times(0) = t1
      var prev = t1
      var depth = 1
      var k = 1
      while (k < nSteps && prev >= 0) {
        val next = m.getOrElse(k, Nil)
          .filter(t => t > prev && t <= t1 + windowUs)
        if (next.nonEmpty) { times(k) = next.min; prev = times(k); depth = k + 1 }
        else prev = -1L
        k += 1
      }
      FunnelOut(uid, depth, times.toSeq)
    }
}
