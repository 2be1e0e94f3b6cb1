package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental cohort retention (20th module) — the streaming
  * counterpart of [[graft.ops.Retention.cohortRetention]] over a FIXED
  * ANALYSIS HORIZON (every production retention matrix has one; it is
  * what makes per-user state finite): cohort = the period of the user's
  * first event, k = periods since cohort, users counted once per
  * (cohort, k) for k ≤ `horizonPeriods`.
  *
  * Per-user state is 16 bytes flat: the running-min cohort and a 64-bit
  * BITMASK of observed periods. Out-of-order correctness: a late earlier
  * event can LOWER the cohort, which renumbers every already-seen period
  * — the bitmask simply shifts left by the cohort delta (bits sliding
  * past the horizon drop, exactly like the batch operator restricted to
  * the horizon around the FINAL cohort). Nothing is emitted until the
  * watermark passes cohort + horizon (event-time timeout), so every
  * emitted row is final whatever the arrival order — the StreamFunnel
  * discipline.
  *
  * Output rows: (cohort_start_us, k, user_id), one per set bit per user;
  * the retention matrix is a downstream count per (cohort_start_us, k) —
  * equal to the batch operator when the data span fits the horizon
  * (asserted by StreamRetentionSpec on shuffled arrival).
  */
object StreamRetention {

  case class RetEvent(user_id: Long, ts_us: Long)
  case class RetState(cohortUs: Long, seen: Long)
  case class RetOut(cohort_start_us: Long, k: Int, user_id: Long)

  def retention(events: Dataset[RetEvent], periodUs: Long,
      horizonPeriods: Int, delayThreshold: String): Dataset[RetOut] = {
    require(periodUs > 0, s"period must be positive, got $periodUs")
    require(horizonPeriods >= 1 && horizonPeriods <= 62,
      s"horizonPeriods must be in [1, 62] (64-bit mask), got $horizonPeriods")
    val spark = events.sparkSession
    import spark.implicits._
    val mask = (1L << (horizonPeriods + 1)) - 1L
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", delayThreshold)
      .as[RetEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RetState, RetOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[RetEvent], state: GroupState[RetState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            (0 to horizonPeriods).iterator
              .filter(k => (s.seen & (1L << k)) != 0L)
              .map(k => RetOut(s.cohortUs, k, uid))
          } else {
            var s = state.getOption.getOrElse(RetState(Long.MaxValue, 0L))
            batch.foreach { e =>
              if (e.ts_us >= 0) {
                val p = e.ts_us - e.ts_us % periodUs
                if (p < s.cohortUs) {
                  // cohort drops: every seen period renumbers up by the
                  // delta; bits sliding past the horizon fall off (they
                  // are > horizon periods after the FINAL cohort)
                  val shift =
                    if (s.cohortUs == Long.MaxValue) 0L
                    else (s.cohortUs - p) / periodUs
                  val shifted =
                    if (shift > horizonPeriods) 0L else s.seen << shift
                  s = RetState(p, shifted & mask)
                }
                val k = (p - s.cohortUs) / periodUs
                if (k <= horizonPeriods)
                  s = s.copy(seen = (s.seen | (1L << k)) & mask)
              }
            }
            state.update(s)
            // finalize once no admissible event can still arrive; a very
            // late first-seen user may already be past that point — then
            // the earliest allowed timeout (just past the watermark) emits
            // at the next trigger
            val wantMs = (s.cohortUs +
              (horizonPeriods.toLong + 1L) * periodUs) / 1000L
            state.setTimeoutTimestamp(
              math.max(wantMs, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }
}
