package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous token-budget apportionment (26th module) — the streaming
  * twin of [[graft.ops.TokenBudget.allocate]]: per tumbling event-time
  * window, hand each group (source / domain / language) an integer quota
  * proportional to its observed token mass, quotas summing EXACTLY to the
  * per-window budget — the rolling data-mixing controller ("what should
  * the next training slice draw from each source, given what arrived this
  * window").
  *
  * Apportionment is a GLOBAL function of a window's complete group-mass
  * table (the largest-remainder rule ranks ALL groups by remainder), so
  * it cannot stream group-by-group; it keys state by WINDOW instead:
  * flatMapGroupsWithState with one (group → mass) map per open window,
  * folded as events arrive (order-independent long sums), and the shared
  * kernel [[graft.ops.TokenBudget.allocateLocal]] — the IDENTICAL
  * arithmetic the batch operator executes distributed — runs once when
  * the watermark closes the window (event-time timeout, the StreamFunnel
  * finalize-once discipline). Every emitted row is final under any
  * arrival order; stream ≡ batch per window is spec-pinned on shuffled
  * arrival.
  *
  * State bound, documented loudly: one map entry per DISTINCT GROUP per
  * open window — the group axis must be the small one (sources, not
  * documents; the batch operator is the path for unbounded group
  * domains). `maxGroups` raises rather than silently growing past the
  * contract.
  *
  * Output per closed window: (window_start_us, grp, sz, quota),
  * Σ quota = budget exactly per window.
  */
object StreamTokenBudget {

  case class BudEvent(grp: String, sz: Long, ts_us: Long)
  case class BudState(sums: Map[String, Long])
  case class BudOut(window_start_us: Long, grp: String, sz: Long, quota: Long)

  def windowedAllocate(events: Dataset[BudEvent], budget: Long,
      windowUs: Long, delayThreshold: String,
      maxGroups: Int = 65536): Dataset[BudOut] = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(windowUs > 0, s"window must be positive, got $windowUs")
    require(maxGroups >= 1, s"maxGroups must be >= 1, got $maxGroups")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", delayThreshold)
      .as[BudEvent]
      .groupByKey(e => e.ts_us - math.floorMod(e.ts_us, windowUs))
      .flatMapGroupsWithState[BudState, BudOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (winStartUs: Long, batch: Iterator[BudEvent],
            state: GroupState[BudState]) =>
          if (state.hasTimedOut) {
            val sums = state.get.sums
            state.remove()
            // groups with zero-or-positive mass apportion; the kernel
            // drops negative totals and nulls exactly like the batch op
            graft.ops.TokenBudget.allocateLocal(sums.toSeq, budget)
              .iterator.map { case (g, s, q) => BudOut(winStartUs, g, s, q) }
          } else {
            var sums = state.getOption.map(_.sums).getOrElse(Map.empty)
            batch.foreach { e =>
              if (e.grp != null) {
                sums = sums.updated(e.grp, sums.getOrElse(e.grp, 0L) + e.sz)
                require(sums.size <= maxGroups,
                  s"stream token budget: window $winStartUs exceeds " +
                    s"$maxGroups distinct groups — the group axis must be " +
                    "the small one; use the batch operator for unbounded " +
                    "group domains")
              }
            }
            state.update(BudState(sums))
            val wantMs = (winStartUs + windowUs) / 1000L
            state.setTimeoutTimestamp(
              math.max(wantMs, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }
}
