package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Last-touch conversion attribution — "which channel gets credit for
  * this purchase": each conversion event is attributed to the user's
  * latest STRICTLY-prior touch event within a lookback window, then
  * conversions and value are rolled up per touch type. The temporal pick
  * is exactly a strict backward as-of join with tolerance, so this
  * composes the custom [[graft.plans.AsOfJoin]] physical operator
  * (co-partitioned sort-merge, O(1) state per key) instead of the
  * O(conversions × touches) pair join a naive plan would run per user.
  *
  * Touches are pre-deduplicated to one row per (user, ts) — the touch
  * with the SMALLEST event id wins a same-microsecond tie — because the
  * as-of pick among time-equal right rows would otherwise be
  * engine-dependent (same determinism move as q_asof's purchase
  * pre-aggregation). Conversions with no touch inside the window are
  * attributed to `(none)`. Value is summed in exact integer cents.
  *
  * Output: (touch_type, n_conversions, cents_total).
  */
object Attribution {

  def lastTouch(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, conversionType: String, valueCol: String,
      lookbackUs: Long, tieCol: String = "event_id"): DataFrame = {
    require(lookbackUs > 0, s"lookback must be positive, got $lookbackUs")
    val conv = events.where(col(typeCol) === conversionType)
      .select(col(userCol), col(tsCol),
        floor(col(valueCol) * lit(100.0)).cast("long").as("__cents"))
    // repartition by the join key BEFORE the (user, ts) groupBy: hash(user)
    // satisfies both the aggregation's ClusteredDistribution and the as-of
    // join's requirement, so this side carries ONE exchange instead of
    // agg-shuffle + re-shuffle (the q_asof plan trick)
    val touches = events.where(col(typeCol) =!= conversionType)
      .repartition(col(userCol))
      .groupBy(col(userCol), col(tsCol))
      .agg(min(struct(col(tieCol), col(typeCol).as("t"))).as("__m"))
      .select(col(userCol), col(tsCol), col("__m.t").as("touch_type"))
    graft.plans.AsOfJoin.asof(conv, touches, keys = Seq(userCol),
        leftTime = tsCol, rightTime = tsCol, direction = "backward",
        strict = true, tolerance = lookbackUs)
      .select(coalesce(col("touch_type"), lit("(none)")).as("touch_type"),
        col("__cents"))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("__cents")).as("cents_total"))
  }
}
