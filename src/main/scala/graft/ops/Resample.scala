package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series resampling: collapse an event stream to fixed buckets with
  * open/high/low/close/count summaries per (group, bucket) — the
  * downsampling step dashboards and seasonality models consume instead
  * of raw events.
  *
  * Open/close are selected WITHOUT a window sort: min/max over
  * (ts, id, value) structs — the struct comparison resolves on the
  * unique (ts, id) prefix, so one partial-aggregated hash aggregate
  * replaces the per-bucket sort (the q_latest_state shape). All values
  * are exact integer micro-units.
  *
  * Output: (group, bucket_start_us, n, open, high, low, close).
  */
object Resample {

  def ohlc(df: DataFrame, groupCol: String, tsUsCol: String,
      idCol: String, valueUsCol: String, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    df.select(col(groupCol).as("grp"),
        (col(tsUsCol) - pmod(col(tsUsCol), lit(bucketUs)))
          .as("bucket_start_us"),
        col(tsUsCol).as("__ts"), col(idCol).as("__id"),
        col(valueUsCol).as("__v"))
      .groupBy("grp", "bucket_start_us")
      .agg(count(lit(1)).as("n"),
        min(struct(col("__ts"), col("__id"), col("__v"))).as("__o"),
        max(col("__v")).as("high"),
        min(col("__v")).as("low"),
        max(struct(col("__ts"), col("__id"), col("__v"))).as("__c"))
      .select(col("grp"), col("bucket_start_us"), col("n"),
        col("__o.__v").as("open"), col("high"), col("low"),
        col("__c.__v").as("close"))
  }

  /** Seasonality profile: per (group, hour-of-day) event counts plus the
    * per-mille share of the group's total — the weekly-rhythm fingerprint
    * behind anomaly baselines. One aggregation + a tiny per-group total
    * joined back (broadcast-sized: |groups| rows).
    */
  def hourlyProfile(df: DataFrame, groupCol: String,
      tsUsCol: String): DataFrame = {
    // the 24-row-per-group count table feeds the totals rollup AND the
    // share join — persist so events are scanned once, not per consumer
    val hours = df.select(col(groupCol).as("grp"),
        pmod((col(tsUsCol).cast("long") / lit(3600000000L)).cast("long"),
          lit(24L)).as("hour"))
      .groupBy("grp", "hour").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = hours.groupBy("grp").agg(sum(col("n")).as("tot"))
    hours.join(broadcast(totals), Seq("grp"))
      .select(col("grp"), col("hour"), col("n"),
        expr("(1000 * n) div tot").as("share_permille"))
  }
}
