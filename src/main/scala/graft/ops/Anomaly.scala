package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-rate spike detection — the monitoring primitive over the same
  * tumbling windows the analytics queries use: a window is a SPIKE for
  * its event type when its count exceeds `ratioNum/ratioDen` times the
  * mean of the previous `lookback` OBSERVED windows of that type
  * (windows with zero events are absent from the count table, so the
  * baseline skips gaps — documented semantics, not an accident).
  *
  * The threshold test is the cross-multiplied integer comparison
  * `n · nprior · ratioDen > baseSum · ratioNum` — no floating-point mean,
  * so the flags are bit-identical in any engine and the driver query
  * gets a hash-exact DuckDB oracle. Windows without a FULL lookback
  * history are never flagged (cold-start guard).
  *
  * Plan shape: one tumbling aggregation (type, window) — partial
  * map-side — then a per-type ordered window over the tiny count table.
  * The window state is `lookback` rows per type; at 100 TB the count
  * table is hours×types, not events.
  */
object Anomaly {

  def rateSpikes(events: DataFrame, tsCol: String, typeCol: String,
      windowUs: Long, lookback: Int = 3,
      ratioNum: Long = 2L, ratioDen: Long = 1L): DataFrame = {
    require(lookback >= 1 && ratioNum > 0 && ratioDen > 0,
      s"need lookback >= 1 and positive ratio (got $lookback, $ratioNum/$ratioDen)")
    val counts = Sessionize.tumbling(events, tsCol, windowUs)
      .groupBy(col(typeCol), col("window_start_us"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(typeCol)).orderBy(col("window_start_us"))
      .rowsBetween(-lookback, -1)
    counts
      .withColumn("base_sum", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("n_prior", count(col("n")).over(w))
      .withColumn("is_spike",
        col("n_prior") === lookback &&
          col("n") * col("n_prior") * ratioDen > col("base_sum") * ratioNum)
  }
}
