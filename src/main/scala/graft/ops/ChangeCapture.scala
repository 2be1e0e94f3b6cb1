package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2-style change capture — compress an append-only event log into
  * per-key STATE INTERVALS: one row per maximal run of equal consecutive
  * state values, with `valid_from_us` / `valid_to_us` (half-open, next
  * change's timestamp; null while current) and a 1-based `version`. This
  * is the lakehouse "apply the change log" primitive: the output is the
  * slowly-changing-dimension table a MERGE would maintain, derived
  * deterministically from the raw log.
  *
  * Order within a key is (`tsCol`, `tieCol`) — the unique tie column makes
  * it total, so run boundaries are engine-independent and the driver query
  * gets a hash-exact DuckDB oracle (lag → filter → lead mirrors 1:1).
  * Runs are value-based: a key that goes A → B → A yields three intervals
  * (versions 1..3), not two.
  *
  * Plan shape at 100 TB: ONE key-partitioned sort window computes the lag,
  * the change-point filter drops every in-run row BEFORE the second window
  * runs, and lead/row_number reuse the same partitioning (no second
  * shuffle — the filter preserves the child's hash distribution, only the
  * intra-partition sort is re-checked). State per key is one row in
  * flight; nothing driver-side.
  */
object ChangeCapture {

  def stateIntervals(log: DataFrame, keyCol: String, tsCol: String,
      stateCol: String, tieCol: String): DataFrame = {
    val seq = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changes = log
      .select(col(keyCol), col(tsCol), col(tieCol), col(stateCol))
      .withColumn("__prev", lag(col(stateCol), 1).over(seq))
      .where(col("__prev").isNull || col("__prev") =!= col(stateCol))
    // second window over change points only: same partition key, so the
    // exchange introduced for `seq` is reused (sort-only re-shape)
    val runs = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    changes
      .withColumn("valid_to_us", lead(col(tsCol), 1).over(runs))
      .withColumn("version", row_number().over(runs))
      .select(col(keyCol), col(stateCol),
        col(tsCol).as("valid_from_us"), col("valid_to_us"),
        col("version").cast("long").as("version"),
        col("valid_to_us").isNull.as("is_current"))
  }
}
