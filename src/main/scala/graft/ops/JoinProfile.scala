package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-join diagnostics — the profile a planner (or an engineer sizing a
  * pipeline) wants BEFORE running an expensive join: per-side row and
  * distinct-key counts, orphan rows (no partner), the hottest key's
  * multiplicity on each side, and the EXACT join output cardinality
  * Σ_k c_left(k)·c_right(k) — the number that says whether a key pair is
  * about to explode (skewed many-to-many) long before AQE finds out the
  * hard way.
  *
  * Cost: one count-aggregate per side (partial-aggregated, shuffles
  * distinct keys, never rows) + one full-outer merge of the two count
  * tables. All integers, one output row.
  */
object JoinProfile {

  def profile(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val lc = left.where(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("lc"))
    val rc = right.where(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("rc"))
    lc.join(rc, Seq("k"), "full_outer")
      .agg(
        sum(coalesce(col("lc"), lit(0L))).as("l_rows"),
        sum(coalesce(col("rc"), lit(0L))).as("r_rows"),
        sum(when(col("lc").isNotNull, 1L).otherwise(0L)).as("l_distinct"),
        sum(when(col("rc").isNotNull, 1L).otherwise(0L)).as("r_distinct"),
        sum(when(col("rc").isNull, col("lc")).otherwise(0L))
          .as("l_orphan_rows"),
        sum(when(col("lc").isNull, col("rc")).otherwise(0L))
          .as("r_orphan_rows"),
        max(coalesce(col("lc"), lit(0L))).as("l_max_multiplicity"),
        max(coalesce(col("rc"), lit(0L))).as("r_max_multiplicity"),
        sum(coalesce(col("lc"), lit(0L)) * coalesce(col("rc"), lit(0L)))
          .as("join_rows"))
  }
}
