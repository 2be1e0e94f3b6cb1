package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO emulation — the lakehouse upsert primitive without a table
  * format: apply a keyed change batch (insert/update/delete) to a
  * snapshot in ONE full-outer join, producing the next snapshot. This is
  * the batch core of every CDC-apply pipeline; [[ChangeCapture]] watches
  * the history, this op advances the state.
  *
  * Semantics per key: only-in-base → unchanged; change row with
  * `op = 'D'` → dropped; any other change row → the change's payload
  * wins (so 'U' on a missing key inserts — standard WHEN NOT MATCHED
  * behavior). Change batches must be unique per key — a batch with two
  * rows for one key would silently fan the snapshot out through the
  * full-outer join, so by default the plan carries an executor-side
  * guard (per-key change counts + `assert_true`) that FAILS the job
  * loudly on the first duplicate non-null key instead (ADVICE r7);
  * disable it only when uniqueness is already enforced upstream (e.g.
  * latest-state compaction) and the extra keyed aggregate matters.
  *
  * Shape: one key-partitioned full-outer join; both sides shuffle once
  * on the key, payload columns are coalesced column-wise — no windows,
  * no driver state, unbounded snapshot size. The guard adds one
  * aggregate + join co-partitioned on the same key, and no driver
  * action (the operator stays lazy).
  */
object Merge {

  def applyChanges(base: DataFrame, keyCol: String, changes: DataFrame,
      opCol: String, payloadCols: Seq[String],
      enforceUniqueChanges: Boolean = true): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one payload column")
    val b = base.select((col(keyCol).as("__k") +:
      payloadCols.map(c => col(c).as(s"__b_$c"))): _*)
    val c0 = changes.select((col(keyCol).as("__k") +: col(opCol).as("__op") +:
      payloadCols.map(cc => col(cc).as(s"__c_$cc"))): _*)
    val c =
      if (!enforceUniqueChanges) c0
      else {
        val dup = c0.groupBy(col("__k")).agg(count(lit(1)).as("__cnt"))
          .where(col("__cnt") > 1L)
        c0.join(dup, Seq("__k"), "left")
          // assert_true yields NULL when the predicate holds and throws
          // otherwise; as a filter it cannot be pruned away, so every
          // surviving change row has a provably unique non-null key
          .where(assert_true(col("__cnt").isNull,
            concat(lit("applyChanges: change batch has multiple rows for key "),
              col("__k").cast("string"))).isNull)
          .drop("__cnt")
      }
    b.join(c, Seq("__k"), "full_outer")
      .where(col("__op").isNull || col("__op") =!= "D")
      .select((col("__k").as(keyCol) +: payloadCols.map(cc =>
        when(col("__op").isNotNull, col(s"__c_$cc"))
          .otherwise(col(s"__b_$cc")).as(cc))): _*)
  }
}
