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
  * behavior). Change batches must be unique per key (enforce upstream
  * with [[graft.SparkEntry]]-style latest-state compaction when a batch
  * can carry several ops for one key).
  *
  * Shape: one key-partitioned full-outer join; both sides shuffle once
  * on the key, payload columns are coalesced column-wise — no windows,
  * no driver state, unbounded snapshot size.
  */
object Merge {

  def applyChanges(base: DataFrame, keyCol: String, changes: DataFrame,
      opCol: String, payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one payload column")
    val b = base.select((col(keyCol).as("__k") +:
      payloadCols.map(c => col(c).as(s"__b_$c"))): _*)
    val c = changes.select((col(keyCol).as("__k") +: col(opCol).as("__op") +:
      payloadCols.map(cc => col(cc).as(s"__c_$cc"))): _*)
    b.join(c, Seq("__k"), "full_outer")
      .where(col("__op").isNull || col("__op") =!= "D")
      .select((col("__k").as(keyCol) +: payloadCols.map(cc =>
        when(col("__op").isNotNull, col(s"__c_$cc"))
          .otherwise(col(s"__b_$cc")).as(cc))): _*)
  }
}
