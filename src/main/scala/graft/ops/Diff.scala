package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the change-data audit primitive: given two versions of
  * a keyed table, emit one row per key that was ADDED, REMOVED, or
  * CHANGED (compared on `valueCols`), with both versions' values side by
  * side. The "what moved between yesterday's build and today's"
  * question behind regression gates, reconciliation jobs, and CDC
  * backfills.
  *
  * Shape: ONE full-outer equi-join on the key columns — the scalable
  * diff (both sides shuffle by key once; no collect, no sort). Presence
  * is tracked by explicit flags, not value nullability, so null-valued
  * columns diff correctly. Keys must be unique per side (the caller
  * aggregates first — a diff of non-unique keys is not well-defined).
  * Unchanged keys are dropped; `changed` compares with null-safe
  * equality.
  *
  * Output: (change, keyCols..., old_<v>/new_<v> per value column).
  */
object Diff {

  def diffSnapshots(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diff needs at least one key column")
    require(valueCols.nonEmpty, "diff needs at least one value column")
    val o = oldDf.select((keyCols.map(col) ++
      valueCols.map(c => col(c).as(s"old_$c")) :+
      lit(true).as("__in_old")): _*)
    val n = newDf.select((keyCols.map(col) ++
      valueCols.map(c => col(c).as(s"new_$c")) :+
      lit(true).as("__in_new")): _*)
    val joined = o.join(n, keyCols, "full_outer")
      .withColumn("__old", coalesce(col("__in_old"), lit(false)))
      .withColumn("__new", coalesce(col("__in_new"), lit(false)))
    val differs = valueCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    joined
      .withColumn("change",
        when(!col("__old"), lit("added"))
          .when(!col("__new"), lit("removed"))
          .when(differs, lit("changed")))
      .where(col("change").isNotNull)
      .select((col("change") +: keyCols.map(col)) ++
        valueCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }
}
