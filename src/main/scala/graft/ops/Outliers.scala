package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust outlier detection via median absolute deviation — the
  * monitoring primitive that survives the outliers it is looking for
  * (mean/stddev z-scores are dragged by the very tail they should flag;
  * the median/MAD pair has a 50% breakdown point).
  *
  * All statistics are EXACT integer order statistics (no interpolated
  * quantiles, no floating point):
  *
  *   med  = lower median of v        (rank ⌊(n+1)/2⌋ under v asc)
  *   mad  = lower median of |v−med|  (rank ⌊(n+1)/2⌋ under d asc)
  *   outlier ⇔ |v−med| > k·mad       (integer cross-multiplication)
  *
  * `k = 3` by default — the conventional "3 robust sigmas" once the
  * 1.4826 normal-consistency constant is folded in (3·1.4826 ≈ 4.45;
  * callers wanting the calibrated normal test pass kNum=4448, kDen=1000).
  * A group where more than half the values are identical has mad = 0 and
  * then EVERY deviating value is an outlier — the standard MAD edge case,
  * kept (it is the right answer for "this metric is normally constant").
  *
  * Shape: one group-keyed exchange, then two in-partition sorts (the
  * second window reuses the first's hash partitioning — no second
  * shuffle), a broadcast-sized per-group cut table joined back, one
  * final aggregation. Same scale posture as [[Normalize.winsorizeStats]]:
  * the per-group sort is the cost, so groups must fit a task's spill
  * budget — true for monitoring dimensions (metric × type), not for
  * per-user grouping at 100 TB (there, pre-aggregate per user first).
  *
  * Output: (groupCols..., n, med, mad, n_outliers).
  */
object Outliers {

  def madStats(df: DataFrame, valueCol: String, groupCols: Seq[String],
      kNum: Long = 3L, kDen: Long = 1L): DataFrame = {
    require(groupCols.nonEmpty, "madStats needs at least one group column")
    require(kNum > 0 && kDen > 0, s"k must be positive, got $kNum/$kDen")
    val grp = groupCols.map(col)
    val wv = Window.partitionBy(grp: _*).orderBy(col("__v"))
    val cw = Window.partitionBy(grp: _*)
    // ranked and devs each feed TWO consumers (the cut aggregation and
    // the join-back); persisted so the source is scanned and window-sorted
    // ONCE per stage instead of re-derived per consumer (plan-guarded:
    // q_outliers must stay a single source scan). The cut tables are one
    // row per group — broadcast, so the join-back keeps the window's hash
    // partitioning instead of re-exchanging the data side.
    val ranked = df
      .withColumn("__v", col(valueCol).cast("long"))
      .withColumn("__rn", row_number().over(wv))
      .withColumn("__n", count(lit(1)).over(cw))
      .withColumn("__rmed", expr("(__n + 1) div 2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val meds = ranked.groupBy(grp: _*)
      .agg(min(when(col("__rn") === col("__rmed"), col("__v"))).as("med"))
    // |v − med|, then the SAME order-statistic trick on the deviations;
    // the secondary __v sort key only pins row_number's tie order — every
    // row tied at the median rank carries the same __d, so the selected
    // statistic is deterministic either way
    val wd = Window.partitionBy(grp: _*).orderBy(col("__d"), col("__v"))
    val devs = ranked.join(broadcast(meds), groupCols)
      .withColumn("__d", abs(col("__v") - col("med")))
      .withColumn("__rd", row_number().over(wd))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mads = devs.groupBy(grp: _*)
      .agg(min(when(col("__rd") === col("__rmed"), col("__d"))).as("mad"))
    devs.join(broadcast(mads), groupCols)
      .groupBy(grp: _*)
      .agg(count(lit(1)).as("n"),
        min(col("med")).as("med"),
        min(col("mad")).as("mad"),
        sum(when(col("__d") * kDen > col("mad") * kNum, 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Per-row flags instead of the per-group rollup: the input rows plus
    * (med, mad, is_outlier) — for routing individual records to
    * quarantine rather than monitoring group health.
    */
  def flagOutliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
      kNum: Long = 3L, kDen: Long = 1L): DataFrame = {
    require(groupCols.nonEmpty, "flagOutliers needs at least one group column")
    val stats = madStats(df, valueCol, groupCols, kNum, kDen)
      .select((groupCols.map(col) :+ col("med") :+ col("mad")): _*)
    df.join(stats, groupCols)
      .withColumn("is_outlier",
        abs(col(valueCol).cast("long") - col("med")) * kDen >
          col("mad") * kNum)
  }
}
