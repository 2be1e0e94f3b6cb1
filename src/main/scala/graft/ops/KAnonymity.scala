package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity audit over quasi-identifier columns (Sweeney 2002) — the
  * privacy-hygiene check a training-data release runs before shipping
  * user-derived tables: every row whose quasi-identifier combination is
  * shared by fewer than k rows is re-identifiable by linkage.
  *
  * [[classSizes]] is the audit surface: one row per equivalence class
  * (distinct quasi-identifier combination) with its size and an `at_risk`
  * 0/1 flag (n < k). Suppressing or generalizing the flagged classes is
  * the caller's policy decision; joining the flag back onto the data is
  * one broadcast/shuffle join keyed by the same columns.
  *
  * Scale shape: ONE partial-aggregated groupBy on the quasi-identifier
  * key — map-side combine collapses each partition to one row per class
  * before the shuffle, so the exchange carries classes, not rows. No
  * window, no collect.
  */
object KAnonymity {

  def classSizes(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "k-anonymity needs at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", when(col("n") < k, 1L).otherwise(0L))
  }

  /** One-row rollup of [[classSizes]]: class counts, at-risk classes, and
    * the number of ROWS living in at-risk classes (the actual exposure).
    */
  def riskSummary(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame =
    classSizes(df, quasiCols, k).agg(
      count(lit(1)).as("n_classes"),
      sum(col("at_risk")).as("n_at_risk_classes"),
      sum(col("n") * col("at_risk")).as("n_rows_at_risk"),
      min(col("n")).as("min_class"),
      max(col("n")).as("max_class"))

  /** Distinct ℓ-diversity audit (Machanavajjhala 2007) — k-anonymity's
    * necessary companion: a large QI class is still unsafe when everyone
    * in it shares the SAME sensitive value (homogeneity attack). Per QI
    * class: row count, distinct sensitive values, the largest single
    * sensitive value's frequency (the homogeneity measure), and the
    * pass/fail flag `n_sensitive >= l`.
    *
    * Two stacked partial-aggregating groupBys — (QI, sensitive) then QI —
    * both map-side combined; output is QI-class-dimension-sized.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "l-diversity needs at least one quasi-identifier")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_sensitive"),
        max(col("__n")).as("max_sens_n"))
      .withColumn("is_diverse", col("n_sensitive") >= l)
  }
}
