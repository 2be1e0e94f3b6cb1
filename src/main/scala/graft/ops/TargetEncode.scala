package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Smoothed target (mean) encoding — the standard high-cardinality
  * categorical-feature transform of a training-data pipeline: replace a
  * category by its empirical target rate, shrunk toward the global rate
  * so rare categories don't memorize their few labels,
  *
  *   enc(c) = (n_c · p_c + m · p̄) / (n_c + m)
  *
  * (m = smoothing pseudo-count; Micci-Barreca 2001's fixed-m variant).
  * All arithmetic is exact-integer in parts-per-million:
  *
  *   enc_ppm(c) = (1000000·pos_c + m·global_ppm) div (n_c + m),
  *   global_ppm = (1000000·pos_g) div n_g
  *
  * — truncating integer division only, so the encoding reproduces
  * hash-exactly in any engine (the repo's no-doubles-in-oracles
  * convention). This is the leakage-PRONE naive fit (encodes over the
  * same rows it aggregates); production folds would fit on train only —
  * the aggregation shape is identical, the split is [[Sampling.hashSplit]].
  *
  * Scale shape: one partial-aggregated groupBy over the category key
  * (map-side combine collapses each partition to one row per category
  * before the shuffle) + one 1-row global aggregate broadcast back. The
  * encoder TABLE is the output — joining it onto the corpus is the
  * caller's broadcast/shuffle decision, sized by category cardinality.
  *
  * Output: (category, n, n_pos, enc_ppm), one row per category.
  */
object TargetEncode {

  /** (category, n, n_pos) sufficient statistics — the part of the fit
    * that touches data. Also the streaming state shape
    * ([[graft.streaming.StreamTargetEncode]] maintains exactly this table
    * incrementally); [[encoderFromCounts]] derives the encoder from it,
    * so batch and stream share one derivation.
    */
  def categoryCounts(df: DataFrame, categoryCol: String,
      target: Column): DataFrame =
    df.select(col(categoryCol).as("category"),
        when(target, 1L).otherwise(0L).as("__t"))
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n"), sum(col("__t")).as("n_pos"))

  /** Encoder derivation over a (category, n, n_pos) table. The global
    * rate recomputes from the counts (Σ n_pos / Σ n — identical integers
    * to a row-level pass), so the input can be a live streaming-state
    * snapshot just as well as a fresh batch fit.
    */
  def encoderFromCounts(counts: DataFrame, smoothing: Long = 20L): DataFrame = {
    require(smoothing >= 0, s"smoothing must be >= 0, got $smoothing")
    val global = counts.agg(
      expr("(1000000 * sum(n_pos)) div sum(n)").as("__gppm"))
    counts.crossJoin(broadcast(global))
      .withColumn("enc_ppm",
        expr(s"(1000000 * n_pos + $smoothing * __gppm) div (n + $smoothing)"))
      .select(col("category"), col("n"), col("n_pos"), col("enc_ppm"))
  }

  def encoderTable(df: DataFrame, categoryCol: String, target: Column,
      smoothing: Long = 20L): DataFrame =
    encoderFromCounts(categoryCounts(df, categoryCol, target), smoothing)

  /** Target-leakage audit of the encoder — the classic failure mode of
    * mean encoding is that a row's own label leaks into its feature; the
    * leave-one-out gap quantifies it exactly. Per category (global rate
    * held fixed, the standard LOO convention):
    *
    *   loo_pos = (10⁶·(n_pos−1) + m·g) div (n−1+m)   — what a positive row sees
    *   loo_neg = (10⁶·n_pos     + m·g) div (n−1+m)   — what a negative row sees
    *   leak_gap = loo_neg − loo_pos                  — ≈ 10⁶/(n−1+m)
    *
    * A small category with a big gap is a memorized label, not a
    * feature. One-class sides report NULL (no such row exists to audit).
    * Same shape as the fit itself: counts + a broadcast global + pure
    * column algebra.
    *
    * Output: (category, n, n_pos, enc_ppm, loo_pos_ppm, loo_neg_ppm,
    * leak_gap_ppm).
    */
  def looLeakageAudit(df: DataFrame, categoryCol: String, target: Column,
      smoothing: Long = 20L): DataFrame = {
    require(smoothing >= 1,
      s"smoothing must be >= 1 for a defined LOO denominator, got $smoothing")
    val counts = categoryCounts(df, categoryCol, target)
    val global = counts.agg(
      expr("(1000000 * sum(n_pos)) div sum(n)").as("__gppm"))
    counts.crossJoin(broadcast(global))
      .withColumn("enc_ppm",
        expr(s"(1000000 * n_pos + $smoothing * __gppm) div (n + $smoothing)"))
      .withColumn("loo_pos_ppm",
        when(col("n_pos") >= 1L, expr(
          s"(1000000 * (n_pos - 1) + $smoothing * __gppm) div (n - 1 + $smoothing)"))
          .otherwise(lit(null)))
      .withColumn("loo_neg_ppm",
        when(col("n") - col("n_pos") >= 1L, expr(
          s"(1000000 * n_pos + $smoothing * __gppm) div (n - 1 + $smoothing)"))
          .otherwise(lit(null)))
      .withColumn("leak_gap_ppm", col("loo_neg_ppm") - col("loo_pos_ppm"))
      .select(col("category"), col("n"), col("n_pos"), col("enc_ppm"),
        col("loo_pos_ppm"), col("loo_neg_ppm"), col("leak_gap_ppm"))
  }
}
