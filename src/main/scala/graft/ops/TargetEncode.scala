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

  def encoderTable(df: DataFrame, categoryCol: String, target: Column,
      smoothing: Long = 20L): DataFrame = {
    require(smoothing >= 0, s"smoothing must be >= 0, got $smoothing")
    val base = df.select(col(categoryCol).as("category"),
      when(target, 1L).otherwise(0L).as("__t"))
    val per = base.groupBy(col("category"))
      .agg(count(lit(1)).as("n"), sum(col("__t")).as("n_pos"))
    val global = base.agg(
      expr("(1000000 * sum(__t)) div count(1)").as("__gppm"))
    per.crossJoin(broadcast(global))
      .withColumn("enc_ppm",
        expr(s"(1000000 * n_pos + $smoothing * __gppm) div (n + $smoothing)"))
      .select(col("category"), col("n"), col("n_pos"), col("enc_ppm"))
  }
}
