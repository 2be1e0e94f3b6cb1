package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohen's κ — chance-corrected agreement between two binary raters
  * (two labeling heuristics, a model vs. a rule, two annotation
  * passes): κ = (p_o − p_e)/(1 − p_e) with p_e the agreement expected
  * from each rater's marginal rates. The quantity every labeling
  * pipeline should report instead of raw agreement — two raters that
  * both say "yes" 95% of the time agree 90.5% by luck alone.
  *
  * Exact integer arithmetic: multiplying through by n² gives
  * num = n·agree − (a₁b₁ + a₀b₀) and den = n² − (a₁b₁ + a₀b₀), and κ
  * is emitted in signed permille with magnitude and sign divided
  * separately (num may be negative — raters agreeing LESS than
  * chance; Spark truncates and DuckDB floors signed division, so the
  * split is load-bearing). Bounds: n² must fit a Long ⇒ n ≤ 3·10⁹
  * rows, far above any labeled sample. Degenerate raters (p_e = 1:
  * both constant and equal) have undefined κ — emitted as 0 with
  * den = 0 visible alongside.
  *
  * Shape: ONE partial-aggregated scan — four conditional sums — and a
  * scalar projection; nothing else.
  */
object Agreement {

  /** Reliability (calibration) bins — does a [0,1] score MEAN what it
    * claims? Rows bin by ⌊score·nBins⌋ and each bin reports its exact
    * positive rate in ppm; a calibrated score has rate_ppm tracking the
    * bin index. The floor of an identically-shaped double expression is
    * engine-portable (the same contract q_quality itself relies on), and
    * everything after the floor is integer. One partial-aggregated pass.
    * Output: (bin, n, n_pos, rate_ppm).
    */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2 && nBins <= 1000, s"nBins must be in [2,1000], got $nBins")
    df.select(floor(col(scoreCol) * nBins).cast("long").as("bin"),
        col(labelCol).cast("boolean").as("lab"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("lab"), 1L).otherwise(0L)).as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("(1000000 * n_pos) div n").as("rate_ppm"))
      .orderBy("bin")
  }

  def cohensKappa(df: DataFrame, raterACol: String,
      raterBCol: String): DataFrame = {
    df.select(col(raterACol).cast("boolean").as("a"),
        col(raterBCol).cast("boolean").as("b"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("agree"),
        sum(when(col("a"), 1L).otherwise(0L)).as("a_pos"),
        sum(when(col("b"), 1L).otherwise(0L)).as("b_pos"))
      .withColumn("chance",
        col("a_pos") * col("b_pos") +
          (col("n") - col("a_pos")) * (col("n") - col("b_pos")))
      .select(col("n"), col("agree"), col("a_pos"), col("b_pos"),
        (col("n") * col("agree") - col("chance")).as("num"),
        (col("n") * col("n") - col("chance")).as("den"))
      .withColumn("kappa_permille",
        when(col("den") === 0L, lit(0L))
          .otherwise(signum(col("num")).cast("long") *
            expr("(1000 * abs(num)) div den")))
  }
}
