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
