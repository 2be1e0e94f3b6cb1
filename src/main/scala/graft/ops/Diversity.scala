package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Simpson diversity of a categorical composition — the probability
  * that two random members of a group share a category, exactly:
  * λ = Σ n_c(n_c−1) / (N(N−1)). Corpus governance reads this per
  * (language → source): λ→1 means one feed dominates the slice (a
  * single-point-of-failure corpus), λ→0 means even mixing. Unlike the
  * Shannon entropy it needs no logarithm, so the value is an exact
  * integer ppm on both engines.
  *
  * Shape: two nested partial-aggregated groupBys — (grp, cat) counts,
  * then the per-grp rollup. Groups with fewer than two members are
  * dropped (λ undefined). Output: (grp, n, n_cats, simpson_ppm).
  */
object Diversity {

  def simpsonIndex(df: DataFrame, grpCol: String, catCol: String): DataFrame =
    df.select(col(grpCol).as("grp"), col(catCol).as("cat"))
      .groupBy("grp", "cat").agg(count(lit(1)).as("n_c"))
      .groupBy("grp")
      .agg(sum(col("n_c")).as("n"),
        count(lit(1)).as("n_cats"),
        sum(col("n_c") * (col("n_c") - 1L)).as("pairs_same"))
      .where(col("n") >= 2L)
      .select(col("grp"), col("n"), col("n_cats"),
        expr("(1000000 * pairs_same) div (n * (n - 1))").as("simpson_ppm"))
      .orderBy("grp")
}
