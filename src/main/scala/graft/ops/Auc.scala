package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact ROC-AUC via the Mann–Whitney U statistic — the standard "does
  * this score separate the classes" check every quality-scoring pipeline
  * needs before a threshold gets picked. No curve interpolation, no
  * floating point: with P positives, N negatives and ties handled by the
  * usual half-credit,
  *
  *   AUC = [ Σ_s p_s · (2·negBelow(s) + n_s) ] / (2·P·N)
  *
  * where the bracket is 2U — an integer (each tie contributes exactly
  * half, doubled away). We report `auc_permille = (1000·2U) div (2·P·N)`
  * plus the raw integer pieces, so any engine replays it bit-for-bit.
  * One-class groups (P=0 or N=0) report NULL — there is no ranking to
  * score.
  *
  * Scale shape: one (group, score)-keyed partial-aggregating count, then
  * a cumulative window over the AGGREGATED table — score-cardinality-
  * sized per group, not data-sized (pre-bucket continuous scores to
  * bound it) — and a group-keyed final aggregate.
  *
  * Output: (grp, n_pos, n_neg, u2, auc_permille) per group.
  */
object Auc {

  def aucByGroup(df: DataFrame, groupCol: String, scoreCol: String,
      labelCol: String): DataFrame = {
    val g = df.select(col(groupCol).cast("string").as("grp"),
        col(scoreCol).cast("long").as("score"),
        col(labelCol).cast("long").as("lab"))
      .where(col("grp").isNotNull && col("score").isNotNull &&
        col("lab").isNotNull)
      .groupBy("grp", "score")
      .agg(sum(col("lab")).as("p"),
        (count(lit(1)) - sum(col("lab"))).as("n"))
    val w = Window.partitionBy("grp").orderBy("score")
    val cum = g.withColumn("negIncl", sum(col("n")).over(w))
      .withColumn("negBelow", col("negIncl") - col("n"))
    cum.groupBy("grp")
      .agg(sum(col("p")).as("n_pos"), sum(col("n")).as("n_neg"),
        sum(col("p") * (lit(2L) * col("negBelow") + col("n"))).as("u2"))
      .select(col("grp"), col("n_pos"), col("n_neg"), col("u2"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          expr("(1000 * u2) div (2 * n_pos * n_neg)"))
          .otherwise(lit(null)).as("auc_permille"))
  }
}
