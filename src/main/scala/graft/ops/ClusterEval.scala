package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering-agreement metrics by pair counting — how well one
  * partition (dedup clusters, LPA communities, k-means cells) matches
  * another (ground-truth labels, last week's run): every unordered item
  * pair is a trial, agreement means "same cluster in both" or "different
  * in both". All counts derive from the (label_a, label_b) contingency
  * table in exact integers:
  *
  *   TP = Σ_ij C(n_ij,2),  FP = Σ_a C(n_a,2) − TP,  FN = Σ_b C(n_b,2) − TP,
  *   TN = C(n,2) − TP − FP − FN
  *
  * Rand index, pair precision/recall and purity are floored permilles of
  * those sums — no expectation correction (ARI's E term is fractional;
  * the raw sums are all there for anyone who wants it downstream).
  *
  * Scale shape: one node-keyed join + a contingency groupBy (output is
  * |A-labels|×|B-labels| bounded), then label-keyed and 1-row rollups —
  * partial-aggregating throughout, no windows, no driver state.
  *
  * Output (one row): (n_items, tp, fp, fn, tn, rand_permille,
  * pair_precision_permille, pair_recall_permille, purity_permille).
  */
object ClusterEval {

  /** `a` and `b` each carry (node, label); items present in both sides
    * are evaluated (inner-join semantics, like modularity).
    */
  def pairConfusion(a: DataFrame, b: DataFrame): DataFrame = {
    val j = a.select(col("node").cast("string").as("node"),
        col("label").cast("string").as("la"))
      .join(b.select(col("node").cast("string").as("node"),
        col("label").cast("string").as("lb")), Seq("node"))
    val cont = j.groupBy("la", "lb").agg(count(lit(1)).as("nij"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val core = cont.agg(
      sum(col("nij")).as("n_items"),
      sum(expr("(nij * (nij - 1)) div 2")).as("tp"))
    val sa = cont.groupBy("la").agg(sum(col("nij")).as("na"))
      .agg(sum(expr("(na * (na - 1)) div 2")).as("sa"))
    val sb = cont.groupBy("lb").agg(sum(col("nij")).as("nb"))
      .agg(sum(expr("(nb * (nb - 1)) div 2")).as("sb"))
    val pur = cont.groupBy("la").agg(max(col("nij")).as("mx"))
      .agg(sum(col("mx")).as("pure"))
    core.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .crossJoin(broadcast(pur))
      .select(col("n_items"), col("tp"),
        (col("sa") - col("tp")).as("fp"),
        (col("sb") - col("tp")).as("fn"),
        (expr("(n_items * (n_items - 1)) div 2")
          - col("sa") - col("sb") + col("tp")).as("tn"),
        col("sa"), col("sb"), col("pure"))
      .select(col("n_items"), col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("n_items") >= 2L,
          expr("(1000 * (tp + tn)) div ((n_items * (n_items - 1)) div 2)"))
          .otherwise(lit(null)).as("rand_permille"),
        when(col("sa") > 0L, expr("(1000 * tp) div sa"))
          .otherwise(lit(null)).as("pair_precision_permille"),
        when(col("sb") > 0L, expr("(1000 * tp) div sb"))
          .otherwise(lit(null)).as("pair_recall_permille"),
        when(col("n_items") > 0L, expr("(1000 * pure) div n_items"))
          .otherwise(lit(null)).as("purity_permille"))
  }
}
