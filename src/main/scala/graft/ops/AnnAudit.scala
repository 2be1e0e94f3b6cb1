package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN quality audit — recall@k of an approximate ranking against exact
  * ground truth, the [[BlockingQuality]] counterpart for the similarity
  * family: before anyone trusts an LSH/IVF/PQ index at corpus scale,
  * measure how much of the true top-k it actually surfaces, per query.
  *
  * Integer-exact: `recall_permille = (1000 · n_hits) div n_truth` — the
  * denominator is the TRUTH list size (which can be < k on small or
  * filtered corpora), hits are counted by (query, neighbor) identity, so
  * the audit is insensitive to rank disagreements inside the list.
  *
  * Scale shape: one (query, neighbor)-keyed left join between two
  * already-k-bounded lists (≤ k rows per query each) + a query-keyed
  * partial-aggregating count. The expensive parts — building the two
  * rankings — are the callers' operators, measured as they actually run.
  */
object AnnAudit {

  /** `truth` and `approx` both carry (query_id, neighbor_id) rows (rank
    * columns welcome, ignored). Output: one row per TRUTH query —
    * (query_id, n_truth, n_hits, recall_permille), ordered by query.
    * Queries the approximate index missed entirely still appear (0 hits);
    * approx-only queries do not (no truth to recall against).
    */
  def recallAtK(truth: DataFrame, approx: DataFrame): DataFrame = {
    val t = truth.select(col("query_id"), col("neighbor_id"))
    val a = approx.select(col("query_id"), col("neighbor_id"),
      lit(1L).as("__hit"))
    t.join(a, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      .select(col("query_id"), col("n_truth"), col("n_hits"),
        expr("(1000 * n_hits) div n_truth").as("recall_permille"))
      .orderBy("query_id")
  }
}
