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

  /** Reciprocal rank of the TRUE nearest neighbor (the truth list's
    * rank-1 row) inside the approximate list: the "did the index put the
    * right answer near the top" number, `rr_ppm = 1_000_000 div rank`,
    * 0 when the index missed it entirely. Per-query rows; average
    * downstream if one number is wanted.
    */
  def reciprocalRank(truth: DataFrame, approx: DataFrame): DataFrame = {
    val t1 = truth.where(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id"))
    val a = approx.select(col("query_id"), col("neighbor_id"),
      col("rank").cast("long").as("__r"))
    t1.join(a, Seq("query_id", "neighbor_id"), "left")
      .select(col("query_id"),
        coalesce(col("__r"), lit(0L)).as("first_rank"),
        when(col("__r").isNotNull, expr("1000000 div __r"))
          .otherwise(lit(0L)).as("rr_ppm"))
      .orderBy("query_id")
  }

  /** Fixed ppm discounts floor(1e6 / log2(i+1)) for ranks 1..10 — a
    * LITERAL table, identical in any engine, so NDCG needs no runtime
    * logarithm anywhere. */
  val NdcgWeightsPpm: Seq[Long] = Seq(1000000L, 630929L, 500000L, 430676L,
    386852L, 356207L, 333333L, 315464L, 301029L, 289064L)

  /** Binary-relevance NDCG@k: relevance 1 iff the approx row's neighbor
    * appears ANYWHERE in the truth list; DCG sums the [[NdcgWeightsPpm]]
    * discount at each approx rank ≤ k, IDCG the first min(|truth|, k)
    * discounts. Output per truth query: (query_id, dcg_ppm, idcg_ppm,
    * ndcg_ppm) with `ndcg_ppm = (1_000_000 · dcg) div idcg`.
    */
  def ndcgAtK(truth: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= NdcgWeightsPpm.length,
      s"k must be in [1, ${NdcgWeightsPpm.length}], got $k")
    val w = array(NdcgWeightsPpm.map(lit): _*)
    val t = truth.select(col("query_id"), col("neighbor_id"),
      lit(1L).as("__rel"))
    val tSizes = truth.groupBy("query_id")
      .agg(count(lit(1)).as("__nt"))
    val gains = approx.where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("int").as("__r"))
      .join(t, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(sum(when(col("__rel").isNotNull,
        element_at(w, col("__r"))).otherwise(lit(0L))).as("dcg_ppm"))
    val idcgPrefix = NdcgWeightsPpm.scanLeft(0L)(_ + _)
    tSizes
      .select(col("query_id"),
        element_at(array(idcgPrefix.map(lit): _*),
          least(col("__nt"), lit(k.toLong)).cast("int") + 1)
          .as("idcg_ppm"))
      .join(gains, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("dcg_ppm"), lit(0L)).as("dcg_ppm"), col("idcg_ppm"),
        when(col("idcg_ppm") > 0L,
          expr("(1000000 * coalesce(dcg_ppm, 0)) div idcg_ppm"))
          .otherwise(lit(0L)).as("ndcg_ppm"))
      .orderBy("query_id")
  }
}
