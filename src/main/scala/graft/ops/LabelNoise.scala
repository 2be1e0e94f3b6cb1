package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** kNN label-noise audit (confident-learning lite) — "which label
  * classes are dirty": a point whose k nearest neighbors MOSTLY carry a
  * different label is a likely mislabel, and the per-class flag rate is
  * the standard triage signal before training on a labeled corpus.
  *
  * Deterministic and oracle-exact: vectors quantize to the 1e4 integer
  * grid (the knnShapley/ANN convention), distance is exact integer
  * squared L2, neighbors rank by (dist asc, id asc). The top-k selection
  * is the k-slot [[graft.functions.TopKByAgg]] aggregate with payload
  * `train_id·2 + eq` — the tie-break compares payloads, and eq ∈ {0,1}
  * < 2 keeps payload order ≡ train_id order, so ranking matches the
  * oracle's `ROW_NUMBER() OVER (ORDER BY dist, train_id)` exactly while
  * the agreement bit rides along for free (no re-join).
  *
  * Id domain contract: ids must be NON-NEGATIVE and < 2^62. The payload
  * encoding `train_id·2 + eq` would overflow Long above 2^62, and the
  * probe filter uses `pmod` while the oracle uses `%` — the two agree
  * only on non-negative ids. The eq-bit decode uses `pmod(payload, 2)`
  * so a contract violation yields eq ∈ {0,1} rather than −1, but the
  * ranking itself is only oracle-exact inside the documented domain.
  *
  * Scale contract: exact brute force over a SAMPLED probe set
  * (`probeModulus`) against the full reference side — the audit's cost
  * is the broadcast(probe) nested-loop join, exactly the documented
  * knnShapley trade; at cluster scale the probe set is the knob, or the
  * candidate set comes from the LSH/IVF family instead of brute force.
  *
  * Output per label class: (label, n_probes, n_flagged, flag_permille,
  * agree_ppm) where flagged = strict minority agreement (2·eq_k <
  * k_eff, with k_eff = actual neighbor count ≤ k) and
  * agree_ppm = (10⁶·Σ eq_k) div (Σ k_eff).
  */
object LabelNoise {

  def knnLabelAudit(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int, probeModulus: Long): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    require(probeModulus >= 2, s"probeModulus must be >= 2, got $probeModulus")
    val q = df.select(col(idCol).cast("long").as("id"),
      expr(s"transform($vecCol, x -> " +
        "CAST(FLOOR(CAST(x AS DOUBLE) * 10000.0) AS BIGINT))").as("v"),
      col(labelCol).cast("long").as("lab"))
    val probe = q.where(pmod(col("id"), lit(probeModulus)) === 0L)
      .select(col("id").as("probe_id"), col("v").as("pv"),
        col("lab").as("plab"))
    // widen(): the reference side streams O(|probes|·dim) work per row
    // through the broadcast nested-loop join — a single-file scan must
    // not funnel it into one task (Similarity.widen, r10 probe lesson)
    val ref = Similarity.widen(q.select(col("id").as("train_id"),
      col("v").as("rv"), col("lab").as("rlab")), "train_id")
    val pairs = broadcast(probe).join(ref,
        col("probe_id") =!= col("train_id")) // self is never a neighbor
      .select(col("probe_id"), col("plab"),
        expr("aggregate(zip_with(pv, rv, (x, y) -> (x - y) * (x - y)), " +
          "0L, (acc, d) -> acc + d)").as("dist"),
        col("train_id"),
        when(col("plab") === col("rlab"), 1L).otherwise(0L).as("eq"))
    // −dist cast to Double for the k-slot ranking: exact while
    // dist < 2^53 (grid is 1e4·unit-scale values, so dim·(2e4·range)²
    // must stay under 9e15 — holds for any normalized-embedding input);
    // beyond that, ordering could diverge from the oracle's exact
    // integer ROW_NUMBER — same documented bound as Bm25.topKDocs.
    val topk = pairs
      .groupBy(col("probe_id"), col("plab"))
      .agg(graft.functions.TopKByAgg.top_k_by(
        (lit(0L) - col("dist")).cast("double"),
        col("train_id") * 2L + col("eq"), k).as("arr"))
      .select(col("probe_id"), col("plab"),
        expr("aggregate(arr, 0L, (acc, x) -> acc + pmod(x.neighbor_id, 2L))")
          .as("eq_k"),
        size(col("arr")).cast("long").as("k_eff"))
    topk.groupBy(col("plab").as("label"))
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("eq_k") * 2L < col("k_eff"), 1L).otherwise(0L))
          .as("n_flagged"),
        sum(col("eq_k")).as("eq_sum"),
        sum(col("k_eff")).as("k_sum"))
      .select(col("label"), col("n_probes"), col("n_flagged"),
        expr("(1000 * n_flagged) div n_probes").as("flag_permille"),
        expr("(1000000 * eq_sum) div k_sum").as("agree_ppm"))
  }
}
