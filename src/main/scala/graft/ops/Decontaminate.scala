package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the curation step that keeps eval data out
  * of the training set. A training document is contaminated when too many
  * of its word n-grams also appear in the evaluation corpus (the public
  * n-gram-overlap method: GPT-3 appendix C / Dolma's decontamination use
  * 8–13-gram collision; we parameterize n and the overlap threshold).
  *
  * Shape at 100 TB: train-side shingles are an inverted index (one row per
  * distinct (doc, n-gram) — the same [[Dedup.shingles]] machinery the
  * dedup family uses), and the eval side collapses to ONE distinct n-gram
  * column. Eval corpora are benchmark-sized (≪ train), so the contamination
  * probe is a broadcast semi/inner join against the train shingles — no
  * shuffle of the 100 TB side beyond its own doc-keyed aggregation.
  * Set `broadcastEval = false` if the eval n-gram set outgrows the
  * driver's broadcast budget; the plan degrades to a shingle-keyed
  * shuffle join, still linear.
  */
object Decontaminate {

  /** Per-train-document n-gram overlap against the eval corpus:
    * (id, n_ngrams, n_contam, contam_permille). Documents shorter than
    * `n` tokens contribute their whole text as one shingle (inherited
    * from [[Dedup.shingles]]), so every train doc gets a row.
    * Integer per-mille (repo convention) keeps the threshold math exact
    * in any engine.
    */
  def ngramOverlap(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int, broadcastEval: Boolean = true): DataFrame = {
    val trainSh = Dedup.shingles(train, idCol, textCol, n)
    val evalShRaw = Dedup.shingles(eval, idCol, textCol, n)
      .select(col("shingle")).distinct()
    val evalSh = if (broadcastEval) broadcast(evalShRaw) else evalShRaw
    val sizes = trainSh.groupBy(col("id"))
      .agg(count(lit(1)).as("n_ngrams"))
    // evalSh is distinct on shingle, so the inner join cannot duplicate a
    // (doc, shingle) row — the per-doc count is the contaminated-shingle
    // count, not a multiplicity
    val hits = trainSh.join(evalSh, Seq("shingle"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_contam"))
    sizes.join(hits, Seq("id"), "left")
      .select(col("id"), col("n_ngrams"),
        coalesce(col("n_contam"), lit(0L)).as("n_contam"))
      .withColumn("contam_permille",
        expr("(n_contam * 1000) div n_ngrams"))
  }

  /** [[ngramOverlap]] plus the decision bit: `contaminated = 1` when the
    * overlap is at or above `thresholdPermille`. Callers filter on the
    * flag (drop) or keep it as a feature column (soft decontamination).
    */
  def flagContaminated(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int, thresholdPermille: Int,
      broadcastEval: Boolean = true): DataFrame = {
    require(thresholdPermille >= 0 && thresholdPermille <= 1000,
      s"threshold is per-mille in [0, 1000], got $thresholdPermille")
    ngramOverlap(train, eval, idCol, textCol, n, broadcastEval)
      .withColumn("contaminated",
        when(col("contam_permille") >= thresholdPermille, 1L).otherwise(0L))
  }

  /** Embedding-space decontamination — the semantic sibling of
    * [[ngramOverlap]]: a paraphrased eval item shares no 8-gram with its
    * source, but its embedding still sits next to it. A train vector is
    * contaminated when its cosine against ANY eval vector reaches
    * `threshold`.
    *
    * Topology mirrors the n-gram path: the eval corpus is benchmark-sized
    * (≪ train) and BROADCAST; the train side streams through one scan —
    * a broadcast nested-loop whose per-pair work is the codegen'd
    * [[graft.functions.ArrayDot]], followed by a train-id-keyed count
    * aggregation (partial-aggregated map-side, so the |train|·|eval|
    * pair stream never shuffles — only per-train-id hit counts do).
    * No driver vector state beyond the eval broadcast; train scale is
    * unbounded.
    *
    * Both sides must be pre-quantized via [[Similarity.quantize]]: dot
    * products and norms are then integer-valued doubles (exact to 2^53),
    * and `dot / sqrt(na·nb)` reproduces bit-identically in any engine
    * (the q_dedup_embed recipe). `excludeSelfId` skips the eval vector
    * with the train row's own id — correct when eval ⊆ train (a held-out
    * slice of one id space), false for unrelated corpora.
    *
    * Output: (id, n_eval, n_hits, max_cos, contaminated) — one row per
    * train vector; `max_cos` is NULL for an empty eval set.
    */
  def embedOverlap(train: DataFrame, idCol: String, vecCol: String,
      eval: DataFrame, evalIdCol: String, evalVecCol: String,
      threshold: Double, excludeSelfId: Boolean = true): DataFrame = {
    val dotC = graft.functions.ArrayDot.array_dot(col("__tv"), col("__ev"))
    val ev = eval.select(col(evalIdCol).as("__eid"),
      col(evalVecCol).as("__ev"),
      graft.functions.ArrayDot.array_dot(col(evalVecCol), col(evalVecCol))
        .as("__en"))
    val tr = train.select(col(idCol).as("id"), col(vecCol).as("__tv"),
      graft.functions.ArrayDot.array_dot(col(vecCol), col(vecCol))
        .as("__tn"))
    val pairs = tr.crossJoin(broadcast(ev))
      .where(if (excludeSelfId) col("id") =!= col("__eid") else lit(true))
      .withColumn("cos", dotC / sqrt(col("__tn") * col("__en")))
    pairs.groupBy(col("id"))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("cos") >= threshold, 1L).otherwise(0L)).as("n_hits"),
        max(col("cos")).as("max_cos"))
      .withColumn("contaminated",
        when(col("n_hits") > 0L, 1L).otherwise(0L))
  }
}
