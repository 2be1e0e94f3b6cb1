package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/test split contamination — the dataset-hygiene check every
  * training pipeline needs BEFORE the split ships: if two near-duplicate
  * documents land on opposite sides of the split, the held-out metric is
  * partially memorization. Deterministic md5 split assignment (the
  * q_sample identity-hash pattern — no RNG, any engine reproduces it)
  * crossed with a mined near-dup pair set; every cross-split pair is a
  * leak.
  *
  * Scale shape: the pair table is the output of the gated/banded dedup
  * family (never all-pairs), and this op adds one map (two md5 lanes per
  * pair) + one 3-row aggregate — nothing data-sized beyond the pairs
  * themselves.
  */
object SplitLeakage {

  /** 'test' when the id's md5 lane lands under `testPermille`, else
    * 'train' — a pure function of (salt, id). */
  def splitOf(id: Column, salt: String, testPermille: Int): Column =
    when(graft.functions.functions.hex_to_long(
        substring(md5(concat(lit(salt), id.cast("string"))), 1, 15))
        % 1000 < testPermille, lit("test"))
      .otherwise(lit("train"))

  /** Cross-corpus leak pairs — the monitor form of this audit: each
    * ARRIVING document (a candidate for the next data drop) is checked
    * for near-duplicates in the FROZEN reference corpus (what already
    * shipped), and a pair whose two md5 split assignments differ is a
    * leak event (the arriving doc would memorize across the boundary).
    * Candidate mining is the shingle inverted index (never all-pairs;
    * hot boilerplate shingles drop loudly via the [[Dedup]] cap), scored
    * by exact shingle-set Jaccard with sizes from the UNCAPPED sets (the
    * family verify discipline).
    *
    * Pure per-(newDocs, reference) function — no state — so the union of
    * per-micro-batch outputs equals the batch run however the stream is
    * chopped ([[graft.streaming.StreamSplitLeakage]] wraps exactly this).
    *
    * Output: (new_id, ref_id, n_shared, jaccard, split_new, split_ref,
    * is_leak) for pairs with Jaccard ≥ threshold.
    */
  def crossCorpusLeaks(newDocs: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, n: Int = 3, threshold: Double = 0.5,
      salt: String = "split", testPermille: Int = 200,
      maxBucketSize: Int = 1000): DataFrame = {
    require(testPermille >= 1 && testPermille <= 999,
      s"testPermille must be in [1, 999], got $testPermille")
    // r12 OPT (guide §2.3/§2.4): persist both shingle tables — each fed
    // 3 subtrees (cap/candidates/verify for ref; candidates/sizes/verify
    // for new), so the document tokenize+window pipeline ran SIX times
    // per call (6 parquet scans in the before-plan, plans/r12). And score
    // via per-doc shingle ARRAYS (the Dedup.verifyJaccard shape) instead
    // of re-joining each candidate against both full shingle tables: the
    // posting re-join exploded every candidate by its documents' whole
    // shingle sets and AQE coalesced the tiny-looking candidate side into
    // ONE task that then computed the whole fan-out alone (profiled 5.1 s
    // of a 9.0 s run at sf0.1). Shingle sets are distinct per id, so
    // |array_intersect| is the exact shared count and array sizes are the
    // exact UNCAPPED set sizes — output unchanged (oracle-verified).
    // CACHE CONTRACT (r13, VERDICT r12 item 4): these persists are
    // intra-query state on a LAZY return value, so the operator cannot
    // unpersist them itself — the consuming action is the caller's.
    // Short-lived sessions rely on LRU + ContextCleaner; long-lived
    // callers sweep like Bench.sweep (clearCache + getPersistentRDDs
    // unpersist), and the streaming wrapper (StreamSplitLeakage) releases
    // this pair after every micro-batch's sink returns.
    val shNew = Dedup.shingles(newDocs, idCol, textCol, n)
      .select(col("id").as("new_id"), col("shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shRef = Dedup.shingles(reference, idCol, textCol, n)
      .select(col("id").as("ref_id"), col("shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val refCapped = Dedup.capHotBuckets(shRef, Seq("shingle"),
      maxBucketSize, "crossCorpusLeaks")
    val cand = shNew.join(refCapped, "shingle")
      .select("new_id", "ref_id").distinct()
    val arrNew = shNew.groupBy("new_id")
      .agg(collect_list(col("shingle")).as("__sa"))
    val arrRef = shRef.groupBy("ref_id")
      .agg(collect_list(col("shingle")).as("__sb"))
    cand
      .join(arrNew, "new_id").join(arrRef, "ref_id")
      .select(col("new_id"), col("ref_id"),
        size(array_intersect(col("__sa"), col("__sb"))).cast("long")
          .as("n_shared"),
        size(col("__sa")).cast("long").as("sa"),
        size(col("__sb")).cast("long").as("sb"))
      .withColumn("jaccard", col("n_shared").cast("double") /
        (col("sa") + col("sb") - col("n_shared")))
      .where(col("jaccard") >= threshold)
      .withColumn("split_new", splitOf(col("new_id"), salt, testPermille))
      .withColumn("split_ref", splitOf(col("ref_id"), salt, testPermille))
      .withColumn("is_leak", col("split_new") =!= col("split_ref"))
      .select("new_id", "ref_id", "n_shared", "jaccard",
        "split_new", "split_ref", "is_leak")
  }

  /** Per unordered split-combo pair counts over a near-dup pair table:
    * (split_a, split_b, n_pairs, is_leak), split_a <= split_b; cross
    * combos are the leaks. */
  def crossSplitPairs(pairs: DataFrame, idA: String, idB: String,
      salt: String = "split", testPermille: Int = 200): DataFrame = {
    require(testPermille >= 1 && testPermille <= 999,
      s"testPermille must be in [1, 999], got $testPermille")
    val sa = splitOf(col(idA), salt, testPermille)
    val sb = splitOf(col(idB), salt, testPermille)
    pairs
      .select(least(sa, sb).as("split_a"), greatest(sa, sb).as("split_b"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("is_leak", col("split_a") =!= col("split_b"))
  }
}
