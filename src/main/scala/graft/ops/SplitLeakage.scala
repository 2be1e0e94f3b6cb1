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
