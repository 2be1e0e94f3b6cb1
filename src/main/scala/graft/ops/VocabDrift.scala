package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocabulary-drift monitoring between corpus slices: hash every token
  * occurrence into `buckets` md5 buckets, normalize each slice's bucket
  * counts to per-mille, and compare slices by TOTAL VARIATION distance
  * (half the L1; reported as the integer L1 in per-mille, range
  * 0..2000) — "how differently do these two sources speak?" without a
  * vocabulary join. The bucketed L1 lower-bounds the true distributional
  * L1 (hashing only merges mass), which is exactly the monitoring
  * direction: an alarm on the sketch is an alarm on the truth.
  *
  * All integer arithmetic (counts → per-mille by truncating division →
  * absolute differences), so the result is hash-exact in any engine.
  * KL/JS divergences need logs — not oracle-portable (repo convention);
  * total variation is the standard log-free drift metric.
  *
  * Shape at 100 TB: one token scan → (slice, bucket) counts
  * (partial-aggregated, ≤ slices·buckets rows), then all pairwise work
  * happens on that tiny distribution table (union-flag rollup per pair,
  * no token-level join anywhere).
  *
  * Output: (src_a, src_b, n_buckets_used, l1_permille).
  */
object VocabDrift {

  /** (key, bucket, cnt, permille) bucket distributions per slice. */
  def bucketDistributions(df: DataFrame, keyCol: String, textCol: String,
      buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val toks = df.select(col(keyCol).as("k"),
        explode(split(col(textCol), " ")).as("tok"))
      .select(col("k"), pmod(graft.functions.functions.hex_to_long(
        substring(md5(col("tok")), 1, 8)), lit(buckets.toLong)).as("b"))
    // the (slice, bucket) count table feeds the totals rollup AND the
    // per-mille join — persist so the token stream is scanned once
    val cnts = toks.groupBy("k", "b").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = cnts.groupBy("k").agg(sum(col("cnt")).as("tot"))
    cnts.join(totals, Seq("k"))
      .select(col("k"), col("b"), col("cnt"),
        expr("(1000 * cnt) div tot").as("pm"))
  }

  /** Pairwise integer L1 between slice distributions. */
  def pairwiseL1(dist: DataFrame): DataFrame = {
    val keys = dist.select(col("k")).distinct()
    val pairs = keys.select(col("k").as("src_a"))
      .join(keys.select(col("k").as("src_b")), col("src_a") < col("src_b"))
    val sideA = pairs.join(dist, col("src_a") === col("k"))
      .select(col("src_a"), col("src_b"), col("b"),
        col("pm").as("pm_a"), lit(0L).as("pm_b"))
    val sideB = pairs.join(dist, col("src_b") === col("k"))
      .select(col("src_a"), col("src_b"), col("b"),
        lit(0L).as("pm_a"), col("pm").as("pm_b"))
    sideA.union(sideB)
      .groupBy("src_a", "src_b", "b")
      .agg(sum(col("pm_a")).as("pa"), sum(col("pm_b")).as("pb"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_buckets_used"),
        sum(abs(col("pa") - col("pb"))).as("l1_permille"))
  }

  /** One-shot: distributions + pairwise distance. The distribution table
    * (slices·buckets rows) is persisted because BOTH pair sides consume
    * it — without the persist each side re-derives it from a full token
    * scan of the corpus. */
  def drift(df: DataFrame, keyCol: String, textCol: String,
      buckets: Int = 1024): DataFrame = {
    val dist = bucketDistributions(df, keyCol, textCol, buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairwiseL1(dist)
  }
}
