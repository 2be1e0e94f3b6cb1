package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature IMPORTANCE WEIGHTS for data selection (the DSIR recipe,
  * Xie et al. 2023, in its integer-exact form): score every document by
  * how much more its token mass looks like a TARGET slice than like the
  * raw corpus. Features are hashed word buckets; each bucket gets weight
  * p_target(bucket) − p_raw(bucket) (both in ppm), and a document's score
  * is the sum of its token occurrences' bucket weights. Selecting the
  * top-scoring documents is importance resampling toward the target
  * distribution — the standard "make 100 TB of crawl look like the
  * high-quality slice" selection step.
  *
  * Deviation from the paper, deliberate and documented: DSIR sums LOG
  * probability ratios; this operator sums ppm probability DIFFERENCES.
  * Both are linear-in-features scoring rules that rank "target-like"
  * documents above "raw-like" ones; the difference form needs no libm
  * log, so the score is integer-exact, summation-order-independent, and
  * engine-portable bit for bit (the repo-wide determinism discipline —
  * same trade [[Bm25]] makes for idf).
  *
  * Shape: tokens are hashed to `buckets` md5-lane buckets
  * (portable ↔ `('0x' || substr(md5(tok),1,15))::BIGINT % B` in the
  * oracle). One groupBy over token occurrences computes per-bucket
  * target/raw counts — map-side combine collapses every partition to ≤ B
  * rows, so the shuffle is B rows per partition regardless of corpus
  * size. The ≤ B-row weight table then BROADCASTS back onto the token
  * stream (no second big shuffle on the bucket axis), and one per-doc
  * aggregation emits scores. Two 1-row totals ride the same broadcast.
  * At 100 TB: the only big exchange is the per-doc aggregation, which
  * any per-doc statistic pays.
  *
  * Empty target slice raises loudly (a ratio against zero mass is
  * meaningless, not zero). Bucket count is bounded to keep the broadcast
  * honest.
  *
  * The reference has no selection surface; beyond-reference pipeline
  * operator in the curation family ([[DomainAffinity]], [[LmScore]],
  * [[GopherRules]]).
  *
  * Output: (doc_id, n_toks, score_ppm), one row per document with ≥ 1
  * token occurrence (split of a non-null string is never empty, so that
  * is every non-null-text document).
  */
object ImportanceWeights {

  def hashedRatioScores(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 4096): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"buckets must be in [2, 2^20] (the weight table broadcasts), got $buckets")
    val toks = df.select(col(idCol).cast("long").as("doc_id"),
        when(isTarget, 1L).otherwise(0L).as("__tgt"),
        explode(split(col(textCol), " ")).as("tok"))
      .withColumn("bkt", pmod(graft.functions.functions.hex_to_long(
        substring(md5(col("tok")), 1, 15)), lit(buckets.toLong)))
    val stats = toks.groupBy(col("bkt"))
      .agg(sum(col("__tgt")).as("cnt_t"), count(lit(1)).as("cnt_s"))
    // guard the denominator BEFORE it divides (ANSI div raises on zero
    // before a downstream guard column would evaluate — TokenBudget's
    // guarded-denominator pattern)
    val tot = stats.agg(sum(col("cnt_t")).as("tot_t"),
        sum(col("cnt_s")).as("tot_s"))
      .select(when(col("tot_t") === 0L,
        raise_error(lit("hashedRatioScores: target slice has zero token " +
          "mass — importance against an empty target is undefined")))
        .otherwise(col("tot_t")).as("tot_t"), col("tot_s"))
    val weights = stats.crossJoin(broadcast(tot))
      .select(col("bkt"),
        (expr("(cnt_t * 1000000L) div tot_t") -
          expr("(cnt_s * 1000000L) div tot_s")).as("w"))
    toks.join(broadcast(weights), Seq("bkt"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("w")).as("score_ppm"))
  }
}
