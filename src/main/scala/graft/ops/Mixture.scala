package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic training-mixture sampling — the data-mixing step of an
  * LLM corpus build: given target per-mille SHARES of the final mixture
  * per source and a total row budget, down-sample each source to its
  * quota with the repo's identity-hash acceptance test (md5 per-mille
  * bucket, [[Sampling.hashSample]]'s formula) so the result is
  * partition-independent, engine-portable, and stable across reruns.
  *
  *   keep(s) = (totalTarget · share(s)) div 1000
  *   rate(s) = min(1000, (keep(s) · 1000) div count(s))   [per-mille]
  *   row kept ⇔ md5-bucket(salt ‖ id) < rate(s)
  *
  * Rates are integer per-mille, so realized counts target the quota to
  * hash-uniformity (exact-quota ranking would need a per-source sort of
  * every row — the non-scalable alternative, deliberately not taken). A
  * source whose corpus is smaller than its quota caps at rate 1000 (all
  * rows — the mixture under-fills rather than inventing data); sources
  * absent from `shares` are dropped entirely. Output: the surviving rows
  * plus their `rate_permille` (the Horvitz–Thompson reweighting factor,
  * same contract as [[Sampling.weightedSample]]'s p_ppm).
  *
  * Plan shape at 100 TB: one tiny per-source count aggregation, a
  * broadcast join of the sources-sized rate table, and a scan-local
  * filter — no sorts, no repartitioning of the corpus.
  */
object Mixture {

  def mixSample(df: DataFrame, idCol: String, sourceCol: String,
      shares: Seq[(String, Int)], totalTarget: Long,
      salt: String = ""): DataFrame = {
    require(shares.nonEmpty, "mixture needs at least one source share")
    require(shares.forall(s => s._2 > 0 && s._2 <= 1000),
      s"shares are per-mille in (0, 1000], got $shares")
    require(shares.map(_._2).sum <= 1000,
      s"shares sum to ${shares.map(_._2).sum} > 1000 per-mille")
    require(shares.map(_._1).distinct.size == shares.size,
      s"duplicate sources in $shares")
    require(totalTarget > 0, s"totalTarget must be positive, got $totalTarget")
    val spark = df.sparkSession
    import spark.implicits._
    val sharesDf = shares.toDF(sourceCol, "__share")
    val rates = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
      .join(sharesDf, sourceCol)
      .withColumn("__keep", expr(s"(${totalTarget}L * __share) div 1000"))
      .withColumn("rate_permille",
        least(lit(1000L), expr("(__keep * 1000) div __n")))
      .select(col(sourceCol), col("rate_permille"))
    val bucket = graft.functions.functions.hex_to_long(
      substring(md5(concat(lit(salt), col(idCol).cast("string"))), 1, 15)) % 1000
    df.join(broadcast(rates), sourceCol)
      .where(bucket < col("rate_permille"))
  }

  /** TEMPERATURE-scaled mixture (r11) — the mT5/XLM-R sampling rule
    * where target shares are derived FROM the corpus instead of given:
    * p(s) ∝ n_s^(1/T), flattening the head and up-weighting the tail.
    * T is fixed at 2 deliberately: the square root is the one power
    * IEEE 754 guarantees correctly rounded, so the derived integer
    * weights floor(√n · 10⁶) are bit-identical in every engine — a
    * general pow(n, 1/T) is not, and would demote the oracle to
    * rows-only. Shares in per-mille come from the largest-remainder
    * apportionment of 1000 over the weights (the exact
    * [[TokenBudget.allocate]] kernel, so Σ share = 1000 by
    * construction); per-source accept rates and the identity-hash
    * acceptance test are [[mixSample]]'s.
    *
    * Plan shape: one sources-sized aggregation, the allocate kernel's
    * range-exchanged ranking over one row per source, a broadcast rate
    * join, a scan-local filter — the corpus is never sorted or
    * repartitioned. Output: surviving rows + share_permille +
    * rate_permille.
    */
  def temperatureMix(df: DataFrame, idCol: String, sourceCol: String,
      totalTarget: Long, salt: String = ""): DataFrame = {
    require(totalTarget > 0, s"totalTarget must be positive, got $totalTarget")
    val counts = df.where(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
    val weights = counts.select(col(sourceCol),
      floor(sqrt(col("__n").cast("double")) * lit(1000000.0))
        .cast("long").as("__w"))
    val shares = TokenBudget.allocate(weights, sourceCol, "__w", 1000L)
      .select(col("grp").as(sourceCol), col("quota").as("share_permille"))
    val rates = counts.join(shares, sourceCol)
      .withColumn("__keep", expr(s"(${totalTarget}L * share_permille) div 1000"))
      .withColumn("rate_permille",
        least(lit(1000L), expr("(__keep * 1000) div __n")))
      .select(col(sourceCol), col("share_permille"), col("rate_permille"))
    val bucket = graft.functions.functions.hex_to_long(
      substring(md5(concat(lit(salt), col(idCol).cast("string"))), 1, 15)) % 1000
    df.join(broadcast(rates), sourceCol)
      .where(bucket < col("rate_permille"))
  }
}
