package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise set-overlap estimation between groups via KMV bottom-k
  * distinct sketches — "how much vocabulary do these two sources share?"
  * without a quadratic token join. HLL ([[graft.functions.Hll]]) answers
  * per-group distinct counts but cannot intersect; the KMV sketch is a
  * coordinated uniform sample of each group's hash set, so any pair's
  * bottom-k UNION sample yields an unbiased Jaccard estimate (Beyer et
  * al. 2007): of the k smallest union hashes, the fraction present in
  * both sketches.
  *
  * Shape at 100 TB: one token scan → per-group [[graft.functions.KmvSketch]]
  * aggregation (bounded k-slot state, map-side partials, dedup inside the
  * buffer — no global distinct shuffle anywhere); the sketch table is one
  * row per group, so the pairwise stage is a tiny self-join over group
  * pairs with per-pair array algebra. Estimation error is the standard
  * O(1/sqrt(k)).
  *
  * Output: (src_a, src_b, k_eff, h_k, n_shared, jaccard_permille) per
  * unordered group pair — k_eff = |bottom-k of the union| (= min(k,
  * |A∪B|)), h_k its largest hash (the union sample's threshold),
  * n_shared the members of both sketches at or below that threshold.
  * All integers: hash-exact in any engine.
  */
object SetSketch {

  /** Per-group bottom-k distinct-hash sketch: (key, sketch sorted
    * array<long>). `hashCol` must be the portable md5 lane
    * (`hex_to_long(substr(md5(x), 1, 15))`) for cross-engine parity. */
  def kmvSketches(df: DataFrame, keyCol: String, hashCol: String,
      k: Int): DataFrame =
    df.groupBy(col(keyCol))
      .agg(graft.functions.KmvSketch.kmv_sketch(col(hashCol), k).as("sketch"))

  /** KMV distinct-count error audit — est-vs-exact per group, the KMV
    * leg of the sketch trust-but-verify family: the classic estimator
    * n̂ = (k−1)·R / h_k (R = 2⁶⁰, the md5-lane hash range; h_k the k-th
    * smallest distinct hash) stays in EXACT integer arithmetic because
    * (k−1)·R is evaluated in DECIMAL(38,0)/HUGEINT before the floor
    * division — no doubles, no logs, identical in any engine. Groups
    * with fewer than k distinct hashes report exactly (the sketch IS the
    * set). "Exact" here counts distinct 60-bit hashes — the same domain
    * the estimator sees, so a (vanishingly rare) md5-lane collision
    * cancels out of the comparison instead of polluting it.
    *
    * The signed relative error splits sign and magnitude explicitly —
    * Spark `div` truncates toward zero while DuckDB `//` floors, so a
    * single signed division would diverge on negative errors.
    *
    * Scale shape: one k-slot sketch aggregate + one distinct-count per
    * group (the audit's truth side — run it on samples or bounded key
    * domains at 100 TB) + a group-dimension join.
    *
    * Output: (key, n_exact, est, err_ppm) per group.
    */
  def distinctErrorAudit(df: DataFrame, keyCol: String, hashCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val sk = kmvSketches(df, keyCol, hashCol, k)
    val exact = df.select(col(keyCol), col(hashCol).as("__h"))
      .where(col("__h").isNotNull)
      .groupBy(col(keyCol))
      .agg(count_distinct(col("__h")).as("n_exact"))
    exact.join(sk, Seq(keyCol))
      .select(col(keyCol), col("n_exact"),
        when(col("n_exact") < k, col("n_exact"))
          .otherwise(expr(
            s"""CAST(CAST(${k - 1} AS DECIMAL(38, 0))
                 * CAST(1152921504606846976 AS DECIMAL(38, 0))
               div CAST(element_at(sketch, $k) AS DECIMAL(38, 0))
               AS BIGINT)""")).as("est"))
      .select(col(keyCol), col("n_exact"), col("est"),
        when(col("est") >= col("n_exact"),
          expr("(1000000 * (est - n_exact)) div n_exact"))
          .otherwise(lit(0L)
            - expr("(1000000 * (n_exact - est)) div n_exact"))
          .as("err_ppm"))
  }

  /** Jaccard estimates for every unordered pair of sketch rows. */
  def pairwiseJaccard(sketches: DataFrame, keyCol: String,
      k: Int): DataFrame = {
    val a = sketches.select(col(keyCol).as("src_a"), col("sketch").as("sa"))
    val b = sketches.select(col(keyCol).as("src_b"), col("sketch").as("sb"))
    a.join(b, col("src_a") < col("src_b"))
      .withColumn("u", array_sort(array_union(col("sa"), col("sb"))))
      // a pair of two EMPTY sketches has no union hash to threshold on:
      // element_at(u, 0) errors under ANSI and n_shared div 0 NULLs —
      // such a pair carries no evidence either way, so it is dropped
      .where(size(col("u")) > 0)
      .withColumn("k_eff", least(lit(k), size(col("u"))).cast("long"))
      .withColumn("h_k", element_at(col("u"), col("k_eff").cast("int")))
      .withColumn("n_shared",
        size(filter(array_intersect(col("sa"), col("sb")),
          x => x <= col("h_k"))).cast("long"))
      .select(col("src_a"), col("src_b"), col("k_eff"), col("h_k"),
        col("n_shared"),
        expr("(1000 * n_shared) div k_eff").as("jaccard_permille"))
  }
}
