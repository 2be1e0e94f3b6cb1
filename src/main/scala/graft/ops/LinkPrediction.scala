package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link prediction by the Resource-Allocation index (Zhou, Lü & Zhang
  * 2009): for a non-adjacent pair (a, b), RA = Σ_{w ∈ N(a)∩N(b)} 1/deg(w)
  * — common neighbors weighted down by how promiscuous they are. Chosen
  * over the near-identical Adamic-Adar (1/ln deg) deliberately: 1/deg is
  * RATIONAL, so the ×1e9 integer-div quantization `1e9 div deg` is exact
  * in any engine, whereas ln() is a libm call whose last ulp differs
  * between implementations — RA is oracle-portable, AA is not.
  *
  * Shape: one wedge self-join keyed by the common neighbor (center),
  * aggregated per candidate pair, anti-joined against existing edges.
  * Wedge cost is Σ deg(w)² over centers, so one celebrity hub dominates
  * the whole job while contributing ≈ 0 weight per pair (1/deg ≈ 0) —
  * centers above `maxCenterDegree` are therefore EXCLUDED, the same
  * hot-key cap pattern as the LSH bucket caps, with a quantified error:
  * each dropped center under-counts an affected pair's score by
  * less than 1e9/maxCenterDegree.
  */
object LinkPrediction {

  private val Scale = 1000000000L

  /** Candidate (a, b) non-edges with >= `minCommon` common neighbors:
    * (a, b, n_common, ra_q) where ra_q = Σ floor(1e9 / deg(w)). */
  def resourceAllocation(edges: DataFrame, srcCol: String, dstCol: String,
      maxCenterDegree: Int = 1024, minCommon: Int = 1): DataFrame = {
    require(maxCenterDegree >= 2, s"maxCenterDegree must be >= 2, got $maxCenterDegree")
    val e = edges.select(
        least(col(srcCol), col(dstCol)).as("x"),
        greatest(col(srcCol), col(dstCol)).as("y"))
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
      .distinct()
      .persist() // consumed by adjacency AND the final anti-join
    val adj = e.select(col("x").as("w"), col("y").as("n"))
      .union(e.select(col("y").as("w"), col("x").as("n")))
    val deg = adj.groupBy("w").agg(count(lit(1)).as("d"))
    val okCenters = deg.where(col("d") <= maxCenterDegree)
    // wedges through capped centers; carry the center degree for scoring
    val a1 = adj.join(okCenters, "w").select(col("w"), col("n").as("a"), col("d"))
    val a2 = adj.select(col("w"), col("n").as("b"))
    val cand = a1.join(a2, Seq("w"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_common"),
        sum(expr(s"$Scale div d")).as("ra_q"))
      .where(col("n_common") >= minCommon)
    cand
      .join(e.select(col("x").as("a"), col("y").as("b")), Seq("a", "b"), "left_anti")
  }

  /** Neighborhood-Jaccard link scores — the normalized cousin of
    * [[resourceAllocation]]: for a non-adjacent candidate pair (a, b),
    *
    *   jaccard = |N(a) ∩ N(b)| / |N(a) ∪ N(b)|
    *           = n_common / (deg(a) + deg(b) − n_common)
    *
    * emitted as the exact integer per-mille
    * `(1000 · n_common) div (deg_a + deg_b − n_common)`, so the driver
    * query gets a hash-exact oracle. Same wedge shape and hot-center cap
    * as RA (common-neighbor counting through centers with degree ≤
    * `maxCenterDegree`; each dropped center under-counts n_common by 1 —
    * the denominator degrees stay exact). Output:
    * (a, b, n_common, deg_a, deg_b, jaccard_permille).
    */
  def neighborJaccard(edges: DataFrame, srcCol: String, dstCol: String,
      maxCenterDegree: Int = 1024, minCommon: Int = 1): DataFrame = {
    require(maxCenterDegree >= 2, s"maxCenterDegree must be >= 2, got $maxCenterDegree")
    val e = edges.select(
        least(col(srcCol), col(dstCol)).as("x"),
        greatest(col(srcCol), col(dstCol)).as("y"))
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
      .distinct()
      .persist() // adjacency, degree joins, AND the final anti-join
    val adj = e.select(col("x").as("w"), col("y").as("n"))
      .union(e.select(col("y").as("w"), col("x").as("n")))
    val deg = adj.groupBy("w").agg(count(lit(1)).as("d"))
    val okCenters = deg.where(col("d") <= maxCenterDegree).select("w")
    // cap ONE wedge side only: the equi-join on w means a wedge survives
    // iff its center is capped, and the plain-adj side avoids a second
    // semi-join pass (RA's shape; measured on q_jaccard_links)
    val capped = adj.join(okCenters, Seq("w"), "left_semi")
    val cand = capped.join(adj.select(col("w"), col("n").as("b")), Seq("w"))
      .where(col("n") < col("b"))
      .select(col("n").as("a"), col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_common"))
      .where(col("n_common") >= minCommon)
    cand
      .join(e.select(col("x").as("a"), col("y").as("b")), Seq("a", "b"), "left_anti")
      .join(deg.select(col("w").as("a"), col("d").as("deg_a")), "a")
      .join(deg.select(col("w").as("b"), col("d").as("deg_b")), "b")
      .withColumn("jaccard_permille",
        expr("(1000 * n_common) div (deg_a + deg_b - n_common)"))
      .select(col("a"), col("b"), col("n_common"), col("deg_a"), col("deg_b"),
        col("jaccard_permille"))
  }

  /** Deterministic negative sampling — the other half of link-prediction
    * training data: for every node, one pseudo-random partner that is NOT
    * a neighbor. Candidates come from a fixed multiplicative permutation
    * over the node ranks (partner(r) = r·2654435761 mod n + 1, the
    * Knuth hash multiplier), so the sample is replayable in any engine —
    * no RNG, no rejection loop; real edges (either orientation) are
    * anti-joined away. Roughly one negative per node (fewer where the
    * map self-pairs or hits a true edge) — run with several `mult`
    * values for more.
    *
    * Shape: [[Ranks.globalRowNumber]] over the node set (range exchange),
    * one rank-keyed self-join for the pairing, two anti-joins against the
    * distinct edge set. `n` (one count job) must stay below ~3.4e9 so
    * rank·mult fits a long — far above any node set that wants
    * one-negative-per-node in one pass.
    */
  def negativeEdges(edges: DataFrame, srcCol: String, dstCol: String,
      mult: Long = 2654435761L): DataFrame = {
    require(mult > 0, s"mult must be positive, got $mult")
    val e = edges.select(col(srcCol).cast("string").as("s"),
        col(dstCol).cast("string").as("t"))
      .where(col("s").isNotNull && col("t").isNotNull && col("s") =!= col("t"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("s").as("node"))
      .union(e.select(col("t").as("node"))).distinct()
    val ranked = Ranks.globalRowNumber(nodes, Seq("node"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = ranked.count()
    require(n < 3_400_000_000L,
      s"rank * mult must fit a long: $n nodes is over the ~3.4e9 bound")
    val cand = ranked
      .withColumn("p", (col("grn") * mult) % n + 1L)
      .where(col("p") =!= col("grn"))
      .join(ranked.select(col("node").as("dst"), col("grn").as("p")),
        Seq("p"))
      .select(col("node").as("src"), col("dst"))
    cand
      .join(e, cand("src") === e("s") && cand("dst") === e("t"), "left_anti")
      .join(e, col("src") === e("t") && col("dst") === e("s"), "left_anti")
  }
}
