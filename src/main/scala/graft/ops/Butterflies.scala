package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Butterfly (2×2 biclique) counting — the bipartite analogue of
  * triangle counting: a butterfly is two left nodes sharing two right
  * nodes, the smallest cohesive motif a bipartite graph can have.
  * Butterfly density drives bipartite clustering coefficients and
  * k-bitruss decompositions the same way triangles drive k-truss
  * ([[Truss]]).
  *
  * Counting identity: with c(u,v) = |N(u) ∩ N(v)| co-neighbors of a left
  * pair, butterflies = Σ_{u<v} C(c,2) and wedges = Σ_{u<v} c — so the
  * whole count reduces to the per-pair co-neighbor table, built exactly
  * like [[graft.queries.Tables.coOrderPairEdges]]: group each right node's
  * left-neighbor list, emit ordered pairs, count per pair. Work is
  * Σ_r d(r)² over wedge-side degrees.
  *
  * Scale guard: right-side hubs make d(r)² explode (one right node with
  * 10⁶ neighbors is 10¹² wedges), so nodes with wedge-side degree above
  * `maxWedgeDegree` are EXCLUDED — the standard hub-truncation of the
  * butterfly-sampling literature, and the documented semantics here (the
  * count is exact over the hub-filtered graph; the oracle applies the
  * identical filter). The collect_list buffer is bounded by the same cap
  * via a pre-aggregated semi-join, so no task ever materializes a hub's
  * neighbor list.
  *
  * Output: ONE row (m_edges, n_wedge_pairs, n_wedges, n_butterflies) —
  * m_edges counts the distinct hub-filtered edge set the motifs are
  * counted over.
  */
object Butterflies {

  def globalCount(edges: DataFrame, leftCol: String, rightCol: String,
      maxWedgeDegree: Int = 256): DataFrame = {
    require(maxWedgeDegree >= 2,
      s"maxWedgeDegree must be >= 2 (a wedge needs 2 neighbors), got $maxWedgeDegree")
    val e = edges.select(col(leftCol).as("l"), col(rightCol).as("r"))
      .where(col("l").isNotNull && col("r").isNotNull)
      .distinct()
    val okR = e.groupBy("r").agg(count(lit(1)).as("d"))
      .where(col("d") <= maxWedgeDegree).select("r")
    val kept = e.join(okR, Seq("r"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = kept
      .groupBy("r").agg(collect_list(col("l")).as("ls"))
      .select(explode(col("ls")).as("l1"), col("ls"))
      .select(col("l1"), explode(col("ls")).as("l2"))
      .where(col("l1") < col("l2"))
    val co = pairs.groupBy("l1", "l2").agg(count(lit(1)).as("c"))
    co.agg(count(lit(1)).as("n_wedge_pairs"),
        sum(col("c")).as("n_wedges"),
        sum(expr("c * (c - 1) div 2")).as("n_butterflies"))
      .crossJoin(broadcast(kept.agg(count(lit(1)).as("m_edges"))))
      .select(col("m_edges"), col("n_wedge_pairs"), col("n_wedges"),
        col("n_butterflies"))
  }
}
