package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Directed triad census (the closed/open directed-motif profile) —
  * "is this interaction graph hierarchical or circular?": over the
  * DISTINCT simple directed edge set (self-loops dropped, each ordered
  * pair at most once),
  *
  *   m_reciprocal — ordered edges whose reverse also exists
  *   n_wedges     — directed 2-paths a→b→c with a ≠ c
  *   n_transitive — ordered triples with a→b, b→c AND the a→c shortcut
  *                  (feed-forward motif; each counted once per pattern)
  *   n_cyclic     — 3-cycles a→b→c→a, rotation-deduped by anchoring the
  *                  MIN node (each cycle counted exactly once)
  *
  * Transitivity/cyclicity of a network is the classic local-structure
  * fingerprint (feed-forward dominance ⇒ hierarchy; cycle dominance ⇒
  * feedback). Counts are plain integers; downstream ratios are the
  * caller's.
  *
  * Scale shape: wedges are NEVER materialized — n_wedges = Σ_b
  * (din_b·dout_b − recip_b) is a degree-table aggregate. The two
  * triangle joins carry candidate 2-paths (Σ din·dout of the hub);
  * at extreme skew pre-filter hubs or switch to an orientation-ordered
  * enumeration — the joins here are the declarative form Catalyst can
  * re-order and AQE can skew-split.
  *
  * Output (one row): (m_edges, m_reciprocal, n_wedges, n_transitive,
  * n_cyclic).
  */
object Triads {

  def directedCensus(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK) // degree aggs + 3 probes
    val rev = e.select(col("b").as("a"), col("a").as("b"))
    val recipEdges = e.join(rev, Seq("a", "b"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val totals = e.agg(count(lit(1)).as("m_edges"))
      .crossJoin(broadcast(
        recipEdges.agg(count(lit(1)).as("m_reciprocal"))))

    // wedges as a degree aggregate: din(b)·dout(b) minus the a→b→a
    // round-trips (one per reciprocal partner of b)
    val din = e.groupBy(col("b").as("n")).agg(count(lit(1)).as("din"))
    val dout = e.groupBy(col("a").as("n")).agg(count(lit(1)).as("dout"))
    val recipDeg = recipEdges.groupBy(col("a").as("n"))
      .agg(count(lit(1)).as("recip"))
    val wedges = din.join(dout, Seq("n"))
      .join(recipDeg, Seq("n"), "left")
      .agg(sum(col("din") * col("dout")
        - coalesce(col("recip"), lit(0L))).as("n_wedges"))

    val e1 = e.select(col("a"), col("b"))
    val e2 = e.select(col("a").as("b"), col("b").as("c"))
    val paths = e1.join(e2, Seq("b")).where(col("a") =!= col("c"))
    val transitive = paths
      .join(e.select(col("a"), col("b").as("c")), Seq("a", "c"), "left_semi")
      .agg(count(lit(1)).as("n_transitive"))
    val cyclic = paths
      .where(col("a") < col("b") && col("a") < col("c"))
      .join(e.select(col("a").as("c"), col("b").as("a")), Seq("c", "a"),
        "left_semi")
      .agg(count(lit(1)).as("n_cyclic"))

    totals
      .crossJoin(broadcast(wedges))
      .crossJoin(broadcast(transitive))
      .crossJoin(broadcast(cyclic))
      .select("m_edges", "m_reciprocal", "n_wedges", "n_transitive",
        "n_cyclic")
  }
}
