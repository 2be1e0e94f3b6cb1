package graft

import graft.ops.{AssociationRules, Betweenness, ConnectedComponents, Dedup,
  PageRank, ShortestPaths, TextStats}
import org.apache.spark.sql.DataFrame

/** Fluent switch-over surface for users of the reference library: every
  * public operator of `polars_grouper` (`super_merger`,
  * `super_merger_weighted`, `graph_solver`, `calculate_shortest_path`,
  * `page_rank`, `betweenness_centrality`, `graph_association_rules` —
  * `polars_grouper/__init__.py`) as a method on the DataFrame carrying
  * the edge/transaction columns, in the same "frame in → frame out"
  * style the reference exposes:
  *
  * {{{
  * import graft.syntax._
  * df.superMerger("from", "to")                       // adds `group`
  * df.pageRank("from", "to")                          // adds `rank`
  * df.shortestPaths("from", "to", "weight")           // all-pairs paths
  * tx.associationRules("order_id", "item")            // rule mining
  * }}}
  *
  * Pure sugar: each method delegates to the `graft.ops` entry point (the
  * canonical, parameter-complete API); nothing here adds semantics, and
  * the gated scale-path defaults pass through unchanged. A few
  * frequently-chained curation helpers ride along for the same reason.
  */
object syntax {

  implicit class GraftDataFrameOps(private val df: DataFrame) extends AnyVal {

    /** `super_merger`: 1-based first-appearance component numbering in a
      * new `group` column (reference row-order semantics). */
    def superMerger(from: String = "from", to: String = "to"): DataFrame =
      ConnectedComponents.superMerger(df, from, to)

    /** `super_merger_weighted`: inclusive `weight >= threshold` edge
      * filter, then [[superMerger]]. */
    def superMergerWeighted(from: String, to: String, weight: String,
        threshold: Double): DataFrame =
      ConnectedComponents.superMergerWeighted(df, from, to, weight, threshold)

    /** Order-insensitive component labels (the at-scale variant):
      * (node, component). */
    def superMergerCanonical(from: String = "from", to: String = "to"): DataFrame =
      ConnectedComponents.superMergerCanonical(df, from, to)

    /** `calculate_shortest_path`: all-pairs weighted shortest paths with
      * the reference's ×1000 truncating cost quantization. */
    def shortestPaths(from: String = "from", to: String = "to",
        weight: String = "weight", directed: Boolean = false): DataFrame =
      ShortestPaths.calculateShortestPath(df, from, to, weight, directed)

    /** `page_rank`: row-aligned rank column (reference recurrence — no
      * dangling redistribution, L1 convergence). */
    def pageRank(from: String = "from", to: String = "to",
        damping: Double = 0.85, maxIter: Int = 100,
        tol: Double = 1e-6): DataFrame =
      PageRank.pageRankColumn(df, from, to, damping, maxIter, tol)

    /** `betweenness_centrality` with the reference's normalization
      * quirks (global n, undirected halving). */
    def betweennessCentrality(from: String = "from", to: String = "to",
        normalized: Boolean = true, directed: Boolean = false): DataFrame =
      Betweenness.betweennessCentrality(df, from, to, normalized, directed)

    /** `graph_association_rules` over (transaction, item) rows. */
    def associationRules(tidCol: String, itemCol: String,
        freqCol: Option[String] = None,
        params: AssociationRules.Params = AssociationRules.Params()): DataFrame =
      AssociationRules.graphAssociationRules(df, tidCol, itemCol, freqCol, params)

    // ---- curation sugar (beyond-reference, most-chained helpers) ----

    /** Exact-duplicate groups by content sha256. */
    def exactDuplicates(idCol: String, textCol: String): DataFrame =
      Dedup.exactDuplicates(df, idCol, textCol)

    /** Token/char/distinct/stopword stats columns. */
    def withTokenStats(textCol: String): DataFrame =
      TextStats.withTokenStats(df, textCol)

    /** First-occurrence n-gram novelty per document. */
    def noveltyScores(idCol: String, textCol: String, n: Int = 3): DataFrame =
      TextStats.noveltyScores(df, idCol, textCol, n)
  }
}
