package graft

import graft.ops.{AssociationRules, Betweenness, ConnectedComponents, Dedup, KMeansEmbed, Multimodal, PageRank, Sessionize, ShortestPaths, Similarity, TextStats, Tokenizer}
import graft.queries.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Connected components (the reference's headline operator) over a
    * part↔supplier co-purchase graph, with per-component size stats.
    */
  def entry(spark: SparkSession): DataFrame = {
    val edges = Tables.partSupplierEdges(spark, "/root/testdata/sf0.001")
    ConnectedComponents.components(edges)
      .groupBy("component").agg(count(lit(1)).as("n_nodes"))
      .orderBy("component")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  import graft.QueryHelpers.merged

  /** The driver contract, assembled from the per-domain registries (r10
    * split — SparkEntry had grown to 9.3k lines). `merged` REQUIRES key
    * disjointness: a duplicate name across registries fails loudly
    * instead of silently shadowing an entry (the r9 Map-literal pitfall).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    merged(Seq(GraphQueries.queries, TextQueries.queries,
      EventQueries.queries, RelationalQueries.queries,
      StatQueries.queries), "query")

  def oracleSql: Map[String, String] =
    merged(Seq(GraphQueries.oracles, TextQueries.oracles,
      EventQueries.oracles, RelationalQueries.oracles,
      StatQueries.oracles), "oracle")
}
