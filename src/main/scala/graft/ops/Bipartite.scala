package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Per-component bipartiteness via the parity-doubling reduction: build a
  * doubled graph with vertices (v, 0) and (v, 1) where each undirected
  * edge (u, v) connects (u,0)–(v,1) and (u,1)–(v,0). Walks in the doubled
  * graph alternate parity, so (v,0) and (v,1) land in the SAME doubled
  * component exactly when v's base component contains an odd cycle — i.e.
  * is not 2-colorable. This turns bipartiteness (2-coloring, schema
  * validation of "is this really a user↔item graph?") into two runs of
  * the existing [[ConnectedComponents]] machinery — no new fixpoint, no
  * BFS levels, and the same O(log n) scale path CC already has.
  *
  * In a connected non-bipartite component EVERY vertex has both-parity
  * closed walks, so the conflict flag is uniform per component — the
  * per-component verdict is a plain max-aggregate, not a quantifier.
  *
  * Output: (component, n_nodes, is_bipartite) — component = the base
  * graph's canonical (min-member) component label. Self-loops count as
  * odd cycles and are kept (a self-loop edge (v, v) connects (v,0)–(v,1)
  * directly); null endpoints are dropped like every graph op here.
  *
  * Parity tags are appended as `name + "#0" / "#1"` — safe because the
  * tag is a suffix on BOTH copies, so tagged names collide only if base
  * names already did.
  */
object Bipartite {

  def bipartiteComponents(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges.select(
        col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK) // doubled CC + base CC inputs
    val doubled = e.select(
        concat(col("src"), lit("#0")).as("src"),
        concat(col("dst"), lit("#1")).as("dst"))
      .union(e.select(
        concat(col("src"), lit("#1")).as("src"),
        concat(col("dst"), lit("#0")).as("dst")))
    // base node whose two parity copies share a doubled component ⇔ the
    // node lies on an odd closed walk
    val odd = ConnectedComponents.components(doubled)
      .select(expr("substring(node, 1, length(node) - 2)").as("node"),
        col("component"))
      .groupBy("node", "component").agg(count(lit(1)).as("k"))
      .where(col("k") === 2)
      .select("node").distinct()
      .withColumn("odd", lit(1L))
    ConnectedComponents.components(e)
      .join(odd, Seq("node"), "left")
      .groupBy(col("component"))
      .agg(
        count(lit(1)).as("n_nodes"),
        (max(coalesce(col("odd"), lit(0L))) === 0L).as("is_bipartite"))
  }
}
