package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** kNN-graph sparsification + connectivity-drift audit — the graph-
  * construction hygiene step of similarity/interaction pipelines: keep
  * each node's `kPerNode` heaviest incident edges (OR-symmetrization:
  * an edge survives if EITHER endpoint ranks it), then measure what the
  * pruning did to the component structure. A sparsifier that shatters
  * the giant component was too aggressive; one that keeps m ≈ m_full
  * did nothing.
  *
  * Determinism: per-node ranking orders by (weight desc, neighbor asc);
  * parallel edges must be pre-aggregated into weights by the caller
  * (one groupBy — the natural place the weight is born anyway).
  *
  * Shape: the rank window partitions by NODE (high-cardinality key —
  * each partition is one adjacency list, no global sort), the survivor
  * set is a distinct of canonical pairs, and the audit runs
  * [[ConnectedComponents.components]] twice. Output (one row):
  * (m_full, n_comp, lcc, m_sparse, n_comp_sparse, lcc_sparse).
  */
object Sparsify {

  /** Canonical undirected survivor edges: (src, dst) with src < dst. */
  def topWeightEdges(weighted: DataFrame, srcCol: String, dstCol: String,
      wCol: String, kPerNode: Int): DataFrame = {
    require(kPerNode >= 1, s"kPerNode must be >= 1, got $kPerNode")
    val e = weighted.select(col(srcCol).as("a"), col(dstCol).as("b"),
        col(wCol).cast("long").as("w"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b"), col("w")))
    val byNode = Window.partitionBy(col("a"))
      .orderBy(col("w").desc, col("b"))
    sym.withColumn("rk", row_number().over(byNode))
      .where(col("rk") <= kPerNode)
      .select(least(col("a"), col("b")).as("src"),
        greatest(col("a"), col("b")).as("dst"))
      .distinct()
  }

  def sparsifyDrift(weighted: DataFrame, srcCol: String, dstCol: String,
      wCol: String, kPerNode: Int): DataFrame = {
    val full = weighted.select(
        least(col(srcCol), col(dstCol)).as("src"),
        greatest(col(srcCol), col(dstCol)).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sparse = topWeightEdges(weighted, srcCol, dstCol, wCol, kPerNode)
      .persist(StorageLevel.MEMORY_AND_DISK)

    def audit(g: DataFrame, sfx: String): DataFrame = {
      val sizes = ConnectedComponents.components(g)
        .groupBy("component").agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as(s"n_comp$sfx"),
          coalesce(max(col("sz")), lit(0L)).as(s"lcc$sfx"))
      g.agg(count(lit(1)).as(s"m$sfx")).crossJoin(broadcast(sizes))
    }

    audit(full, "_full").crossJoin(broadcast(audit(sparse, "_sparse")))
      .select("m_full", "n_comp_full", "lcc_full", "m_sparse",
        "n_comp_sparse", "lcc_sparse")
  }
}
