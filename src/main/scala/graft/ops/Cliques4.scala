package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 4-clique enumeration — one densification step past triangles: the
  * canonical "tightly bound item/user group" signal (a 4-clique is four
  * entities ALL pairwise linked). Built compositionally on
  * [[Triangles.triangleList]] (which already carries the gated local
  * replay + wedge budget): a 4-clique is a triangle (a < b < c) plus a
  * fourth node d > c adjacent to all three corners, so each clique is
  * emitted exactly once with sorted corners.
  *
  * Scale shape: candidates expand each triangle along the canonical
  * edges of its HIGHEST corner c — volume Σ_tri |N₊(c)| — then two
  * (key, d)-keyed semi-joins close the remaining pairs; no driver state
  * beyond what triangleList itself gates. Degeneracy-ordered expansion
  * (kClist) is the upgrade if Σ|N₊(c)| ever dominates; on order-capped
  * co-purchase graphs (≤ 8 items ⇒ ≤ K₈ blocks) it cannot.
  */
object Cliques4 {

  private def canonical(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    edges.select(
        least(col(srcCol), col(dstCol)).as("x"),
        greatest(col(srcCol), col(dstCol)).as("y"))
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
      .distinct()

  /** All 4-cliques, one row each, corners sorted (a < b < c < d). */
  def cliqueList(edges: DataFrame, srcCol: String, dstCol: String,
      maxLocalEdges: Long = 2000000L): DataFrame = {
    val e = canonical(edges, srcCol, dstCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tri = Triangles.triangleList(edges, srcCol, dstCol, maxLocalEdges)
    tri
      .join(e.select(col("x").as("c"), col("y").as("d")), Seq("c"))
      .join(e.select(col("x").as("a"), col("y").as("d")), Seq("a", "d"),
        "left_semi")
      .join(e.select(col("x").as("b"), col("y").as("d")), Seq("b", "d"),
        "left_semi")
      .select(col("a"), col("b"), col("c"), col("d"))
  }

  /** Per-node 4-clique participation (nodes in ≥ 1 clique). */
  def perNodeCounts(edges: DataFrame, srcCol: String, dstCol: String,
      maxLocalEdges: Long = 2000000L): DataFrame =
    cliqueList(edges, srcCol, dstCol, maxLocalEdges)
      .select(explode(array(col("a"), col("b"), col("c"), col("d")))
        .as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_cliques4"))
}
