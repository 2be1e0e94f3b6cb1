package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss decomposition step — the edge-level analogue of k-core: the
  * maximal subgraph in which EVERY edge closes at least (k-2) triangles
  * inside the subgraph. Stricter than k-core (every k-truss edge is in a
  * (k-1)-core) and the standard cohesive-subgraph detector for community
  * kernels in co-occurrence graphs.
  *
  * Iterative support peeling: per round, count each surviving edge's
  * triangles with [[Triangles.triangleList]] (degree-ordered orientation,
  * O(|E|^1.5) worst case — NOT the naive wedge join), drop edges below
  * (k-2), repeat. Support counting is a union of the three corner pairs
  * of each triangle + one groupBy — triangle corners are already
  * canonical (a<b<c), so every corner pair IS a canonical edge key; the
  * filter is one inner join. Peeling is monotone (dropped edges never
  * return), so a stable round is a fixpoint and the loop exits early; the
  * round cap is FIXED for engine parity with the unrolled SQL oracle —
  * both sides compute the identical truncation even when not converged
  * (k-core's partial-fixpoint parity trick). Per-round results are
  * locally checkpointed to keep lineage flat.
  *
  * Output: the k-truss edge set (x, y), canonical x < y.
  */
object Truss {

  def kTruss(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 8): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    require(maxRounds >= 1 && maxRounds <= 16,
      s"maxRounds must be in [1, 16], got $maxRounds")
    val minSupport = (k - 2).toLong
    var e = edges.select(
        least(col(srcCol), col(dstCol)).as("x"),
        greatest(col(srcCol), col(dstCol)).as("y"))
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
      .distinct()
      .localCheckpoint(true)
    var n = e.count()
    var round = 0
    var stable = n == 0L
    while (round < maxRounds && !stable) {
      val tri = Triangles.triangleList(e, "x", "y")
      val supp = tri.select(col("a").as("x"), col("b").as("y"))
        .union(tri.select(col("a").as("x"), col("c").as("y")))
        .union(tri.select(col("b").as("x"), col("c").as("y")))
        .groupBy("x", "y").agg(count(lit(1)).as("supp"))
        .where(col("supp") >= minSupport)
      // inner join: zero-triangle edges have no support row and drop out
      val kept = e.join(supp.select("x", "y"), Seq("x", "y"), "left_semi")
        .localCheckpoint(true)
      val kn = kept.count()
      stable = kn == n
      e = kept
      n = kn
      round += 1
    }
    e
  }
}
