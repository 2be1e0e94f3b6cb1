package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph feasibility checks that compose existing primitives into
  * judged verdicts — cheap global diagnostics a pipeline can gate on.
  */
object GraphChecks {

  /** Eulerian path/circuit feasibility per connected component:
    * a connected multigraph has an Euler CIRCUIT iff every degree is
    * even, an Euler PATH iff at most two degrees are odd. Output one
    * row per component: (component, n_nodes, m_edges, n_odd,
    * has_circuit, has_path). Cost: one degree aggregate + one CC pass
    * + one component rollup — no traversal anywhere.
    */
  def eulerian(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // the canonical edge set feeds the degree aggregate AND the CC pass
    // (which scans it more than once itself) — persist, don't recompute
    val canonical = edges.select(
        least(col(srcCol).cast("string"), col(dstCol).cast("string")).as("x"),
        greatest(col(srcCol).cast("string"), col(dstCol).cast("string"))
          .as("y"))
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = canonical.select(col("x").as("node"))
      .union(canonical.select(col("y").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val cc = ConnectedComponents.components(
      canonical.select(col("x").as("src"), col("y").as("dst")))
    val nodeStats = deg.join(cc, Seq("node"))
      .groupBy("component")
      .agg(count(lit(1)).as("n_nodes"),
        sum(when(col("deg") % 2L === 1L, 1L).otherwise(0L)).as("n_odd"),
        // Σdeg double-counts each edge exactly twice
        expr("sum(deg) div 2").as("m_edges"))
    nodeStats.select(col("component"), col("n_nodes"), col("m_edges"),
        col("n_odd"),
        (col("n_odd") === 0L).as("has_circuit"),
        (col("n_odd") <= 2L).as("has_path"))
      .orderBy("component")
  }

  /** Rich-club profile: for every degree threshold k in [1, maxK], how
    * densely interconnected are the nodes of degree > k?
    * φ(k) = 2·E_k / (N_k·(N_k−1)) in permille — a rising φ(k) means
    * hubs preferentially link to hubs (the "rich club"). One degree
    * aggregate, one threshold explode bounded by maxK (edges appear
    * once per PASSING threshold only), integer division exact on both
    * engines. Thresholds with fewer than 2 qualifying nodes are
    * omitted (φ undefined). Output: (k, n_k, e_k, phi_permille).
    */
  def richClub(edges: DataFrame, srcCol: String, dstCol: String,
      maxK: Int = 16): DataFrame = {
    require(maxK >= 1 && maxK <= 256, s"maxK must be in [1, 256], got $maxK")
    // canonical feeds deg and the e_k join; deg feeds n_k and BOTH join
    // sides — persist both or the co-order derivation reruns 4x
    val canonical = edges.select(
        least(col(srcCol).cast("string"), col(dstCol).cast("string")).as("x"),
        greatest(col(srcCol).cast("string"), col(dstCol).cast("string"))
          .as("y"))
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = canonical.select(col("x").as("node"))
      .union(canonical.select(col("y").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // explode ONLY the passing thresholds (sequence end is clamped, and
    // Spark's sequence runs DESCENDING when end < start, so the deg >= 2
    // guard is load-bearing)
    val nk = deg.where(col("deg") >= 2L)
      .select(explode(sequence(lit(1),
        least(col("deg") - 1L, lit(maxK.toLong)))).as("k"))
      .groupBy("k").agg(count(lit(1)).as("n_k"))
    val ek = canonical
      .join(deg.select(col("node").as("x"), col("deg").as("dx")), Seq("x"))
      .join(deg.select(col("node").as("y"), col("deg").as("dy")), Seq("y"))
      .select(least(col("dx"), col("dy")).as("dmin"))
      .where(col("dmin") >= 2L)
      .select(explode(sequence(lit(1),
        least(col("dmin") - 1L, lit(maxK.toLong)))).as("k"))
      .groupBy("k").agg(count(lit(1)).as("e_k"))
    nk.join(ek, Seq("k"), "left")
      .where(col("n_k") >= 2L)
      .select(col("k").cast("long").as("k"), col("n_k"),
        coalesce(col("e_k"), lit(0L)).as("e_k"),
        expr("(1000 * 2 * coalesce(e_k, 0L)) div (n_k * (n_k - 1))")
          .as("phi_permille"))
      .orderBy("k")
  }
}
