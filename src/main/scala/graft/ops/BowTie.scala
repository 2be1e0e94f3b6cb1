package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Bow-tie decomposition of a directed graph (Broder et al. 2000,
  * "Graph structure in the Web") — the canonical macro-structure
  * answer: how much of the graph is the giant strongly-connected CORE,
  * how much feeds IN (reaches the core), flows OUT (reachable from the
  * core), and how much is disconnected tendril/other mass.
  *
  * CORE is the largest SCC from [[Scc.components]] (ties broken by the
  * smallest component id). IN/OUT come from two frontier
  * reachability loops seeded at the core — each round is one edge join
  * + distinct + anti-join (only NEW nodes stay on the frontier), with
  * per-round localCheckpoint and a driver count per round (the CC
  * convergence discipline; rounds are bounded by the graph's
  * diameter). Nothing driver-sized beyond the 1-row counts.
  *
  * Output (one row): (n_nodes, n_core, n_in, n_out, n_other).
  */
object BowTie {

  def decompose(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK) // probed every BFS round
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    val scc = Scc.components(e)
    val core = scc
      .groupBy("scc_id").agg(count(lit(1)).as("sz"))
      .orderBy(col("sz").desc, col("scc_id")).limit(1)
      .join(scc, Seq("scc_id"))
      .select(col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    /** All nodes reachable from `seed` along `adj(from, to)`,
      * EXCLUDING the seed set itself. */
    def reach(seed: DataFrame, fromCol: String, toCol: String): DataFrame = {
      var visited = seed.select(col("node")).localCheckpoint(true)
      var frontier = visited
      var grew = true
      while (grew) {
        val next = frontier
          .join(e, col("node") === col(fromCol))
          .select(col(toCol).as("node")).distinct()
          .join(visited, Seq("node"), "left_anti")
          .localCheckpoint(true)
        grew = next.limit(1).count() > 0
        if (grew) {
          visited = visited.union(next).localCheckpoint(true)
          frontier = next
        }
      }
      visited.join(seed, Seq("node"), "left_anti")
    }

    val out = reach(core, "src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    val in = reach(core, "dst", "src").persist(StorageLevel.MEMORY_AND_DISK)

    val nAll = nodes.agg(count(lit(1)).as("n_nodes"))
    val nCore = core.agg(count(lit(1)).as("n_core"))
    val nOut = out.agg(count(lit(1)).as("n_out"))
    val nIn = in.agg(count(lit(1)).as("n_in"))
    nAll.crossJoin(broadcast(nCore))
      .crossJoin(broadcast(nIn))
      .crossJoin(broadcast(nOut))
      .select(col("n_nodes"), col("n_core"), col("n_in"), col("n_out"),
        (col("n_nodes") - col("n_core") - col("n_in") - col("n_out"))
          .as("n_other"))
  }
}
