package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Targeted-attack robustness audit (Albert–Jeong–Barabási style): how
  * much of the graph's largest connected component survives removing
  * the top-k degree hubs? The one-row before/after summary is the
  * standard resilience probe for infrastructure and interaction graphs
  * — scale-free graphs shatter under hub removal, exponential ones
  * don't.
  *
  * Hubs are the k highest-degree nodes with DETERMINISTIC (degree desc,
  * node asc) tie-breaks. Nodes that lose all edges vanish from the
  * after-graph (edge-list CC semantics — isolated singletons are not
  * components here; n_nodes_after counts surviving endpoints).
  *
  * Shape: degree aggregate (node-dimension) → k-row hub table
  * (broadcast anti-joins) → [[ConnectedComponents.components]] twice —
  * each the gated union-find aggregate / distributed CC of the
  * components family; everything else is 1-row rollups.
  *
  * Output (one row): (n_nodes, m_edges, lcc, n_nodes_after,
  * m_edges_after, lcc_after).
  */
object Robustness {

  def hubRemovalImpact(edges: DataFrame, srcCol: String, dstCol: String,
      topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK) // degree + CC + anti-joins
    val deg = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val hubs = deg.orderBy(col("d").desc, col("node")).limit(topK)
      .select("node")
    val eAfter = e
      .join(broadcast(hubs.withColumnRenamed("node", "src")), Seq("src"),
        "left_anti")
      .join(broadcast(hubs.withColumnRenamed("node", "dst")), Seq("dst"),
        "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)

    def summary(g: DataFrame, suffix: String): DataFrame = {
      val sizes = ConnectedComponents.components(g)
        .groupBy("component").agg(count(lit(1)).as("sz"))
      val counts = g.agg(count(lit(1)).as(s"m_edges$suffix"))
        .crossJoin(broadcast(
          g.select(col("src").as("n")).union(g.select(col("dst").as("n")))
            .distinct().agg(count(lit(1)).as(s"n_nodes$suffix"))))
        .crossJoin(broadcast(sizes.agg(
          coalesce(max(col("sz")), lit(0L)).as(s"lcc$suffix"))))
      counts.select(s"n_nodes$suffix", s"m_edges$suffix", s"lcc$suffix")
    }

    summary(e, "").crossJoin(broadcast(summary(eAfter, "_after")))
  }

  /** Random-failure percolation sweep — the contrast experiment to
    * [[hubRemovalImpact]]'s targeted attack: remove each node
    * independently with (replayable) probability f/1000 — node n dies
    * at fraction f iff its md5 lane mod 1000 < f, so the SAME nodes die
    * at every higher fraction (a proper percolation process, nested
    * removals) — and report the surviving giant component per
    * fraction. Scale-free graphs survive random failure but shatter
    * under attack; comparing the two curves is the classic
    * Albert–Jeong–Barabási experiment.
    *
    * One row per fraction (0 included): (f_permille, n_nodes, m_edges,
    * lcc) — CC runs once per fraction over the filtered edge set.
    */
  def randomFailureSweep(edges: DataFrame, srcCol: String, dstCol: String,
      fractionsPermille: Seq[Int], salt: String = "perc"): DataFrame = {
    require(fractionsPermille.nonEmpty &&
      fractionsPermille.forall(f => f >= 1 && f <= 999),
      s"fractions are permille in [1, 999], got $fractionsPermille")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    def lane(c: org.apache.spark.sql.Column) =
      pmod(graft.functions.functions.hex_to_long(
        substring(md5(concat(lit(salt), c)), 1, 13)), lit(1000L))

    def row(f: Int): DataFrame = {
      val g =
        if (f == 0) e
        else e.where(lane(col("src")) >= f && lane(col("dst")) >= f)
      val sizes = ConnectedComponents.components(g)
        .groupBy("component").agg(count(lit(1)).as("sz"))
      g.agg(count(lit(1)).as("m_edges"))
        .crossJoin(broadcast(
          g.select(col("src").as("n")).union(g.select(col("dst").as("n")))
            .distinct().agg(count(lit(1)).as("n_nodes"))))
        .crossJoin(broadcast(sizes.agg(
          coalesce(max(col("sz")), lit(0L)).as("lcc"))))
        .select(lit(f).as("f_permille"), col("n_nodes"), col("m_edges"),
          col("lcc"))
    }

    (0 +: fractionsPermille.sorted).map(row).reduce(_ union _)
  }
}
