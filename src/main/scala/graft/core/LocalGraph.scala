package graft.core

/** Compact adjacency snapshot of a (small) graph, built on the driver and
  * broadcast to executors for the per-source traversal operators
  * (shortest paths, betweenness). Node ids are dense ints assigned by
  * first appearance in the supplied edge order — `from` before `to` within
  * a row, mirroring the reference's dictionary encoding
  * (reference: src/graph_utils.rs:66-76).
  *
  * This is the broadcast fast path: it requires the EDGE LIST (not the
  * data) to fit on the driver; callers guard with `maxLocalEdges`. The
  * documented scale path for graphs beyond that is Pregel SSSP /
  * source-sampled Brandes (SURVEY.md §7.6).
  *
  * Multi-edges are preserved — the reference counts them with multiplicity
  * in PageRank outdegree and Brandes path counts.
  */
final case class LocalGraph(
    names: Array[String],
    index: Map[String, Int],
    adj: Array[Array[(Int, Long)]]) {
  def numNodes: Int = names.length
}

object LocalGraph {

  /** @param directed when false, each edge is inserted in both directions
    *   (reference: src/shortest_path.rs:140-146).
    */
  def fromEdges(rows: Seq[(String, String, Long)], directed: Boolean): LocalGraph = {
    val index = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def id(name: String): Int = index.getOrElseUpdate(name, index.size)
    val resolved = rows.map { case (f, t, c) => (id(f), id(t), c) }
    val n = index.size
    val buf = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[(Int, Long)])
    resolved.foreach { case (f, t, c) =>
      buf(f) += ((t, c))
      if (!directed) buf(t) += ((f, c))
    }
    LocalGraph(index.keys.toArray, index.toMap, buf.map(_.toArray))
  }
}
