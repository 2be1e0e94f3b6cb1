package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss decomposition step — the edge-level analogue of k-core: the
  * maximal subgraph in which EVERY edge closes at least (k-2) triangles
  * inside the subgraph. Stricter than k-core (every k-truss edge is in a
  * (k-1)-core) and the standard cohesive-subgraph detector for community
  * kernels in co-occurrence graphs.
  *
  * Iterative support peeling, identical truncation on both paths: per
  * round, count each surviving edge's triangles, drop edges below (k-2),
  * repeat until stable or `maxRounds` (the cap is FIXED for engine parity
  * with the unrolled SQL oracle — peeling is monotone, so early-stable
  * equals the full unroll).
  *
  * Two size-gated paths (the [[Scc.components]] pattern):
  *   - <= `maxLocalEdges` distinct edges: ONE capped collect + in-memory
  *     peeling with sorted-adjacency intersections (per round
  *     O(Σ min(deg u, deg v)), the sequential-merge bound). A 6-round
  *     peel at bench SF is ~40 scheduled distributed jobs otherwise —
  *     measured 97 s distributed vs ~2 s local at sf0.1.
  *   - above the gate: per-round [[Triangles.triangleList]] (degree-
  *     ordered orientation, O(|E|^1.5) worst case, never the naive wedge
  *     join) + corner-pair support groupBy + semi-join, per-round results
  *     locally checkpointed — the 100 TB path, all shuffle-native.
  *
  * Output: the k-truss edge set (x, y), canonical x < y.
  */
object Truss {

  def kTruss(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 8, maxLocalEdges: Long = 2_000_000L): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    require(maxRounds >= 1 && maxRounds <= 16,
      s"maxRounds must be in [1, 16], got $maxRounds")
    val spark = edges.sparkSession
    import spark.implicits._
    val minSupport = (k - 2).toLong
    val canonical = edges.select(
        least(col(srcCol), col(dstCol)).as("x"),
        greatest(col(srcCol), col(dstCol)).as("y"))
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
      .distinct()

    if (maxLocalEdges > 0 && maxLocalEdges < Int.MaxValue - 1) {
      val capped = canonical.limit(maxLocalEdges.toInt + 1)
        .as[(String, String)].collect()
      if (capped.length <= maxLocalEdges) {
        if (capped.isEmpty)
          return spark.emptyDataset[(String, String)].toDF("x", "y")
        return spark.createDataFrame(
          localTruss(capped, minSupport, maxRounds).toIndexedSeq)
          .toDF("x", "y")
      }
    }

    var e = canonical.localCheckpoint(true)
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
      // semi join: zero-triangle edges have no support row and drop out
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

  /** In-memory peel over a collected canonical edge list — round-for-round
    * identical to the distributed loop (same fixed-round truncation). */
  private def localTruss(edges: Array[(String, String)], minSupport: Long,
      maxRounds: Int): Array[(String, String)] = {
    val names = {
      val s = new java.util.TreeSet[String]()
      edges.foreach { case (a, b) => s.add(a); s.add(b) }
      s.toArray(new Array[String](0))
    }
    val id = new java.util.HashMap[String, Int](names.length * 2)
    names.zipWithIndex.foreach { case (n, i) => id.put(n, i) }
    var cur = edges.map { case (a, b) => (id.get(a), id.get(b)) }
    var round = 0
    var stable = cur.isEmpty
    while (round < maxRounds && !stable) {
      // sorted adjacency arrays for two-pointer intersection
      val deg = new Array[Int](names.length)
      cur.foreach { case (u, v) => deg(u) += 1; deg(v) += 1 }
      val adj = Array.tabulate(names.length)(i => new Array[Int](deg(i)))
      val fill = new Array[Int](names.length)
      cur.foreach { case (u, v) =>
        adj(u)(fill(u)) = v; fill(u) += 1
        adj(v)(fill(v)) = u; fill(v) += 1
      }
      var i = 0
      while (i < adj.length) { java.util.Arrays.sort(adj(i)); i += 1 }
      val kept = cur.filter { case (u, v) =>
        var s = 0L; var a = 0; var b = 0
        val au = adj(u); val av = adj(v)
        while (a < au.length && b < av.length && s < minSupport) {
          if (au(a) == av(b)) { s += 1; a += 1; b += 1 }
          else if (au(a) < av(b)) a += 1
          else b += 1
        }
        s >= minSupport
      }
      stable = kept.length == cur.length
      cur = kept
      round += 1
    }
    cur.map { case (u, v) => (names(u), names(v)) }
  }
}
