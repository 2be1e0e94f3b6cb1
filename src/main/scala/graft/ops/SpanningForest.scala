package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Borůvka minimum spanning forest — the cheapest edge set
  * connecting whatever can be connected (per-cluster backbone selection,
  * single-linkage clustering's dual, network-design primitive).
  *
  * Classic Borůvka rounds, all shuffle-native: every current component
  * picks its (w, x, y)-minimal CROSSING edge (map-side `min(struct(...))`
  * argmin per component, both directions), the picked edges join the
  * forest, and the picked component graph is contracted with the existing
  * [[ConnectedComponents]] operator (size-gated union-find aggregate /
  * pure-shuffle star fallback) — each round at least halves the number of
  * live components, so ≤ log₂(V) rounds total. Per round: two label
  * joins + one argmin shuffle + a CC run on a graph no larger than the
  * CURRENT component count (shrinks geometrically; at 100 TB the first
  * contraction graph is |V| rows, not |E|). Labels are locally
  * checkpointed per round to keep lineage flat.
  *
  * With distinct weights the MSF is unique regardless of tie order — the
  * driver query derives weights from the md5 identity-hash contract
  * precisely so the DuckDB Prim oracle (greedy, different algorithm)
  * provably lands on the identical edge set; ties under equal weights
  * break by (x, y) within this implementation only.
  *
  * Output: (x, y, w, round) — forest edges with the Borůvka round that
  * added them.
  */
object SpanningForest {

  def minimumSpanningForest(edges: DataFrame, srcCol: String,
      dstCol: String, weightCol: String, maxRounds: Int = 20,
      maxLocalEdges: Long = 2_000_000L): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 40,
      s"maxRounds must be in [1, 40], got $maxRounds")
    val spark = edges.sparkSession
    import spark.implicits._
    // canonical undirected edges, parallel edges collapsed to the min weight
    val canonical = edges.select(
        least(col(srcCol), col(dstCol)).as("x"),
        greatest(col(srcCol), col(dstCol)).as("y"),
        col(weightCol).cast("long").as("w"))
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
      .groupBy("x", "y").agg(min(col("w")).as("w"))
    // gated driver-local fast path (the Scc/Truss pattern): each Borůvka
    // round schedules an argmin shuffle + a full CC run — ~10 jobs — so a
    // small graph pays seconds of pure scheduling (measured 13 s for the
    // 30-edge nation graph). The local loop replays the SAME rounds
    // ((w, x, y) argmin per component, CC contraction), so `round` values
    // match the distributed path exactly.
    if (maxLocalEdges > 0 && maxLocalEdges < Int.MaxValue - 1) {
      val capped = canonical.limit(maxLocalEdges.toInt + 1)
        .as[(String, String, Long)].collect()
      if (capped.length <= maxLocalEdges) {
        if (capped.isEmpty)
          return spark.emptyDataset[(String, String, Long, Long)]
            .toDF("x", "y", "w", "round")
        return spark.createDataFrame(
          localBoruvka(capped, maxRounds).toIndexedSeq)
          .toDF("x", "y", "w", "round")
      }
    }
    val e0 = canonical.localCheckpoint(true)
    var lab = e0.select(col("x").as("node"))
      .union(e0.select(col("y").as("node"))).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint(true)
    var forest = List.empty[DataFrame]
    var round = 1
    var done = false
    while (round <= maxRounds && !done) {
      val lx = lab.select(col("node").as("x"), col("comp").as("cx"))
      val ly = lab.select(col("node").as("y"), col("comp").as("cy"))
      val crossing = e0.join(lx, "x").join(ly, "y")
        .where(col("cx") =!= col("cy"))
      if (crossing.isEmpty) done = true
      else {
        val dir = crossing.select(col("cx").as("c"),
            struct(col("w"), col("x"), col("y"), col("cy").as("oc")).as("m"))
          .union(crossing.select(col("cy").as("c"),
            struct(col("w"), col("x"), col("y"), col("cx").as("oc")).as("m")))
        val picked = dir.groupBy("c").agg(min(col("m")).as("m"))
          .select(col("m.w").as("w"), col("m.x").as("x"),
            col("m.y").as("y"), col("c"), col("m.oc").as("oc"))
          .localCheckpoint(true)
        forest ::= picked.select(col("x"), col("y"), col("w")).distinct()
          .withColumn("round", lit(round.toLong))
        // contract: components linked by picked edges merge to one label.
        // The picked comp graph has <= |live components| edges — CC on it
        // is the cheap inner step, not a second full-graph pass.
        val merged = ConnectedComponents
          .components(picked.select(col("c").as("src"), col("oc").as("dst")))
          .select(col("node").as("comp"), col("component").as("newComp"))
        lab = lab.join(merged, Seq("comp"), "left")
          .select(col("node"),
            coalesce(col("newComp"), col("comp")).as("comp"))
          .localCheckpoint(true)
      }
      round += 1
    }
    forest.reduceOption(_ unionByName _)
      .getOrElse(e0.select(col("x"), col("y"), col("w"))
        .withColumn("round", lit(0L)).limit(0))
  }

  /** In-memory Borůvka replay over a collected canonical edge list —
    * identical rounds to the distributed loop: per round every live
    * component picks its (w, x, y)-minimal crossing edge, picked edges
    * join the forest with this round's number, components merge
    * (union-find stands in for the CC contraction). */
  private def localBoruvka(edges: Array[(String, String, Long)],
      maxRounds: Int): Array[(String, String, Long, Long)] = {
    val names = {
      val s = new java.util.TreeSet[String]()
      edges.foreach { case (a, b, _) => s.add(a); s.add(b) }
      s.toArray(new Array[String](0))
    }
    val id = new java.util.HashMap[String, Int](names.length * 2)
    names.zipWithIndex.foreach { case (n, i) => id.put(n, i) }
    val parent = Array.tabulate(names.length)(identity)
    def find(a: Int): Int = {
      var r = a
      while (parent(r) != r) r = parent(r)
      var c = a
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    val es = edges.map { case (a, b, w) => (id.get(a), id.get(b), w) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, Long)]
    var round = 1
    var done = false
    while (round <= maxRounds && !done) {
      // min crossing edge per component under (w, x-name, y-name) order
      val best = new java.util.HashMap[Int, (Long, String, String, Int, Int)]()
      es.foreach { case (u, v, w) =>
        val (cu, cv) = (find(u), find(v))
        if (cu != cv) {
          val cand = (w, names(u), names(v), u, v)
          def better(a: (Long, String, String, Int, Int),
              b: (Long, String, String, Int, Int)): Boolean =
            a._1 < b._1 || (a._1 == b._1 && (a._2 < b._2 ||
              (a._2 == b._2 && a._3 < b._3)))
          val bu = best.get(cu)
          if (bu == null || better(cand, bu)) best.put(cu, cand)
          val bv = best.get(cv)
          if (bv == null || better(cand, bv)) best.put(cv, cand)
        }
      }
      if (best.isEmpty) done = true
      else {
        val picked = new java.util.HashSet[(String, String)]()
        best.values.forEach { case (w, x, y, u, v) =>
          if (picked.add((x, y))) {
            out += ((x, y, w, round.toLong))
            val (cu, cv) = (find(u), find(v))
            if (cu != cv) parent(cu) = cv
          }
        }
      }
      round += 1
    }
    out.toArray
  }
}
