package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strongly connected components of a DIRECTED edge list — the directed
  * sibling of [[ConnectedComponents]] (user-journey graphs, link graphs,
  * dependency graphs all need mutual-reachability, not just contact).
  *
  * Algorithm: forward/backward min-label peeling. Per round:
  *
  *   f(v) = min id u with a directed path u →* v   (forward propagation)
  *   b(v) = min id u with a directed path v →* u   (backward propagation)
  *
  * If f(v) = b(v) = m then m reaches v and v reaches m, so v ∈ SCC(m);
  * conversely every SCC whose min-reaching and min-reached ids coincide is
  * fully labeled in the round (in particular the SCC of the globally
  * smallest surviving id, so each round strictly shrinks the graph —
  * rounds are bounded by the depth of the min-id chain in the condensation
  * DAG, small on real graphs). Extracted nodes and their edges peel off;
  * the rest re-runs.
  *
  * Everything is shuffle algebra: propagation is a join + min-aggregate
  * per step with an order-insensitive convergence signature (one 1-row
  * action per step, the [[ConnectedComponents]] pattern), peeling is two
  * left-anti joins, `localCheckpoint` truncates the plan per step. No
  * driver-side graph state at any size. Node ids travel as strings and
  * component ids are lexicographic mins, matching the repo's other graph
  * operators.
  */
object Scc {

  /** (node, scc_id) for every node incident to an edge.
    *
    * `maxRounds` is a loud-abort guard, not a tuning knob: rounds are
    * bounded by the min-id-chain depth of the condensation DAG, and each
    * round extracts EVERY SCC whose forward and backward mins coincide —
    * typically a large fraction, so real graphs finish in a handful of
    * rounds. The worst case is adversarial: a path graph whose ids
    * strictly DESCEND along the edges peels exactly one SCC per round
    * (only the globally smallest id has f = b). 256 therefore covers any
    * condensation chain 256 deep; a deeper one aborts via `require` with
    * the remaining-node count rather than looping silently (raise the
    * parameter if a legitimately deeper id-descending chain exists).
    */
  def components(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", maxRounds: Int = 256,
      maxPropSteps: Int = 128): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    var e = edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .where($"src".isNotNull && $"dst".isNotNull && $"src" =!= $"dst")
      .distinct().localCheckpoint(true)
    var nodes = e.select($"src".as("node")).union(e.select($"dst".as("node")))
      .distinct().localCheckpoint(true)
    var result = spark.emptyDataset[(String, String)]
      .toDF("node", "scc_id")
    var round = 0
    var remaining = nodes.count()
    while (remaining > 0) {
      require(round < maxRounds,
        s"SCC peeling did not converge in $maxRounds rounds ($remaining nodes left)")
      val f = minPropagate(nodes, e, forward = true, maxPropSteps)
        .withColumnRenamed("m", "fmin")
      val b = minPropagate(nodes, e, forward = false, maxPropSteps)
        .withColumnRenamed("m", "bmin")
      val done = f.join(b, "node").where($"fmin" === $"bmin")
        .select($"node", $"fmin".as("scc_id")).localCheckpoint(true)
      result = result.union(done)
      val doneNodes = done.select("node")
      nodes = nodes.join(doneNodes, Seq("node"), "left_anti").localCheckpoint(true)
      e = e.join(doneNodes.select($"node".as("src")), Seq("src"), "left_anti")
        .join(doneNodes.select($"node".as("dst")), Seq("dst"), "left_anti")
        .select("src", "dst").localCheckpoint(true)
      remaining = nodes.count()
      round += 1
    }
    result
  }

  /** Min-label propagation to fixpoint: m(v) = min over {v} ∪ {m(u) :
    * edge u→v} (or v→u when backward), iterated until the label multiset
    * signature stops changing. */
  private def minPropagate(nodes: DataFrame, e: DataFrame, forward: Boolean,
      maxSteps: Int): DataFrame = {
    import nodes.sparkSession.implicits._
    val (msgFrom, msgTo) = if (forward) ("src", "dst") else ("dst", "src")
    var lab = nodes.select($"node", $"node".as("m")).localCheckpoint(true)
    def sigOf(df: DataFrame) =
      df.agg(count(lit(1)), coalesce(bit_xor(xxhash64($"node", $"m")), lit(0L)))
        .first()
    var prevSig = sigOf(lab)
    var step = 0
    var converged = false
    while (!converged) {
      require(step < maxSteps, s"min propagation exceeded $maxSteps steps")
      val msgs = lab.join(e, $"node" === col(msgFrom))
        .select(col(msgTo).as("node"), $"m")
      val next = lab.select($"node", $"m").union(msgs)
        .groupBy($"node").agg(min($"m").as("m")).localCheckpoint(true)
      val sig = sigOf(next)
      converged = sig == prevSig
      prevSig = sig
      lab = next
      step += 1
    }
    lab
  }
}
