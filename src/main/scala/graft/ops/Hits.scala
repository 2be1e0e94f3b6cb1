package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs & authorities — the mutually-recursive link-analysis pair
  * the engine's PageRank/Katz family was missing:
  *
  *     a_i(v) = Σ_{u→v} h_{i-1}(u)      (authority = endorsed by hubs)
  *     h_i(u) = Σ_{u→v} a_i(v)          (hub = endorses authorities)
  *
  * run for a FIXED number of iterations from h_0 = 1 in EXACT integer
  * arithmetic with NO normalization: every score is then a walk count
  * (a_1 is in-degree, h_1 is the sum of successors' in-degrees, …), the
  * ranking is identical to the normalized variant's, and the
  * unrolled-CTE oracle replays it bit for bit — the same
  * oracle-portability decision as [[Katz]] and
  * [[PageRank.scoresFixedPoint]]. Scores grow ~λ_max² per iteration;
  * ANSI mode faults Long overflow loudly, so a too-deep iteration count
  * fails instead of silently wrapping (keep `iterations` small — the
  * HITS ranking stabilizes in a handful of rounds).
  *
  * Shape per iteration: two src/dst-keyed partial-aggregated join+sum
  * passes over the edge list — pure shuffle algebra, no driver state, no
  * windows; the edge list is persisted by the caller when shared. Nodes
  * with no in-edges (resp. out-edges) keep score 0 via the left join on
  * the node universe, so the output covers every node exactly once.
  */
object Hits {

  /** (node, auth_fp, hub_fp) after `iterations` full a/h rounds. */
  def hubsAuthorities(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 2): DataFrame = {
    require(iterations >= 1 && iterations <= 6,
      s"iterations must be in [1, 6] (integer scores grow ~λ² per round), " +
        s"got $iterations")
    val e = edges.select(col(srcCol).cast("string").as("s"),
        col(dstCol).cast("string").as("t"))
      .where(col("s").isNotNull && col("t").isNotNull)
    val nodes = e.select(col("s").as("node"))
      .union(e.select(col("t").as("node"))).distinct()

    // h starts as the all-ones vector: the first authority pass is then
    // plain in-degree, so iteration 1 needs no join at all
    var auth: DataFrame = null
    var hub: DataFrame = e.select(col("s").as("node")).distinct()
      .withColumn("score", lit(1L))
    for (_ <- 1 to iterations) {
      auth = e.join(hub.select(col("node").as("s"), col("score").as("hs")),
          Seq("s"))
        .groupBy(col("t").as("node"))
        .agg(sum(col("hs")).as("score"))
      hub = e.join(auth.select(col("node").as("t"), col("score").as("as")),
          Seq("t"))
        .groupBy(col("s").as("node"))
        .agg(sum(col("as")).as("score"))
      auth = auth.localCheckpoint(eager = false)
      hub = hub.localCheckpoint(eager = false)
    }
    nodes
      .join(auth.select(col("node"), col("score").as("auth_fp")), Seq("node"),
        "left")
      .join(hub.select(col("node"), col("score").as("hub_fp")), Seq("node"),
        "left")
      .select(col("node"),
        coalesce(col("auth_fp"), lit(0L)).as("auth_fp"),
        coalesce(col("hub_fp"), lit(0L)).as("hub_fp"))
  }
}
