package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimRank structural similarity (Jeh & Widom 2002) — "two nodes are
  * similar when their in-neighbors are similar": the classic recursive
  * graph-similarity measure behind related-item and co-citation
  * analysis, complementary to the neighborhood-overlap family
  * (Jaccard/Adamic-Adar/NodeSketch) because it scores nodes with NO
  * shared neighbors through multi-hop structure.
  *
  * Engine-exact integer fixed point on the ppm grid: s₀ = 10⁶·[a=b];
  *
  *   s_{t+1}(a,b) = (C_ppm · Σ_{u∈I(a), v∈I(b)} s_t(u,v))
  *                  div (10⁶ · |I(a)| · |I(b)|)          (a ≠ b)
  *
  * floored every round (the statistic is DEFINED as the quantized
  * iterate — the LPA/KCore/PageRank-fp parity trick), diagonal clamped
  * to 10⁶, products in DECIMAL(38,0) (C·Σ can pass 2⁶³ on dense
  * graphs). Zero pairs are dropped each round, so only the nonzero
  * pair support ever materializes (sparse by construction).
  *
  * Scale contract: SimRank's state is inherently pair-shaped — O(V²)
  * worst case — so the operator carries a LOUD `maxNodes` gate; each
  * round is one pair⋈in-edge⋈in-edge shuffle join plus one aggregate,
  * fully distributed under the gate. For million-node graphs use the
  * sketch family instead; SimRank is the exact small-graph instrument.
  *
  * Output: (node_a, node_b, s_ppm) for node_a < node_b, s_ppm > 0
  * after `iters` rounds (symmetric, so each unordered pair once).
  */
object SimRank {

  def simRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, cPpm: Long = 800000L, maxNodes: Int = 4096): DataFrame = {
    require(iters >= 1 && iters <= 16, s"iters must be in [1, 16], got $iters")
    require(cPpm >= 1L && cPpm <= 999999L,
      s"cPpm must be in [1, 999999], got $cPpm")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(srcCol).cast("string").as("u"),
        col(dstCol).cast("string").as("a"))
      .where($"u".isNotNull && $"a".isNotNull && $"u" =!= $"a")
      .distinct()
      .localCheckpoint(true)
    val nodes = e.select($"u".as("node")).union(e.select($"a".as("node")))
      .distinct()
      .localCheckpoint(true)
    val nNodes = nodes.count()
    require(nNodes <= maxNodes,
      s"simRank: $nNodes nodes exceed the $maxNodes pair-state gate — " +
        "use the sketch similarity family at this scale")
    val din = e.groupBy($"a").agg(count(lit(1)).as("din"))
      .localCheckpoint(true)
    val diag = nodes.select($"node".as("pa"), $"node".as("pb"),
      lit(1000000L).as("s_ppm"))
    val ea = e.select($"u".as("ua"), $"a".as("na"))
    val eb = e.select($"u".as("vb"), $"a".as("nb"))
    var s = diag
    for (t <- 1 to iters) {
      val sums = s
        .join(ea, $"pa" === $"ua")
        .join(eb, $"pb" === $"vb")
        .where($"na" =!= $"nb")
        .groupBy($"na", $"nb").agg(sum($"s_ppm").as("ssum"))
      val offdiag = sums
        .join(din.select($"a".as("na"), $"din".as("da")), "na")
        .join(din.select($"a".as("nb"), $"din".as("db")), "nb")
        .select($"na".as("pa"), $"nb".as("pb"),
          expr(s"""CAST((CAST($cPpm AS DECIMAL(38,0)) * ssum)
                  | div (CAST(1000000 AS DECIMAL(38,0)) * da * db)
                  | AS BIGINT)""".stripMargin).as("s_ppm"))
        .where($"s_ppm" > 0L)
      val next = diag.union(offdiag)
      s = if (t == iters || t % 2 == 0) next.localCheckpoint(true) else next
    }
    s.where($"pa" < $"pb")
      .select($"pa".as("node_a"), $"pb".as("node_b"), $"s_ppm")
  }
}
