package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Katz centrality — the walk-counting centrality PageRank's family is
  * missing here: x(v) = Σ_k α^k · (#walks of length k ending at v),
  * computed as the truncated fixed point
  *
  *     x_{i+1}(v) = β·scale + (αNum · Σ_{u→v} m(u,v)·x_i(u)) div αDen
  *
  * in EXACT integer arithmetic on a ×`scale` grid (the
  * [[PageRank.scoresFixedPoint]] recipe: the sum is divided ONCE per
  * node per iteration, so the truncation sequence is engine-independent
  * and the unrolled-CTE oracle replays it bit for bit). Unlike PageRank
  * there is no out-degree normalization — prestige accumulates with
  * in-walk count, which is exactly what distinguishes Katz.
  *
  * CONVERGENCE IS THE CALLER'S CONTRACT: the series diverges when
  * α ≥ 1/λ_max; with integer truncation, divergence shows up as Long
  * overflow, which ANSI mode faults loudly rather than wrapping. Keep
  * αNum/αDen below 1/(max in-strength) for a safe geometric bound.
  *
  * Shape per iteration: one rank-keyed join of the multiplicity edge
  * list + a dst-keyed partial-aggregated sum — identical shuffle algebra
  * to the distributed PageRank path; state localCheckpointed every other
  * round. Output: (node, katz_fp) on the scale grid.
  */
object Katz {

  def centralityFixedPoint(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", iters: Int = 6, alphaNum: Long = 1L,
      alphaDen: Long = 8L, scale: Long = 1_000_000_000L): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters must be in [1, 64], got $iters")
    require(alphaNum > 0 && alphaDen > 0 && scale > 0,
      s"alpha/scale must be positive, got $alphaNum/$alphaDen, $scale")
    val spark = edges.sparkSession
    import spark.implicits._
    val e0 = edges.select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .where($"src".isNotNull && $"dst".isNotNull)
    val em = e0.groupBy($"src", $"dst").agg(count(lit(1)).as("m"))
      .localCheckpoint(true)
    val nodes = em.select($"src".as("node"))
      .union(em.select($"dst".as("node"))).distinct()
      .localCheckpoint(true)
    var x = nodes.withColumn("r", lit(scale))
    for (i <- 1 to iters) {
      val inc = em.join(x.select($"node".as("src"), $"r"), "src")
        .groupBy($"dst").agg(sum($"m" * $"r").as("s"))
      val next = nodes.join(inc.select($"dst".as("node"), $"s"),
          Seq("node"), "left")
        .select($"node",
          (lit(scale) +
            expr(s"($alphaNum * coalesce(s, 0L)) div $alphaDen")).as("r"))
      x = if (i % 2 == 0 || i == iters) next.localCheckpoint(true) else next
    }
    x.withColumnRenamed("r", "katz_fp")
  }
}
