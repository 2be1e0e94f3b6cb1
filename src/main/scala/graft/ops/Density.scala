package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-density clustering (DBSCAN's scalable cousin): quantize points
  * to an eps-grid on two projection axes, call a cell "core" when it
  * holds at least minPts points, connect 8-adjacent core cells, and
  * label every point by its cell's component — GriT-DBSCAN/GridDBSCAN
  * family, the way density clustering actually runs at corpus scale
  * (cluster structure lives on the CELL dimension, never on points).
  *
  * Per point: (id, cell_x, cell_y, cluster, kind) — kind is 'core'
  * (point in a core cell), 'border' (non-core cell 8-adjacent to ≥1
  * core cell; cluster = MIN adjacent cluster id, the deterministic
  * tie-break), or 'noise' (cluster NULL). Cluster ids are the min
  * "cx:cy" member string of the core-cell component — the same
  * min-label convention as [[ConnectedComponents.components]], so the
  * DuckDB oracle replays it with a recursive min-label CTE.
  *
  * Portability: eps MUST be a power of two — v/eps is then an exact
  * float scaling, floor is exact, and both engines land every point in
  * the identical cell (no decimal-boundary coin flips). Enforced.
  *
  * Scale shape: one scan → (cell) hash agg; everything structural
  * (core filter, 8-neighbor join, components) runs on the CELL
  * dimension (bounded by spread/eps², not by rows); the two point-level
  * joins broadcast the cell→cluster dictionaries. No windows, no
  * driver state beyond the gated CC fast path.
  */
object Density {

  private val offsets = for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)

  /** 2-D radius self-join (planar range search) — all point pairs
    * within L2 distance eps on the first two projection axes, the
    * spatial primitive behind contact tracing / co-location / blocking:
    * coordinates quantize to integers (×10000 floor — the repo's vector
    * convention), cells are epsQ-wide via the exact floor-division
    * pmod identity (Spark `div` truncates; (x − pmod(x, c)) div c IS
    * the floor), candidates come from the 9-cell neighborhood join and
    * are verified by the EXACT integer squared distance — a pair within
    * eps can never span more than one cell per axis, so the candidate
    * set is complete.
    *
    * epsQ is the quantized radius (eps·10000, must be a positive
    * integer — e.g. 0.125 → 1250). Candidate volume is Σ|cell|²-ish
    * over the 9-neighborhoods — the grid is the LSH here; never
    * all-pairs. Output: (id_a, id_b, dist_sq_q) with id_a < id_b,
    * dist_sq_q ≤ epsQ².
    */
  def radiusPairs(df: DataFrame, idCol: String, vecCol: String,
      epsQ: Long): DataFrame = {
    require(epsQ >= 1, s"epsQ must be a positive integer, got $epsQ")
    val pts = df.select(col(idCol).as("id"),
        floor(element_at(col(vecCol), 1).cast("double") * lit(10000.0))
          .cast("long").as("xq"),
        floor(element_at(col(vecCol), 2).cast("double") * lit(10000.0))
          .cast("long").as("yq"))
      .where(col("xq").isNotNull && col("yq").isNotNull)
      .withColumn("cx", expr(s"(xq - pmod(xq, $epsQ)) div $epsQ"))
      .withColumn("cy", expr(s"(yq - pmod(yq, $epsQ)) div $epsQ"))
    val spark = df.sparkSession
    import spark.implicits._
    val off = offsets.toDF("dx", "dy")
    val probes = pts.crossJoin(broadcast(off))
      .select(col("id").as("id_a"), col("xq").as("xa"), col("yq").as("ya"),
        (col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"))
    probes
      .join(pts.select(col("id").as("id_b"), col("xq").as("xb"),
        col("yq").as("yb"), col("cx"), col("cy")), Seq("cx", "cy"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        ((col("xa") - col("xb")) * (col("xa") - col("xb"))
          + (col("ya") - col("yb")) * (col("ya") - col("yb")))
          .as("dist_sq_q"))
      .where(col("dist_sq_q") <= epsQ * epsQ)
    // exactly-once WITHOUT a distinct: b lives in exactly one cell, a
    // probes 9 distinct cells, and id_a < id_b drops the mirror — so a
    // qualifying pair meets exactly once. (A trailing distinct here was
    // the operator's single biggest shuffle — output-sized, 116M rows at
    // the 16x probe — and provably dedups nothing; DensitySpec pins the
    // no-duplicate invariant on a coincident-point fixture.)
  }

  def gridDbscan(df: DataFrame, idCol: String, vecCol: String,
      eps: Double, minPts: Long): DataFrame = {
    require(eps > 0 && java.lang.Math.getExponent(eps) >= -30 &&
      eps == java.lang.Math.scalb(1.0, java.lang.Math.getExponent(eps)),
      s"eps must be a power of two for exact cell assignment, got $eps")
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    val spark = df.sparkSession
    import spark.implicits._

    val pts = df.select(col(idCol).as("id"),
      floor(element_at(col(vecCol), 1).cast("double") / lit(eps))
        .cast("long").as("cell_x"),
      floor(element_at(col(vecCol), 2).cast("double") / lit(eps))
        .cast("long").as("cell_y"))
      .where(col("cell_x").isNotNull && col("cell_y").isNotNull)

    val cells = pts.groupBy(col("cell_x"), col("cell_y"))
      .agg(count(lit(1)).as("n"))
    val core = cells.where(col("n") >= minPts)
      .select(col("cell_x"), col("cell_y"),
        concat(col("cell_x").cast("string"), lit(":"),
          col("cell_y").cast("string")).as("node"))

    val off = offsets.toDF("dx", "dy")
    // 8-neighbor (plus self, keeping singleton core cells as CC nodes)
    // core-to-core edges; symmetric by construction of the offset set
    val edges = core.as("a")
      .crossJoin(broadcast(off))
      .join(core.as("b"),
        col("b.cell_x") === col("a.cell_x") + col("dx") &&
          col("b.cell_y") === col("a.cell_y") + col("dy"))
      .select(col("a.node").as("src"), col("b.node").as("dst"))
    val comp = ConnectedComponents.components(edges)

    val coreClusters = core.join(comp, core("node") === comp("node"))
      .select(col("cell_x"), col("cell_y"), col("component").as("cluster"))
    val borderClusters = cells.where(col("n") < minPts)
      .select(col("cell_x").as("bx"), col("cell_y").as("by"))
      .crossJoin(broadcast(off))
      .join(coreClusters,
        col("cell_x") === col("bx") + col("dx") &&
          col("cell_y") === col("by") + col("dy"))
      .groupBy(col("bx"), col("by"))
      .agg(min(col("cluster")).as("cluster"))
      .select(col("bx").as("cell_x"), col("by").as("cell_y"),
        col("cluster"))

    pts
      .join(broadcast(coreClusters.withColumnRenamed("cluster", "__core")),
        Seq("cell_x", "cell_y"), "left")
      .join(broadcast(borderClusters.withColumnRenamed("cluster", "__bord")),
        Seq("cell_x", "cell_y"), "left")
      .select(col("id"), col("cell_x"), col("cell_y"),
        coalesce(col("__core"), col("__bord")).as("cluster"),
        when(col("__core").isNotNull, lit("core"))
          .when(col("__bord").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("kind"))
  }
}
