package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.functions.hex_to_long

/** Deterministic threshold cascade (Watts / bootstrap percolation) —
  * how far does influence spread when a node activates once `k` of its
  * neighbors have? Seeds are the md5-sampled permille slice (the
  * repo's identity-hash sampling contract, so the "random" seed set is
  * a pure function of node names), then fixed synchronous rounds:
  * every inactive node with ≥ k currently-active neighbors activates,
  * stamped with its round. Fixed `rounds` is the truncation contract
  * the unrolled oracle replays; early convergence equals the full
  * unroll because active state only grows.
  *
  * Round cost: one active⨝edges join + one ≥k count aggregate + one
  * anti-join — per-round state is one row per active node, locally
  * checkpointed; pure shuffle algebra at any scale.
  *
  * Output: (node, active_round) — 0 for seeds, r for round-r
  * activations, −1 for nodes the cascade never reached.
  */
object Cascade {

  def thresholdCascade(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int = 2, seedPermille: Int = 100, rounds: Int = 6,
      salt: String = "seed|"): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64], got $k")
    require(seedPermille >= 1 && seedPermille <= 1000,
      s"seedPermille must be in [1, 1000], got $seedPermille")
    require(rounds >= 1 && rounds <= 32,
      s"rounds must be in [1, 32], got $rounds")
    val canonical = edges.select(
        least(col(srcCol).cast("string"), col(dstCol).cast("string")).as("x"),
        greatest(col(srcCol).cast("string"), col(dstCol).cast("string"))
          .as("y"))
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
      .distinct()
    val sym = canonical.select(col("x").as("a"), col("y").as("b"))
      .union(canonical.select(col("y").as("a"), col("x").as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = sym.select(col("a").as("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var active = nodes
      .where(hex_to_long(substring(md5(concat(lit(salt), col("node"))),
        1, 15)) % 1000L < seedPermille.toLong)
      .select(col("node"), lit(0L).as("active_round"))
      .localCheckpoint(eager = false)
    var r = 1
    var live = true
    while (r <= rounds && live) {
      val newly = sym
        .join(active.select(col("node").as("b")), Seq("b"))
        .groupBy(col("a").as("node"))
        .agg(count(lit(1)).as("n_active"))
        .where(col("n_active") >= k.toLong)
        .join(active.select("node"), Seq("node"), "left_anti")
        .select(col("node"), lit(r.toLong).as("active_round"))
        .localCheckpoint(eager = true)
      live = newly.limit(1).count() > 0
      if (live) {
        active = active.union(newly).localCheckpoint(eager = false)
      }
      r += 1
    }
    nodes.join(active, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("active_round"), lit(-1L)).as("active_round"))
      .orderBy("node")
  }

  /** Unrolled-oracle CTE chain over a `symg(a, b)` CTE: seeds a0, then
    * n<k>/a<k> per round; final active set is `a<rounds>`. Kept beside
    * the operator so the SQL and the Spark loop cannot drift.
    */
  def oracleRoundCtes(k: Int, seedPermille: Int, rounds: Int,
      salt: String = "seed|"): String = {
    val sb = new StringBuilder
    sb.append(
      s"""nodesg AS MATERIALIZED (SELECT DISTINCT a AS node FROM symg),
         |a0 AS MATERIALIZED (SELECT node, CAST(0 AS BIGINT) AS r
         |      FROM nodesg
         |      WHERE ('0x' || substr(md5('$salt' || node), 1, 15))::BIGINT
         |            % 1000 < $seedPermille)""".stripMargin)
    for (i <- 1 to rounds) {
      val prev = s"a${i - 1}"
      sb.append(
        s""",
           |n$i AS MATERIALIZED (SELECT s.a AS node, CAST($i AS BIGINT) AS r
           |      FROM symg s JOIN $prev act ON act.node = s.b
           |      WHERE s.a NOT IN (SELECT node FROM $prev)
           |      GROUP BY s.a HAVING COUNT(*) >= $k),
           |a$i AS MATERIALIZED (SELECT node, r FROM $prev
           |      UNION ALL SELECT node, r FROM n$i)""".stripMargin)
    }
    sb.toString
  }
}
