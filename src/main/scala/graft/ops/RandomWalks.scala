package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic hash-guided graph walks — the sampling primitive behind
  * node2vec/DeepWalk-style embedding pipelines (corpus of node sequences
  * fed to a sequence model) and behind walk-based similarity features.
  *
  * True random walks are unverifiable across engines, so the "coin" is the
  * repo's identity-hash contract: at node v on step t of walk w, move to
  * the out-neighbor u minimizing
  * `hex_to_long(md5(salt‖w‖'|'‖t‖'|'‖u)[1..15])` (ties → smallest u).
  * That is a fixed pseudo-random permutation per (walk, step), so walks
  * LOOK uniform but replay identically in Spark and the DuckDB oracle —
  * the same trick the matching/sampling operators use. Walks stop early
  * at sink nodes (no out-edges → no row for that step).
  *
  * Scale shape: one walk per seed, any number of seeds. Each step is ONE
  * shuffle-hash join of the frontier (|walks| rows) against the edge list
  * keyed by src, then an argmin `min(struct(score, dst))` groupBy that
  * partial-aggregates map-side — no window, no per-node edge collection.
  * Steps are a fixed small constant (walk length), so the plan is
  * `steps` joins deep; each frontier is locally checkpointed to keep
  * lineage flat. At 100 TB this is exactly the join-per-step shape of the
  * published distributed node2vec implementations, minus the alias-table
  * bias (deliberately: unbiased 1st-order walks are what the hash oracle
  * can mirror).
  */
object RandomWalks {

  /** @param edges directed edge list; duplicates are fine (deduped here)
    * @param seeds one walk per row; `seedCol` is both walk id and start node
    * @return (walk_id, step, node) with step 0 = the seed itself
    */
  def walks(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, steps: Int,
      salt: String = "walk"): DataFrame = {
    require(steps >= 1 && steps <= 32, s"steps must be in [1, 32], got $steps")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint(true)
    var cur = seeds.select(col(seedCol).as("walk_id"),
      col(seedCol).as("node"), lit(0L).as("step"))
    var parts = List(cur)
    for (t <- 1 to steps) {
      val scored = cur.select(col("walk_id"), col("node"))
        .join(e, col("node") === col("src"))
        .withColumn("score", graft.functions.functions.hex_to_long(
          substring(md5(concat(lit(salt), col("walk_id"),
            lit(s"|$t|"), col("dst"))), 1, 15)))
      cur = scored.groupBy("walk_id")
        .agg(min(struct(col("score"), col("dst"))).as("m"))
        .select(col("walk_id"), col("m.dst").as("node"),
          lit(t.toLong).as("step"))
        .localCheckpoint(true)
      parts ::= cur
    }
    parts.reduce(_ unionByName _)
  }
}
