package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Time-respecting reachability (earliest arrival) over a TEMPORAL edge
  * list (src, dst, t) — the diffusion primitive: v is reachable from s
  * when a path exists whose edge times STRICTLY increase, and the
  * earliest-arrival time is the min final edge time over such paths.
  * "Who could event X have influenced, and how fast" — the question
  * behind contamination tracing, influence analysis, and lineage cutoff
  * checks; plain reachability over the static graph OVERCOUNTS because it
  * happily walks backwards in time.
  *
  * Hop-synchronous relaxation, `rounds` fixed (paths of ≤ `rounds` edges
  * — the k-core/LPA partial-fixpoint parity trick, both engines compute
  * the identical truncation):
  *
  *   frontier ⋈ edges ON v = src AND t > arr   (equi key + time residual)
  *   → per-(source, node) min, kept only where it IMPROVES the best
  *     arrival so far; improved pairs are the next frontier.
  *
  * Unlike unweighted BFS ([[Harmonic]]'s anti-join trick), a LATER round
  * can improve an arrival found earlier (a longer path may end on an
  * earlier-timed edge), so the visited set must min-MERGE: rounds are
  * checkpointed improvement deltas and the final answer is one
  * (source, node) min-aggregation over their union. State is
  * |sources| × |temporal reach|, never the event stream; no driver state.
  *
  * Output: (s, node, earliest_us), the trivial (s, s, startUs) seed rows
  * excluded. A cycle back to the source is NOT re-emitted: the source's
  * earliest arrival is its own start time, already minimal — arrivals are
  * first-touch times, not revisit times.
  */
object TemporalReach {

  def earliestArrival(tedges: DataFrame, srcCol: String, dstCol: String,
      tCol: String, sources: DataFrame, rounds: Int,
      startUs: Long = -1L): DataFrame = {
    require(rounds >= 1 && rounds <= 12, s"rounds must be in [1, 12], got $rounds")
    val e = tedges.select(col(srcCol).as("a"), col(dstCol).as("b"),
        col(tCol).cast("long").as("t"))
      .where(col("a").isNotNull && col("b").isNotNull && col("t").isNotNull)
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK) // probed every round
    val init = sources.select(col(sources.columns.head).as("s"))
      .distinct()
      .select(col("s"), col("s").as("v"), lit(startUs).as("arr"))
      .localCheckpoint(true)
    var parts = List(init)
    var frontier = init
    for (_ <- 1 to rounds) {
      val best = parts.reduce(_ unionByName _)
        .groupBy(col("s"), col("v")).agg(min(col("arr")).as("old_arr"))
      val improved = frontier.join(e, col("v") === col("a") && col("t") > col("arr"))
        .select(col("s"), col("b").as("v2"), col("t").as("arr"))
        .withColumnRenamed("v2", "v")
        .groupBy(col("s"), col("v")).agg(min(col("arr")).as("arr"))
        .join(best, Seq("s", "v"), "left")
        .where(col("old_arr").isNull || col("arr") < col("old_arr"))
        .select(col("s"), col("v"), col("arr"))
        .localCheckpoint(true)
      parts ::= improved
      frontier = improved
    }
    parts.reduce(_ unionByName _)
      .where(!(col("v") === col("s") && col("arr") === startUs))
      .groupBy(col("s"), col("v").as("node"))
      .agg(min(col("arr")).as("earliest_us"))
  }
}
