package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard LAYOUT AUDIT — the check before a data-parallel run
  * strides a corpus across N workers: assign every document to one of
  * `numShards` shards by salted content-free hash (md5 of the id — the
  * assignment must be reproducible across engines and runs, never
  * partition-dependent), then report per shard the row count, the token
  * mass, the mass share in ppm, and the distinct-group coverage
  * (sources / languages per shard). What it catches: mass imbalance (one
  * shard 3% heavier = every step waits on it — the straggler is decided
  * HERE, not in the trainer) and group starvation (a shard that never
  * sees a source biases its worker's gradient stream).
  *
  * Distinct from [[Splits.stratifiedSplit]] (train/test membership) and
  * [[ZOrderLayout.layout]] (file-level locality for range pruning): this
  * is the worker-axis layout, and the audit is the deliverable — the
  * assignment column itself is one projection.
  *
  * Shape: one groupBy(shard) with count/sum partial aggregation plus one
  * count_distinct (its own exchange on (shard, group) — the price of the
  * starvation check), and a 1-row total broadcast for shares. Nothing
  * here depends on corpus size beyond those aggregations.
  *
  * The reference has no layout surface; beyond-reference pipeline
  * operator in the curation family ([[TokenBudget]], [[Packing]]).
  *
  * Output: (shard, n_rows, tot_w, share_ppm, n_groups), one row per
  * non-empty shard.
  */
object ShardLayout {

  def layoutAudit(df: DataFrame, idCol: String, weightCol: String,
      groupCol: String, numShards: Int): DataFrame = {
    require(numShards >= 1 && numShards <= (1 << 20),
      s"numShards must be in [1, 2^20], got $numShards")
    val assigned = df.select(
      pmod(graft.functions.functions.hex_to_long(substring(
          md5(concat(lit("shard"), col(idCol).cast("string"))), 1, 15)),
        lit(numShards.toLong)).as("shard"),
      // a null weight is corruption, not zero mass — raise, don't skip
      // (sum() would silently drop it and the shares would still print)
      when(col(weightCol).isNull,
        raise_error(concat(lit("shard layout: null weight for id "),
          col(idCol).cast("string"))))
        .otherwise(col(weightCol).cast("long")).as("__w"),
      col(groupCol).as("__g"))
    val per = assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__w")).as("tot_w"),
        count_distinct(col("__g")).as("n_groups"))
    val tot = per.agg(sum(col("tot_w")).as("__tot"))
      .select(when(col("__tot") <= 0L,
        raise_error(lit("shard layout: non-positive total mass — " +
          "nothing to lay out")))
        .otherwise(col("__tot")).as("__tot"))
    per.crossJoin(broadcast(tot))
      .select(col("shard"), col("n_rows"), col("tot_w"),
        expr("(tot_w * 1000000L) div __tot").as("share_ppm"),
        col("n_groups"))
  }
}
