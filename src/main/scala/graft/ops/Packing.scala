package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Complementary-pair SEQUENCE PACKING — the pre-training batching step:
  * documents are packed into fixed-capacity context windows so padding
  * (wasted compute) is minimized. The deterministic rule here is the
  * classic sorted complementary pairing (the simplest member of the
  * Krell et al. 2021 packing family): rank docs by length descending,
  * pair the r-th LONGEST with the r-th SHORTEST (rank N+1−r) when the two
  * fit the capacity together; a pair that does not fit leaves both as
  * singletons, and the middle element of an odd corpus is a singleton.
  * One pass, no sequential bin state — every assignment is a pure
  * function of (rank, partner rank, the two lengths), which is what makes
  * the operator distributable AND oracle-checkable row-for-row (true
  * first-fit packing is an inherently sequential fold; its greedy bin
  * state cannot be expressed as a per-row function, so it neither scales
  * nor oracles — the pairing rule recovers most of the fill at none of
  * the coordination).
  *
  * Shape: one global ranking on [[Ranks.globalRowNumber]] (range exchange
  * + per-partition numbering — never a single-partition window), one
  * 1-row COUNT broadcast, ONE equi-join of the ranked table to itself on
  * rank = N+1−rank (shuffle on the rank key), and a union of the three
  * member classes (long side, short side, odd middle). At 100 TB the
  * corpus ranking is a range exchange and the pairing join is
  * uniformly keyed by construction — rank keys are unique, so there are
  * no hot buckets, ever.
  *
  * Integer-exact: fill_ppm = pack_len·10⁶ div capacity. A document longer
  * than the capacity stays a singleton with fill_ppm > 10⁶ — reported
  * honestly, not clipped (the downstream truncation policy is the
  * trainer's decision, not the packer's). Negative lengths raise loudly.
  *
  * The reference has no batching surface; beyond-reference pipeline
  * operator in the curation family. The packing family's other member is
  * [[Chunker.packContiguous]] — ORDER-PRESERVING running-sum binning (for
  * corpora whose document order carries meaning, packed per shard); this
  * operator is the REORDERING form that trades order for fill (pair long
  * with short), the choice when documents are exchangeable. [[TokenBudget]]
  * apportions ACROSS groups; packing lays out WITHIN a batch.
  *
  * Output: one row per document —
  * (doc_id, len, rnk, pack_id, n_members, pack_len, fill_ppm), where
  * pack_id is the LONGER member's doc id (a pack's stable name).
  */
object Packing {

  def packPairs(df: DataFrame, idCol: String, lenCol: String,
      capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be > 0, got $capacity")
    val base = df.select(col(idCol).cast("long").as("doc_id"),
      when(col(lenCol).cast("long") < 0L || col(lenCol).isNull,
        raise_error(concat(lit("packPairs: negative or null length for doc "),
          col(idCol).cast("string"))))
        .otherwise(col(lenCol).cast("long")).as("len"))
    val total = base.agg(count(lit(1)).as("__n"))
    val ranked = Ranks.globalRowNumber(
        base.withColumn("__neglen", -col("len")), Seq("__neglen", "doc_id"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("len"), col("grn").as("rnk"),
        (col("__n") + 1L - col("grn")).as("__partner"))
    val lhs = ranked.where(col("rnk") < col("__partner"))
      .select(col("doc_id").as("id_l"), col("len").as("len_l"),
        col("rnk").as("r_l"), col("__partner").as("p_l"))
    val rhs = ranked.select(col("doc_id").as("id_s"),
      col("len").as("len_s"), col("rnk").as("r_s"))
    val j = lhs.join(rhs, col("r_s") === col("p_l"))
    val formed = col("len_l") + col("len_s") <= lit(capacity)
    val longRows = j.select(col("id_l").as("doc_id"), col("len_l").as("len"),
      col("r_l").as("rnk"), col("id_l").as("pack_id"),
      when(formed, 2L).otherwise(1L).as("n_members"),
      when(formed, col("len_l") + col("len_s")).otherwise(col("len_l"))
        .as("pack_len"))
    val shortRows = j.select(col("id_s").as("doc_id"), col("len_s").as("len"),
      col("r_s").as("rnk"),
      when(formed, col("id_l")).otherwise(col("id_s")).as("pack_id"),
      when(formed, 2L).otherwise(1L).as("n_members"),
      when(formed, col("len_l") + col("len_s")).otherwise(col("len_s"))
        .as("pack_len"))
    val middle = ranked.where(col("rnk") === col("__partner"))
      .select(col("doc_id"), col("len"), col("rnk"),
        col("doc_id").as("pack_id"), lit(1L).as("n_members"),
        col("len").as("pack_len"))
    longRows.unionByName(shortRows).unionByName(middle)
      .withColumn("fill_ppm", expr(s"(pack_len * 1000000L) div ${capacity}L"))
  }
}
