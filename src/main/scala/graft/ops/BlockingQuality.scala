package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Blocking-quality audit — the two numbers that justify (or condemn)
  * a dedup blocking scheme before the expensive verify stage runs:
  *
  *   - pair recall: what fraction of the TRUE near-dup pairs does the
  *     candidate set retain? (misses here are unfixable downstream)
  *   - reduction ratio: what fraction of the n·(n−1)/2 all-pairs work
  *     does blocking eliminate? (the whole point of blocking)
  *
  * Both exact integers — recall in permille, reduction in ppm. A
  * blocking with recall 990 and reduction 999 990 is doing its job; a
  * recall of 700 means 30% of duplicates survive the pipeline no
  * matter how good the verifier is.
  *
  * Shape: one semi-join for the hit count plus three scalar counts,
  * all broadcast into a single output row — the candidate/truth pair
  * sets shuffle once each on the pair key. Degenerate inputs (no
  * truth, fewer than 2 items) report vacuous recall 1000 / reduction 0
  * rather than dividing by zero.
  */
object BlockingQuality {

  def evaluate(candidates: DataFrame, truth: DataFrame,
      items: DataFrame): DataFrame = {
    val cand = candidates.select(col("id_a"), col("id_b")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tr = truth.select(col("id_a"), col("id_b")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val hit = cand.join(tr, Seq("id_a", "id_b"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
    items.agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(tr.agg(count(lit(1)).as("n_truth"))))
      .crossJoin(broadcast(cand.agg(count(lit(1)).as("n_cand"))))
      .crossJoin(broadcast(hit))
      .select(col("n_docs"), col("n_truth"), col("n_cand"), col("n_hit"),
        when(col("n_truth") === 0L, lit(1000L))
          .otherwise(expr("(1000 * n_hit) div n_truth"))
          .as("recall_permille"),
        when(col("n_docs") < 2L, lit(0L))
          .otherwise(expr(
            "1000000 - (2000000 * n_cand) div (n_docs * (n_docs - 1))"))
          .as("reduction_ppm"))
  }
}
