package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document chunking + sequence packing — the two steps between "curated
  * documents" and "training batches" in an LLM data pipeline.
  *
  * CHUNKING splits each document into fixed-size token windows with
  * overlap. It is embarrassingly parallel (per-row `sequence` + `explode`
  * + `slice`, all codegen collection functions, no shuffle at all), so the
  * plan is a single projection stage over the scan regardless of corpus
  * size. Stride = chunkTokens - overlapTokens; the last chunk keeps the
  * tail even when shorter. Tokens are single-space splits, matching every
  * other text operator here (and `string_split` in the oracle).
  *
  * PACKING groups consecutive chunks into bins of ~`capacity` tokens. True
  * first-fit bin packing is an inherently sequential greedy; the
  * distributed, deterministic, cross-engine-reproducible variant used at
  * scale is CONTIGUOUS packing: order chunks within a partition key, take
  * the running token sum, and cut a new bin every `capacity` tokens —
  * `bin = (running_sum - tokens) / capacity` (integer div). A bin may
  * overflow by at most one chunk's tokens (the straddling chunk joins the
  * bin its first token lands in); utilization is within max_chunk/capacity
  * of optimal, which is the accepted trade for a one-window-pass plan.
  * Packing is per `keyCols` partition (pack per shard/language at 100 TB —
  * a global pack would serialize into one window partition).
  */
object Chunker {

  /** One row per (document, chunk): (idCol..., chunk_idx, n_chunk_tokens,
    * chunk_text). Empty/whitespace-only docs yield one chunk of their
    * token list (split(" ") never returns an empty array). */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlapTokens")
    val stride = chunkTokens - overlapTokens
    val toks = df.select(col(idCol), split(col(textCol), " ").as("__w"))
      .withColumn("__n", size(col("__w")))
    // chunk count = 1 + ceil(max(n - chunkTokens, 0) / stride): one chunk
    // covers the first window, then one per stride until the tail is in
    val nChunks = lit(1) +
      ceil(greatest(col("__n") - chunkTokens, lit(0)).cast("double") / stride)
        .cast("int")
    toks
      .withColumn("chunk_idx", explode(sequence(lit(0), nChunks - 1)))
      .select(
        col(idCol),
        col("chunk_idx"),
        slice(col("__w"), col("chunk_idx") * stride + 1, lit(chunkTokens))
          .as("__chunk_toks"))
      .select(
        col(idCol),
        col("chunk_idx"),
        size(col("__chunk_toks")).as("n_chunk_tokens"),
        array_join(col("__chunk_toks"), " ").as("chunk_text"))
  }

  /** Contiguous packing: assigns each row a `bin` per key partition so
    * consecutive rows (ordered by `orderCols`) fill ~`capacity` tokens per
    * bin. Supply an order that is unique within each key partition — the
    * running sum (and therefore the binning) is only deterministic under a
    * total order. */
  def packContiguous(chunks: DataFrame, tokensCol: String, capacity: Int,
      keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(orderCols.nonEmpty, "orderCols must define a total order")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("__running", sum(col(tokensCol)).over(w))
      // integer div, not double `/`: running sums in a long-lived partition
      // can pass 2^53, where double division would misplace bin boundaries
      .withColumn("bin", expr(s"(__running - $tokensCol) div $capacity"))
      .drop("__running")
  }
}
