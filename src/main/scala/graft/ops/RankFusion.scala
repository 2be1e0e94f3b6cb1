package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion — the standard way retrieval pipelines combine
  * rankings from heterogeneous scorers (dense ANN + lexical, or two ANN
  * index families): each list contributes 1/(k0 + rank) per hit, summed
  * per (query, candidate), and the fused order is that sum descending.
  * RRF needs no score calibration between lists, which is exactly why it
  * wins in practice (Cormack et al., SIGIR 2009 — rank, not score).
  *
  * Integer-exact: the contribution is `1_000_000 div (k0 + rank)` — the
  * same floor division in any engine — so the fused scores (and therefore
  * the fused order, ties to the smaller candidate id) are oracle-exact.
  *
  * Scale shape: the inputs are ALREADY top-k lists (≤ k rows per query
  * per list), so fusion is a union + one (query, candidate)-keyed
  * partial-aggregating sum + the k-slot [[graft.functions.TopKByAgg]] —
  * no window sort, shuffle bounded by Σ list sizes.
  */
object RankFusion {

  /** Inner-product top-k — the second ranking family next to
    * [[Similarity.bruteForceTopK]]'s cosine: broadcast the (small) query
    * batch against one corpus scan, score with the codegen'd
    * [[graft.functions.ArrayDot]], keep k per query via the k-slot
    * aggregate (shuffle carries ≤ k pairs per query per partition).
    * Output: (query_id, rank, neighbor_id, dot), ranked (dot desc,
    * neighbor_id asc). Quantize both sides first for engine-exact scores.
    */
  def innerProductTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int): DataFrame = {
    import graft.functions.ArrayDot.array_dot
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        array_dot(col("__qv"), col("__cv")).as("dot"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKByAgg.top_k_by(
        col("dot"), col("neighbor_id"), k).as("__top"))
      .select(col("query_id"), posexplode(col("__top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.neighbor_id").as("neighbor_id"), col("col.cosine").as("dot"))
  }

  /** Fuse ranked lists. Every input must have (query_id, neighbor_id,
    * rank) with rank 1-based. Output: (query_id, rank, neighbor_id,
    * rrf_ppm) — the fused top-`topK` per query, ordered (rrf_ppm desc,
    * neighbor_id asc).
    */
  def reciprocalRankFusion(rankings: Seq[DataFrame], k0: Int = 60,
      topK: Int = 5): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k0 >= 1, s"k0 must be >= 1, got $k0")
    val u = rankings.map(_.select(col("query_id"), col("neighbor_id"),
      col("rank").cast("long").as("rank"))).reduce(_ unionAll _)
    val fused = u.groupBy("query_id", "neighbor_id")
      .agg(sum(expr(s"1000000 div ($k0 + rank)")).as("rrf_ppm"))
    // rrf_ppm <= n_lists * 1e6/ (k0+1) — far below 2^53, so the double
    // cast into the k-slot buffer is order-exact and round-trips
    fused.groupBy("query_id")
      .agg(graft.functions.TopKByAgg.top_k_by(
        col("rrf_ppm").cast("double"), col("neighbor_id"), topK).as("__top"))
      .select(col("query_id"), posexplode(col("__top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.neighbor_id").as("neighbor_id"),
        col("col.cosine").cast("long").as("rrf_ppm"))
  }
}
