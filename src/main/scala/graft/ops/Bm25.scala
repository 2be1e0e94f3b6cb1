package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25-shaped retrieval scoring — the lexical ranking function behind
  * "which documents answer this query", the standard first-stage
  * retriever next to the ANN family. Engine-portable by construction:
  *
  *   - idf is the ppm-floored Robertson RATIO
  *     `idf_ppm = (10⁶·(N − df + 1)) div (df + 1)` — NOT its logarithm
  *     (libm `ln` is not oracle-portable; the per-term doc ordering is
  *     identical, cross-term additivity differs from log-BM25 — the
  *     documented trade, same policy as Tokenizer.tfidfTopTerms);
  *   - tf saturation keeps BM25's exact shape with k1 = 6/5, b = 3/4
  *     cross-multiplied to integers (avgdl = S/N never materializes as a
  *     rounded intermediate):
  *     `tfnorm_ppm = (10⁶·22·tf·S) div (10·S·tf + 3·S + 9·dl·N)`;
  *   - per-term contribution `(idf_ppm · tfnorm_ppm) div 10⁶`, summed per
  *     (query, doc). Products run in DECIMAL(38,0) (the RankCorr policy:
  *     10⁶·22·tf·S wraps Long once S reaches ~4·10¹⁰ tokens).
  *
  * Scale shape: one token explode → (doc, term) tf counts semi-joined to
  * the BROADCAST query-term dictionary before df/scoring (only query
  * terms ever shuffle), corpus totals as a broadcast 1-row aggregate,
  * top-k per query via the k-slot [[graft.functions.TopKByAgg]] — no
  * window sort over the candidate table.
  *
  * Query contract: `queries` must carry columns named `query_id` (castable
  * to long) and `term` (string); the projected (query_id, term) pairs are
  * DEDUPLICATED before scoring, so duplicate input rows cannot
  * double-count a term's contribution (matching the oracle's distinct
  * VALUES list).
  *
  * Output: (query_id, rank, doc_id, score_ppm), rank 1..k by
  * (score desc, doc_id asc).
  */
object Bm25 {

  /** Frozen corpus-side statistics — everything BM25 scoring needs that
    * does not depend on the queries: the (doc, term) tf postings
    * (persisted — it feeds df AND scoring), per-doc lengths, and the
    * 1-row corpus totals. Build once per corpus snapshot; score any
    * number of query batches against it ([[StreamBm25]]'s
    * train-batch / score-stream topology). */
  final case class Bm25Index(tf: DataFrame, dl: DataFrame, corpus: DataFrame)

  def buildIndex(docs: DataFrame, idCol: String, textCol: String): Bm25Index = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("tok"))
      .where($"tok" =!= "")
    // one persisted pass feeds tf, dl, the corpus totals and df
    val tf = toks.groupBy($"doc_id", $"tok")
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dl = tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
    val corpus = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(tf.agg(coalesce(sum($"tf"), lit(0L)).as("s_tok")))
    Bm25Index(tf, dl, corpus)
  }

  def topKDocs(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int = 10): DataFrame =
    topKDocsWithIndex(buildIndex(docs, idCol, textCol), queries, k)

  /** Score a query table against a prebuilt [[Bm25Index]] — the scoring
    * tail of [[topKDocs]], identical arithmetic (df is computed against
    * the index's postings per query-term batch). */
  def topKDocsWithIndex(ix: Bm25Index, queries: DataFrame,
      k: Int = 10): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    val spark = ix.tf.sparkSession
    import spark.implicits._
    val Bm25Index(tf, dl, corpus) = ix
    val terms = queries.select(col("query_id").cast("long").as("query_id"),
      col("term").cast("string").as("term")).distinct()
    val dfreq = tf
      .join(broadcast(terms.select($"term".as("tok")).distinct()), "tok")
      .groupBy($"tok").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(terms.withColumnRenamed("term", "tok")), "tok")
      .join(broadcast(dfreq), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("idf_ppm", expr(
        "(1000000 * (n_docs - df + 1)) div (df + 1)"))
      .withColumn("tfnorm_ppm", expr(
        """(CAST(22000000 AS DECIMAL(38,0)) * tf * s_tok)
          | div (CAST(10 AS DECIMAL(38,0)) * s_tok * tf
          |       + 3 * s_tok + 9 * dl * n_docs)""".stripMargin))
      .withColumn("contrib_ppm", expr(
        "(CAST(idf_ppm AS DECIMAL(38,0)) * tfnorm_ppm) div 1000000"))
      .groupBy($"query_id", $"doc_id")
      .agg(sum($"contrib_ppm").as("score_ppm"))
    // score_ppm cast to Double for the k-slot ranking: exact while
    // |score_ppm| < 2^53. idf_ppm ≤ 10⁶·(N+1), tfnorm_ppm < 2.2·10⁶, so a
    // per-term contrib stays ≤ 2.2·10⁶·(N+1)/1 · 1 — the bound is only
    // reachable past ~10⁹ query terms hitting one doc; beyond 2^53 the
    // documented oracle-exact (score desc, doc_id asc) tie order could
    // silently diverge. Same bound note as LabelNoise's negated distance.
    scored.groupBy($"query_id")
      .agg(graft.functions.TopKByAgg.top_k_by(
        $"score_ppm".cast("double"), $"doc_id", k).as("arr"))
      .select($"query_id", posexplode($"arr"))
      .select($"query_id", ($"pos" + 1).cast("int").as("rank"),
        $"col.neighbor_id".as("doc_id"),
        $"col.cosine".cast("long").as("score_ppm"))
  }
}
