package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the CCNet-style filter
  * (Wenzek et al. 2020: score web text with a LM trained on a trusted
  * corpus, keep the head of the score distribution). A full Kneser-Ney
  * perplexity needs logarithms, and libm `log` is not oracle-portable
  * (repo convention: no floating-point transcendentals whose last bit
  * differs across engines) — so the score is the LINEAR likelihood
  * proxy: the mean conditional bigram probability in parts-per-million,
  *
  *     lm_ppm(doc) = floor( Σ_bigrams floor(1e6·c(w1 w2)/c(w1 ·)) / n )
  *
  * where `c(w1 w2)` is the bigram's occurrence count in the model corpus
  * and `c(w1 ·)` the total bigrams starting with `w1`. Unseen bigrams
  * (and unseen first words) contribute 0 — the maximum-likelihood
  * estimate with no smoothing, which is exactly what makes the score an
  * integer. Higher = more in-distribution; the downstream filter keeps
  * `lm_ppm >= cut` or resamples by the score, exactly like perplexity
  * buckets.
  *
  * Shape at 100 TB: the model is two hash aggregations over the
  * reference corpus's token stream (bigram-keyed, partial-aggregated
  * map-side — hot bigrams cost one row per partition in the shuffle);
  * scoring joins the document bigram stream to the model on the bigram
  * key — a plain shuffle equi-join, linear in both sides, no driver
  * state, no broadcast requirement (the model may be arbitrarily large).
  * Build the model ONCE on the trusted corpus, then score any number of
  * batches against it (the train-batch / score-stream topology of
  * [[DomainAffinity]]).
  *
  * Token-level multiplicities are KEPT (an LM counts occurrences, not
  * document frequency — unlike the distinct-shingle dedup family).
  * Documents with fewer than 2 tokens have no bigrams and score
  * `n_bigrams = 0, lm_ppm = 0` (kept via the left join on ids so the
  * score table stays total over the corpus).
  */
object LmScore {

  /** Per-occurrence (id, passthrough..., w1, w2) bigram rows.
    * Array-expression shingling bound to a single `split` (the
    * [[DomainAffinity]] derivation — O(tokens)/row, window-free hence
    * streamable); docs shorter than 2 tokens yield no rows.
    */
  private def bigramRows(df: DataFrame, idCol: String, textCol: String,
      passthrough: Seq[String] = Seq.empty): DataFrame =
    df.select((col(idCol).as("id") +: passthrough.map(col)) :+
        split(col(textCol), " ").as("__w"): _*)
      .where(size(col("__w")) >= 2)
      .select((col("id") +: passthrough.map(col)) :+ explode(expr(
        """transform(sequence(0, size(__w) - 2),
          |  i -> struct(element_at(__w, i + 1) AS w1,
          |              element_at(__w, i + 2) AS w2))""".stripMargin))
        .as("bg"): _*)
      .select((col("id") +: passthrough.map(col)) :+
        col("bg.w1").as("w1") :+ col("bg.w2").as("w2"): _*)

  /** Train the bigram model on a reference corpus:
    * (w1, w2, c2, c1) — bigram count and first-word continuation total.
    * One bigram-keyed aggregation plus a w1-keyed rollup joined back
    * (both partial-aggregate map-side).
    */
  def bigramModel(ref: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // the bigram count table feeds the first-word rollup AND the join —
    // persist so the reference corpus is tokenized once per model build
    val bg = bigramRows(ref, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val firsts = bg.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    bg.join(firsts, Seq("w1"))
  }

  /** Score documents against a prebuilt model:
    * (id, n_bigrams, sum_ppm, lm_ppm). Pure per-document work plus one
    * bigram-keyed shuffle join — safe inside foreachBatch with a frozen
    * model table.
    */
  def scoreAgainst(df: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame =
    finishScore(df.select(col(idCol).as("id")).distinct(),
      bigramRows(df, idCol, textCol), model, idCol)

  private def finishScore(ids: DataFrame, bg: DataFrame,
      model: DataFrame, idCol: String): DataFrame = {
    val scored = bg.select("id", "w1", "w2")
      .join(model, Seq("w1", "w2"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(expr("(c2 * 1000000) div c1"), lit(0L)))
          .as("sum_ppm"))
    ids.join(scored, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_ppm"), lit(0L)).as("sum_ppm"))
      .withColumn("lm_ppm",
        when(col("n_bigrams") === 0L, 0L)
          .otherwise(expr("sum_ppm div n_bigrams")))
  }

  /** One-shot: train on the rows matching `refPred` (the trusted slice —
    * e.g. the target language) and score EVERY row of `df` against that
    * model. The bigram stream is derived ONCE and persisted — it feeds
    * both the model aggregation (filtered to the reference slice) and
    * the scoring join, so the corpus is tokenized in a single pass
    * instead of once per consumer (the [[DomainAffinity.score]] shape;
    * at sf0.1 the cache materialization roughly breaks even with the
    * recompute, but at corpus scale recompute means an extra full pass
    * over the data). The id spine is a third scan but column-pruned to
    * the id alone.
    */
  def score(df: DataFrame, idCol: String, textCol: String,
      refPred: Column): DataFrame = {
    val bg = bigramRows(df.withColumn("__is_ref", refPred),
        idCol, textCol, Seq("__is_ref"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val refBg = bg.where(col("__is_ref"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val model = refBg.join(
      refBg.groupBy(col("w1")).agg(sum(col("c2")).as("c1")), Seq("w1"))
    finishScore(df.select(col(idCol).as("id")).distinct(), bg, model, idCol)
  }
}
