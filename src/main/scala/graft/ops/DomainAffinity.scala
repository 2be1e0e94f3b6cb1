package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-flavored domain-affinity scoring over hashed n-gram features
  * (Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling", simplified to stay integer-exact): hash each document's
  * word bigrams into `buckets` md5 buckets (distinct per document —
  * document frequency), estimate per-bucket target/rest frequencies with
  * Laplace smoothing, and mark a bucket TARGET-AFFINE when
  *
  *     p_target(f) >= (ratioNum/ratioDen) · p_rest(f)
  *
  * evaluated as the cross-multiplied INTEGER test
  * `(ct+1)·(Ns+B)·ratioDen >= (cs+1)·(Nt+B)·ratioNum` — the exact
  * likelihood-ratio threshold with no logarithm anywhere (libm log is
  * not oracle-portable; repo convention). A document's affinity is the
  * per-mille of its features landing in affine buckets — the importance
  * signal DSIR resamples by, here as a transparent integer score.
  *
  * Split into [[affineBuckets]] (model build — corpus aggregation) and
  * [[scoreAgainst]] (pure per-document scoring against the model) so the
  * standard train-batch / score-stream topology works: build the table
  * on the reference corpus, broadcast it at any scale (`buckets` rows),
  * score batches or micro-batches against it
  * ([[graft.streaming.StreamAffinity]]).
  *
  * Scale shape: bigram derivation is a per-row array expression (no
  * window, no shuffle); the class-count aggregation shuffles at most
  * `buckets` groups (partial-aggregated map-side, so hot buckets cost
  * one row per partition); the affine set is `buckets` rows and
  * BROADCASTS back onto the feature stream; the only data-sized shuffle
  * is the final per-doc count. No driver state at any size.
  *
  * Output: (id, n_features, n_affine, affinity_permille), one row per
  * document with at least one feature (docs shorter than 2 tokens
  * contribute their whole text as one feature, mirroring
  * [[Dedup.shingles]]).
  */
object DomainAffinity {

  /** Distinct (id, passthrough..., bucket) hashed-bigram feature rows.
    * Array-expression shingling — streamable (no window) and identical
    * strings to the posexplode+lead derivation: w[i] || ' ' || w[i+1]
    * for i in [0, n-2], whole text when the doc has fewer than 2 tokens.
    */
  private def featureRows(df: DataFrame, idCol: String, textCol: String,
      passthrough: Seq[String], buckets: Int): DataFrame = {
    // tokenize ONCE into a bound column — referencing split(...) inside
    // the transform lambda would re-split per element, O(tokens²)/row
    val withW = df.select(
      (col(idCol).as("id") +: passthrough.map(col)) :+
        col(textCol).as("__txt") :+ split(col(textCol), " ").as("__w"): _*)
    val shingled = withW.select(
      (col("id") +: passthrough.map(col)) :+
        explode(expr(
          """CASE WHEN size(__w) >= 2
            |THEN transform(sequence(0, size(__w) - 2),
            |       i -> concat(element_at(__w, i + 1), ' ',
            |                   element_at(__w, i + 2)))
            |ELSE array(__txt) END""".stripMargin)).as("shingle"): _*)
    shingled.select(
      (col("id") +: passthrough.map(col)) :+
        pmod(graft.functions.functions.hex_to_long(
          substring(md5(col("shingle")), 1, 8)), lit(buckets.toLong))
          .as("bucket"): _*)
      .distinct()
  }

  /** The likelihood-ratio test over flagged feature rows: (bucket,
    * is_affine), `buckets` rows. */
  private def affineFromFeats(feats: DataFrame, buckets: Int,
      ratioNum: Long, ratioDen: Long): DataFrame = {
    val cnts = feats.groupBy(col("bucket")).agg(
      sum(when(col("__is_t"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("__is_t"), 0L).otherwise(1L)).as("cs"))
    val totals = cnts.agg(sum(col("ct")).as("nt"), sum(col("cs")).as("ns"))
    cnts.crossJoin(broadcast(totals))
      .withColumn("is_affine",
        (col("ct") + 1L) * (col("ns") + buckets.toLong) * ratioDen >=
          (col("cs") + 1L) * (col("nt") + buckets.toLong) * ratioNum)
      .select(col("bucket"), col("is_affine"))
  }

  /** Build the (bucket, is_affine) model table from a reference corpus.
    * `buckets` rows — broadcastable at any corpus size. */
  def affineBuckets(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 4096,
      ratioNum: Long = 2L, ratioDen: Long = 1L): DataFrame = {
    require(buckets > 0 && ratioNum > 0 && ratioDen > 0,
      s"buckets/ratio must be positive (got $buckets, $ratioNum/$ratioDen)")
    affineFromFeats(
      featureRows(df.withColumn("__is_t", targetPred), idCol, textCol,
        Seq("__is_t"), buckets),
      buckets, ratioNum, ratioDen)
  }

  /** Score documents against a prebuilt model table. Pure per-document
    * work plus one broadcast join — safe inside foreachBatch. `affine`
    * must cover every bucket the corpus can hash to (as
    * [[affineBuckets]] output does for buckets seen in its corpus;
    * unseen buckets score as non-affine via the left join). */
  def scoreAgainst(df: DataFrame, idCol: String, textCol: String,
      affine: DataFrame, buckets: Int = 4096): DataFrame =
    featureRows(df, idCol, textCol, Seq.empty, buckets)
      .join(broadcast(affine), Seq("bucket"), "left")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_features"),
        sum(when(coalesce(col("is_affine"), lit(false)), 1L).otherwise(0L))
          .as("n_affine"))
      .withColumn("affinity_permille",
        expr("(n_affine * 1000) div n_features"))

  /** One-shot: build the model on `df` and score `df` with it. The
    * flagged feature rows are derived ONCE and persisted — they feed both
    * the class-count aggregation and the scoring join (plan audit r7:
    * the unshared formulation tokenized the corpus twice; at sf0.1 the
    * cache materialization costs more than the cheap recompute, but at
    * corpus scale recompute means a second full pass over the data). */
  def score(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 4096,
      ratioNum: Long = 2L, ratioDen: Long = 1L): DataFrame = {
    require(buckets > 0 && ratioNum > 0 && ratioDen > 0,
      s"buckets/ratio must be positive (got $buckets, $ratioNum/$ratioDen)")
    val feats = featureRows(df.withColumn("__is_t", targetPred),
        idCol, textCol, Seq("__is_t"), buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val affine = affineFromFeats(feats, buckets, ratioNum, ratioDen)
    feats.join(broadcast(affine), Seq("bucket"), "left")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_features"),
        sum(when(coalesce(col("is_affine"), lit(false)), 1L).otherwise(0L))
          .as("n_affine"))
      .withColumn("affinity_permille",
        expr("(n_affine * 1000) div n_features"))
  }
}
