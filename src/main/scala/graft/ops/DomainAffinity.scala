package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR-flavored domain-affinity scoring over hashed n-gram features
  * (Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling", simplified to stay integer-exact): hash each document's
  * distinct word bigrams into `buckets` md5 buckets, estimate per-bucket
  * target/rest document frequencies with Laplace smoothing, and mark a
  * bucket TARGET-AFFINE when
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
  * Scale shape: bigram derivation is map-side (posexplode + lead window
  * keyed by doc); the class-count aggregation shuffles at most `buckets`
  * groups (partial-aggregated map-side, so hot buckets cost one row per
  * partition); the affine set is `buckets` rows and BROADCASTS back onto
  * the feature stream; the only data-sized shuffle is the final per-doc
  * count. No driver state at any size.
  *
  * Output: (id, n_features, n_affine, affinity_permille), one row per
  * document that has at least one feature (docs shorter than 2 tokens
  * contribute their whole text as one feature, mirroring
  * [[Dedup.shingles]]).
  */
object DomainAffinity {

  def score(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 4096,
      ratioNum: Long = 2L, ratioDen: Long = 1L): DataFrame = {
    require(buckets > 0 && ratioNum > 0 && ratioDen > 0,
      s"buckets/ratio must be positive (got $buckets, $ratioNum/$ratioDen)")
    val base = df.select(col(idCol).as("id"), targetPred.as("is_t"),
      col(textCol).as("__txt"), split(col(textCol), " ").as("__toks"))
    val exploded = base.select(col("id"), col("is_t"), col("__txt"),
      size(col("__toks")).as("__ntok"),
      posexplode(col("__toks")).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val withShingle = exploded.withColumn("shingle",
      when(col("__ntok") >= 2 && col("pos") <= col("__ntok") - 2,
        concat_ws(" ", col("tok"), lead(col("tok"), 1).over(w)))
        .when(col("__ntok") < 2 && col("pos") === 0, col("__txt")))
    val feats = withShingle.where(col("shingle").isNotNull)
      .select(col("id"), col("is_t"),
        pmod(graft.functions.functions.hex_to_long(
          substring(md5(col("shingle")), 1, 8)), lit(buckets.toLong))
          .as("bucket"))
      .distinct() // feature presence per document (document frequency)

    val cnts = feats.groupBy(col("bucket")).agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("is_t"), 0L).otherwise(1L)).as("cs"))
    val totals = cnts.agg(sum(col("ct")).as("nt"), sum(col("cs")).as("ns"))
    val affine = cnts.crossJoin(broadcast(totals))
      .withColumn("is_affine",
        (col("ct") + 1L) * (col("ns") + buckets.toLong) * ratioDen >=
          (col("cs") + 1L) * (col("nt") + buckets.toLong) * ratioNum)
      .select(col("bucket"), col("is_affine"))

    feats.join(broadcast(affine), "bucket")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_features"),
        sum(when(col("is_affine"), 1L).otherwise(0L)).as("n_affine"))
      .withColumn("affinity_permille",
        expr("(n_affine * 1000) div n_features"))
  }
}
