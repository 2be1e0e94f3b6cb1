package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.functions.hex_to_long

/** The hashing trick — fixed-width sparse feature vectors without a
  * vocabulary table: every token is routed to one of 2^bits buckets by
  * an md5 lane, with a second hash bit supplying the ± sign that keeps
  * the bucket-collision expectation zero (Weinberger et al.'s signed
  * feature hashing). This is the vectorizer that scales where
  * CountVectorizer can't: NO vocabulary broadcast, NO dictionary fit
  * pass, identical output on any cluster layout — the bucket of a token
  * is a pure function of its bytes.
  *
  * Portability: bucket = md5-lane % 2^bits and sign = parity of the
  * next lane bit, both on the 15-hex-char non-negative long — the
  * [[graft.functions.HexToLong]] convention every sketch here shares,
  * so the DuckDB oracle reproduces the exact vectors.
  *
  * Shape: one explode + one (doc, bucket)-keyed partial-aggregated sum;
  * output cardinality is docs × ≤2^bits regardless of vocabulary size.
  */
object FeatureHash {

  /** (doc_id, bucket, feat_val, n_tokens): signed-sum feature value and
    * raw token count per hash bucket per document.
    */
  def hashFeatures(docs: DataFrame, idCol: String, tokensCol: String,
      bits: Int = 6): DataFrame = {
    require(bits >= 1 && bits <= 20,
      s"bits must be in [1, 20] (2^bits buckets), got $bits")
    val nBuckets = 1L << bits
    docs.select(col(idCol).as("doc_id"),
        explode(col(tokensCol)).as("tok"))
      .where(length(col("tok")) > 0)
      .withColumn("h", hex_to_long(substring(md5(col("tok")), 1, 15)))
      .withColumn("bucket", col("h") % nBuckets)
      .withColumn("sign",
        lit(1L) - lit(2L) * (expr(s"h div ${nBuckets}L") % 2L))
      .groupBy("doc_id", "bucket")
      .agg(sum(col("sign")).as("feat_val"),
        count(lit(1)).as("n_tokens"))
  }
}
