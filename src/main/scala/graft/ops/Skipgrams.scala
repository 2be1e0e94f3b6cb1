package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skip-gram context-pair extraction — the training-corpus builder for
  * word2vec-family embedding models: every (center, context) token pair
  * within a forward window of `window` positions, counted over the whole
  * corpus.
  *
  * Shape: tokenize → posexplode → ONE entity-keyed window (partition by
  * doc, order by position) computing `window` leads — so the per-doc
  * sequential scan is a single shuffle keyed by doc id, exactly the
  * Sessionize/Transitions cadence, and the pair count is a second
  * map-side-combined aggregation. No self-join on position bands (which
  * would shuffle the token table twice and explode skew on long docs).
  * `minCount` bounds the output the way word2vec's vocabulary floor does;
  * counts are exact longs.
  */
object Skipgrams {

  def skipgramCounts(df: DataFrame, idCol: String, textCol: String,
      window: Int = 2, minCount: Long = 1L): DataFrame = {
    require(window >= 1 && window <= 16,
      s"window must be in [1, 16], got $window")
    val toks = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val withLeads = toks.select(
      col("tok") +: (1 to window).map(j =>
        lead(col("tok"), j).over(w).as(s"__t$j")): _*)
    // one explode over the lead array, NOT a per-distance union: a union
    // of j branches physically duplicates the scan+window subtree j times
    // (plan-audited — two full document scans for window=2)
    val pairs = withLeads.select(col("tok").as("center"),
        explode(array((1 to window).map(j => col(s"__t$j")): _*)).as("context"))
      .where(col("context").isNotNull)
    pairs.groupBy("center", "context").agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
  }
}
