package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top-V vocabulary COVERAGE audit — the vocab-sizing decision tool: rank
  * the corpus's tokens by frequency, keep the top `vocabSize`, and report
  * per document what share of its token OCCURRENCES that vocabulary
  * covers. Sweeping V and reading the coverage distribution is how a
  * tokenizer's vocab size is actually chosen (the marginal coverage of
  * the next 10k entries), and per-doc coverage is itself a curation
  * signal: a document far below the corpus coverage norm is written in
  * vocabulary the model will mostly see as UNK/bytes.
  *
  * Distinct from [[Tokenizer.tokenStats]], which segments against a
  * FIXED externally-supplied subword vocabulary: this operator SELECTS
  * the vocabulary from corpus statistics (word-level, the selection step
  * upstream of any subword training) and audits what the selection buys.
  *
  * Ranking is (count desc, token asc) — fully deterministic — on
  * [[Ranks.globalRowNumber]] (range exchange over the VOCAB axis, which
  * is orders of magnitude smaller than the corpus; never a
  * single-partition window). The selected V rows then BROADCAST back
  * onto the token stream (bounded by `vocabSize`, which is bounded
  * loudly), so the corpus pays exactly two big exchanges: the count
  * aggregation (map-side combined to one row per distinct token per
  * partition) and the per-doc aggregation every per-doc statistic pays.
  *
  * Integer-exact: coverage_ppm = n_in_vocab·10⁶ div n_toks.
  *
  * The reference has no vocabulary surface; beyond-reference pipeline
  * operator in the tokenization family ([[Tokenizer]], [[BpeTrain]],
  * [[TextStats]]).
  *
  * Output: (doc_id, n_toks, n_in_vocab, coverage_ppm), one row per
  * non-null-text document.
  */
object VocabCoverage {

  def topVCoverage(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize >= 1 && vocabSize <= (1 << 22),
      s"vocabSize must be in [1, 2^22] (the vocab broadcasts), got $vocabSize")
    val toks = df.select(col(idCol).cast("long").as("doc_id"),
      explode(split(col(textCol), " ")).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("__c"))
    val vocab = Ranks.globalRowNumber(
        counts.withColumn("__negc", -col("__c")).select("tok", "__negc"),
        Seq("__negc", "tok"))
      .where(col("grn") <= vocabSize.toLong)
      .select(col("tok"), lit(1L).as("__in"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        sum(coalesce(col("__in"), lit(0L))).as("n_in_vocab"))
      .select(col("doc_id"), col("n_toks"), col("n_in_vocab"),
        expr("(n_in_vocab * 1000000L) div n_toks").as("coverage_ppm"))
  }
}
