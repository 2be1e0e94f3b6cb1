package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, "Scaling
  * Language Models: ... Gopher" §A1.1) — the standard pre-training
  * heuristic filter battery, as per-document integer evidence plus 0/1
  * rule flags so downstream mixes can threshold, audit, or re-weight
  * instead of hard-dropping:
  *
  *   - word count in [minWords, maxWords]
  *   - mean word length in [3, 10] characters (×10 fixed-point)
  *   - symbol-to-word ratio ('#' and '…' as "...") <= 0.1
  *   - >= 80% of words contain an alphabetic character
  *   - >= 2 stopword hits (the "real sentence" proxy)
  *
  * Everything is whitespace-token + integer arithmetic; symbol counts use
  * the replace-length trick (no regex), alphabetic membership uses the
  * single class [A-Za-z] which Java regex and RE2 agree on — every cell
  * reproduces hash-exactly in DuckDB. One narrow projection, no shuffle
  * at all until the caller aggregates: the filter battery runs at scan
  * speed inside whole-stage codegen.
  *
  * Output: (id, n_words, mwl_x10, n_symbols, n_alpha_words, n_stop_hits,
  * words_ok, mwl_ok, sym_ok, alpha_ok, stop_ok, pass) — counts BIGINT,
  * flags 0/1 BIGINT.
  */
object GopherRules {

  def ruleFlags(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    require(minWords >= 1 && maxWords > minWords,
      s"need 1 <= minWords < maxWords, got $minWords/$maxWords")
    val toks = s"filter(split($textCol, ' '), x -> length(x) > 0)"
    val flag = (c: org.apache.spark.sql.Column) =>
      when(c, 1L).otherwise(0L)
    val base = df.select(
      col(idCol).as("id"),
      expr(s"CAST(size($toks) AS BIGINT)").as("n_words"),
      expr(s"aggregate($toks, CAST(0 AS BIGINT), (a, x) -> a + length(x))")
        .as("__sumlen"),
      // replace-length counting: occurrences of '#' plus of the '...'
      // run (each swallowing 3 chars) — plain replace(), NOT regexp
      // (DuckDB's regexp_replace is first-match-only without 'g')
      expr(s"""CAST(length($textCol) - length(replace($textCol, '#', ''))
        | + (length($textCol) - length(replace($textCol, '...', ''))) div 3
        | AS BIGINT)""".stripMargin).as("n_symbols"),
      expr(s"CAST(size(filter($toks, x -> x rlike '[A-Za-z]')) AS BIGINT)")
        .as("n_alpha_words"),
      TextStats.tokenCountIn(textCol, TextStats.stopwordsEn).cast("long")
        .as("n_stop_hits"))
    base
      .withColumn("mwl_x10",
        expr("CASE WHEN n_words > 0 THEN (10 * __sumlen) div n_words ELSE 0 END"))
      .withColumn("words_ok",
        flag(col("n_words") >= minWords && col("n_words") <= maxWords))
      .withColumn("mwl_ok", flag(col("mwl_x10") >= 30L && col("mwl_x10") <= 100L))
      .withColumn("sym_ok", flag(col("n_symbols") * 10L <= col("n_words")))
      .withColumn("alpha_ok",
        flag(col("n_alpha_words") * 10L >= col("n_words") * 8L))
      .withColumn("stop_ok", flag(col("n_stop_hits") >= 2L))
      .withColumn("pass",
        col("words_ok") * col("mwl_ok") * col("sym_ok") * col("alpha_ok") *
          col("stop_ok"))
      .select(col("id"), col("n_words"), col("mwl_x10"), col("n_symbols"),
        col("n_alpha_words"), col("n_stop_hits"), col("words_ok"),
        col("mwl_ok"), col("sym_ok"), col("alpha_ok"), col("stop_ok"),
        col("pass"))
  }
}
