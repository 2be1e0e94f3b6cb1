package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: token statistics, quality
  * scoring, heuristic language id, and document fingerprinting.
  *
  * Everything is a single codegen'd column expression over
  * whitespace-tokenized text — no UDFs, no shuffles beyond the caller's
  * aggregation — and every formula is engine-portable (mirrored verbatim
  * in the DuckDB oracle SQL): integer counts, exact integer fingerprint
  * arithmetic, and single-division ratios, so results are bit-identical
  * across engines.
  */
object TextStats {

  val stopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "in")
  val markersDe: Seq[String] = Seq("der", "die", "das", "und")
  val markersEs: Seq[String] = Seq("el", "los", "y", "es")
  val markersFr: Seq[String] = Seq("le", "les", "et", "est")

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ",", ")")

  /** Count of whitespace tokens contained in `words`. */
  def tokenCountIn(textCol: String, words: Seq[String]): Column =
    expr(s"size(filter(split($textCol, ' '), x -> x IN ${inList(words)}))")

  /** Per-document token statistics: n_tokens, n_chars, n_distinct, n_stop. */
  def withTokenStats(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_tokens", size(split(col(textCol), " ")))
      .withColumn("n_chars", length(col(textCol)))
      .withColumn("n_distinct", size(array_distinct(split(col(textCol), " "))))
      .withColumn("n_stop", tokenCountIn(textCol, stopwordsEn))

  /** Deterministic quality score in [0,1]:
    * 0.4·min(n_tokens/100, 1) + 0.4·type-token-ratio + 0.2·min(5·stop_ratio, 1).
    * Requires the [[withTokenStats]] columns.
    */
  def qualityScore: Column =
    lit(0.4) * least(col("n_tokens").cast("double") / lit(100.0), lit(1.0)) +
      lit(0.4) * (col("n_distinct").cast("double") / col("n_tokens")) +
      lit(0.2) * least(col("n_stop").cast("double") * lit(5.0) / col("n_tokens"), lit(1.0))

  /** Per-key token CONCENTRATION profile — the diversity screen of a
    * training-data mix (a source whose token mass sits in a handful of
    * types is boilerplate/spam; a diffuse one is natural text): for each
    * group key,
    *
    *   hhi_ppm  = (1000000 · Σ c_t²) div n²      (Herfindahl–Hirschman)
    *   gini_ppm = 1000000 − hhi_ppm              (Gini impurity 1 − Σ p²)
    *
    * over whitespace-token counts c_t, n = Σ c_t — all truncating integer
    * arithmetic, so the profile is hash-exact in any engine (no entropy:
    * log is libm and not oracle-portable; Σp² ranks concentration the
    * same way). ANSI overflow bounds the exact form at ~3·10⁶ tokens per
    * key (1e6·n² must fit a long) and fails LOUDLY beyond — for
    * corpus-scale keys aggregate per (key, shard) first or feed the
    * Count-Min heavy-hitter path instead.
    *
    * Scale shape: two partial-aggregated groupBys — (key, token) counts,
    * then per-key sufficient sums. No window, no collect.
    *
    * Output: (key, n_tokens, n_distinct, top_count, hhi_ppm, gini_ppm).
    */
  def tokenConcentration(df: DataFrame, keyCol: String,
      textCol: String): DataFrame = {
    val tok = df.select(col(keyCol).as("key"),
        explode(split(col(textCol), " ")).as("tok"))
      .where(length(col("tok")) > 0)
    val counts = tok.groupBy(col("key"), col("tok"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("key"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_count"),
        sum(col("c") * col("c")).as("__sq"))
      .withColumn("hhi_ppm",
        expr("(1000000 * __sq) div (n_tokens * n_tokens)"))
      .withColumn("gini_ppm", lit(1000000L) - col("hhi_ppm"))
      .select(col("key"), col("n_tokens"), col("n_distinct"),
        col("top_count"), col("hhi_ppm"), col("gini_ppm"))
  }

  /** BPE-ish subword token count: alphabetic runs and digit runs each
    * count as one token (punctuation/whitespace excluded) — the standard
    * cheap proxy for tokenizer cost when the real BPE vocab isn't on the
    * cluster. The pattern uses only basic character classes so Spark's
    * regexp_count and DuckDB's regexp_extract_all agree exactly.
    */
  def bpeishTokenCount(textCol: String): Column =
    regexp_count(col(textCol), lit("[A-Za-z]+|[0-9]+"))

  /** Heuristic language id from marker-word counts, deterministic argmax
    * with fixed priority en > de > es > fr > unknown.
    */
  def langId(textCol: String): Column = {
    val en = tokenCountIn(textCol, stopwordsEn)
    val de = tokenCountIn(textCol, markersDe)
    val es = tokenCountIn(textCol, markersEs)
    val fr = tokenCountIn(textCol, markersFr)
    when(en >= greatest(de, es, fr) && en > 0, lit("en"))
      .when(de >= greatest(es, fr) && de > 0, lit("de"))
      .when(es >= fr && es > 0, lit("es"))
      .when(fr > 0, lit("fr"))
      .otherwise(lit("unknown"))
  }

  /** Character-n-gram language id: scores each language by occurrences of
    * its characteristic character bigrams/trigrams (substring counts via
    * length-difference after replace — engine-portable, no regex), argmax
    * with the same fixed priority as [[langId]]. Complements the
    * marker-word heuristic for text without clean word boundaries.
    */
  def langIdCharNgram(textCol: String): Column = {
    def occurrences(ngram: String): Column =
      (length(col(textCol)) -
        length(replace(col(textCol), lit(ngram), lit("")))) / lit(ngram.length)
    def score(ngrams: Seq[String]): Column =
      ngrams.map(occurrences).reduce(_ + _)
    val en = score(Seq("th", "he ", "ing"))
    val de = score(Seq("ch", "ei", "der"))
    val es = score(Seq("ll", "ci", "que"))
    val fr = score(Seq("ou", "au", "les"))
    when(en >= greatest(de, es, fr) && en > 0, lit("en"))
      .when(de >= greatest(es, fr) && de > 0, lit("de"))
      .when(es >= fr && es > 0, lit("es"))
      .when(fr > 0, lit("fr"))
      .otherwise(lit("unknown"))
  }

  /** 31-ary position-weighted rolling token fingerprint, mod 1e9+7.
    * Token code = ascii(first char)·31 + length; weight cycles through
    * 31^(i mod 8). The mod is applied PER TERM (each term < 2^60 even for
    * max codepoints, and the running sum of modded terms stays < 2^63 up
    * to ~9e9 tokens) so neither engine can overflow; mathematically equal
    * to one final mod.
    */
  def fingerprint(textCol: String): Column = {
    val pows = Array(1L, 31L, 961L, 29791L, 923521L, 28629151L, 887503681L, 27512614111L)
    val w = split(col(textCol), " ")
    val terms = transform(w, (x, i) =>
      ((ascii(substring(x, 1, 1)) * lit(31) + length(x)).cast("long") *
        element_at(array(pows.map(lit): _*), (i % lit(8)) + lit(1))) % lit(1000000007L))
    aggregate(terms, lit(0L), (acc, v) => acc + v) % lit(1000000007L)
  }

  /** Gopher-style intra-document repetition statistics over token
    * n-grams — the standard quality filter for machine-generated /
    * template text that per-token ratios can't see (Rae et al. 2021,
    * "Scaling Language Models", Table A1 — public paper; we use token
    * counts rather than character counts so the arithmetic is exact
    * integer and engine-portable).
    *
    * Per document, over its `n`-token shingles:
    *   - `total_ngrams`   number of n-gram occurrences (n_tokens - n + 1)
    *   - `dup_ngrams`     occurrences whose n-gram appears >= 2 times
    *   - `top_ngram`      occurrences of the single most frequent n-gram
    *   - `dup_permille`   (dup_ngrams · 1000) div total_ngrams
    *   - `top_permille`   (top_ngram · 1000) div total_ngrams
    *
    * Built with posexplode + window lead (whole-stage codegen, same
    * pattern as [[Dedup.shingles]]) — the window is partitioned by
    * document, so at 100 TB the only shuffle is doc-keyed and state is
    * one document's tokens per task. Documents with fewer than `n`
    * tokens produce no row (they have no n-grams).
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"ngram size must be >= 1, got $n")
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    // project the leads first (window exprs can't sit in a filter), then
    // drop positions within n-1 of the document end: the LAST lead is null
    // there, and concat_ws would otherwise silently shorten the n-gram
    val leadCols = (1 until n).map(i => lead(col("tok"), i).over(w).as(s"t$i"))
    val withLeads = toks.select((col(idCol) +: col("tok") +: leadCols): _*)
    val complete =
      if (n == 1) withLeads else withLeads.where(col(s"t${n - 1}").isNotNull)
    val parts = col("tok") +: (1 until n).map(i => col(s"t$i"))
    val grams = complete.select(col(idCol), concat_ws(" ", parts: _*).as("ngram"))
    val counts = grams.groupBy(col(idCol), col("ngram")).agg(count(lit(1)).as("c"))
    counts.groupBy(col(idCol))
      .agg(
        sum(col("c")).as("total_ngrams"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_ngrams"),
        max(col("c")).as("top_ngram"))
      .withColumn("dup_permille", expr("(dup_ngrams * 1000) div total_ngrams"))
      .withColumn("top_permille", expr("(top_ngram * 1000) div total_ngrams"))
  }

  /** Corpus-frequency rarity score — the statistical gibberish signal the
    * per-document heuristics above can't see: a document whose tokens are
    * mostly corpus-rare (OCR noise, mojibake, random ids) scores high even
    * when its lengths and ratios look normal. Two aggregation passes over
    * TOKEN rows: corpus document-frequencies (vocabulary-sized result),
    * then a token-keyed join back and a per-doc rollup —
    *
    *   rare_permille = (n_rare · 1000) div n_token_rows
    *
    * where a token is rare when its corpus df <= `rareDf`. Pure integer
    * counts and integer division end-to-end (q_rare_tokens oracle). At
    * 100 TB both shuffles are token/doc-keyed and the df table is
    * vocabulary-sized — no per-document state anywhere.
    */
  def rareTokenScore(df: DataFrame, idCol: String, textCol: String,
      rareDf: Long = 2L): DataFrame = {
    val toks = df.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
    // document frequency: in how many documents does the token appear
    val dfreq = toks.select(col(idCol), col("tok")).distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    toks.join(dfreq, "tok")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_token_rows"),
        sum(when(col("df") <= rareDf, 1L).otherwise(0L)).as("n_rare"))
      .withColumn("rare_permille", expr("(n_rare * 1000) div n_token_rows"))
  }

  /** First-occurrence n-gram novelty: how much of a document's (distinct)
    * word n-gram set appears in NO earlier document (by ascending id) —
    * high novelty flags fresh content, low novelty flags boilerplate or
    * near-copies of earlier data. The curation signal behind "keep the
    * first, drop repeats" corpus policies, per-document instead of
    * per-pair (no candidate join at all, unlike the Dedup family).
    *
    *   first(shingle) = min doc id containing it (one shingle-keyed
    *   aggregation; min partial-aggregates map-side, so hot boilerplate
    *   shingles cost one row per map partition, not one per document)
    *   novelty_permille = (1000 · |{sh : first(sh) = id}|) div |shingles|
    *
    * Output: (id, n_shingles, n_novel, novelty_permille). Integer counts
    * and integer division end-to-end; shingle derivation shared with the
    * Jaccard dedup family ([[Dedup.shingles]] — docs shorter than n
    * tokens contribute their whole text as one shingle).
    *
    * Shape (r10 rework): JOIN-FREE on the shingle axis. Per-doc NOVEL
    * counts don't need first-owners joined back onto the full shingle
    * table — they are a RE-AGGREGATION of the firsts table itself
    * (groupBy first_id → count, one row per DISTINCT shingle in, one row
    * per doc out), and per-doc shingle totals come straight off the
    * shingle table. The previous shape paid a big-big shingle-keyed join
    * plus a doc-keyed aggregation of the joined full-width table; this
    * one touches the shingle axis exactly once (partial-min map-side) and
    * stitches two per-doc aggregates with one left join on the small doc
    * axis — at 100 TB the gram table is the heavy axis, and it now
    * shuffles once instead of three times. The shingle subtree feeds both
    * per-doc totals and the firsts aggregation, so it stays persisted
    * (lazy-plan policy of Dedup.ngramJaccardPairs / ConnectedComponents).
    */
  def noveltyScores(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val sh = Dedup.shingles(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_shingles"))
    val novel = sh.groupBy(col("shingle")).agg(min(col("id")).as("first_id"))
      .groupBy(col("first_id").as(idCol))
      .agg(count(lit(1)).as("n_novel"))
    sizes.join(novel, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        expr("(coalesce(n_novel, 0L) * 1000) div n_shingles")
          .as("novelty_permille"))
  }

  /** Top-`k` rarity-weighted keywords per document — the tf·idf term
    * extraction behind tagging/routing/topic features, in exact integer
    * arithmetic so the driver query gets a hash-exact oracle:
    *
    *   score(doc, tok) = tf(doc, tok) · (1 000 000 div df(tok))
    *
    * an idf-like rarity weight without libm `log` (same design choice as
    * [[LinkPrediction]]'s RA-over-Adamic-Adar: integer-div rarity is
    * engine-portable, logarithms are not). Resolution floor: tokens with
    * corpus df > 1e6 score 0 — documented, and exactly the tokens tf·idf
    * would bury anyway. Ranking is (score desc, token asc) via the k-slot
    * [[graft.functions.TopKByAgg]] string aggregate — a hash aggregate
    * whose map-side partials carry ≤ k entries per doc per partition,
    * instead of a window sort over every scored token row.
    *
    * Output: (id, rank 1..k, token, score). Plan shape at 100 TB: tf and
    * df are token/doc-keyed partial-aggregating shuffles, the tf⋈df join
    * is token-keyed against a vocabulary-sized table, and the final top-k
    * aggregate is doc-keyed — no per-corpus state, no sorts over the
    * token stream.
    */
  def keywords(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val Scale = 1000000L
    // persisted: tf feeds BOTH the df aggregation and the score join —
    // without it the tokenize + (doc, tok) shuffle runs twice (plan audit
    // r7, same trade-off note as noveltyScores: at small SF the cache
    // costs more than the recompute, at corpus scale the recompute is a
    // second full scan + token shuffle). Left to LRU eviction.
    val tf = df.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "tok")
      .withColumn("score", expr(s"tf * (${Scale}L div df)"))
    scored.groupBy(col(idCol))
      .agg(graft.functions.TopKByAgg.top_k_by_str(
        col("score").cast("double"), col("tok"), k).as("top"))
      .select(col(idCol), posexplode(col("top")).as(Seq("pos", "kw")))
      .select(col(idCol), (col("pos") + 1).cast("long").as("rank"),
        col("kw.payload").as("token"), col("kw.score").cast("long").as("score"))
  }
}
