package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous blocklist monitoring (25th module): per tumbling event-time
  * window, how many documents hit each blocklisted phrase and how many
  * total occurrences arrived — the ingestion-time twin of
  * [[graft.ops.Blocklist.phraseMatches]], the dashboard a moderation /
  * policy team watches while a crawl streams in.
  *
  * Topology: phrase matching is PURE PER-ROW work (a document arrives
  * whole, so its token-aligned L-gram hits come from the same
  * `transform(sequence, slice)` projection as the batch operator — no
  * entity window, which streaming could not partition-order anyway),
  * then one watermarked windowed aggregation per (phrase, window). State
  * per window is |blocklist| counters — bounded by the phrase list, not
  * by the stream. Counts are order-independent integer sums, which the
  * stream≡batch spec leans on.
  *
  * Output per closed window: (phrase, window_start_us, n_hits).
  * Phrases with zero hits in a window emit nothing (append mode emits
  * observed groups only) — absence means zero, same documented delta as
  * [[StreamHeavyHitters]].
  */
object StreamBlocklist {

  def windowedPhraseHits(stream: DataFrame, tsCol: String, textCol: String,
      phrases: Seq[String], windowDuration: String,
      delayThreshold: String): DataFrame = {
    require(phrases.nonEmpty, "windowedPhraseHits needs at least one phrase")
    require(phrases.distinct.size == phrases.size,
      "duplicate phrases in the blocklist")
    val byLen = phrases.map(p => (p, p.split(" ").length))
    require(byLen.forall { case (p, l) => l >= 1 && l <= 16 && p.nonEmpty },
      "each phrase must be 1..16 single-space-separated tokens")
    val lens = byLen.map(_._2).distinct.sorted

    val spark = stream.sparkSession
    import spark.implicits._
    val phraseDf = broadcast(byLen.toDF("phrase", "plen"))

    val gramArrays = lens.map { l =>
      expr(s"""CASE WHEN size(__arr) >= $l THEN
                 transform(sequence(0, size(__arr) - $l),
                   i -> struct($l AS plen,
                               array_join(slice(__arr, i + 1, $l), ' ')
                                 AS gram))
               ELSE CAST(array() AS
                 array<struct<plen: int, gram: string>>)
               END""")
    }
    // watermark UPSTREAM of the phrase join: documents hitting no phrase
    // must still advance event time or no window would ever close
    val grams = stream
      .select(col(tsCol), split(col(textCol), " ").as("__arr"))
      .withWatermark(tsCol, delayThreshold)
      .select(col(tsCol), explode(concat(gramArrays: _*)).as("g"))
      .select(col(tsCol), col("g.plen").as("plen"), col("g.gram").as("gram"))
    grams
      .join(phraseDf,
        grams("plen") === phraseDf("plen") &&
          grams("gram") === phraseDf("phrase"))
      .groupBy(col("phrase"), window(col(tsCol), windowDuration))
      .agg(count(lit(1)).as("n_hits"))
      .select(col("phrase"),
        unix_micros(col("window.start")).as("window_start_us"),
        col("n_hits"))
  }
}
