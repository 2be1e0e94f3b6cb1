package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-aligned multi-phrase blocklist matching — the policy filter of a
  * training-data pipeline: which documents contain any of a curated list
  * of words or multi-word phrases (slurs, spam markers, licensing
  * boilerplate), where in the document, and how often.
  *
  * Token-aligned deliberately: substring matching ("ass" in "class") is
  * the classic blocklist false positive; a phrase of L words matches only
  * a run of L whole tokens.
  *
  * ZERO-SHUFFLE candidate generation: a document's L-grams are a pure
  * per-row computation (`split` → `transform(sequence(0, n−L), i →
  * array_join(slice(…)))`), so grams of every needed phrase length come
  * out of one projection on the scan — no posexplode + entity-window pass
  * (which would shuffle the whole token table by doc id before any
  * matching; plan-audited against that variant). The exploded (length,
  * pos, gram) rows then equi-join the BROADCAST phrase list and aggregate
  * per (doc, phrase) — at 100 TB the corpus side streams scan →
  * project → BroadcastHashJoin → partial agg with the only shuffle being
  * the final (doc, phrase)-keyed combine, which is hit-sized, not
  * corpus-sized.
  *
  * `sequence(a, b)` with b < a counts DOWN in Spark, so a doc shorter
  * than a phrase length is explicitly guarded to an empty gram array
  * rather than silently producing negative-position garbage.
  *
  * Phrases are matched exactly (case-sensitive, single-space separated);
  * normalize both sides upstream if needed. Duplicate phrases are
  * rejected. The reference has no text surface; beyond-reference
  * training-pipeline operator, the policy sibling of [[Redact]] (which
  * rewrites; this one locates and counts).
  *
  * Output: (doc_id, phrase, n_hits, first_pos), one row per (doc,
  * phrase) with at least one match; positions 0-based token offsets;
  * overlapping occurrences all count.
  */
object Blocklist {

  def phraseMatches(df: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "phraseMatches needs at least one phrase")
    require(phrases.distinct.size == phrases.size,
      "duplicate phrases in the blocklist")
    val byLen = phrases.map(p => (p, p.split(" ").length))
    require(byLen.forall { case (p, l) => l >= 1 && l <= 16 && p.nonEmpty },
      "each phrase must be 1..16 single-space-separated tokens")
    val lens = byLen.map(_._2).distinct.sorted

    val spark = df.sparkSession
    import spark.implicits._
    val phraseDf = broadcast(byLen.toDF("phrase", "plen"))

    // per-row grams for each needed length, from one split
    val gramArrays = lens.map { l =>
      expr(s"""CASE WHEN size(__arr) >= $l THEN
                 transform(sequence(0, size(__arr) - $l),
                   i -> struct($l AS plen, CAST(i AS BIGINT) AS pos,
                               array_join(slice(__arr, i + 1, $l), ' ')
                                 AS gram))
               ELSE CAST(array() AS
                 array<struct<plen: int, pos: bigint, gram: string>>)
               END""")
    }
    val grams = df
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__arr"))
      .select(col("doc_id"),
        explode(concat(gramArrays: _*)).as("g"))
      .select(col("doc_id"), col("g.plen").as("plen"),
        col("g.pos").as("pos"), col("g.gram").as("gram"))
    grams
      .join(phraseDf,
        grams("plen") === phraseDf("plen") &&
          grams("gram") === phraseDf("phrase"))
      .groupBy(col("doc_id"), col("phrase"))
      .agg(count(lit(1)).as("n_hits"), min(col("pos")).as("first_pos"))
  }
}
