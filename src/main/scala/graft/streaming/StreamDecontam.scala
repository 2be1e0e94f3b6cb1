package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous benchmark decontamination (28th module) — the streaming
  * twin of [[graft.ops.Decontaminate.flagContaminated]]: training
  * documents arrive on a stream and each is scored, per tumbling
  * event-time window, for word n-gram overlap against a FROZEN eval
  * corpus (the train-batch/score-stream topology of [[StreamAffinity]] /
  * [[StreamBm25]] — benchmarks change rarely; the crawl never stops).
  * This is the ingestion gate form: a contaminated page is flagged the
  * window it lands, not at the next full-corpus decontamination pass.
  *
  * Stateless until the last step: each event carries its WHOLE document,
  * so the per-doc distinct shingle set is computed inside the row
  * (split → slice window n-grams → array_distinct; documents shorter
  * than n tokens contribute their whole text as the single shingle —
  * the [[graft.ops.Dedup.shingles]] convention, equivalence spec-pinned
  * against the batch operator), then exploded and LEFT-joined
  * stream-static against the eval corpus's distinct-gram table
  * (broadcast — benchmark-sized by definition). The ONLY stateful
  * operator is the watermarked (window, doc) aggregation counting
  * (n_ngrams, n_contam): two longs of state per open (doc, window),
  * append mode emits each doc once at watermark close.
  *
  * The in-row shingle derivation uses higher-order array functions
  * (CodegenFallback); since r12 the batch [[graft.ops.Dedup.shingles]]
  * uses the same in-row transform/array_distinct projection, so the
  * equivalence spec pins the SHARED convention, not a cross-shape
  * equality (r13, ADVICE r12).
  *
  * Output per closed window: (window_start_us, doc_id, n_ngrams,
  * n_contam, contam_permille, contaminated).
  */
object StreamDecontam {

  def windowedOverlap(stream: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, tsCol: String, n: Int, thresholdPermille: Int,
      windowDuration: String, delayThreshold: String): DataFrame = {
    require(n >= 2 && n <= 16, s"n must be in [2, 16], got $n")
    require(thresholdPermille >= 0 && thresholdPermille <= 1000,
      s"threshold is per-mille in [0, 1000], got $thresholdPermille")
    val evalSh = broadcast(
      graft.ops.Dedup.shingles(eval, idCol, textCol, n)
        .select(col("shingle")).distinct()
        .withColumn("__hit", lit(1L)))
    val shingleArr = expr(
      s"""array_distinct(CASE WHEN size(__w) >= $n
         |  THEN transform(sequence(1, size(__w) - ${n - 1}),
         |                 i -> array_join(slice(__w, i, $n), ' '))
         |  ELSE array(__txt) END)""".stripMargin)
    val exploded = stream
      .select(col(tsCol).as("__ts"), col(idCol).as("doc_id"),
        col(textCol).as("__txt"), split(col(textCol), " ").as("__w"))
      .withWatermark("__ts", delayThreshold)
      .withColumn("shingle", explode(shingleArr))
    exploded
      .join(evalSh, Seq("shingle"), "left")
      .groupBy(window(col("__ts"), windowDuration), col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_contam"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("doc_id"), col("n_ngrams"), col("n_contam"),
        expr("(n_contam * 1000) div n_ngrams").as("contam_permille"),
        when(expr("(n_contam * 1000) div n_ngrams") >= thresholdPermille, 1L)
          .otherwise(0L).as("contaminated"))
  }
}
